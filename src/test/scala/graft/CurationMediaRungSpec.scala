package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.llm.DedupOps
import graft.streaming.{CurationStream, DedupStream, VectorStream}

/** The media-rung half of the curation-stream suite (lens config,
  * dihedral image/video, shift, tile, tile-and-mirror — the six
  * longest-running admission-ladder tests), split out of
  * [[CurationStreamSpec]] so forked test groups run the two halves in
  * parallel JVMs. Coverage is unchanged: the tests moved verbatim. */
class CurationMediaRungSpec extends CurationStreamHelpers {
  import spark.implicits._

  test("the image lens config: a gradient recycler admits under AHash, rejects image_dup under Both (start)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, ImageGen}
    // driver-side generative prints through the REAL PNG round-trip —
    // both lenses of each length's fixture image, memoized (the
    // framePrintOf discipline)
    val imgMemo = scala.collection.mutable.HashMap.empty[Int, ((Long, Long), (Long, Long))]
    def lensOf(l: Int): ((Long, Long), (Long, Long)) =
      imgMemo.getOrElseUpdate(l, {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(ImageGen.png(l.toLong)))
        (MultimodalOps.aHash(img), MultimodalOps.dHash(img))
      })
    def samplesOf(l: Int): Array[Int] = {
      val (ch, nf) = AudioGen.params(l.toLong)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l.toLong, i.toLong))
    }
    val afpMemo = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    def afpOf(l: Int) = afpMemo.getOrElseUpdate(l,
      MultimodalOps.acousticFingerprint(samplesOf(l)))
    val pcmMemo = scala.collection.mutable.HashMap.empty[Int, Long]
    def pcmOf(l: Int) = pcmMemo.getOrElseUpdate(l,
      AudioDecoder.pcmHashOfSamples(samplesOf(l)))
    // the VERTICAL-GRADIENT-RECYCLER analog inside the generative
    // family: a length pair whose dHash prints sit within the gate while
    // the aHash prints sit beyond it (the m4e separation, surfacing
    // naturally from the ramp formula's byte wrapping), with the audio
    // far on BOTH tiers — so under AHashLens nothing can reject the
    // second doc, and under BothLens ONLY the dHash leg can
    def audioFar(a: Int, b: Int): Boolean =
      ham64(afpOf(a), afpOf(b)) > 3 && pcmOf(a) != pcmOf(b)
    val cand = (for {
      la <- (330 to 700).iterator
      lb <- (la + 1 to 700).iterator
      if ham64(lensOf(la)._2, lensOf(lb)._2) <= 3
      if ham64(lensOf(la)._1, lensOf(lb)._1) > 3
      if audioFar(la, lb)
    } yield (la, lb)).nextOption()
    assert(cand.isDefined, "fixture search: no dHash-near/aHash-far pair")
    val (lenA, lenB) = cand.get
    // a seed far from both on EVERY print family in play (both image
    // lenses + both audio tiers; all ids are non-video, so the video
    // rungs never see them)
    val lenC = (330 to 700).find(l => l != lenA && l != lenB &&
      Seq(lenA, lenB).forall(x =>
        ham64(lensOf(l)._1, lensOf(x)._1) > 3 &&
          ham64(lensOf(l)._2, lensOf(x)._2) > 3 && audioFar(l, x))).get
    def textOfLen(tag: String, len: Int): String = {
      val sb = new StringBuilder(tag)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      sb.append(" ").append("z" * pad)
      assert(sb.length === len, s"textOfLen($tag, $len)")
      sb.toString
    }
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // one run per lens config over IDENTICAL feeds: seed, then the
    // original in microbatch 1, then the gradient recycler in
    // microbatch 2 — the verdict difference isolates the lens
    def runWith(lens: DedupStream.ImageLens): (Map[Long, (String, Option[Long])], String) = {
      val tmp = Files.createTempDirectory(s"graft_curation_lens_$lens").toString
      // the seed admission carries the run's lens config: the mediaconf
      // stamp (r17 advice) pins the lens per index on first admission,
      // so a mixed-config seed would now fail fast by design
      DedupStream.admitBatch(
        Seq((1L, "src", textOfLen("seed", lenC))).toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed", imageLens = lens)
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Array[Float])]
      val q = CurationStream.start(
        stream.toDF().toDF("doc_id", "source", "text", "embedding"),
        s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench,
        imageLens = lens)
      try {
        stream.addData((401L, "src", textOfLen("orig", lenA), e(2)))
        q.processAllAvailable()
        stream.addData((403L, "src", textOfLen("redo", lenB), e(3)))
        q.processAllAvailable()
      } finally q.stop()
      (CurationStream.verdictLog(spark, s"$tmp/out")
        .select("doc_id", "verdict", "detail_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap, tmp)
    }
    // under the default mean-threshold lens the recycler sails through —
    // the exact gap the second lens exists to close
    val (viaA, _) = runWith(DedupStream.AHashLens)
    assert(viaA === Map(401L -> ("admitted", None), 403L -> ("admitted", None)),
      viaA.toString)
    // under BothLens the dHash leg of the candidate union rejects it off
    // the MAINTAINED fourteenth side, across the microbatch boundary —
    // witness = the microbatch-1 admission
    val (viaBoth, tmpBoth) = runWith(DedupStream.BothLens)
    assert(viaBoth === Map(401L -> ("admitted", None),
      403L -> ("image_dup", Some(401L))), viaBoth.toString)
    // the metrics row names the class; the sides hold exactly the
    // admitted docs' prints (the seed admits under the SAME stamped lens
    // config — r17 advice — so under BothLens both sides carry it too:
    // the stamp is what guarantees no partially-populated side exists)
    val m = CurationStream.metrics(spark, s"$tmpBoth/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_image_dup")) === 1L, m.toString)
    assert(DedupStream.corpusImageHashes(spark, s"$tmpBoth/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 401L))
    assert(DedupStream.corpusImageDHashes(spark, s"$tmpBoth/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 401L))
    // the DHash-only config rejects it too (the rung serves the gradient
    // side alone), and never writes the aHash side at all — every
    // admission, seed included, is gradient-only under the stamp
    val (viaD, tmpD) = runWith(DedupStream.DHashLens)
    assert(viaD === Map(401L -> ("admitted", None),
      403L -> ("image_dup", Some(401L))), viaD.toString)
    assert(DedupStream.corpusImageHashes(spark, s"$tmpD/text")
      .select("doc_id").as[Long].collect().isEmpty,
      "a DHash-configured index must not populate the aHash side")
    DedupOps.releaseCaches()
  }

  test("the dihedral rung: a canonical-print recycler admits without it, rejects image_dup under dihedralRung (start)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, ImageGen}
    // driver-side generative prints, all three lens families + audio
    val lensMemo = scala.collection.mutable
      .HashMap.empty[Int, ((Long, Long), (Long, Long), (Long, Long))]
    def lensOf(l: Int) = lensMemo.getOrElseUpdate(l, {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ImageGen.png(l.toLong)))
      (MultimodalOps.aHash(img), MultimodalOps.dHash(img),
        MultimodalOps.dihedralAHash(img))
    })
    def samplesOf(l: Int): Array[Int] = {
      val (ch, nf) = AudioGen.params(l.toLong)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l.toLong, i.toLong))
    }
    val afpMemo = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    def afpOf(l: Int) = afpMemo.getOrElseUpdate(l,
      MultimodalOps.acousticFingerprint(samplesOf(l)))
    val pcmMemo = scala.collection.mutable.HashMap.empty[Int, Long]
    def pcmOf(l: Int) = pcmMemo.getOrElseUpdate(l,
      AudioDecoder.pcmHashOfSamples(samplesOf(l)))
    def audioFar(a: Int, b: Int) =
      ham64(afpOf(a), afpOf(b)) > 3 && pcmOf(a) != pcmOf(b)
    // the MIRROR-RECYCLER analog in the generative family: a length pair
    // whose CANONICAL prints sit within the gate while BOTH plain lenses
    // sit beyond it (the orbit minimum colliding where the
    // orientation-sensitive forms differ) and the audio far on both
    // tiers — so without the dihedral rung NOTHING rejects the second
    // doc, and with it ONLY the canonical screen can
    val cand = (for {
      la <- (330 to 700).iterator
      lb <- (la + 1 to 700).iterator
      if ham64(lensOf(la)._3, lensOf(lb)._3) <= 3
      if ham64(lensOf(la)._1, lensOf(lb)._1) > 3
      if ham64(lensOf(la)._2, lensOf(lb)._2) > 3
      if audioFar(la, lb)
    } yield (la, lb)).nextOption()
    assert(cand.isDefined, "fixture search: no canonical-near/lenses-far pair")
    val (lenA, lenB) = cand.get
    val lenC = (330 to 700).find(l => l != lenA && l != lenB &&
      Seq(lenA, lenB).forall(x =>
        ham64(lensOf(l)._1, lensOf(x)._1) > 3 &&
          ham64(lensOf(l)._2, lensOf(x)._2) > 3 &&
          ham64(lensOf(l)._3, lensOf(x)._3) > 3 && audioFar(l, x))).get
    def textOfLen(tag: String, len: Int): String = {
      val sb = new StringBuilder(tag)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      sb.append(" ").append("z" * pad)
      assert(sb.length === len); sb.toString
    }
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    def runWith(rung: Boolean): (Map[Long, (String, Option[Long])], String) = {
      val tmp = Files.createTempDirectory(s"graft_curation_dih_$rung").toString
      // the seed admission carries the run's rung config: the mediaconf
      // stamp (r17 advice) pins lens/rung per index on first admission
      DedupStream.admitBatch(
        Seq((1L, "src", textOfLen("seed", lenC))).toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed", dihedralRung = rung)
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Array[Float])]
      val q = CurationStream.start(
        stream.toDF().toDF("doc_id", "source", "text", "embedding"),
        s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench,
        dihedralRung = rung)
      try {
        stream.addData((401L, "src", textOfLen("orig", lenA), e(2)))
        q.processAllAvailable()
        stream.addData((403L, "src", textOfLen("redo", lenB), e(3)))
        q.processAllAvailable()
      } finally q.stop()
      (CurationStream.verdictLog(spark, s"$tmp/out")
        .select("doc_id", "verdict", "detail_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap, tmp)
    }
    // without the rung both plain lenses pass the recycler — the gap
    val (without, _) = runWith(rung = false)
    assert(without === Map(401L -> ("admitted", None),
      403L -> ("admitted", None)), without.toString)
    // with it: rejected image_dup off the MAINTAINED fifteenth side,
    // across the microbatch boundary, witness = the batch-1 admission
    val (withRung, tmpK) = runWith(rung = true)
    assert(withRung === Map(401L -> ("admitted", None),
      403L -> ("image_dup", Some(401L))), withRung.toString)
    // only ADMITTED docs' canonical prints sit on the side (the seed
    // admitted under the same stamped rung config, so its print is
    // there too — the stamp is what guarantees no partially-populated
    // side can exist)
    assert(DedupStream.corpusImageKHashes(spark, s"$tmpK/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 401L))
    DedupOps.releaseCaches()
  }

  test("the dihedral rung on VIDEO: a mirrored-keyframe clip recycler admits without it, rejects video_dup under dihedralRung (start)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, VideoGen}
    // driver-side generative prints, memoized per (length, frame):
    // plain aHash AND the dihedral-canonical print off one decode
    val frameMemo = scala.collection.mutable
      .HashMap.empty[(Int, Int), ((Long, Long), (Long, Long))]
    def framePrints(l: Int, fno: Int) = frameMemo.getOrElseUpdate((l, fno), {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        VideoGen.framePng(l.toLong, fno)))
      (MultimodalOps.aHash(img), MultimodalOps.dihedralAHash(img))
    })
    def allOrdinalsFar(la: Int, lb: Int): Boolean = {
      val (nfa, nfb) = (2 + la % 3, 2 + lb % 3)
      (0 until 4).forall(i => ham64(
        framePrints(la, i * nfa / 4)._1, framePrints(lb, i * nfb / 4)._1) > 3)
    }
    // the seed must ALSO be canonical-far at every ordinal: under the
    // rung the shot-level screen unions the framekhashes side, and a
    // coincidental canonical frame match would flip the "must admit"
    // batch-1 doc to video_near_dup
    def allOrdinalsFarK(la: Int, lb: Int): Boolean = {
      val (nfa, nfb) = (2 + la % 3, 2 + lb % 3)
      (0 until 4).forall(i => ham64(
        framePrints(la, i * nfa / 4)._2, framePrints(lb, i * nfb / 4)._2) > 3)
    }
    def samplesOf(l: Int): Array[Int] = {
      val (ch, nf) = AudioGen.params(l.toLong)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l.toLong, i.toLong))
    }
    val afpMemo = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    def afpOf(l: Int) = afpMemo.getOrElseUpdate(l,
      MultimodalOps.acousticFingerprint(samplesOf(l)))
    val pcmMemo = scala.collection.mutable.HashMap.empty[Int, Long]
    def pcmOf(l: Int) = pcmMemo.getOrElseUpdate(l,
      AudioDecoder.pcmHashOfSamples(samplesOf(l)))
    def audioFar(a: Int, b: Int) =
      ham64(afpOf(a), afpOf(b)) > 3 && pcmOf(a) != pcmOf(b)
    // the MIRROR-RECYCLER analog for CLIPS in the generative family: a
    // length pair whose canonical KEYFRAME prints sit within the gate
    // while the plain keyframe AND every sampled ordinal's plain prints
    // sit beyond it, audio far on both tiers — so without the rung
    // NOTHING rejects the second clip (keyframe rung far, shot rung far
    // at every ordinal, audio rungs far, no image prints on video ids),
    // and with it only the videokhashes canonical screen can
    val cand = (for {
      la <- (330 to 700).iterator
      lb <- (la + 1 to 700).iterator
      if ham64(framePrints(la, 0)._2, framePrints(lb, 0)._2) <= 3
      if ham64(framePrints(la, 0)._1, framePrints(lb, 0)._1) > 3
      if allOrdinalsFar(la, lb)
      if audioFar(la, lb)
    } yield (la, lb)).nextOption()
    assert(cand.isDefined, "fixture search: no canonical-keyframe-near/plain-far pair")
    val (lenA, lenB) = cand.get
    // a seed far from both on EVERY family the rung-on run screens:
    // plain keyframe + ordinals, canonical keyframe, audio
    val lenC = (330 to 700).find(l => l != lenA && l != lenB &&
      Seq(lenA, lenB).forall(x =>
        ham64(framePrints(l, 0)._1, framePrints(x, 0)._1) > 3 &&
          ham64(framePrints(l, 0)._2, framePrints(x, 0)._2) > 3 &&
          allOrdinalsFar(l, x) && allOrdinalsFarK(l, x) &&
          audioFar(l, x))).get
    def textOfLen(tag: String, len: Int): String = {
      val sb = new StringBuilder(tag)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      sb.append(" ").append("z" * pad)
      assert(sb.length === len); sb.toString
    }
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // every id is a VIDEO id (mod 4 == 0): the video rungs carry the catch
    def runWith(rung: Boolean): (Map[Long, (String, Option[Long])], String) = {
      val tmp = Files.createTempDirectory(s"graft_curation_vdih_$rung").toString
      DedupStream.admitBatch(
        Seq((8L, "src", textOfLen("seed", lenC))).toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed", dihedralRung = rung)
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        Seq((8L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Array[Float])]
      val q = CurationStream.start(
        stream.toDF().toDF("doc_id", "source", "text", "embedding"),
        s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench,
        dihedralRung = rung)
      try {
        stream.addData((404L, "src", textOfLen("orig", lenA), e(2)))
        q.processAllAvailable()
        // the mirrored-clip recycler analog: fresh text/embedding/audio,
        // plain prints far at keyframe and every ordinal — only the
        // canonical keyframe print collides, ACROSS the microbatch
        // boundary off the maintained side
        stream.addData((408L, "src", textOfLen("redo", lenB), e(3)))
        q.processAllAvailable()
      } finally q.stop()
      (CurationStream.verdictLog(spark, s"$tmp/out")
        .select("doc_id", "verdict", "detail_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap, tmp)
    }
    // without the rung every plain video screen passes the recycler
    val (without, _) = runWith(rung = false)
    assert(without === Map(404L -> ("admitted", None),
      408L -> ("admitted", None)), without.toString)
    // with it: rejected video_dup off the MAINTAINED sixteenth side
    val (withRung, tmpK) = runWith(rung = true)
    assert(withRung === Map(404L -> ("admitted", None),
      408L -> ("video_dup", Some(404L))), withRung.toString)
    val m = CurationStream.metrics(spark, s"$tmpK/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_video_dup")) === 1L, m.toString)
    // only ADMITTED clips' canonical keyframe prints sit on the side
    assert(DedupStream.corpusVideoKHashes(spark, s"$tmpK/text")
      .select("doc_id").as[Long].collect().toSet === Set(8L, 404L))
    DedupOps.releaseCaches()
  }

  test("the shift rungs reject padded/reversed/prepended recyclers across start() microbatches; without them every one admits") {
    implicit val sqlCtx = spark.sqlContext
    def textOfLen(tag: String, len: Int): String = {
      val sb = new StringBuilder(tag)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      sb.append(" ").append("z" * pad)
      assert(sb.length === len); sb.toString
    }
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // Searched fixture over the generative arithmetic (all video ids, so
    // the image rung is structurally absent): corpus doc 8 at text
    // length 335 (710-sample stream, 5 windows; 2-frame clip). Probes
    // carry the RENDITION envelope — fresh text/embedding/image/video of
    // their own, their AUDIO (or VIDEO) a re-rendering of doc 8's:
    //   404: doc 8's stream behind 2 whole windows of silence — the
    //        exact rung misses (pcm moved) and the contour rung misses
    //        (every whole-clip window shifted, Hamming 33);
    //   408: doc 8's stream REVERSED behind 1 window — contour Hamming
    //        46, and the forward-window screen never matches a reversal;
    //   412: doc 8's CLIP behind 2 intro frames — the keyframe rung sees
    //        an intro print (Hamming ~40) and every proportionally
    //        sampled ordinal lands on a different frame (all > 3);
    //   416: doc 8's CLIP MIRRORED behind 2 intro frames (round 20) —
    //        the COMPOSED re-edit: the prepend shifts every proportional
    //        ordinal AND the mirror flips the plain stride prints (the
    //        generative ramp is monotone in x, so ~half the bits move),
    //        so even the plain-stride rung misses; only the CANONICAL
    //        stride leg (framestridek side) catches it, at offset 2.
    // Without the rungs each probe therefore ADMITS; with them the
    // window/stride screens catch each at its true offset off the
    // maintained always-on sides, ACROSS start() microbatch boundaries.
    def runWith(rungs: Boolean): (Map[Long, (String, Option[Long])], String) = {
      val tmp = Files.createTempDirectory(s"graft_curation_shift_$rungs").toString
      DedupStream.admitBatch(
        Seq((8L, "src", textOfLen("seed", 335))).toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        Seq((8L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Array[Float], Option[Long],
          Option[Long], Option[Boolean], Option[Long], Option[Long],
          Option[Boolean])]
      val q = CurationStream.start(
        stream.toDF().toDF("doc_id", "source", "text", "embedding",
          "audio_len", "audio_pad", "audio_rev", "video_len", "video_pad",
          "video_mirror"),
        s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench,
        audioShiftRung = rungs, videoShiftRung = rungs)
      try {
        stream.addData((404L, "src", textOfLen("pads", 370), e(2),
          Some(335L), Some(2L), None, None, None, None))
        q.processAllAvailable()
        stream.addData((408L, "src", textOfLen("revs", 372), e(3),
          Some(335L), Some(1L), Some(true), None, None, None))
        q.processAllAvailable()
        stream.addData((412L, "src", textOfLen("vids", 416), e(4),
          None, None, None, Some(335L), Some(2L), None))
        q.processAllAvailable()
        stream.addData((416L, "src", textOfLen("mirr", 464), e(5),
          None, None, None, Some(335L), Some(2L), Some(true)))
        q.processAllAvailable()
      } finally q.stop()
      (CurationStream.verdictLog(spark, s"$tmp/out")
        .select("doc_id", "verdict", "detail_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap, tmp)
    }
    val (without, _) = runWith(rungs = false)
    assert(without === Map(404L -> ("admitted", None),
      408L -> ("admitted", None), 412L -> ("admitted", None),
      416L -> ("admitted", None)),
      without.toString)
    val (withR, tmpK) = runWith(rungs = true)
    assert(withR === Map(
      404L -> ("audio_shift_dup", Some(8L)),
      408L -> ("audio_shift_dup", Some(8L)),
      412L -> ("video_shift_dup", Some(8L)),
      416L -> ("video_shift_dup", Some(8L))), withR.toString)
    // fixture sanity for 416: the PLAIN stride screen alone genuinely
    // misses the mirrored+prepended rendition — the catch above is the
    // canonical leg's (framestridek side), not an accident of the plain
    // one
    assert(graft.llm.MultimodalOps.audioShiftNearDupsServedWins(
        DedupStream.corpusFrameStrides(spark, s"$tmpK/text"),
        graft.llm.MultimodalOps.frameStridePrints(spark,
          graft.llm.MultimodalOps.asRenditionMediaTable(
            Seq((416L, "src", textOfLen("mirr", 464), Some(335L), Some(2L),
              Some(true)))
              .toDF("doc_id", "source", "text", "video_len", "video_pad",
                "video_mirror"))),
        Seq(416L).toDF("doc_id")).collect().isEmpty,
      "the plain stride screen must genuinely miss the mirrored re-edit")
    // the dual-tier accounting carries the new classes
    val m = CurationStream.metrics(spark, s"$tmpK/out")
    assert(m.agg(sum("n_audio_shift_dup")).head.getLong(0) === 2L)
    assert(m.agg(sum("n_video_shift_dup")).head.getLong(0) === 2L)
    // only ADMITTED docs' prints reach the window/stride sides — the
    // canonical stride side included (round 20)
    assert(DedupStream.corpusAudioRWins(spark, s"$tmpK/text")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(8L))
    assert(DedupStream.corpusFrameStrides(spark, s"$tmpK/text")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(8L))
    assert(DedupStream.corpusFrameKStrides(spark, s"$tmpK/text")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(8L))
    DedupOps.releaseCaches()
  }

  test("the tile rung rejects a cropped image re-upload across start() microbatches; without it every full-frame lens admits") {
    implicit val sqlCtx = spark.sqlContext
    def textOfLen(tag: String, len: Int): String = {
      val sb = new StringBuilder(tag)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      sb.append(" ").append("z" * pad)
      assert(sb.length === len); sb.toString
    }
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // corpus doc 9 (an IMAGE id; 9%7=2 so it admits as the lossless BMP
    // rendition — prints are container-invariant): text length 335 →
    // 63×57 px, 3×3 whole tiles. Probe 405 re-uploads doc 9's image
    // CROPPED by one tile column and one tile row (the img_* rendition
    // envelope), under fresh text/embedding/audio: every full-frame
    // lens's sample positions move (the generative ramp's aHash/dHash/
    // dihedral prints all land > Hamming 3), so the lens rung — and
    // every other rung — admits it; only the TILE rung catches, at its
    // true (−1, −1) offset, off the maintained imagetiles side.
    def runWith(rung: Boolean): (Map[Long, (String, Option[Long])], String) = {
      val tmp = Files.createTempDirectory(s"graft_curation_tile_$rung").toString
      DedupStream.admitBatch(
        Seq((9L, "src", textOfLen("seed", 335))).toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        Seq((9L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Array[Float], Option[Long],
          Option[Long], Option[Long])]
      val q = CurationStream.start(
        stream.toDF().toDF("doc_id", "source", "text", "embedding",
          "img_len", "img_crop_x", "img_crop_y"),
        s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench,
        imageShiftRung = rung)
      try {
        stream.addData((405L, "src", textOfLen("crop", 464), e(2),
          Some(335L), Some(1L), Some(1L)))
        q.processAllAvailable()
      } finally q.stop()
      (CurationStream.verdictLog(spark, s"$tmp/out")
        .select("doc_id", "verdict", "detail_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap, tmp)
    }
    val (without, _) = runWith(rung = false)
    assert(without === Map(405L -> ("admitted", None)), without.toString)
    val (withR, tmpK) = runWith(rung = true)
    assert(withR === Map(405L -> ("image_shift_dup", Some(9L))),
      withR.toString)
    val m = CurationStream.metrics(spark, s"$tmpK/out")
    assert(m.agg(sum("n_image_shift_dup")).head.getLong(0) === 1L)
    // only ADMITTED docs' tile prints reach the maintained side
    assert(DedupStream.corpusImageTiles(spark, s"$tmpK/text")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(9L))
    DedupOps.releaseCaches()
  }

  test("the tile rung rejects a cropped-AND-mirrored re-upload across start() microbatches; without it every rung admits") {
    implicit val sqlCtx = spark.sqlContext
    def textOfLen(tag: String, len: Int): String = {
      val sb = new StringBuilder(tag)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      sb.append(" ").append("z" * pad)
      assert(sb.length === len); sb.toString
    }
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // the r20 COMPOSED image recycler: probe 405 re-uploads corpus doc
    // 9's image (335 → 63×57 px) cropped by one tile column and one
    // tile row AND mirror-x'd (img_g = 1) — the crop moves every
    // full-frame lens sample, the mirror scrambles every PLAIN tile
    // print, so the whole image ladder INCLUDING the m4o tile screen
    // structurally misses; only the canonical-tile leg of the rung
    // catches, on the 'rt' witness at (−1, −1), off the maintained
    // imagetilesk side.
    def runWith(rung: Boolean): (Map[Long, (String, Option[Long])], String) = {
      val tmp = Files.createTempDirectory(s"graft_curation_ktile_$rung").toString
      DedupStream.admitBatch(
        Seq((9L, "src", textOfLen("seed", 335))).toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        Seq((9L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, Array[Float], Option[Long],
          Option[Long], Option[Long], Option[Long])]
      val q = CurationStream.start(
        stream.toDF().toDF("doc_id", "source", "text", "embedding",
          "img_len", "img_crop_x", "img_crop_y", "img_g"),
        s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench,
        imageShiftRung = rung)
      try {
        stream.addData((405L, "src", textOfLen("mirr", 464), e(2),
          Some(335L), Some(1L), Some(1L), Some(1L)))
        q.processAllAvailable()
      } finally q.stop()
      (CurationStream.verdictLog(spark, s"$tmp/out")
        .select("doc_id", "verdict", "detail_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap, tmp)
    }
    val (without, _) = runWith(rung = false)
    assert(without === Map(405L -> ("admitted", None)), without.toString)
    val (withR, tmpK) = runWith(rung = true)
    assert(withR === Map(405L -> ("image_shift_dup", Some(9L))),
      withR.toString)
    // only ADMITTED docs' canonical tile prints reach the side, 'lt'
    // family rows in the plain tile schema
    assert(DedupStream.corpusImageTileKs(spark, s"$tmpK/text")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(9L))
    DedupOps.releaseCaches()
  }

}
