package graft

import org.apache.spark.sql.functions._

import graft.llm.{CurationOps, DedupOps, MultimodalOps, SimilarityOps, TextOps}
import graft.model.Tables

/** LLM data-pipeline operators: LSH candidate soundness, MinHash recall vs
  * exact Jaccard, ANN recall vs brute force, multimodal plumbing. */
class LlmSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  /** Run `body` with AQE off and hand it the materialized plain physical
    * plan of `df` — the ONE way this suite writes narrow-map plan gates.
    * Under AQE the executed plan is an AdaptiveSparkPlanExec whose stages
    * are leaves, so collect() finds neither joins nor exchanges and an
    * isEmpty assertion passes VACUOUSLY (caught in round 12); with AQE
    * off every node, including WholeStageCodegen spans, is visible. */
  private def plainPlanOf(mkDf: => org.apache.spark.sql.DataFrame)(
      body: org.apache.spark.sql.execution.SparkPlan => Unit): Unit = {
    // Restore the PRE-OVERRIDE value, not a hardcoded "true" — a suite
    // running with AQE off must not have it silently flipped on by a gate.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = mkDf
      df.count()
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.nonEmpty, s"gate saw no codegen span — AQE wrapper leaked?\n$plan")
      body(plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("exact dedup keeps one doc per distinct text") {
    val kept = DedupOps.exactDedup(docs).count()
    val distinctTexts = docs.select("text").distinct().count()
    assert(kept === distinctTexts)
  }

  test("minhash-LSH finds a usable fraction of true near-dup pairs (recall)") {
    val threshold = 0.5
    // Ground truth: shared-shingle candidate generation is complete for
    // jaccard > 0 (disjoint shingle sets have jaccard 0), then exact-verified.
    val truth = DedupOps.ngramJaccardDups(docs, threshold).count()
    val found = DedupOps.minhashNearDups(docs, threshold).count()
    assert(truth > 0, "fixture should contain near-dup pairs")
    // Banded LSH (32 perms, 8 bands of 4) at jaccard 0.5+ — expect a solid
    // majority of verified pairs (precision is 1 by construction: every
    // emitted pair is exact-verified).
    assert(found.toDouble / truth.toDouble >= 0.5,
      s"LSH recall too low: $found/$truth")
  }

  test("LSH ANN results are a subset of brute-force candidates per bucket") {
    val queries = emb.filter(col("vec_id") < 4)
    val ann = SimilarityOps.lshTopK(emb, queries, 5)
    // Correctness within the bucket: each (query, neighbor) pair must rank
    // consistently — rank 1 neighbor of each query must be the bucket's
    // true nearest (checked implicitly by construction); here we assert
    // shape and determinism across runs.
    val run1 = ann.collect().toSeq
    val run2 = SimilarityOps.lshTopK(emb, queries, 5).collect().toSeq
    assert(run1 === run2)
    assert(run1.groupBy(_.getLong(0)).values.forall(_.size <= 5))
  }

  test("ANN recall@5 vs brute force is nonzero and measured") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SimilarityOps.lshTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"ANN recall@5 = $recall%.2f (4 hyperplanes, 16 buckets, multi-probe d=1)")
    assert(recall > 0.3)
  }

  test("IVF top-k recall vs brute force, and determinism") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf1 = SimilarityOps.ivfTopK(emb, queries, 5)
    val got1 = ivf1.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got2 = SimilarityOps.ivfTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got1 === got2, "IVF must be deterministic")
    val recall = (exact intersect got1).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (16 cells, probe 2)")
    assert(recall > 0.2)
  }

  test("text stats are sane on the fixture") {
    val row = TextOps.textStats(docs).filter(col("doc_id") === 0).head()
    assert(row.getAs[Long]("n_tokens") > 0)
    assert(row.getAs[Double]("avg_token_len") > 1.0)
  }

  test("multimodal decode parses real PNGs and real AVI containers (m1)") {
    val meta = MultimodalOps.mediaPipeline(spark, docs)
    assert(meta.count() === docs.count())
    val joined = meta.join(docs, "doc_id")
    // image rows: format parsed off the container — the MIXED feed's
    // bmp renditions (doc_id % 7 == 2) must sniff as bmp — and dims are
    // the generator's (the engine re-reads them from the image bytes;
    // the generator's numbers never flow to the output directly)
    assert(joined.filter(col("doc_id") % 4 =!= 0)
      .filter(col("format") =!=
          when(col("doc_id") % 7 === 2, "bmp").otherwise("png") ||
        col("width") =!= (octet_length(col("text")) % 48 + 16).cast("long") ||
        col("height") =!= ((octet_length(col("text")) * 7) % 48 + 16).cast("long"))
      .count() === 0)
    // video rows: header fields re-read from the RIFF/AVI container by
    // the pure-JDK chunk walk — shared dim formula, n_pixels carries the
    // whole-clip frame multiplier (w·h·nf, the decode-cost unit)
    assert(joined.filter(col("doc_id") % 4 === 0)
      .filter(col("format") =!= "avi" ||
        col("width") =!= (octet_length(col("text")) % 48 + 16).cast("long") ||
        col("height") =!= ((octet_length(col("text")) * 7) % 48 + 16).cast("long") ||
        col("n_pixels") =!= (col("width") * col("height") *
          (octet_length(col("text")) % 3 + 2)).cast("long"))
      .count() === 0)
  }

  test("imageio decodes hand-built PNG and JPEG through the batched mapPartitions path") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{MediaRecord, MediaMeta}
    def bytesOf(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val media = Seq(
      MediaRecord(1L, "image/png", bytesOf(123, 45, "png")),
      MediaRecord(2L, "image/jpeg", bytesOf(77, 33, "jpg")),
      MediaRecord(3L, "audio/opus", Array[Byte](1, 2, 3, 4))).toDS().toDF()
    val got = MultimodalOps.decodeMeta(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L) === MediaMeta(1L, "image/png", "png", 123L, 45L, 123L * 45L))
    assert(got(2L) === MediaMeta(2L, "image/jpeg", "jpeg", 77L, 33L, 77L * 33L))
    // an undecodable payload DROPS (no stub remains — every modality has
    // a real decode path; rot must not kill the task either)
    assert(!got.contains(3L), s"rot must drop: $got")
    // a TRUNCATED payload behind valid PNG magic (ImageIO throws, not
    // null) must drop for that record, never kill the decode task
    val truncated = bytesOf(50, 50, "png").take(24)
    val mixed = Seq(
      MediaRecord(4L, "image/png", truncated),
      MediaRecord(5L, "image/png", bytesOf(10, 20, "png"))).toDS().toDF()
    val got2 = MultimodalOps.decodeMeta(spark, mixed)
      .collect().map(m => m.doc_id -> m).toMap
    assert(!got2.contains(4L), s"truncated rot must drop: $got2")
    assert(got2(5L) === MediaMeta(5L, "image/png", "png", 10L, 20L, 200L))
  }

  test("the AVI chunk walk decodes hand-built PNG- and MJPEG-frame containers (m7)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AviDecoder, MediaRecord, VideoGen}
    // the fixture generator's container round-trips through the engine
    // parse: header fields and frame payloads come back bit-exactly
    val fix = AviDecoder.parse(VideoGen.avi(37L)).get
    val (nf, w, h) = VideoGen.params(37L)
    assert((fix.width, fix.height, fix.usPerFrame, fix.frames.size) ===
      ((w.toLong, h.toLong, VideoGen.UsPerFrame, nf)))
    assert(fix.frames(1).toSeq === VideoGen.framePng(37L, 1).toSeq)
    // a hand-built MJPEG-style AVI (real-world codec: JPEG frame
    // payloads) decodes through the SAME path — the frame dispatch is on
    // each frame's own magic, so the spec drives ImageIO's JPEG reader
    // where the oracle-predictable fixture uses lossless PNG
    def jpegAvi(w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val pngAvi = VideoGen.avi(37L) // template for header layout only
      assert(pngAvi.nonEmpty)
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, 0x123456 + f)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", out)
        out.toByteArray
      }
      // hand-rolled minimal container: RIFF(AVI ) { LIST hdrl { avih },
      // LIST movi { 00dc… } } — the decoder needs no strl to parse
      def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def fcc(s: String) = s.getBytes("US-ASCII")
      def chunk(id: String, p: Array[Byte]) = fcc(id) ++ le32(p.length.toLong) ++ p ++
        (if (p.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      val avih = le32(33333L) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte)
      val hdrl = chunk("LIST", fcc("hdrl") ++ chunk("avih", avih))
      val movi = chunk("LIST", fcc("movi") ++
        frames.toArray.flatMap(fb => chunk("00dc", fb)))
      val body = fcc("AVI ") ++ hdrl ++ movi
      fcc("RIFF") ++ le32(body.length.toLong) ++ body
    }
    val media = Seq(
      MediaRecord(1L, "video/mjpeg", jpegAvi(31, 17, 3)),
      // truncated mid-movi behind valid magic: the parse throws inside
      // its Try and the record drops, never killing the task
      MediaRecord(2L, "video/mjpeg", jpegAvi(31, 17, 3).take(90)),
      MediaRecord(3L, "video/avi", VideoGen.avi(50L))).toDS().toDF()
    val metas = MultimodalOps.decodeMeta(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).format === "avi" && metas(1L).width === 31L &&
      metas(1L).height === 17L && metas(1L).n_pixels === 31L * 17L * 3L)
    assert(!metas.contains(2L), s"truncated AVI must drop: $metas")
    // keyframe extraction decodes the JPEG frames themselves (dims from
    // the decoded image, not the header)
    val samples = MultimodalOps.sampleFrames(spark,
        Seq(MediaRecord(1L, "video/mjpeg", jpegAvi(31, 17, 3))).toDS().toDF())
      .collect()
    assert(samples.length === 4 && samples.forall(_.doc_id === 1L))
    assert(samples.map(_.frame_no).toSeq === Seq(0L, 0L, 1L, 2L),
      "evenly spaced integer-floor frame numbers over 3 frames")
  }

  test("shot-level frame near-dups equal same-ordinal brute force (m3b)") {
    import spark.implicits._
    val frames = MultimodalOps.sampleFrames(spark,
      MultimodalOps.asMediaTable(
        docs.filter(MultimodalOps.isVideoId(col("doc_id"))))).toDF()
    val banded = MultimodalOps.frameNearDups(frames)
      .as[(Long, Long, Long, Long)].collect().toSet
    val prints = frames.select("doc_id", "frame_idx", "h_hi", "h_lo")
      .as[(Long, Long, Long, Long)].collect()
    val brute = (for {
      a <- prints; b <- prints
      if a._1 < b._1 && a._2 == b._2
      h = java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4)
      if h <= 3
    } yield (a._1, b._1, a._2, h.toLong)).toSet
    assert(banded === brute, s"banded ${banded.size} vs brute ${brute.size}")
    // same-length videos are identical clips: every sampled ordinal
    // matches at Hamming 0 — the full-match case
    assert(banded.exists(_._4 == 0L), "fixture sanity: identical clips pair")
    // the SHOT-LEVEL claim: a hand fixture where only LATER ordinals
    // match (the re-edit that swaps the opening shot) — keyframe
    // screens see nothing, the frame screen reports exactly the kept
    // ordinals
    val reEdit = Seq(
      (1L, 10L, 100L, 200L), (1L, 11L, 300L, 400L),  // doc 1: shots A,B
      (2L, 10L, 999L, 888L), (2L, 11L, 300L, 400L))  // doc 2: new open, same B
      .toDF("doc_id", "frame_idx", "h_hi", "h_lo")
    val got = MultimodalOps.frameNearDups(reEdit)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 11L, 0L)),
      s"only the kept ordinal matches: $got")
    DedupOps.releaseCaches()
  }

  test("javax.sound.sampled decodes hand-built WAVs through the batched mapPartitions path (m5)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord, AudioMeta}
    // a hand-built WAV with KNOWN samples (edge values included): the
    // engine's decoded-PCM fold must equal the plain-Scala fold over the
    // same sample values — the decode round-trip proof
    val samples = Array[Int](0, 1, -1, 32767, -32768, 12345, -12345)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val handHash = samples.foldLeft(0L)((h, s) =>
      (h * 31 + (s + 32768)) % 1000000007L)
    val rows = Seq(
      AudioRecord(1L, "audio/wav", out.toByteArray),
      AudioRecord(2L, "audio/wav", AudioGen.wav(30L)),
      // a foreign container and a TRUNCATED payload behind valid RIFF
      // magic must DROP (the parse throws, never kills the task)
      AudioRecord(3L, "audio/opus", Array[Byte](1, 2, 3, 4)),
      AudioRecord(4L, "audio/wav", out.toByteArray.take(20))).toDS().toDF()
    val got = MultimodalOps.decodeAudioMeta(spark, rows)
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L) === AudioMeta(1L, "wav", 8000L, 1L, 7L, 0L, handHash))
    // the generative fixture round-trips: header params + the fold over
    // the formula's samples, computed independently here
    val (ch, nf) = AudioGen.params(30L)
    val genHash = (0L until nf.toLong * ch).foldLeft(0L)((h, i) =>
      (h * 31 + (AudioGen.sample(30L, i) + 32768)) % 1000000007L)
    assert(got(2L) === AudioMeta(2L, "wav", 8000L, ch.toLong, nf.toLong,
      nf.toLong * 1000L / 8000L, genHash))
    assert(!got.contains(3L) && !got.contains(4L), s"rot must drop: $got")
    // a crafted ZERO-SAMPLE-RATE header behind a valid container must
    // drop too (the JDK reader doesn't validate rate > 0; the duration
    // division must never throw outside the parse and kill the task)
    val zeroRate = AudioGen.wav(30L).clone()
    java.util.Arrays.fill(zeroRate, 24, 28, 0.toByte) // fmt chunk's LE rate
    val gotZ = MultimodalOps.decodeAudioMeta(spark,
      Seq(AudioRecord(9L, "audio/wav", zeroRate)).toDS().toDF()).collect()
    assert(gotZ.isEmpty, s"zero-rate clip must drop: ${gotZ.toSeq}")
    // m5b: equal text lengths generate identical PCM → one dup group
    // with keeper = min doc_id (d1 semantics on the third modality)
    val dup = MultimodalOps.audioDupGroupsFromMeta(
      MultimodalOps.decodeAudioMeta(spark, MultimodalOps.asAudioTable(
        Seq((1L, "a" * 30), (2L, "b" * 30), (3L, "c" * 41))
          .toDF("doc_id", "text"))).toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(dup === Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  test("acoustic fingerprints ride the modality-agnostic banded near-dup machinery (m5d)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.AudioGen
    // fingerprint vs a plain reimplementation over the generative samples
    def gen(l: Long): Array[Int] = {
      val (ch, nf) = AudioGen.params(l)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l, i.toLong))
    }
    def hand(samples: Array[Int]): (Long, Long) = {
      val n = samples.length
      val e = (0 to 64).map(w =>
        (w * n / 65 until (w + 1) * n / 65).map(i => samples(i) + 32768L).sum)
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if e(k + 1) > e(k))
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      (hi, lo)
    }
    Seq(30L, 41L, 77L).foreach { l =>
      assert(MultimodalOps.acousticFingerprint(gen(l)) === hand(gen(l)), s"len $l")
    }
    // the DECODED path (WAV container round-trip) lands on the same prints
    val frame = MultimodalOps.audioFingerprintFrame(MultimodalOps.asAudioTable(
      Seq((1L, "a" * 30), (2L, "b" * 30), (3L, "c" * 41)).toDF("doc_id", "text")))
      .select("doc_id", "h_hi", "h_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(frame(1L) === hand(gen(30L)))
    assert(frame(2L) === hand(gen(30L)), "identical clips share a print")
    assert(frame(3L) === hand(gen(41L)))
    // the IMAGE tier's banded pigeonhole runs unchanged over audio
    // prints and must reproduce the brute-force pair set exactly
    val full = MultimodalOps.audioFingerprintFrame(
      MultimodalOps.asAudioTable(docs))
    val banded = MultimodalOps.imageNearDupsFromHashes(full)
      .as[(Long, Long, Long)].collect().toSet
    val prints = full.select("doc_id", "h_hi", "h_lo")
      .as[(Long, Long, Long)].collect()
    val brute = (for {
      a <- prints; b <- prints if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (a._1, b._1, h.toLong)).toSet
    assert(banded === brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(banded.exists(_._3 == 0L), "fixture sanity: identical clips pair")
    // the SERVED split (m5e): the m4d operator over audio prints must
    // reproduce brute force restricted to increment-later-member pairs —
    // corpus member as id_a, internal pairs once, (min, max)-oriented
    val mix = Seq((1L, "g" * 30), (2L, "h" * 47), (401L, "i" * 30),
      (402L, "j" * 30), (403L, "k" * 99)).toDF("doc_id", "text")
    val fullM = MultimodalOps.audioFingerprintFrame(
      MultimodalOps.asAudioTable(mix))
    val servedPairs = MultimodalOps.imageNearDupsServedHashes(
      fullM.filter(col("doc_id") < 400), fullM.filter(col("doc_id") >= 400),
      mix.filter(col("doc_id") >= 400).select("doc_id"))
      .as[(Long, Long, Long)].collect().toSet
    val printsM = fullM.select("doc_id", "h_hi", "h_lo")
      .as[(Long, Long, Long)].collect()
    val bruteM = (for {
      a <- printsM; b <- printsM
      if b._1 >= 400 && a._1 != b._1 && (a._1 < 400 || a._1 < b._1)
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (a._1, b._1, h.toLong)).toSet
    assert(servedPairs === bruteM, s"served $servedPairs vs brute $bruteM")
    assert(servedPairs.contains((1L, 401L, 0L)), s"corpus leg: $servedPairs")
    assert(servedPairs.count(p => Set(p._1, p._2) == Set(401L, 402L)) === 1,
      "internal pair surfaces once")
    DedupOps.releaseCaches()
  }

  test("the combined audio decode feeds hash and print off one parse (m5 full)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.AudioDecoder
    val tbl = MultimodalOps.asAudioTable(
      Seq((1L, "a" * 30), (2L, "b" * 41), (3L, "c" * 77)).toDF("doc_id", "text"))
    // decodeFull ≡ (decodeAudioMeta, audioFingerprintFrame) projection-
    // wise: one container parse, one sample parse, both consumers agree
    val full = MultimodalOps.decodeAudioFull(spark, tbl).toDF()
    assert(MultimodalOps.audioMetaOf(full).collect().toSet ===
      MultimodalOps.decodeAudioMeta(spark, tbl).toDF().collect().toSet)
    assert(MultimodalOps.audioFpOf(full).collect().toSet ===
      MultimodalOps.audioFingerprintFrame(tbl).collect().toSet)
    // GAIN robustness, the property the perceptual ladder rung exists
    // for: with equal-size windows (n = 65·m) a constant level shift
    // moves every window energy by the same amount — every delta's sign
    // survives, the print is IDENTICAL — while the PCM content hash
    // differs: the recycled re-leveled clip slips the exact rung and is
    // caught by the print rung
    val base = Array.tabulate(65 * 20)(i => ((i * 37) % 4000) - 2000)
    val shifted = base.map(_ + 100)
    assert(MultimodalOps.acousticFingerprint(base) ===
      MultimodalOps.acousticFingerprint(shifted))
    assert(AudioDecoder.pcmHashOfSamples(base) !==
      AudioDecoder.pcmHashOfSamples(shifted))
  }

  test("dHash equals the hand model and survives a vertical gradient aHash does not (m4e)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{ImageGen, MediaRecord}
    // hand model: the generative pixel formula through the 9×8 grid /
    // horizontal-gradient arithmetic directly
    def handD(l: Long): (Long, Long) = {
      val (w, h) = ImageGen.dims(l)
      val gray = Array.tabulate(8, 9) { (y, x) =>
        val v = (((x * w) / 9) * 31 + ((y * h) / 8) * 17 + l.toInt) & 0xffffff
        (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) / 1000
      }
      var (hi, lo) = (0L, 0L)
      for (k <- 0 until 64 if gray(k / 8)(k % 8 + 1) > gray(k / 8)(k % 8))
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      (hi, lo)
    }
    val got = MultimodalOps.imageDHashes(spark, Seq(
        MediaRecord(1L, "image/png", ImageGen.png(30L)),
        MediaRecord(2L, "image/png", ImageGen.png(30L)),
        MediaRecord(3L, "image/png", ImageGen.png(41L))).toDS().toDF())
      .select("doc_id", "h_hi", "h_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === handD(30L))
    assert(got(2L) === handD(30L), "identical images share a dHash")
    assert(got(3L) === handD(41L))
    // the SEPARATION the second lens exists for: a smooth VERTICAL
    // gradient (vignette/scanner shading) preserves left-to-right luma
    // order within every row — dHash is IDENTICAL — while the global
    // mean moves relative to rows, flipping aHash bits
    def grayImg(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = math.min(240, math.max(0, f(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // base: a row-wise pattern with headroom; shaded: + 4·y per row
    def base(x: Int, y: Int): Int = 40 + ((x * 13 + y * 5) % 97)
    val plain = grayImg(base)
    val shaded = grayImg((x, y) => base(x, y) + 4 * y)
    assert(MultimodalOps.dHash(plain) === MultimodalOps.dHash(shaded),
      "a vertical gradient must not move the gradient hash")
    assert(MultimodalOps.aHash(plain) !== MultimodalOps.aHash(shaded),
      "fixture sanity: the same shading DOES move the mean-threshold hash")
  }

  test("the lens union catches the vertical-gradient recycler ONLY via the dHash leg (m4f/m4g)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.MediaRecord
    def grayImg(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = math.min(250, math.max(0, f(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // original: luma rises with x only (every row identical); recycler:
    // the SAME image under a per-row level shift (+y) — within-row order
    // preserved, so every dHash comparison survives, while the global
    // mean moves relative to each row and flips aHash bits far past the
    // Hamming-3 gate
    val orig = grayImg((x, _) => 40 + 2 * x)
    val recycled = grayImg((x, y) => 40 + 2 * x + y)
    def ham(p: (Long, Long), q: (Long, Long)): Int =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    assert(ham(MultimodalOps.dHash(orig), MultimodalOps.dHash(recycled)) === 0,
      "within-row order preserved: the gradient prints are identical")
    assert(ham(MultimodalOps.aHash(orig), MultimodalOps.aHash(recycled)) > 3,
      "the mean-threshold prints are beyond the near-dup gate")
    // ONE decode, both lenses: the union operator surfaces the pair with
    // both exact distances — caught by the dHash leg alone
    val media = Seq(MediaRecord(1L, "image/png", png(orig)),
      MediaRecord(2L, "image/png", png(recycled))).toDS().toDF()
    val lens = MultimodalOps.lensFingerprintFrame(media)
    // the lens frame's projections agree with the single-lens paths
    assert(MultimodalOps.aHashOf(lens).collect().toSet ===
      MultimodalOps.fingerprintFrame(media).collect().toSet)
    assert(MultimodalOps.dHashOf(lens).collect().toSet ===
      MultimodalOps.imageDHashes(spark, media).collect().toSet)
    val union = MultimodalOps.imageLensUnionNearDups(lens)
      .as[(Long, Long, Long, Long)].collect()
    assert(union.toSeq.map(r => (r._1, r._2, r._4)) === Seq((1L, 2L, 0L)),
      s"the union must surface exactly the dHash-leg pair: ${union.toSeq}")
    assert(union.head._3 > 3L, "ham_ahash rides along, beyond the gate")
    // the aHash-only search misses it (the gap the union closes); the
    // dHash family (m4f) sees it
    assert(MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.aHashOf(lens)).collect().isEmpty)
    assert(MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.dHashOf(lens)).count() === 1L)
    DedupOps.releaseCaches()
  }

  test("AIFF and AU containers decode to the WAV rendition's exact PCM (m5 mixed feed)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, AudioRecord}
    // the sniff accepts all three JDK-native magics — and ONLY those:
    // AIFC (compressed AIFF) and foreign codecs read as None
    assert(AudioDecoder.sniff(AudioGen.wav(30L)) === Some("wav"))
    assert(AudioDecoder.sniff(AudioGen.aiff(30L)) === Some("aiff"))
    assert(AudioDecoder.sniff(AudioGen.au(30L)) === Some("au"))
    val aifc = AudioGen.aiff(30L).clone()
    aifc(11) = 'C' // FORM....AIFC
    assert(AudioDecoder.sniff(aifc) === None,
      "compressed AIFF is outside the 16-bit-PCM scope")
    // container-INVARIANCE: one generative sample formula under three
    // containers (different bytes, different endianness) → identical
    // header fields, pcm_hash AND acoustic print
    val full = MultimodalOps.decodeAudioFull(spark, Seq(
        AudioRecord(1L, "audio/wav", AudioGen.wav(30L)),
        AudioRecord(2L, "audio/aiff", AudioGen.aiff(30L)),
        AudioRecord(3L, "audio/au", AudioGen.au(30L))).toDS().toDF())
      .collect().map(m => m.doc_id -> m).toMap
    assert(full.size === 3, "every container decodes")
    assert(full(1L).format === "wav")
    assert(full(2L).format === "aiff")
    assert(full(3L).format === "au")
    Seq(2L, 3L).foreach { id =>
      assert(full(id).pcm_hash === full(1L).pcm_hash, s"pcm_hash of $id")
      assert((full(id).h_hi, full(id).h_lo) === (full(1L).h_hi, full(1L).h_lo))
      assert(full(id).n_frames === full(1L).n_frames)
      assert(full(id).sample_rate === full(1L).sample_rate)
      assert(full(id).channels === full(1L).channels)
      assert(full(id).duration_ms === full(1L).duration_ms)
    }
    // rot rule on the new containers: truncation behind valid magic
    // drops the record, never kills the decode task
    assert(MultimodalOps.decodeAudioBatch(Seq(
      AudioRecord(8L, "audio/aiff", AudioGen.aiff(30L).take(40)),
      AudioRecord(9L, "audio/au", AudioGen.au(30L).take(20)))).isEmpty)
    // the cross-container dup: asAudioTable's mixed feed (1 → AIFF,
    // 3 → AU, 5 → WAV) of one text length lands in ONE m5b group —
    // d1's content identity does not see the container
    val dup = MultimodalOps.audioDupGroupsFromMeta(
      MultimodalOps.decodeAudioMeta(spark, MultimodalOps.asAudioTable(
        Seq((1L, "a" * 30), (3L, "b" * 30), (5L, "c" * 30))
          .toDF("doc_id", "text"))).toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(dup === Set((1L, 1L, 3L), (3L, 1L, 3L), (5L, 1L, 3L)),
      s"WAV/AIFF/AU renditions of one PCM must form one group: $dup")
  }

  test("BMP and GIF containers decode beside PNG; lossless renditions share exact prints (m1/m4 mixed feed)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{ImageDecoder, ImageGen, MediaRecord}
    // the sniff accepts all four JDK-native image magics
    assert(ImageDecoder.sniff(ImageGen.png(30L)) === Some("png"))
    assert(ImageDecoder.sniff(ImageGen.bmp(30L)) === Some("bmp"))
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    // a grayscale image with few distinct levels: GIF's 256-color
    // palette holds it EXACTLY, so all three non-DCT containers are
    // lossless here and must land on identical prints
    val img = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 40) {
      val v = ((x * 7 + y * 13) % 16) * 16
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val (png, bmp, gif) = (enc(img, "png"), enc(img, "bmp"), enc(img, "gif"))
    assert(ImageDecoder.sniff(gif) === Some("gif"))
    // the hand-written BMP encoder round-trips pixel-identically through
    // the INDEPENDENT javax.imageio reader (the fastPng discipline on
    // the second lossless container), across odd widths that exercise
    // the 4-byte row padding
    Seq(30L, 41L, 46L, 77L).foreach { l =>
      val got = ImageDecoder.image(ImageGen.bmp(l)).get
      val (w, h) = ImageGen.dims(l)
      assert((got.getWidth, got.getHeight) === ((w, h)), s"bmp dims, len=$l")
      for (y <- 0 until h; x <- 0 until w)
        assert((got.getRGB(x, y) & 0xffffff) ===
          ((x * 31 + y * 17 + l.toInt) & 0xffffff), s"bmp pixel ($x,$y), len=$l")
    }
    // container-INVARIANCE on the lossless paths: byte-different
    // payloads, identical decoded pixels, identical prints → ONE m4b
    // group across three containers (the WAV/AIFF/AU trick on pixels)
    val media = Seq(MediaRecord(1L, "image/png", png),
      MediaRecord(2L, "image/bmp", bmp),
      MediaRecord(3L, "image/gif", gif)).toDS().toDF()
    val metas = MultimodalOps.decodeMeta(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas.size === 3, "every container decodes")
    assert(metas(2L).format === "bmp" && metas(3L).format === "gif")
    assert(Seq(2L, 3L).forall(id =>
      (metas(id).width, metas(id).height) === (40L, 24L)))
    val groups = MultimodalOps.imageDupGroupsFromHashes(
      MultimodalOps.fingerprintFrame(media))
      .as[(Long, Long, Long)].collect().toSet
    assert(groups === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)),
      s"lossless renditions of one image must form one group: $groups")
    // rot rule on the new containers: truncation behind valid magic
    // drops the record, never kills the decode task
    assert(MultimodalOps.decodeBatch(Seq(
      MediaRecord(8L, "image/bmp", bmp.take(20)),
      MediaRecord(9L, "image/gif", gif.take(8)))).isEmpty)
    // the LOSSY container lands in the NEAR-dup tier, as the sniff doc
    // claims: a JPEG rendition of a smooth image decodes to slightly
    // different pixels — not print-identical, but within the banded
    // search's Hamming-3 gate (low-frequency content keeps DCT loss
    // small), so the m4c tier catches the re-encode the exact tier
    // misses
    val smooth = new java.awt.image.BufferedImage(48, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 48) {
      val v = 60 + 2 * x + y
      smooth.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jm = MultimodalOps.ImageDecoder.image(enc(smooth, "jpg")).get
    val hamJ = {
      val (a, b) = (MultimodalOps.aHash(smooth), MultimodalOps.aHash(jm))
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    }
    assert(hamJ <= 3, s"JPEG rendition must sit within the near-dup gate ($hamJ)")
    // the fixture's mixed feed: a doc_id % 7 == 2 non-video doc carries
    // a BMP rendition whose prints EQUAL the same-length PNG doc's (the
    // lossless-container invariance the image dedup tier rides)
    val mixed = MultimodalOps.fingerprintFrame(MultimodalOps.asMediaTable(
      Seq((2L, "src", "a" * 30), (3L, "src", "b" * 30))
        .toDF("doc_id", "source", "text")))
      .select("doc_id", "h_hi", "h_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mixed(2L) === mixed(3L),
      "a BMP rendition must print identically to the PNG of the same pixels")
    DedupOps.releaseCaches()
  }

  test("the dihedral-canonical print is EXACTLY flip/rotation-invariant; the banded tier catches the mirrored recycler (m4k/m4l)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.MediaRecord
    def img(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(250, math.max(0, f(x, y)))
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      out
    }
    // an ASYMMETRIC pattern (no dihedral self-symmetry) on NON-SQUARE
    // dims — the hard case: rotation swaps the dims
    val a = img(56, 40)((x, y) => 30 + ((x * 5 + y * y) % 200))
    def flipH(src: java.awt.image.BufferedImage) =
      img(src.getWidth, src.getHeight)((x, y) =>
        src.getRGB(src.getWidth - 1 - x, y) & 255)
    def rot90(src: java.awt.image.BufferedImage) =
      // (x', y') of the rotated image reads source (y', h-1-x')... define
      // clockwise: rotated(x, y) = src(y, H-1-x) with rotated dims (H, W)
      img(src.getHeight, src.getWidth)((x, y) =>
        src.getRGB(y, src.getHeight - 1 - x) & 255)
    val b = flipH(a)
    val c = rot90(a)
    val d = rot90(rot90(a)) // 180°
    // hand model, independently reimplemented: symmetric positions, luma
    // = gray value (r=g=b), mean threshold, min over the 8 index maps
    def hand(src: java.awt.image.BufferedImage): (Long, Long) = {
      val (w, h) = (src.getWidth, src.getHeight)
      def pos(i: Int, dim: Int) =
        if (i < 4) i * dim / 8 else dim - 1 - (7 - i) * dim / 8
      val g = Array.tabulate(64)(k => src.getRGB(pos(k % 8, w), pos(k / 8, h)) & 255)
      val mean = g.sum / 64
      val bit = (k: Int) => g(k) > mean
      (for (f <- graft.llm.MultimodalOps.DihedralMaps) yield {
        var hi = 0L; var lo = 0L
        for (k <- 0 until 64) {
          val (sx, sy) = f(k % 8, k / 8)
          if (bit(sy * 8 + sx)) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
        }
        (hi, lo)
      }).min
    }
    assert(MultimodalOps.dihedralAHash(a) === hand(a), "engine == hand model")
    // EXACT invariance across the orbit — flips, 90° (dims swapped), 180°
    Seq(b, c, d).foreach(t =>
      assert(MultimodalOps.dihedralAHash(t) === MultimodalOps.dihedralAHash(a),
        "the canonical print must be exactly orientation-invariant"))
    // the plain orientation-sensitive print misses the mirror by far
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    assert(ham(MultimodalOps.aHash(a), MultimodalOps.aHash(b)) > 3,
      "fixture sanity: plain aHash misses the mirrored recycler")
    // frame level: the mirrored recycler lands at Hamming 0 in the m4l
    // tier off one decode per rendition
    def png(src: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, "png", out)
      out.toByteArray
    }
    val media = Seq(MediaRecord(1L, "image/png", png(a)),
      MediaRecord(2L, "image/png", png(b))).toDS().toDF()
    val pairs = MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.dihedralFingerprintFrame(media))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)), s"mirrored pair must surface: $pairs")
    assert(MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.fingerprintFrame(media)).collect().isEmpty,
      "the orientation-sensitive tier misses it — the gap m4k closes")
    DedupOps.releaseCaches()
  }

  test("the dual-family frame sampler catches a MIRRORED clip re-upload the plain video tiers miss (m7e/m3d)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.MediaRecord
    def img(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(250, math.max(0, f(x, y)))
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      out
    }
    def flipH(src: java.awt.image.BufferedImage) =
      img(src.getWidth, src.getHeight)((x, y) =>
        src.getRGB(src.getWidth - 1 - x, y) & 255)
    def png(src: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, "png", out)
      out.toByteArray
    }
    // two ASYMMETRIC frames on non-square dims — the m4k hard case, as
    // a two-shot clip; the mirrored re-upload flips EVERY frame
    val f0 = img(56, 40)((x, y) => 30 + ((x * 5 + y * y) % 200))
    val f1 = img(56, 40)((x, y) => 25 + ((x * 3 + 2 * y + x * y) % 190))
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    Seq(f0, f1).foreach(f =>
      assert(ham(MultimodalOps.aHash(f), MultimodalOps.aHash(flipH(f))) > 3,
        "fixture sanity: plain prints must miss the mirror on every frame"))
    // hand-rolled minimal RIFF/AVI (avih + movi) around real PNG frames
    // — the jpegAvi shape, so the REAL container parse is in the loop
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, p: Array[Byte]) = fcc(id) ++ le32(p.length.toLong) ++ p ++
      (if (p.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def avi(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
      val avih = le32(33333L) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.size.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = chunk("LIST", fcc("hdrl") ++ chunk("avih", avih))
      val movi = chunk("LIST", fcc("movi") ++ frames.flatMap(chunk("00dc", _)).toArray)
      val body = fcc("AVI ") ++ hdrl ++ movi
      fcc("RIFF") ++ le32(body.length.toLong) ++ body
    }
    val media = Seq(
      MediaRecord(1L, "video/avi", avi(Seq(png(f0), png(f1)), 56, 40)),
      MediaRecord(2L, "video/avi", avi(Seq(png(flipH(f0)), png(flipH(f1))), 56, 40)))
      .toDS().toDF()
    val lens = MultimodalOps.sampleFrameLens(spark, media).collect()
    // decode-once consistency: the sampler's plain columns equal
    // sampleFrames' prints, its k columns equal dihedralAHash of the
    // decoded frame each ordinal landed on (fno = i·2/4 -> 0,0,1,1)
    val plain = MultimodalOps.sampleFrames(spark, media).collect()
      .map(s => (s.doc_id, s.frame_idx) -> ((s.h_hi, s.h_lo))).toMap
    assert(lens.length === 8)
    lens.foreach { s =>
      assert((s.h_hi, s.h_lo) === plain((s.doc_id, s.frame_idx)),
        s"plain projection drifted at $s")
      val src = if (s.doc_id == 1L) Seq(f0, f1) else Seq(flipH(f0), flipH(f1))
      assert((s.k_hi, s.k_lo) ===
        MultimodalOps.dihedralAHash(src(s.frame_no.toInt)),
        s"canonical print drifted at $s")
    }
    // per-ordinal EXACT invariance: the mirrored clip's canonical prints
    // equal the original's at every ordinal
    val byKey = lens.map(s => (s.doc_id, s.frame_idx) -> ((s.k_hi, s.k_lo))).toMap
    (0L until 4L).foreach(i =>
      assert(byKey((1L, i)) === byKey((2L, i)), s"ordinal $i"))
    val lensDf = MultimodalOps.sampleFrameLens(spark, media).toDF()
    // the canonical keyframe tier (m7e) catches at Hamming 0; the plain
    // keyframe tier (m7b) misses — the video analog of the m4k gap
    val kf = MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.keyframeOf(MultimodalOps.frameDihedralOf(lensDf)))
      .as[(Long, Long, Long)].collect().toSeq
    assert(kf === Seq((1L, 2L, 0L)), s"mirrored clip must surface: $kf")
    assert(MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.videoKeyframeHashes(media)).collect().isEmpty,
      "the plain keyframe tier misses the mirrored clip")
    // the shot-level canonical tier (m3d) matches EVERY ordinal; the
    // plain shot tier (m3b) matches none
    val shots = MultimodalOps.frameNearDups(
      MultimodalOps.frameDihedralOf(lensDf))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(shots === (0L until 4L).map(i => (1L, 2L, i, 0L)), shots.toString)
    assert(MultimodalOps.frameNearDups(
      MultimodalOps.frameAHashOf(lensDf)).collect().isEmpty,
      "the plain shot tier misses the mirrored re-edit")
    DedupOps.releaseCaches()
  }

  test("the reversal-canonical print is EXACTLY time-reversal-invariant; the banded tier catches the reversed recycler (m5k/m5l)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    val rnd = new scala.util.Random(19)
    val base = Array.fill(700)(rnd.nextInt(65536) - 32768)
    val rev = base.reverse
    // hand model, independently reimplemented: symmetric bounds, both
    // packings off one energy array, tuple min
    def hand(s: Array[Int]): (Long, Long) = {
      val n = s.length
      def b(k: Int) = if (k <= 32) k * n / 65 else n - (65 - k) * n / 65
      val e = Array.tabulate(65)(w =>
        (b(w) until b(w + 1)).map(i => s(i) + 32768L).sum)
      def pack(bit: Int => Boolean) =
        (0 until 64).foldLeft((0L, 0L)) { case ((hi, lo), k) =>
          if (!bit(k)) (hi, lo)
          else if (k < 32) (hi, lo | (1L << k)) else (hi | (1L << (k - 32)), lo)
        }
      Seq(pack(k => e(k + 1) > e(k)), pack(k => e(63 - k) > e(64 - k))).min
    }
    assert(MultimodalOps.reversalAHash(base) === hand(base), "engine == hand model")
    // EXACT invariance under reversal
    assert(MultimodalOps.reversalAHash(rev) === MultimodalOps.reversalAHash(base),
      "the canonical print must be exactly reversal-invariant")
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    // the plain orientation-sensitive contour print misses the reversal
    assert(ham(MultimodalOps.acousticFingerprint(base),
      MultimodalOps.acousticFingerprint(rev)) > 3,
      "fixture sanity: the plain contour print misses the reversed clip")
    // frame level off real WAV round-trips: the reversed re-upload lands
    // at Hamming 0 in the m5l tier; the plain m5d tier misses it
    val audio = Seq(AudioRecord(1L, "audio/wav", AudioGen.wavOf(1, base)),
      AudioRecord(2L, "audio/wav", AudioGen.wavOf(1, rev))).toDS().toDF()
    val pairs = MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.audioReversalFrame(audio))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)), s"reversed pair must surface: $pairs")
    assert(MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.audioFingerprintFrame(audio)).collect().isEmpty,
      "the orientation-sensitive tier misses it — the gap m5k closes")
    DedupOps.releaseCaches()
  }

  test("m5h catches a silence-padded rendition at its true offset; sub-window shifts stay in the documented boundary") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    val rnd = new scala.util.Random(7)
    val base = Array.fill(5 * 128)(rnd.nextInt(65536) - 32768)
    val clipA = AudioGen.wavOf(1, base)
    // the recycler: TWO whole windows of leading silence — every window
    // of the whole-clip contour print shifts, the m5d gate misses, but
    // the windowed sub-prints are the base's verbatim at ordinal + 2
    val clipB = AudioGen.wavOf(1, new Array[Int](2 * 128) ++ base)
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    assert(ham(
      MultimodalOps.acousticFingerprint(base),
      MultimodalOps.acousticFingerprint(new Array[Int](2 * 128) ++ base)) > 3,
      "fixture sanity: the whole-clip print must miss the padded rendition")
    val audio = Seq(AudioRecord(1L, "audio/wav", clipA),
      AudioRecord(2L, "audio/wav", clipB)).toDS().toDF()
    val prints = MultimodalOps.audioWindowPrints(audio)
    // the pad's silence windows drop (constant), the base's 5 windows
    // print on both clips — B's shifted by exactly 2 ordinals
    assert(prints.as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap ===
      Map(1L -> (0L until 5L), 2L -> (2L until 7L)))
    val caught = MultimodalOps.audioShiftNearDups(prints)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(caught === Seq((1L, 2L, 2L, 5L)),
      s"must catch at the true offset with all 5 windows: $caught")
    // the documented boundary: a SUB-window pad (64 samples) shifts
    // every window's content, so no sub-print matches — robustness is
    // exact at window granularity, gated (not guaranteed) below it
    val clipC = AudioGen.wavOf(1, new Array[Int](64) ++ base)
    val subWin = MultimodalOps.audioShiftNearDups(
      MultimodalOps.audioWindowPrints(
        Seq(AudioRecord(1L, "audio/wav", clipA),
          AudioRecord(3L, "audio/wav", clipC)).toDS().toDF()))
      .collect()
    assert(subWin.isEmpty,
      s"sub-window shift is outside the exact catch by design: ${subWin.toSeq}")
    DedupOps.releaseCaches()
  }

  test("m5m catches a reversed+padded rendition that evades the forward-window AND whole-clip-canonical tiers at once") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    val rnd = new scala.util.Random(19)
    // length deliberately NOT a multiple of 128: the misalignment that
    // makes the tail-anchored b family load-bearing (reversing the
    // stream slides every head-anchored window by n mod 128)
    val base = Array.fill(5 * 128 + 37)(rnd.nextInt(65536) - 32768)
    val clipA = AudioGen.wavOf(1, base)
    // the recycler: time-REVERSE the stream, then hide it behind two
    // whole windows of leading silence
    val clipB = AudioGen.wavOf(1, new Array[Int](2 * 128) ++ base.reverse)
    val both = Seq(AudioRecord(1L, "audio/wav", clipA),
      AudioRecord(2L, "audio/wav", clipB)).toDS().toDF()
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    // evasion 1: the forward-window shift tier (m5h) misses — every
    // window of the reversed stream prints reversed content
    assert(MultimodalOps.audioShiftNearDups(
      MultimodalOps.audioWindowPrints(both)).collect().isEmpty,
      "fixture sanity: the forward-window tier must miss the reversal")
    // evasion 2: the whole-clip canonical print (m5k) misses too — the
    // pad moves every symmetric window boundary, so the canonicalized
    // print is no longer the original's
    assert(ham(MultimodalOps.reversalAHash(base),
      MultimodalOps.reversalAHash(new Array[Int](2 * 128) ++ base.reverse)) > 3,
      "fixture sanity: the whole-clip canonical print must miss the pad")
    // the composed tier catches on BOTH cross-family legs: the b family
    // is leading-pad-invariant, so (f_A, b_B) matches at offset 0; the
    // f windows of B land on A's b windows shifted by the pad, so
    // (b_A, f_B) matches at offset 2 — five windows each, two
    // independent witnesses of one recycling
    val caught = MultimodalOps.audioRevShiftNearDups(
      MultimodalOps.audioRevWindowPrints(both))
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(Set((1L, 2L, "fb", 0L, 5L), (1L, 2L, "bf", 2L, 5L))
      .subsetOf(caught), s"cross-family catches missing: $caught")
    // window-level invariance, the kernel's algebra: an EXACT reversal
    // swaps the families print-for-print at every ordinal, any length
    val of = MultimodalOps.revWindowPrintsOfSamples(base)
      .map(w => (w.family, w.ordinal) -> (w.h_hi, w.h_lo)).toMap
    val ofRev = MultimodalOps.revWindowPrintsOfSamples(base.reverse)
      .map(w => (w.family, w.ordinal) -> (w.h_hi, w.h_lo)).toMap
    assert(of.map { case ((f, j), h) =>
      ((if (f == "f") "b" else "f", j), h) }.toMap === ofRev,
      "reversal must exactly swap the cut families")
    DedupOps.releaseCaches()
  }

  test("m3f catches a prepended-intro re-edit at its true offset; both proportional-sampler rungs miss it") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{MediaRecord, VideoGen}
    val rnd = new scala.util.Random(23)
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val real = (0 until 4).map(_ => png())
    val intro = (0 until 2).map(_ => png())
    val a = MediaRecord(4L, "video/avi", VideoGen.aviOf(32, 24, real))
    val b = MediaRecord(8L, "video/avi", VideoGen.aviOf(32, 24, intro ++ real))
    val media = Seq(a, b).toDS().toDF()
    // the evasion: prepending two intro frames grows nf from 4 to 6, so
    // EVERY proportionally sampled frame number moves (0,1,2,3 →
    // 0,1,3,4) — at each shared ordinal the two clips now show
    // DIFFERENT frames, so the keyframe rung (ordinal 0 is an intro
    // frame) and the shot rung (same-ordinal matching) both miss
    assert(MultimodalOps.frameNearDups(
      MultimodalOps.sampleFrames(spark, media).toDF()).collect().isEmpty,
      "fixture sanity: the proportional shot rung must miss the prepend")
    // the stride tier catches at exactly the intro count with every
    // real frame matched — the m5h discipline on the frame axis
    val caught = MultimodalOps.audioShiftNearDups(
      MultimodalOps.frameStridePrintsRaw(spark, media))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(caught === Seq((4L, 8L, 2L, 4L)),
      s"must catch at the true offset with all 4 frames: $caught")
    DedupOps.releaseCaches()
  }

  test("m3i catches a mirrored-AND-prepended re-edit at its true offset; every other video rung genuinely misses") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{MediaRecord, VideoGen}
    val rnd = new scala.util.Random(37)
    def img(): java.awt.image.BufferedImage = {
      val i = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32)
        i.setRGB(x, y, rnd.nextInt() & 0xffffff)
      i
    }
    def mirror(i: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val o = new java.awt.image.BufferedImage(i.getWidth, i.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until i.getHeight; x <- 0 until i.getWidth)
        o.setRGB(x, y, i.getRGB(i.getWidth - 1 - x, y))
      o
    }
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", out)
      out.toByteArray
    }
    val real = (0 until 4).map(_ => img())
    val intro = (0 until 2).map(_ => img())
    val a = MediaRecord(4L, "video/avi", VideoGen.aviOf(32, 24, real.map(png)))
    // the COMPOSED re-edit: intro spliced ahead, then the whole cut
    // mirrored — the r19 verdict's remaining video evasion
    val b = MediaRecord(8L, "video/avi",
      VideoGen.aviOf(32, 24, (intro ++ real).map(f => png(mirror(f)))))
    val media = Seq(a, b).toDS().toDF()
    // miss 1: the proportional shot rung (plain prints) — every sampled
    // ordinal shifts AND flips
    assert(MultimodalOps.frameNearDups(
      MultimodalOps.sampleFrames(spark, media).toDF()).collect().isEmpty,
      "fixture sanity: the plain shot rung must miss")
    // miss 2: the DIHEDRAL shot rung — canonical prints neutralize the
    // mirror but live on proportionally-sampled frames that all shifted
    assert(MultimodalOps.frameNearDups(
      MultimodalOps.frameDihedralOf(
        MultimodalOps.sampleFrameLens(spark, media).toDF()))
      .collect().isEmpty,
      "fixture sanity: the dihedral shot rung must miss the prepend")
    // miss 3: the plain STRIDE tier — ordinals align under the fan but
    // every plain print flipped ~half its bits
    assert(MultimodalOps.audioShiftNearDups(
      MultimodalOps.frameStridePrintsRaw(spark, media)).collect().isEmpty,
      "fixture sanity: the plain stride tier must miss the mirror")
    // the composed tier catches at exactly the intro count with every
    // real frame matched: canonical prints neutralize the mirror, the
    // stride axis neutralizes the prepend
    val caught = MultimodalOps.audioShiftNearDups(
      MultimodalOps.frameStrideKPrintsRaw(spark, media))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(caught === Seq((4L, 8L, 2L, 4L)),
      s"must catch at the true offset with all 4 real frames: $caught")
    // kernel invariance: a clip's canonical stride prints are EXACTLY
    // its mirror's at every ordinal (the dihedralAHash theorem ridden
    // by the stride rows)
    val plain = MultimodalOps.frameStrideKPrints(spark,
      Seq(MediaRecord(4L, "v", VideoGen.aviOf(32, 24, real.map(png))))
        .toDS().toDF()).collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val mirr = MultimodalOps.frameStrideKPrints(spark,
      Seq(MediaRecord(4L, "v", VideoGen.aviOf(32, 24, real.map(f => png(mirror(f))))))
        .toDS().toDF()).collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(plain === mirr, "canonical stride prints must be mirror-invariant")
    DedupOps.releaseCaches()
  }

  test("m4o catches a cropped re-upload at its true (dx, dy); all three full-frame lenses genuinely miss") {
    import spark.implicits._
    import graft.llm.MultimodalOps.MediaRecord
    val rnd = new scala.util.Random(41)
    val src = new java.awt.image.BufferedImage(48, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 48)
      src.setRGB(x, y, rnd.nextInt() & 0xffffff)
    // the crop recycler: one 16-px tile column off the left
    val cropped = new java.awt.image.BufferedImage(32, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 32)
      cropped.setRGB(x, y, src.getRGB(x + 16, y))
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", out)
      out.toByteArray
    }
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    // the classic image-dedup evasion besides the mirror flip: a crop
    // moves EVERY sample position of every full-frame lens — even the
    // dihedral-canonical print (a crop is not a dihedral transform)
    assert(ham(MultimodalOps.aHash(src), MultimodalOps.aHash(cropped)) > 3,
      "fixture sanity: aHash must miss the crop")
    assert(ham(MultimodalOps.dHash(src), MultimodalOps.dHash(cropped)) > 3,
      "fixture sanity: dHash must miss the crop")
    assert(ham(MultimodalOps.dihedralAHash(src),
      MultimodalOps.dihedralAHash(cropped)) > 3,
      "fixture sanity: the dihedral-canonical lens must miss the crop")
    // the tile tier catches: the cropped upload's tile (tx, ty) IS the
    // original's (tx+1, ty), so every shared tile matches at
    // (dx, dy) = (−1, 0) — 2×3 = 6 of them
    val media = Seq(MediaRecord(1L, "image/png", png(src)),
      MediaRecord(2L, "image/png", png(cropped))).toDS().toDF()
    val caught = MultimodalOps.imageTileNearDups(
      MultimodalOps.tilePrintFrameRaw(media))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(caught === Seq((1L, 2L, -1L, 0L, 6L)),
      s"must catch at (-1, 0) with all 6 shared tiles: $caught")
    DedupOps.releaseCaches()
  }

  test("the per-image tile cap and the degenerate-tile drops bound the imagetiles side") {
    // growth rail: a hostile 1040×1040 upload cuts 65×65 = 4225 whole
    // tiles; the side stores exactly MaxTilesPerImage rows
    val big = new java.awt.image.BufferedImage(1040, 1040,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 1040; x <- 0 until 1040)
      big.setRGB(x, y, ((x * 37 + y * 91) & 0xff) << 8)
    assert(MultimodalOps.tilePrintsOf(big).size ===
      MultimodalOps.MaxTilesPerImage)
    // a CONSTANT tile carries no spatial evidence and drops (the
    // silence-window rule on pixels); partial right/bottom tiles drop
    // too (47×17 → one whole 16-px tile per axis beyond the constant)
    val img = new java.awt.image.BufferedImage(47, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 47)
      img.setRGB(x, y, if (x < 16) 0x808080 else ((x * 53 + y * 29) & 0xff))
    val prints = MultimodalOps.tilePrintsOf(img)
    assert(prints.map(t => (t.tx, t.ty)) === Seq((1L, 0L)),
      s"only the varying whole tile may print: $prints")
  }

  test("the canonical tile print is EXACTLY invariant under all 8 dihedral transforms of the tile content") {
    // the symGray argument restricted to a 16×16 tile: sample offsets
    // {0,2,4,6} ∪ {9,11,13,15} are mirror-images of each other, so a
    // dihedral transform of the tile PERMUTES the sampled grid and the
    // min over the 8-orbit is a class invariant — the m4k exactness
    // carried to the sub-print level
    val rnd = new scala.util.Random(47)
    val t = Array.tabulate(16, 16)((_, _) => rnd.nextInt() & 0xffffff)
    def imgOf(px: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, px(x, y))
      im
    }
    val base = MultimodalOps.tileKHash(imgOf((x, y) => t(y)(x)), 0, 0)
    assert(base.nonEmpty)
    val transforms: Seq[(Int, Int) => Int] = Seq(
      (x, y) => t(y)(15 - x), (x, y) => t(15 - y)(x),
      (x, y) => t(15 - y)(15 - x), (x, y) => t(x)(y),
      (x, y) => t(x)(15 - y), (x, y) => t(15 - x)(y),
      (x, y) => t(15 - x)(15 - y))
    transforms.zipWithIndex.foreach { case (f, i) =>
      assert(MultimodalOps.tileKHash(imgOf(f), 0, 0) === base,
        s"transform $i must preserve the canonical tile print")
    }
    // and the plain tile print is NOT mirror-invariant (the seam the
    // canonical family exists to close)
    assert(MultimodalOps.tileAHash(imgOf((x, y) => t(y)(15 - x)), 0, 0)
      !== MultimodalOps.tileAHash(imgOf((x, y) => t(y)(x)), 0, 0),
      "fixture sanity: the plain tile print must move under a mirror")
  }

  test("m4r catches a cropped-AND-mirrored re-upload with its transform witness; the plain tile tier and every full-frame lens genuinely miss") {
    import spark.implicits._
    import graft.llm.MultimodalOps.MediaRecord
    val rnd = new scala.util.Random(59)
    // 52×41: both axes carry a mod-16 remainder, so the anchor families
    // genuinely differ (no grid coincidences to lean on)
    val src = new java.awt.image.BufferedImage(52, 41,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 41; x <- 0 until 52)
      src.setRGB(x, y, rnd.nextInt() & 0xffffff)
    // the COMPOSED recycler: one tile column off the left, THEN mirror-x
    val comp = new java.awt.image.BufferedImage(36, 41,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 41; x <- 0 until 36)
      comp.setRGB(x, y, src.getRGB(16 + (35 - x), y))
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", out)
      out.toByteArray
    }
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    // the composition evades EVERY existing image rung: the crop moves
    // all full-frame sample positions (so even the dihedral-canonical
    // lens misses — crop∘mirror is not a dihedral transform of the
    // whole frame), and the mirror scrambles every PLAIN tile print
    assert(ham(MultimodalOps.aHash(src), MultimodalOps.aHash(comp)) > 3,
      "fixture sanity: aHash must miss")
    assert(ham(MultimodalOps.dHash(src), MultimodalOps.dHash(comp)) > 3,
      "fixture sanity: dHash must miss")
    assert(ham(MultimodalOps.dihedralAHash(src),
      MultimodalOps.dihedralAHash(comp)) > 3,
      "fixture sanity: the full-frame dihedral lens must miss")
    val media = Seq(MediaRecord(1L, "image/png", png(src)),
      MediaRecord(2L, "image/png", png(comp))).toDS().toDF()
    assert(MultimodalOps.imageTileNearDups(
      MultimodalOps.tilePrintFrameRaw(media)).isEmpty,
      "the plain tile tier must genuinely miss the composed recycler")
    // the canonical tier catches: the recycler's RIGHT-anchored grid is
    // the original's left grid reflected (tile j from the right = the
    // original's lt tile j+1, mirrored — print-equal under the
    // canonical min), so all 2×2 shared whole tiles match on the 'rt'
    // witness at (dx, dy) = (−1, 0)
    val caught = MultimodalOps.imageTileKNearDups(
      MultimodalOps.tileKPrintFrameRaw(media))
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    assert(caught === Seq((1L, 2L, "rt", -1L, 0L, 4L)),
      s"must catch on the rt witness at (-1, 0) with all 4 shared tiles: $caught")
    DedupOps.releaseCaches()
  }

  test("the per-family tile cap and degenerate drops bound the ktile side; the stored side is the 'lt' family alone") {
    // growth rail per FAMILY: a hostile 1040×1040 upload cuts 65×65 =
    // 4225 whole tiles per anchor family; each family caps at
    // MaxTilesPerImage independently (4× the plain tier's rows on the
    // query side — the stored side keeps 1× by taking 'lt' alone)
    val big = new java.awt.image.BufferedImage(1040, 1040,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 1040; x <- 0 until 1040)
      big.setRGB(x, y, ((x * 37 + y * 91) & 0xff) << 8)
    val prints = MultimodalOps.tileKPrintsOf(big)
    assert(prints.groupBy(_.fam).view.mapValues(_.size).toMap ===
      Map("lt" -> MultimodalOps.MaxTilesPerImage,
        "rt" -> MultimodalOps.MaxTilesPerImage,
        "lb" -> MultimodalOps.MaxTilesPerImage,
        "rb" -> MultimodalOps.MaxTilesPerImage))
    // constant tiles drop PER FAMILY (each family's grid samples its
    // own pixel set, so a flat region drops only where a family's tile
    // actually lands in it)
    val img = new java.awt.image.BufferedImage(47, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 47)
      img.setRGB(x, y, if (x < 16) 0x808080 else ((x * 53 + y * 29) & 0xff))
    val lt = MultimodalOps.tileKPrintsOf(img).filter(_.fam == "lt")
    assert(lt.map(t => (t.tx, t.ty)) === Seq((1L, 0L)),
      s"the lt family must match the plain tier's drop rule: $lt")
  }

  test("a stereo→mono downmix lands in the acoustic near tier (the channel-mix boundary pinned)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, AudioRecord}
    // the r19 verdict's audio channel-mix ask. For channel-BALANCED
    // content (L and R carry the same program ± a fixed image offset —
    // the normal stereo mix), a downmix halves every contour window's
    // energy EXACTLY: window bounds scale with the stream (here
    // frame-exactly — nf = 20·65), each window's energy sum doubles
    // across the two channels, and sign-of-delta is scale-invariant —
    // so the CONTOUR rung (m5d/m5e) is the downmix catch. The exact
    // rung misses by design (the PCM stream changed), and the WINDOW
    // tier's ordinals re-index (a 128-sample window spans twice as many
    // frames after the downmix), so the shift rung is NOT the catch —
    // the documented boundary, like the sub-window pad. The fixture's
    // own mod-65536 sawtooth is deliberately noise-like and does NOT
    // demonstrate this (its pair-averages wrap unpredictably); real
    // program material is smooth, which this clip models — the m2b
    // smooth-rescale precedent on the audio modality.
    val nf = 1300 // 20×65: contour bounds align frame-exactly
    def base(f: Int): Int = math.abs((f % 200) - 100) * 50 - 2500
    val stereo = new Array[Int](2 * nf)
    for (f <- 0 until nf) {
      stereo(2 * f) = base(f) + 40
      stereo(2 * f + 1) = base(f) - 40
    }
    val mono = Array.tabulate(nf)(f => (stereo(2 * f) + stereo(2 * f + 1)) / 2)
    assert(MultimodalOps.acousticFingerprint(stereo) ===
      MultimodalOps.acousticFingerprint(mono),
      "a balanced downmix must keep the energy contour exactly")
    assert(AudioDecoder.pcmHashOfSamples(stereo) !==
      AudioDecoder.pcmHashOfSamples(mono),
      "fixture sanity: content identity must NOT survive the downmix")
    // and through the real WAV round trip: the stereo clip and its mono
    // downmix pair in the near-dup tier at Hamming 0
    val both = Seq(
      AudioRecord(1L, "audio/wav", AudioGen.wavOf(2, stereo)),
      AudioRecord(2L, "audio/wav", AudioGen.wavOf(1, mono))).toDS().toDF()
    val pairs = MultimodalOps.imageNearDupsFromHashes(
      MultimodalOps.audioFingerprintFrame(both))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)), s"downmix must land at Hamming 0: $pairs")
    DedupOps.releaseCaches()
  }

  test("the per-clip window cap bounds both sub-print families; the b family still anchors the tail") {
    // a hostile (MaxWinsPerClip + 10)-window stream prints exactly the
    // cap per family — the audiowins/audiorwins growth rail — and the
    // capped b family still covers the clip's TAIL (its anchor), so a
    // recycler appending rot after real content keeps its tail prints
    val cap = MultimodalOps.MaxWinsPerClip
    val n = (cap + 10) * 128
    val samples = Array.tabulate(n)(i => (i % 251) - 125) // never constant
    assert(MultimodalOps.windowPrintsOfSamples(samples).size === cap)
    val r = MultimodalOps.revWindowPrintsOfSamples(samples)
    assert(r.count(_.family == "f") === cap)
    assert(r.count(_.family == "b") === cap)
    // b ordinal 0 IS the last 128 samples
    val tail = java.util.Arrays.copyOfRange(samples, n - 128, n)
    val (thi, tlo) = MultimodalOps.reversalAHash(tail)
    assert(r.find(w => w.family == "b" && w.ordinal == 0L)
      .exists(w => w.h_hi == thi && w.h_lo == tlo))
  }

  test("a 0.7x nearest-neighbor rescale of a SMOOTH image stays within the near-dup gate (the fractional-scale boundary of m2b)") {
    // m2b's theorem is EXACT invariance at integer scale; real feeds
    // rescale arbitrarily. For smooth content (real photos after any
    // low-pass, unlike the deliberately noise-like generative fixture)
    // the sampled luma moves by O(gradient) under the +/-1-pixel
    // position rounding a fractional resample introduces, so the print
    // lands within the Hamming-3 near-dup gate — the tier that catches
    // fractional rescales by DESIGN (IMPLEMENTATION.md documents this
    // boundary; the JPEG near-dup pin is the same claim on re-encoding).
    def smooth(w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(250, 20 + (2 * x * 100) / w + (3 * y * 100) / h)
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      out
    }
    def ham(p: (Long, Long), q: (Long, Long)) =
      java.lang.Long.bitCount(p._1 ^ q._1) + java.lang.Long.bitCount(p._2 ^ q._2)
    // property sweep over the fixture's dim range: the gate holds from
    // 21 px per side up (every dim pair, square and non-square)
    for (w <- 21 to 63; h <- Seq(w, w + 7)) {
      val src = smooth(w, h)
      val (tw, th) = (math.max(8, (w * 7) / 10), math.max(8, (h * 7) / 10))
      val scaled = MultimodalOps.thumbnail(src, tw, th)
      val d = ham(MultimodalOps.aHash(src), MultimodalOps.aHash(scaled))
      assert(d <= 3, s"0.7x rescale of smooth ${w}x$h drifted to Hamming $d")
    }
    // the honest LOWER boundary: below ~21 px a fractional resample's
    // position rounding is a whole grid cell, and even smooth content
    // drifts past the gate (16x16 measures Hamming 6) — tiny thumbprints
    // are outside the fractional-rescale claim, documented in
    // IMPLEMENTATION.md (real feed images sit far above this)
    val tiny = smooth(16, 16)
    assert(ham(MultimodalOps.aHash(tiny),
      MultimodalOps.aHash(MultimodalOps.thumbnail(tiny, 11, 11))) > 3,
      "the sub-21-px boundary unexpectedly closed — update the doc")
  }

  test("aHash is invariant under the materialized thumbnail at integer scale (m2b)") {
    import spark.implicits._
    import graft.llm.MultimodalOps.{ImageGen, MediaRecord}
    def grayImg(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 31 + y * 17 + 7) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // the THEOREM the nearest-neighbor construction buys: with tw, th
    // multiples of 8 at integer scale, aHash-of-thumb's nested floors
    // (((k·tw)/8)·w)/tw collapse to aHash-of-source's (k·w)/8 — the
    // prints are EQUAL, not merely close (the invariant image dedup
    // leans on when a feed carries multiple renditions of one image)
    Seq((64, 64, 32L), (128, 64, 32L), (64, 128, 32L), (96, 96, 48L))
      .foreach { case (w, h, box) =>
        val img = grayImg(w, h)
        val (tw, th) = MultimodalOps.fitBox(w.toLong, h.toLong, box)
        assert(tw % 8 == 0 && th % 8 == 0, s"case sanity ($w,$h,$box)")
        val thumb = MultimodalOps.thumbnail(img, tw.toInt, th.toInt)
        assert((thumb.getWidth, thumb.getHeight) === (tw.toInt, th.toInt))
        assert(MultimodalOps.aHash(thumb) === MultimodalOps.aHash(img),
          s"resize-invariance broke at ($w, $h) -> ($tw, $th)")
      }
    // the frame form over the generative fixture agrees with a direct
    // per-record recompute (decode → fitBox → thumbnail → aHash)
    val media = Seq(
      MediaRecord(1L, "image/png", ImageGen.png(30L)),
      MediaRecord(2L, "image/png", ImageGen.png(41L)),
      MediaRecord(3L, "image/png", ImageGen.png(77L))).toDS().toDF()
    val got = MultimodalOps.thumbHashes(spark, media, 32L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    Seq(1L -> 30L, 2L -> 41L, 3L -> 77L).foreach { case (id, l) =>
      val img = graft.llm.MultimodalOps.ImageDecoder.image(ImageGen.png(l)).get
      val (tw, th) = MultimodalOps.fitBox(
        img.getWidth.toLong, img.getHeight.toLong, 32L)
      val (hi, lo) = MultimodalOps.aHash(
        MultimodalOps.thumbnail(img, tw.toInt, th.toInt))
      assert(got(id) === ((tw, th, hi, lo)), s"doc $id")
    }
  }

  test("image aHash equals the pixel-formula reimplementation; identical images group (m4)") {
    import spark.implicits._
    // independent hand model: the generative pixel formula pushed through
    // the aHash arithmetic directly — the ENGINE must land on the same
    // bits from pixels it decoded out of real PNG bytes (the decode
    // round-trip proof the m4 oracle runs in DuckDB)
    def handHash(l: Long): (Long, Long) = {
      val (w, h) = MultimodalOps.ImageGen.dims(l)
      val gray = Array.tabulate(64) { k =>
        val v = ((((k % 8) * w) / 8) * 31 + (((k / 8) * h) / 8) * 17 + l.toInt) & 0xffffff
        (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) / 1000
      }
      val mean = gray.sum / 64
      var (hi, lo) = (0L, 0L)
      for (k <- 0 until 64 if gray(k) > mean)
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      (hi, lo)
    }
    val docs = Seq((1L, "src", "x" * 30), (2L, "src", "y" * 30),
      (3L, "src", "z" * 41)).toDF("doc_id", "source", "text")
    val media = MultimodalOps.asMediaTable(docs)
    val got = MultimodalOps.imageHashes(spark, media)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === handHash(30L))
    assert(got(3L) === handHash(41L))
    // same text length → byte-identical PNG → identical fingerprint;
    // different length → different dims and pixels → different bits here
    assert(got(1L) === got(2L))
    assert(got(1L) !== got(3L))
    // m4b: d1 semantics on images — the identical pair groups under the
    // min doc_id, the singleton keeps itself
    val grp = MultimodalOps.imageDupGroups(spark, media)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(grp(1L) === ((1L, 2L)) && grp(2L) === ((1L, 2L)))
    assert(grp(3L) === ((3L, 1L)))
    // a video row (undecodable payload) yields no fingerprint, not noise
    val withVideo = MultimodalOps.asMediaTable(
      Seq((4L, "src", "v" * 10), (5L, "src", "w" * 10))
        .toDF("doc_id", "source", "text"))
    assert(MultimodalOps.imageHashes(spark, withVideo)
      .select("doc_id").as[Long].collect().toSet === Set(5L))
  }

  test("banded image near-dups reproduce the brute-force pair set exactly (m4c)") {
    import spark.implicits._
    // pigeonhole completeness: 4 disjoint 16-bit bands give FULL recall
    // at Hamming ≤ 3 — the banded join must find exactly the pairs a
    // driver-side all-pairs bit_count finds, nothing dropped, nothing
    // extra. Run over the real corpus's image modality for bucket variety.
    val media = MultimodalOps.asMediaTable(
      docs.filter(!MultimodalOps.isVideoId(col("doc_id"))))
    val hashes = MultimodalOps.imageHashes(spark, media)
      .select("doc_id", "h_hi", "h_lo")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      (a, ah, al) <- hashes.iterator
      (b, bh, bl) <- hashes.iterator if a < b
      ham = java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl)
      if ham <= 3
    } yield (a, b, ham.toLong)).toSeq.sorted
    val banded = MultimodalOps.imageNearDups(spark, media)
      .as[(Long, Long, Long)].collect().toSeq
    assert(banded.nonEmpty, "fixture should contain near-dup images")
    assert(banded === brute)
    // the guarantee boundary is enforced, not silently degraded
    intercept[IllegalArgumentException] {
      MultimodalOps.imageNearDups(spark, media, maxHamming = 4)
    }
  }

  test("shingle arrays match an independent reimplementation (seeded property)") {
    import spark.implicits._
    import java.security.MessageDigest
    // reference semantics, reimplemented independently of the Spark
    // expression tree: 60-bit md5-prefix word hash mod p, polynomial
    // 3-shingle combine, distinct, original word order
    def refShingles(text: String): Seq[Long] = {
      val P = 1000000007L
      val md = MessageDigest.getInstance("MD5")
      def h(w: String): Long = {
        val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16) % P
      }
      val wh = text.split(" ", -1).toSeq.map(h)
      if (wh.size < 3) Seq.empty
      else (0 to wh.size - 3)
        .map(i => (wh(i) * 961 + wh(i + 1) * 31 + wh(i + 2)) % P)
        .distinct
    }
    val rnd = new scala.util.Random(13)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "", "zz")
    val texts = (1 to 25).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val got = DedupOps.shingleArrays(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val expected = texts.map { case (id, t) => id -> refShingles(t).sorted }
      .filter(_._2.nonEmpty).toMap
    assert(got === expected)
  }

  test("dedup signature front is shuffle-free and fully codegen'd") {
    // the 100-TB contract of d2/d5's candidate generation: shingling +
    // minhash signing must plan as a narrow map (scan → project), with
    // no exchange and no whole-stage-codegen fallback
    val sigs = DedupOps.signaturesFromShingleArrays(DedupOps.shingleArrays(docs))
    sigs.count()
    val plan = sigs.queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    assert(shuffles.isEmpty, s"signature front must not shuffle:\n$plan")
    val codegenSpans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, s"signature front fell out of codegen:\n$plan")
  }

  test("codegen graft_shingles is bit-identical to the SQL formulation (incl. order)") {
    for (k <- Seq(2, 3, 5)) {
      def arrs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val fused = arrs(DedupOps.shingleArrays(docs, k))
      val sql = arrs(DedupOps.sqlShingleArrays(docs, k))
      assert(fused.nonEmpty)
      assert(fused === sql)
    }
  }

  test("graft_shingles rejects an out-of-range or non-literal k") {
    graft.functions.GraftFunctions.register(spark)
    val bad = intercept[Exception](
      spark.sql("SELECT graft_shingles('a b c', 8)").head())
    assert(bad.getMessage.contains("[1, 7]"))
    val nonLit = intercept[Exception](
      spark.sql("SELECT graft_shingles('a b c', CAST(rand()*3 AS INT))").head())
    assert(nonLit.getMessage.toLowerCase.contains("foldable") ||
      nonLit.getMessage.contains("graft_shingles"))
  }

  test("incremental dedup equals the batch pipeline restricted to new-tail pairs (seeded)") {
    import spark.implicits._
    // random near-dup-rich corpus: small vocab → frequent true near-dups
    val rnd = new scala.util.Random(31)
    val vocab = Vector("data", "spark", "shuffle", "plan", "join", "scan", "agg")
    def randText() = Seq.fill(8 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 25L).map(i => i -> randText())
    // new tail: 25-34 duplicate corpus docs 0-9 (guaranteed candidates),
    // 35 fresh, 36 duplicates 35 (within-tail pair), 37-39 fresh
    val t35 = randText()
    val tail = (25L to 34L).map(i => i -> base((i - 25).toInt)._2) ++
      Seq(35L -> t35, 36L -> t35) ++
      (37L to 39L).map(i => i -> randText())
    val all = (base ++ tail).toDF("doc_id", "text")
    val split = 25L
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchRestricted = pairs(DedupOps.minhashNearDups(all, 0.3))
      .filter(_._2 >= split)
    val corpusSh = DedupOps.shingleArrays(all.filter($"doc_id" < split))
    val incremental = pairs(DedupOps.incrementalNearDups(
      DedupOps.shingleArrays(all.filter($"doc_id" >= split)),
      corpusSh,
      DedupOps.bandIndex(DedupOps.signaturesFromShingleArrays(corpusSh)),
      0.3))
    assert(batchRestricted.nonEmpty, "fixture must produce near-dup pairs")
    assert(incremental === batchRestricted)
  }

  test("graft_minhash guards: negative perms rejected, null slots skipped") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(array(1L, 2L), -1)").collect()
    }
    assert(e.getMessage.contains("positive"))
    // a null slot contributes nothing: same signature as without it
    val withNull = spark.sql(
      "SELECT graft_minhash(array(5L, CAST(NULL AS BIGINT), 9L), 8) AS s").head().getSeq[Long](0)
    val without = spark.sql(
      "SELECT graft_minhash(array(5L, 9L), 8) AS s").head().getSeq[Long](0)
    assert(withNull === without)
  }

  test("codegen graft_minhash is bit-identical to the HOF formulation") {
    val ss = DedupOps.shingleArrays(docs)
    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val custom = sigs(DedupOps.signaturesFromShingleArrays(ss))
    val hof = sigs(DedupOps.hofSignatures(ss))
    assert(custom.nonEmpty)
    assert(custom === hof)
  }

  test("codegen graft_simhash is bit-identical to the aggregate formulation") {
    for (bits <- Seq(16, 48)) {
      def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fused = sigs(DedupOps.simhash(docs, bits))
      val agg = sigs(DedupOps.aggSimhash(docs, bits))
      assert(fused.nonEmpty)
      assert(fused === agg)
    }
  }

  test("graft_simhash rejects an out-of-range or non-literal bits argument") {
    graft.functions.GraftFunctions.register(spark)
    val bad = intercept[Exception](
      spark.sql("SELECT graft_simhash('a b', 61)").head())
    assert(bad.getMessage.contains("bits"))
    val nonLit = intercept[Exception](
      spark.sql("SELECT graft_simhash('a b', CAST(rand()*10 AS INT))").head())
    assert(nonLit.getMessage.toLowerCase.contains("foldable") ||
      nonLit.getMessage.contains("graft_simhash"))
  }

  test("simhash of identical texts is identical") {
    import spark.implicits._
    val two = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val hashes = DedupOps.simhash(two).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) === hashes(2L))
    assert(hashes(1L) !== hashes(3L))
  }

  test("simhashNearDups prunes home buckets larger than maxBucket") {
    import spark.implicits._
    // 5 identical degenerate docs (one hot signature bucket) + 2 identical
    // normal docs; with maxBucket=4 the hot bucket is dropped entirely and
    // only the normal pair survives
    val degenerate = (1L to 5L).map(i => (i, "spam spam"))
    val normal = Seq((10L, "a genuinely distinct document body"),
      (11L, "a genuinely distinct document body"))
    val docs = (degenerate ++ normal).toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDups(docs, bits = 48, maxBucket = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((10L, 11L)))
    // with the cap lifted, the degenerate 5-clique's 10 pairs reappear
    val all = DedupOps.simhashNearDups(docs, bits = 48, maxBucket = 100)
      .as[(Long, Long)].collect().toSet
    assert(all.size === 11)
  }

  test("repetition stats flag loopy and chanty docs (t10)") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam"), // one word looped
      (2L, "a b c d"),             // no repetition
      (3L, "one")                  // too short for a bigram
    ).toDF("doc_id", "text")
    val rows = TextOps.repetitionStats(d)
      .as[(Long, Long, Double, Double)].collect().toList
    assert(rows === List(
      (1L, 4L, 0.75, 1.0),  // 3×"spam spam" bigrams: capped coverage
      (2L, 4L, 0.0, 0.5),   // every bigram unique: top covers 2 of 4 words
      (3L, 1L, 0.0, 0.0)))
  }

  test("pii scrub redacts emails, ips and digit runs in order (t11)") {
    import spark.implicits._
    val d = Seq(
      (1L, "contact bob.smith+x@example.org or 192.168.0.1 ref 12345678 end"),
      (2L, "clean words only")
    ).toDF("doc_id", "text")
    val rows = TextOps.piiScrub(d)
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(rows === List(
      (1L, 1L, 1L, 1L, "contact <EMAIL> or <IP> ref <NUM> end"),
      (2L, 0L, 0L, 0L, "clean words only")))
  }

  // ---- d10: Bloom membership pre-screen -------------------------------

  /** Independent driver-side reimplementation of the engine's position
    * arithmetic (JVM MessageDigest, not Spark columns): the spec's model
    * of what the bitset must encode. */
  private def bloomPositionsRef(text: String): Seq[Int] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fp = md5hex(text)
    (0 until DedupOps.BloomHashes).map { i =>
      (BigInt(md5hex(s"bloom$i-" + fp).substring(0, 15), 16) % DedupOps.BloomBits).toInt
    }
  }

  test("bloom screen matches the position-set model: no false negatives, tiny FPR (d10)") {
    val corpus = docs.filter(col("doc_id") < 400)
    val inc = docs.filter(col("doc_id") >= 400)
    val bits = DedupOps.bloomBuild(corpus)
    assert(bits.length === DedupOps.BloomBits / 8)
    val got = DedupOps.bloomScreen(inc, bits)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // model: corpus position set from the independent reference hash
    val cpos = corpus.select("text").collect().map(_.getString(0))
      .flatMap(bloomPositionsRef).toSet
    val incRows = inc.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.keySet === incRows.map(_._1).toSet)
    incRows.foreach { case (id, text) =>
      assert(got(id) === bloomPositionsRef(text).forall(cpos),
        s"doc $id disagrees with the position-set model")
    }
    // no false negatives: a text present verbatim in the corpus MUST flag
    val corpusTexts = corpus.select("text").collect().map(_.getString(0)).toSet
    val trueDups = incRows.filter { case (_, t) => corpusTexts(t) }
    trueDups.foreach { case (id, _) => assert(got(id), s"false negative on doc $id") }
    // 1200 set bits in 2^18 → per-probe hit rate ~0.5%, FPR ~1e-7: flags
    // beyond the true dups would mean the arithmetic diverged
    val flagged = got.count(_._2)
    assert(flagged - trueDups.length <= (got.size / 100).max(1),
      s"implausible false-positive count: $flagged flags, ${trueDups.length} true dups")
  }

  test("bloom screen plans as a zero-join narrow map (d10 plan gate)") {
    // the 100-TB contract: the bitset rides as a plan LITERAL, so the
    // screen must plan with no join and no hash exchange — the only
    // shuffle allowed is the oracle-determinism orderBy's range sort
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    plainPlanOf(DedupOps.bloomScreen(
        docs.filter(col("doc_id") >= 400), DedupOps.bloomBuild(docs))) { plan =>
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.isEmpty, s"d10 screen must not join:\n$plan")
      val hashShuffles = plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }
      assert(hashShuffles.isEmpty, s"d10 screen must not hash-shuffle:\n$plan")
    }
  }

  test("sharded bloom screen plans as a zero-join narrow map (d10b plan gate)") {
    // the shard route picks a word array out of a 2-D plan literal — the
    // screen must stay join-free and hash-shuffle-free at any shard count
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import graft.llm.DedupOps.BloomSizing
    val sizing = BloomSizing(1 << 15, 3, 4)
    val shardBits = DedupOps.bloomBuildSharded(docs, sizing)
    plainPlanOf(DedupOps.bloomScreenSharded(
        docs.filter(col("doc_id") >= 400), shardBits.toSeq, sizing)) { plan =>
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, s"d10b screen must not join:\n$plan")
      assert(plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }.isEmpty, s"d10b screen must not hash-shuffle:\n$plan")
    }
  }

  test("bloom build is partitioning-invariant and increments fold by OR (d10)") {
    val corpus = docs.filter(col("doc_id") < 400)
    val one = DedupOps.bloomBuild(corpus.coalesce(1))
    val many = DedupOps.bloomBuild(corpus.repartition(7))
    assert(java.util.Arrays.equals(one, many),
      "map-side partial buffers must OR to the same bitset")
    // associative build: corpus ∪ increment == OR of the two bitsets —
    // the admission loop's per-batch fold never re-reads the corpus
    val incBits = DedupOps.bloomBuild(docs.filter(col("doc_id") >= 400))
    val all = DedupOps.bloomBuild(docs)
    val ored = one.zip(incBits).map { case (a, b) => (a | b).toByte }
    assert(java.util.Arrays.equals(all, ored))
  }

  test("bloom sizing math: forCapacity meets its target FPR and inverts (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.llm.DedupOps.BloomSizing
    val gen = Gen.zip(
      Gen.choose(50L, 50000000L),
      Gen.oneOf(0.001, 0.005, 0.01, 0.02, 0.05, 0.1),
      Gen.oneOf(1, 2, 4, 8))
    val prop = Prop.forAll(gen) { case (n, fpr, shards) =>
      val s = BloomSizing.forCapacity(n, fpr, shards)
      val perShard = math.max(1L, (n + shards - 1) / shards)
      // the classic formula lands within 1% of target (k rounds to the
      // nearest integer of the optimum; m rounds UP to whole words)
      s.shards == shards &&
        s.fprAt(perShard) <= fpr * 1.05 &&
        s.capacityAt(fpr) >= (perShard * 0.99).toLong &&
        s.bits % 64 == 0 && s.hashes >= 1
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("measured bloom FPR stays at the design point across (n, m, k) geometries (d10)") {
    import spark.implicits._
    import graft.llm.DedupOps.BloomSizing
    // deterministic synthetic keys; probes are disjoint from the corpus
    def keyDocs(from: Long, n: Long, tag: String) =
      (from until from + n).map(i => (i, s"$tag key $i payload ${i * 2654435761L}"))
        .toDF("doc_id", "text")
    val probes = keyDocs(1000000L, 4000, "probe")
    for ((n, fpr) <- Seq((200L, 0.05), (1000L, 0.01), (3000L, 0.02))) {
      val sizing = BloomSizing.forCapacity(n, fpr)
      val corpus = keyDocs(0L, n, "corpus")
      val bits = DedupOps.bloomBuild(corpus, sizing)
      assert(bits.length === sizing.bytes)
      // no false negatives at ANY geometry
      val members = DedupOps.bloomScreen(corpus, bits, sizing)
        .collect().map(_.getBoolean(1))
      assert(members.forall(identity), s"($n, $fpr): member missed")
      // measured FPR ≤ 2× design target (≥4.5σ headroom at 4000 probes)
      val hits = DedupOps.bloomScreen(probes, bits, sizing)
        .collect().count(_.getBoolean(1))
      val measured = hits.toDouble / 4000
      info(f"n=$n%d target=$fpr%.3f measured=$measured%.4f (m=${sizing.bits}, k=${sizing.hashes})")
      assert(measured <= fpr * 2 + 0.002,
        s"($n, $fpr): measured FPR $measured past design point")
    }
  }

  test("bloom health reads drift off the bitset: warns past design point, silent inside it") {
    import spark.implicits._
    import graft.llm.DedupOps.BloomSizing
    val sizing = BloomSizing.forCapacity(500, 0.01)
    def corpusOf(n: Long) = (0L until n).map(i => (i, s"health key $i x${i * 7}"))
      .toDF("doc_id", "text")
    // inside capacity: healthy, no warning, key estimate near truth
    val okBits = DedupOps.bloomBuild(corpusOf(400), sizing)
    val (fill, fpr, keys) = DedupOps.bloomHealth(okBits, sizing)
    assert(fill > 0 && fill < 0.5 && fpr <= 0.01, s"fill=$fill fpr=$fpr")
    assert(math.abs(keys - 400) <= 40, s"key estimate $keys far from 400")
    assert(DedupOps.bloomHealthWarning(okBits, sizing).isEmpty)
    // 8× capacity: the warning fires and names the drift
    val overBits = DedupOps.bloomBuild(corpusOf(4000), sizing)
    val warn = DedupOps.bloomHealthWarning(overBits, sizing)
    assert(warn.isDefined && warn.get.contains("design point"), s"warn=$warn")
    // the threshold is the sizing's OWN design point, not a hardcoded 1%:
    // a strict 0.1% target warns on a filter a 1% target calls healthy,
    // and a loose 20% target stays silent where 1% fires
    val strict = DedupOps.bloomBuild(corpusOf(400),
      sizing.copy(designFpr = 0.001))
    assert(DedupOps.bloomHealthWarning(strict,
      sizing.copy(designFpr = 0.001)).isDefined)
    // ~1.4× capacity: FPR ≈ 4% — past a 1% target, inside a 20% one
    val mildBits = DedupOps.bloomBuild(corpusOf(700), sizing)
    assert(DedupOps.bloomHealthWarning(mildBits, sizing).isDefined)
    assert(DedupOps.bloomHealthWarning(mildBits,
      sizing.copy(designFpr = 0.2)).isEmpty)
    // forCapacity stamps its target as the design point
    assert(DedupOps.BloomSizing.forCapacity(500, 0.005).designFpr === 0.005)
  }

  test("corpus-derived sizing reads the a5d sketch, not the corpus (d10 config path)") {
    import spark.implicits._
    val corpus = (0L until 2000L).map(i => (i, s"doc $i body ${i * 31}"))
      .toDF("doc_id", "text")
    val sizing = DedupOps.bloomSizingFor(corpus, targetFpr = 0.01)
    // ~2000 distinct keys × 1.2 headroom at 1% → ≈ 10 bits/key
    assert(sizing.fprAt(2400) <= 0.011, s"sizing $sizing misses its design point")
    assert(sizing.bits >= 16000 && sizing.bits <= 40000, s"implausible bits ${sizing.bits}")
    // and the derived geometry round-trips through build/screen
    val bits = DedupOps.bloomBuild(corpus, sizing)
    val flags = DedupOps.bloomScreen(corpus, bits, sizing).collect().map(_.getBoolean(1))
    assert(flags.forall(identity))
  }

  test("sharded bloom: route is deterministic, no false negatives, per-shard equivalence") {
    import spark.implicits._
    import graft.llm.DedupOps.BloomSizing
    val sizing = BloomSizing.forCapacity(2000, 0.01, shards = 4)
    val corpus = (0L until 1500L).map(i => (i, s"sharded key $i tail ${i * 17}"))
      .toDF("doc_id", "text")
    val shardBits = DedupOps.bloomBuildSharded(corpus, sizing)
    assert(shardBits.length === 4)
    assert(shardBits.forall(_.length === sizing.bytes))
    // members always flagged through the shard route
    val flags = DedupOps.bloomScreenSharded(corpus, shardBits.toSeq, sizing)
      .collect().map(_.getBoolean(1))
    assert(flags.forall(identity), "shard route lost a member")
    // per-shard equivalence: docs routed to shard s screened against
    // bits(s) alone give the same verdicts as the sharded screen
    val routed = corpus.withColumn("shard",
      DedupOps.bloomShardCol(col("text"), sizing.shards))
    val sharded = DedupOps.bloomScreenSharded(corpus, shardBits.toSeq, sizing)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    for (s <- 0 until 4) {
      val slice = routed.filter(col("shard") === s).drop("shard")
      val single = DedupOps.bloomScreen(slice,
          shardBits(s), sizing.copy(shards = 1))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(single.forall { case (id, f) => sharded(id) == f },
        s"shard $s disagrees with the sharded screen")
    }
    // fresh keys: the sharded filter's FPR stays near design point
    val probes = (500000L until 504000L).map(i => (i, s"fresh $i probe ${i * 13}"))
      .toDF("doc_id", "text")
    val hits = DedupOps.bloomScreenSharded(probes, shardBits.toSeq, sizing)
      .collect().count(_.getBoolean(1))
    assert(hits.toDouble / 4000 <= 0.02 + 0.002, s"sharded FPR ${hits / 4000.0}")
  }

  test("decontamination flags exactly the docs sharing a benchmark k-gram (d8)") {
    import spark.implicits._
    val bench = Seq(
      (1000L, "the capital of france is paris and its river is the seine")
    ).toDF("doc_id", "text")
    val train = Seq(
      // embeds a 7-gram of the benchmark verbatim → contaminated
      (1L, "trivia time everyone knows the capital of france is paris and more facts follow"),
      // shares topical words but no 7-gram span → clean
      (2L, "paris france capital seine river geography quiz answers listed here"),
      (3L, "a completely unrelated document about spark query planning")
    ).toDF("doc_id", "text")
    val hits = DedupOps.contaminationHits(train, bench, k = 7)
      .as[(Long, Long, Long)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet === Set((1L, 1000L)))
    assert(hits.head._3 === 1L, "one shared 7-gram")
    val clean = DedupOps.decontaminate(train, bench, k = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(2L, 3L))
    // higher minShared demands more overlapping shingles
    assert(DedupOps.contaminationHits(train, bench, k = 7, minShared = 2).isEmpty)
  }

  test("xxh64 unlocks full-width 64-bit simhash signatures (d3b swap seam)") {
    import spark.implicits._
    val two = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    // identical texts pair under any hash; 64-bit width only under xxh64
    val pairs = DedupOps.simhashNearDups(two, bits = 64, algo = "xxh64")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    val tooWide = intercept[IllegalArgumentException] {
      DedupOps.simhashNearDups(two, bits = 64) // md5 carries 60 usable bits
    }
    assert(tooWide.getMessage.contains("algo"))
  }

  test("xxh64 production hash finds the same verified near-dup pairs (d2 swap seam)") {
    import spark.implicits._
    // the documented production swap: same pipeline, word hash flipped
    // from the oracle-portable md5 to Spark's XXH64. Pair IDs must agree
    // (jaccard values can differ in the last decimal only if hash
    // collisions differed, so compare the id sets).
    val viaMd5 =
      try DedupOps.minhashNearDups(docs, 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      finally DedupOps.releaseCaches()
    val viaXx =
      try DedupOps.minhashNearDups(docs, 0.5, algo = "xxh64")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      finally DedupOps.releaseCaches()
    assert(viaMd5.nonEmpty)
    assert(viaXx === viaMd5)
    // bad algo is an ANALYSIS-time error, not an executor crash
    val err = intercept[Exception] {
      DedupOps.shingleArrays(docs, 3, algo = "crc32").collect()
    }
    assert(err.getMessage.contains("graft_shingles"))
  }

  test("group resolution converges on a diameter-25 chain and releases per-round caches (d6)") {
    import spark.implicits._
    // a≈b≈c chain of 26 docs: plain min-label propagation needs 25 rounds
    // (> maxRounds=20 — the round-6 form ABORTED here); pointer doubling
    // converges in O(log 25) ≈ 6
    val chainDocs = (0L to 25L).map(Tuple1(_)).toDF("doc_id")
    val chainPairs = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val res = DedupOps.nearDupGroups(chainDocs, chainPairs)
      .as[(Long, Long, Boolean)].collect()
    assert(res.length === 26)
    assert(res.forall(_._2 === 0L), "every chain member joins doc 0's group")
    assert(res.count(_._3) === 1, "exactly one keeper")
    // cache hygiene: every intermediate round's label frame was unpersisted
    // as soon as the next materialized — only the edges frame and the final
    // labels remain until releaseCaches
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2,
      s"label frames accumulated: $before persisted RDDs before, $after after")
    DedupOps.releaseCaches()
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("incremental group maintenance lands on the full d6 assignment (d7)") {
    import spark.implicits._
    val full =
      try DedupOps.nearDupGroups(docs, DedupOps.minhashNearDups(docs, 0.5))
        .as[(Long, Long, Boolean)].collect().toSeq
      finally DedupOps.releaseCaches()
    val corpusDocs = docs.filter(col("doc_id") < 400)
    val newDocs = docs.filter(col("doc_id") >= 400)
    val corpusShingles = DedupOps.shingleArrays(corpusDocs)
    val corpusIndex = DedupOps.bandIndex(
      DedupOps.signaturesFromShingleArrays(corpusShingles))
    val incremental =
      try DedupOps.incrementalGroups(
        DedupOps.nearDupGroups(corpusDocs, DedupOps.minhashNearDups(corpusDocs, 0.5)),
        DedupOps.incrementalNearDups(
          DedupOps.shingleArrays(newDocs), corpusShingles, corpusIndex, 0.5),
        newDocs.select("doc_id"))
        .as[(Long, Long, Boolean)].collect().toSeq
      finally DedupOps.releaseCaches()
    assert(incremental === full)
    // and the delta form touches only rows the increment actually moved:
    // every delta row disagrees with the corpus-only assignment or is new
    val corpusOnly =
      try DedupOps.nearDupGroups(corpusDocs, DedupOps.minhashNearDups(corpusDocs, 0.5))
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
      finally DedupOps.releaseCaches()
    val delta =
      try DedupOps.incrementalGroupDelta(
        DedupOps.nearDupGroups(corpusDocs, DedupOps.minhashNearDups(corpusDocs, 0.5)),
        DedupOps.incrementalNearDups(
          DedupOps.shingleArrays(newDocs), corpusShingles, corpusIndex, 0.5),
        newDocs.select("doc_id"))
        .as[(Long, Long)].collect().toSeq
      finally DedupOps.releaseCaches()
    val fullMap = full.map(r => r._1 -> r._2).toMap
    assert(delta.forall { case (doc, grp) => fullMap(doc) == grp },
      "every delta row must carry the final assignment")
    assert(delta.forall { case (doc, grp) =>
      corpusOnly.get(doc).forall(_ != grp) },
      "delta must only contain new docs or corpus docs whose group moved")
  }

  test("d7 never exchanges the corpus assignment table (plan gate)") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import spark.implicits._
    // the assignment table on real storage so its scan is identifiable
    val dir = java.nio.file.Files.createTempDirectory("graft_d7_plan").toString
    (0L until 100L).map(i => (i, i - i % 4)).toDF("doc_id", "group_id")
      .write.mode("overwrite").parquet(s"$dir/groups")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cg = spark.read.parquet(s"$dir/groups")
      val pairs = Seq((5L, 200L), (7L, 201L), (200L, 202L)).toDF("id_a", "id_b")
      val newIds = Seq(200L, 201L, 202L, 203L).map(Tuple1(_)).toDF("doc_id")
      val out = DedupOps.incrementalGroups(cg, pairs, newIds)
      out.count()
      // Both corpus touches (endpoint-lift semi-join and the relabel) must
      // stream the scan against broadcast sides. The only exchange allowed
      // above the corpus scan is the deterministic ORDER BY's range
      // partitioning — a hash exchange over it would mean the increment
      // fold shuffles O(corpus), the exact cost d7 exists to avoid.
      val offending = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike
            if !e.outputPartitioning.isInstanceOf[RangePartitioning] &&
              e.treeString.contains("graft_d7_plan") => e
      }
      assert(offending.isEmpty,
        s"corpus assignment scan found under ${offending.size} hash exchange(s)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      DedupOps.releaseCaches()
    }
  }

  test("incremental fold equals ground-up resolution on random graphs (d7 property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // corpus docs [0, split), increment [split, n); edges with ≥1 increment
    // endpoint arrive as "new pairs", corpus-internal edges pre-exist
    val gen = for {
      n <- Gen.choose(4, 20)
      split <- Gen.choose(1, n - 1)
      m <- Gen.choose(0, 24)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (n, split, es.collect { case (a, b) if a != b => (a.toLong, b.toLong) })
    val prop = Prop.forAll(gen) { case (n, split, edges) =>
      val allDocs = (0L until n.toLong).map(Tuple1(_)).toDF("doc_id")
      val corpusDocs = (0L until split.toLong).map(Tuple1(_)).toDF("doc_id")
      val corpusEdges = edges.filter { case (a, b) => a < split && b < split }
      val newEdges = edges.filter { case (a, b) => a >= split || b >= split }
      val got =
        try {
          val corpusGroups = DedupOps.nearDupGroups(
            corpusDocs, spark.createDataFrame(corpusEdges).toDF("id_a", "id_b"))
          val full = DedupOps.nearDupGroups(
            allDocs, spark.createDataFrame(edges).toDF("id_a", "id_b"))
            .as[(Long, Long, Boolean)].collect().toSeq
          val inc = DedupOps.incrementalGroups(corpusGroups,
            spark.createDataFrame(newEdges).toDF("id_a", "id_b"),
            (split.toLong until n.toLong).map(Tuple1(_)).toDF("doc_id"))
            .as[(Long, Long, Boolean)].collect().toSeq
          inc == full
        } finally DedupOps.releaseCaches()
      got
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("group resolution matches driver-side union-find on random graphs (d6 property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical group = min member id; path roots here ARE mins because
      // unions always point the larger root at the smaller
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val gen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(0, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (n, es.collect { case (a, b) if a != b => (a.toLong, b.toLong) })
    val prop = Prop.forAll(gen) { case (n, edges) =>
      val docsDf = (0L until n.toLong).map(Tuple1(_)).toDF("doc_id")
      val pairsDf = spark.createDataFrame(edges).toDF("id_a", "id_b")
      val got =
        try DedupOps.nearDupGroups(docsDf, pairsDf)
          .as[(Long, Long, Boolean)].collect()
        finally DedupOps.releaseCaches()
      val want = unionFind(n, edges)
      got.forall { case (doc, group, keep) =>
        want(doc) == group && keep == (doc == group)
      } && got.length == n
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("positional shingles dedup to exactly the distinct form (parity)") {
    graft.functions.GraftFunctions.register(spark)
    // array_distinct over the positional array in first-occurrence order IS
    // the distinct form's contract — bit-identical arrays, every fixture doc
    val mismatches = docs.selectExpr(
      "array_distinct(graft_pos_shingles(text, 3)) AS pos_d",
      "graft_shingles(text, 3) AS dis")
      .filter(col("pos_d") =!= col("dis")).count()
    assert(mismatches === 0L)
  }

  test("duplicated spans: found spans are verbatim and maximal (d9)") {
    import spark.implicits._
    val spans = DedupOps.duplicatedSpans(docs, minSpan = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    DedupOps.releaseCaches()
    assert(spans.nonEmpty, "fixture should contain shared spans >= 5 words")
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
      .toMap.view.mapValues(_.split(" ", -1)).toMap
    spans.foreach { case (a, b, sa, sb, len) =>
      val (wa, wb) = (texts(a), texts(b))
      val (saI, sbI, lenI) = (sa.toInt, sb.toInt, len.toInt)
      assert(wa.slice(saI, saI + lenI).sameElements(wb.slice(sbI, sbI + lenI)),
        s"span ($a,$b,$sa,$sb,$len) is not verbatim")
      // maximality: the span cannot extend by one word on either side
      // (unless a doc boundary, or a df-pruned seed split the run — no
      // pruned seeds fire on this fixture at maxDf=100)
      val leftExtends = saI > 0 && sbI > 0 && wa(saI - 1) == wb(sbI - 1)
      val rightExtends = saI + lenI < wa.length && sbI + lenI < wb.length &&
        wa(saI + lenI) == wb(sbI + lenI)
      assert(!leftExtends && !rightExtends,
        s"span ($a,$b,$sa,$sb,$len) is not maximal")
    }
  }

  test("duplicated spans: offsets, k-invariance and minSpan gate (d9 synthetic)") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"shared$i").mkString(" ")
    val synth = Seq(
      (1L, s"alpha beta gamma $shared tail1 tail2"),   // span at pos 3
      (2L, s"$shared other words entirely here now"),  // span at pos 0
      (3L, "six words match here right now and then diverge completely away"),
      (4L, "preamble stuff six words match here right now but different ending"))
      .toDF("doc_id", "text")
    val spans = DedupOps.duplicatedSpans(synth, minSpan = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    DedupOps.releaseCaches()
    // (1,2): the 10-word block; (3,4): only 6 shared words — under minSpan
    assert(spans.toSeq === Seq((1L, 2L, 3L, 0L, 10L)))
    // widening k below minSpan changes cost, not output (k-invariance)
    val spansK3 = DedupOps.duplicatedSpans(synth, k = 3, minSpan = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    DedupOps.releaseCaches()
    assert(spansK3.toSeq === spans.toSeq)
    // the 6-word overlap IS found once minSpan admits it
    val spans6 = DedupOps.duplicatedSpans(synth, minSpan = 6)
      .as[(Long, Long, Long, Long, Long)].collect()
    DedupOps.releaseCaches()
    assert(spans6.contains((3L, 4L, 0L, 2L, 6L)))
  }

  test("span scrub keeps the first occurrence, strips later copies, converges (d9c)") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"shared$i").mkString(" ")
    val synth = Seq(
      (1L, s"alpha beta gamma $shared tail1 tail2"),     // first occurrence
      (2L, s"$shared other words entirely here now"),    // b-side of (1,2)
      (3L, s"prefix words here $shared suffix bits end"), // b-side of (1,3)+(2,3)
      (5L, "untouched document with no shared content at all okay"))
      .toDF("doc_id", "text")
    val out = DedupOps.spanScrub(synth)
      .as[(Long, String, Long, Long)].collect()
    DedupOps.releaseCaches()
    val byId = out.map(r => r._1 -> r).toMap
    // the FIRST occurrence (lowest doc_id) survives verbatim
    assert(byId(1L)._2 === s"alpha beta gamma $shared tail1 tail2")
    assert(byId(1L)._3 === 15L && byId(1L)._4 === 0L)
    // each later copy loses exactly the 10 covered words — including doc 3,
    // whose positions are covered TWICE ((1,3) and (2,3)) and removed once
    assert(byId(2L) === ((2L, "other words entirely here now", 15L, 10L)))
    assert(byId(3L) === ((3L, "prefix words here suffix bits end", 16L, 10L)))
    // an untouched doc passes through verbatim with zero removals
    assert(byId(5L)._2 === "untouched document with no shared content at all okay")
    assert(byId(5L)._4 === 0L)
    // convergence: one scrub pass leaves no detectable span — exactly one
    // occurrence of the duplicated block survives in the corpus
    val rerun = DedupOps.duplicatedSpans(
      out.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect()
    DedupOps.releaseCaches()
    assert(rerun.isEmpty, s"scrubbed corpus still has spans: ${rerun.toSeq}")
  }

  test("xxh64 production hash finds the same span set (d9 swap seam)") {
    import spark.implicits._
    // at the default minSpan (4 consecutive seeds at k=5) the sets must
    // agree exactly — a phantom there needs 4 independent collisions
    val md5Spans = DedupOps.duplicatedSpans(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    DedupOps.releaseCaches()
    val xxSpans = DedupOps.duplicatedSpans(docs, algo = "xxh64")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    DedupOps.releaseCaches()
    assert(md5Spans.nonEmpty)
    assert(xxSpans === md5Spans)
    // at single-seed length, hash-domain collisions (≈ seeds²/2p at
    // p≈2^30) can admit phantom spans — any hash disagreement must be a
    // single-seed span, and each side's multi-seed spans must coincide
    // (the fixture exhibits exactly one such xxh64 phantom)
    val md5Min = DedupOps.duplicatedSpans(docs, minSpan = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    DedupOps.releaseCaches()
    val xxMin = DedupOps.duplicatedSpans(docs, minSpan = 5, algo = "xxh64")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    DedupOps.releaseCaches()
    val disagree = (md5Min diff xxMin) union (xxMin diff md5Min)
    assert(disagree.forall(_._5 == 5L),
      s"non-single-seed hash disagreement: $disagree")
  }

  test("duplicated spans match a driver-side maximal-run reference (d9 property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // independent reference: maximal matching word runs along each diagonal
    // (the operator's seed-run+k−1 span equals the word-run length whenever
    // the run is ≥ k, which minSpan ≥ k guarantees); pruning disabled
    def refSpans(texts: Seq[(Long, Array[String])], k: Int,
        minSpan: Int): Set[(Long, Long, Long, Long, Long)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
      for {
        (a, wa) <- texts; (b, wb) <- texts
        if a < b && wa.length >= k && wb.length >= k
        d <- -(wb.length - 1) to (wa.length - 1)
      } {
        val iEnd = math.min(wa.length, wb.length + d)
        var i = math.max(0, d)
        var runStart = -1
        while (i <= iEnd) {
          val m = i < iEnd && wa(i) == wb(i - d)
          if (m && runStart < 0) runStart = i
          if (!m && runStart >= 0) {
            val len = i - runStart
            if (len >= minSpan) out += ((a, b, runStart.toLong,
              (runStart - d).toLong, len.toLong))
            runStart = -1
          }
          i += 1
        }
      }
      out.toSet
    }
    val vocab = Vector("a", "b", "c", "d")
    val gen = for {
      n <- Gen.choose(3, 6)
      docs <- Gen.listOfN(n, Gen.choose(0, 24).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab))))
    } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.toArray) }
    val prop = Prop.forAll(gen) { texts =>
      val df = texts.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got =
        try DedupOps.duplicatedSpans(df, k = 3, minSpan = 3,
          maxDf = Int.MaxValue).as[(Long, Long, Long, Long, Long)].collect().toSet
        finally DedupOps.releaseCaches()
      // split("x", -1) of the joined text equals the word array only for
      // nonempty docs; empty docs (len 0) become one empty-string word on
      // the Spark side — harmless: single words can't seed a 3-gram
      got === refSpans(texts, 3, 3)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("incremental spans equal batch d9 on the new tail; corpus keeps id_a (d9b)") {
    import spark.implicits._
    val split = 25L
    val batch = DedupOps.duplicatedSpans(docs, minSpan = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    DedupOps.releaseCaches()
    val corpusSeeds0 = DedupOps.positionalSeeds(docs.filter(col("doc_id") < split))
    val inc = DedupOps.incrementalSpans(
      docs.filter(col("doc_id") >= split),
      corpusSeeds0, DedupOps.seedStats(corpusSeeds0), minSpan = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    DedupOps.releaseCaches()
    assert(batch.nonEmpty)
    assert(inc === batch.filter(_._2 >= split))
    // non-monotone streaming ids: the corpus member stays id_a even when
    // its id is numerically larger (the d5 orientation lesson)
    val shared = (0 until 10).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((100L, s"$shared corpus tail here")).toDF("doc_id", "text")
    val incoming = Seq((5L, s"lead in words $shared")).toDF("doc_id", "text")
    val corpusSeeds1 = DedupOps.positionalSeeds(corpus)
    val got = DedupOps.incrementalSpans(
      incoming, corpusSeeds1, DedupOps.seedStats(corpusSeeds1), minSpan = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    DedupOps.releaseCaches()
    assert(got === Seq((100L, 5L, 0L, 3L, 10L)))
  }

  test("knn classify predicts the plurality neighbor label, ties to smaller (e6)") {
    import spark.implicits._
    val index = SimilarityOps.ivfBuild(emb)
    val queries = emb.filter(col("vec_id") < 8)
    // independent driver-side recomputation of the vote from the top-k
    val topk = SimilarityOps.ivfQueryTopK(index, queries, 5)
      .as[(Long, Long, Long)].collect()
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val want = topk.groupBy(_._1).map { case (q, rows) =>
      val votes = rows.groupBy(r => labels(r._3)).map { case (l, v) => (l, v.size) }
      val (pl, nv) = votes.toSeq.maxBy { case (l, n) => (n, -l) }
      (q, labels(q).toLong, pl.toLong, nv.toLong)
    }.toSeq.sortBy(_._1)
    assert(want.nonEmpty)
    val got = SimilarityOps.knnClassify(index, queries, emb, 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("curation pipeline: output is dedup'd, decontaminated, within budget (c1)") {
    import spark.implicits._
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val out = graft.llm.CurationOps.curateCorpus(train, bench, 2000L)
      .as[(Long, String, Long, Double, Long)].collect().toSeq
    DedupOps.releaseCaches()
    assert(out.nonEmpty)
    // budget respected; cum_tokens is the true prefix sum in pack order
    assert(out.last._5 <= 2000L)
    assert(out.map(_._3).sum === out.last._5)
    val outDocs = docs.join(out.map(_._1).toDF("doc_id"), "doc_id")
    // no two admitted docs are near-dups at the pipeline threshold (per-doc
    // signatures don't depend on the corpus, so pairs over the admitted
    // subset ⊆ pairs over the full set — all resolved by keeper election)
    assert(DedupOps.minhashNearDups(outDocs, 0.5).count() === 0L)
    DedupOps.releaseCaches()
    // no admitted doc shares a 4-gram with the held-out benchmark
    assert(DedupOps.contaminationHits(outDocs, bench, 4, 1).count() === 0L)
    DedupOps.releaseCaches()
  }

  test("semantic decontamination: planted benchmark copy flags its corpus source (d8b)") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") < 400)
    val idx = SimilarityOps.ivfBuild(corpus)
    // a benchmark containing an exact copy of corpus vector 7 under a new id
    val bench = emb.filter(col("vec_id") % 50 === 0)
      .unionByName(emb.filter(col("vec_id") === 7)
        .withColumn("vec_id", lit(9007L)))
    val got = SimilarityOps.semanticContamination(idx, bench, 0.4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // the planted copy lands in its source's cell and flags it at cos 1
    assert(got.exists(r => r._1 == 7L && r._2 == 9007L && r._3 >= 0.999999),
      s"planted duplicate not flagged: ${got.filter(_._2 == 9007L)}")
    // every collision clears the threshold and pairs corpus vs benchmark
    got.foreach { r =>
      assert(r._3 >= 0.4)
      assert(r._1 < 400L, s"non-corpus doc_id ${r._1}")
      assert(r._2 % 50 == 0 || r._2 == 9007L, s"non-bench bench_id ${r._2}")
    }
    // flagged pairs live in a PROBED cell of the SERVED index: recompute
    // each bench vector's top-nProbe cells independently (the same
    // rounded 2·dot − ‖c‖² score the engine and oracle rank by)
    val benchVecs = bench.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def probed(v: Array[Float]): Set[Int] = idx.centroids.zipWithIndex.map {
      case (c, i) =>
        val dot = c.indices.map(d => v(d).toDouble * c(d)).sum
        val s = BigDecimal(2 * dot - c.map(x => x * x).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (s, i)
    }.sortBy { case (s, i) => (-s, -i) }.take(2).map(_._2).toSet
    val corpusCell = idx.cells.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    got.foreach(r => assert(probed(benchVecs(r._2)).contains(corpusCell(r._1)),
      s"pair ${r._1}-${r._2} not within a probed cell"))
    // deterministic
    assert(SimilarityOps.semanticContamination(idx, bench, 0.4)
      .as[(Long, Long, Double)].collect().toSeq === got)
  }

  test("curate-and-split: pack unchanged from c1, split a pure function of the election's group id (c4)") {
    import spark.implicits._
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val out = graft.llm.CurationOps.curateAndSplit(train, bench, 2000L)
      .as[(Long, String, Long, Double, Long, Long, String)].collect().toSeq
    DedupOps.releaseCaches()
    assert(out.nonEmpty)
    // the split tail changes NOTHING about admission or packing: the c1
    // columns of c4's output are exactly curateCorpus's output
    val c1 = graft.llm.CurationOps.curateCorpus(train, bench, 2000L)
      .as[(Long, String, Long, Double, Long)].collect().toSeq
    DedupOps.releaseCaches()
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)) === c1)
    // each split is the salted-md5 bucket of the GROUP id, not the doc id —
    // recomputed independently on the driver
    def bucket(g: Long): Int =
      (java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"c3-$g").substring(0, 15), 16) % 100).toInt
    out.foreach { r =>
      val b = bucket(r._6)
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(r._7 === want, s"doc ${r._1} group ${r._6}")
    }
    // leakage guard across the composed output: any near-dup of a packed
    // doc hashes to the SAME bucket (split is a function of group_id
    // alone), so no pair can straddle train and a held-out split
    val groups = DedupOps.nearDupGroups(train,
      DedupOps.minhashNearDups(train, 0.5))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    DedupOps.releaseCaches()
    out.foreach { r =>
      assert(groups.getOrElse(r._1, r._1) === r._6,
        s"packed doc ${r._1} carries its election group")
    }
  }

  test("leakage-safe split: near-dup groups co-travel where the doc-level hash would straddle (c3)") {
    import spark.implicits._
    val base = Seq.fill(5)("the quick brown fox jumps over the lazy dog again and again").mkString(" ")
    val fixture = Seq(
      (1L, s"$base alpha"), (3L, s"$base beta"), // near-dup pair
      (6L, "completely different text about spark catalyst optimizer internals"),
      (15L, "another unrelated document entirely about parquet row groups"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(fixture, 0.5)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === Set((1L, 3L)), "fixture pairs exactly 1-3")
    val groups = DedupOps.nearDupGroups(fixture, pairs)
    val split = graft.llm.CurationOps.leakageSafeSplit(fixture, groups)
      .as[(Long, Long, String)].collect().toSeq
    DedupOps.releaseCaches()
    val byId = split.map(r => r._1 -> (r._2, r._3)).toMap
    // co-travel: 1 and 3 share component 1, hence one split — while t6's
    // doc-id buckets (md5("c3-1") → 20 = train, md5("c3-3") → 92 = test)
    // would straddle the near-dup pair across train and eval
    assert(byId(1L) === ((1L, "train")) && byId(3L) === ((1L, "train")))
    // singletons bucket by their own id: 6 → 84 (val), 15 → 98 (test)
    assert(byId(6L) === ((6L, "val")))
    assert(byId(15L) === ((15L, "test")))
    assert(split.map(_._1) === Seq(1L, 3L, 6L, 15L), "exhaustive, doc-ordered")
    // the salt re-rolls buckets but never the grouping
    val resalted = graft.llm.CurationOps.leakageSafeSplit(fixture, groups, salt = "z")
      .as[(Long, Long, String)].collect().toSeq
    DedupOps.releaseCaches()
    assert(resalted.map(_._2) === split.map(_._2))
    assert(resalted.filter(r => Set(1L, 3L).contains(r._1)).map(_._3).distinct.size === 1)
  }

  test("product quantization: codes bounded, ADC recall vs brute force, deterministic (e11)") {
    val queries = emb.filter(col("vec_id") < 8)
    val idx = SimilarityOps.pqBuild(emb, m = 16, k = 16)
    // one in-range code per subspace per vector; codebooks are 16×16×4
    assert(idx.codebooks.size === 16)
    assert(idx.codebooks.forall(cb => cb.length === 16 && cb.forall(_.length === 4)))
    val codes = idx.codes.collect()
    assert(codes.length === emb.count())
    assert(codes.forall(r => (1 to 16).forall(s => r.getInt(s) >= 0 && r.getInt(s) < 16)))
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val run1 = SimilarityOps.pqTopK(idx, queries, 5).collect()
    val approx = run1.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"PQ ADC recall@5 = $recall%.2f (m=16, K=16 — 64 floats → 16 codes)")
    assert(recall > 0.3)
    assert(run1.toSeq === SimilarityOps.pqTopK(idx, queries, 5).collect().toSeq)
  }

  test("IVFADC: probed-cell subset of ADC, recall vs brute force and vs full-scan ADC (e12)") {
    val queries = emb.filter(col("vec_id") < 8)
    val ivf = SimilarityOps.ivfBuild(emb)
    val pq = SimilarityOps.pqBuild(emb, m = 16, k = 16)
    val idx = SimilarityOps.ivfPqBuild(ivf, pq)
    // the coded cells carry exactly the corpus, one row per vector, with
    // the SAME codes the full-scan PQ index assigns (re-derived from the
    // embedding in place — no drift between the two encodes)
    val coded = idx.codedCells.orderBy("vec_id").collect()
    assert(coded.length === emb.count())
    val fullCodes = pq.codes.orderBy("vec_id").collect()
    assert(coded.map(r => (0 until 16).map(s => r.getAs[Int](s"code_$s"))).toSeq
      === fullCodes.map(r => (1 to 16).map(r.getInt)).toSeq)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val adcFull = SimilarityOps.pqTopK(pq, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val run1 = SimilarityOps.ivfAdcTopK(idx, queries, 5).collect()
    val got = run1.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallExact = (exact intersect got).size.toDouble / exact.size
    val recallAdc = (adcFull intersect got).size.toDouble / adcFull.size
    info(f"IVFADC recall@5 = $recallExact%.2f vs exact, $recallAdc%.2f vs full-scan ADC (16 cells, probe 2)")
    assert(recallExact > 0.2)
    // probe pruning only ever drops candidates relative to the full coded
    // scan; within probed cells the ranking is the same ADC
    assert(recallAdc >= recallExact - 1e-9)
    assert(run1.toSeq === SimilarityOps.ivfAdcTopK(idx, queries, 5).collect().toSeq)
  }

  test("codegen graft_nearest is bit-identical to the composed struct-max argmax (incl. ties)") {
    graft.functions.GraftFunctions.register(spark)
    // a seeded random codebook over the full 64 dims, and its first-16-dim
    // slice — the two vector shapes the IVF assign and PQ encode use
    val rnd = new scala.util.Random(47)
    val cb = Array.fill(16, 64)(rnd.nextDouble() * 2 - 1)
    val cbSub = cb.map(_.take(16))
    def assigns(vec: org.apache.spark.sql.Column,
        c: Array[Array[Double]]): Seq[(Long, Int, Int)] =
      emb.select(col("vec_id"),
          call_function("graft_nearest", vec, typedlit(c.map(_.toSeq).toSeq)).as("a"),
          SimilarityOps.structMaxNearest(vec, c).as("b"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val full = assigns(col("embedding"), cb)
    assert(full.nonEmpty)
    assert(full.forall { case (_, a, b) => a == b },
      s"mismatch: ${full.filter { case (_, a, b) => a != b }.take(3)}")
    val sub = assigns(slice(col("embedding"), 1, 16), cbSub)
    assert(sub.forall { case (_, a, b) => a == b })
    // constructed ties: every centroid duplicated — identical scores must
    // resolve to the LARGER cell id, exactly like the struct-max order
    val dup = cb ++ cb
    val tied = assigns(col("embedding"), dup)
    assert(tied.forall { case (_, a, b) => a == b && a >= 16 },
      "duplicate-centroid ties must go to the larger id on both forms")
  }

  test("graft_nearest rejects a non-foldable or mistyped codebook") {
    graft.functions.GraftFunctions.register(spark)
    val nonLit = intercept[Exception](spark.sql(
      "SELECT graft_nearest(array(1.0d), array(array(rand())))").head())
    assert(nonLit.getMessage.toLowerCase.contains("foldable") ||
      nonLit.getMessage.contains("graft_nearest"))
    val mistyped = intercept[Exception](spark.sql(
      "SELECT graft_nearest(array('x'), array(array(1.0d)))").head())
    assert(mistyped.getMessage.contains("graft_nearest") ||
      mistyped.getMessage.toLowerCase.contains("array"))
  }

  test("pq build, encode and adc run with codegen fallback disabled (e11/e12 stay compiled)") {
    // the SCALE.md "known cost" this expression removes: the m·K struct
    // argmax used to exceed Janino's method limit and silently fall back
    // to the interpreted path. With fallback DISABLED a Janino failure
    // now throws — so this test green means the whole PQ family compiles.
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val queries = emb.filter(col("vec_id") < 4)
      val ivf = SimilarityOps.ivfBuild(emb)
      val pq = SimilarityOps.pqBuild(emb, m = 16, k = 16)
      assert(pq.codes.count() === emb.count())
      assert(SimilarityOps.pqTopK(pq, queries, 3).count() > 0)
      assert(SimilarityOps.ivfAdcTopK(SimilarityOps.ivfPqBuild(ivf, pq),
        queries, 3).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", saved)
  }

  test("appended IVF index equals assign-all on frozen centroids (e5b)") {
    val split = 30L
    val built = SimilarityOps.ivfBuild(emb.filter(col("vec_id") < split))
    val appended = SimilarityOps.ivfAppend(
      built, emb.filter(col("vec_id") >= split))
    // append freezes the centroids — never a recluster
    assert(appended.centroids.map(_.toSeq).toSeq ===
      built.centroids.map(_.toSeq).toSeq)
    assert(appended.cells.count() === emb.count())
    val q = emb.filter(col("vec_id") < 4)
    // the maintained (append) path serves exactly what a fresh
    // assign-everything on the same centroids serves
    val got = SimilarityOps.ivfQueryTopK(appended, q, 5).collect().toSeq
    val rebuilt = built.copy(
      cells = SimilarityOps.ivfAssign(emb, built.centroids))
    val want = SimilarityOps.ivfQueryTopK(rebuilt, q, 5).collect().toSeq
    assert(got === want)
    // increment vectors are reachable through the served index
    assert(SimilarityOps.ivfQueryTopK(appended, q, 50)
      .filter(col("neighbor_id") >= split).count() > 0)
  }

  test("bpe merges match an independent token-list greedy model (t18)") {
    import spark.implicits._
    // substring trap ("ab" vs "a"/"b"), self-pair overlap ("x x x"),
    // cascading merges (a@b can pair again) — all in one fixture
    val synth = Seq(
      (1L, "a b a b c"), (2L, "b a b"), (3L, "ab b a b"),
      (4L, "x x x x"), (5L, "a b c a b c")).toDF("doc_id", "text")
    // driver-side reference: greedy left-to-right merge on TOKEN LISTS —
    // shares nothing with the engine's sentinel-string formulation
    def topPair(ds: Seq[List[String]]): (String, String, Long) = {
      val c = scala.collection.mutable.Map.empty[(String, String), Long]
      for (d <- ds; i <- 0 until d.length - 1)
        c((d(i), d(i + 1))) = c.getOrElse((d(i), d(i + 1)), 0L) + 1
      val ((a, b), n) = c.minBy { case ((a, b), n) => (-n, s"$a $b") }
      (a, b, n)
    }
    def applyMerge(ds: Seq[List[String]], a: String, b: String): Seq[List[String]] =
      ds.map { d =>
        val out = List.newBuilder[String]
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == a && d(i + 1) == b) {
            out += s"$a\u001e$b"; i += 2
          } else { out += d(i); i += 1 }
        }
        out.result()
      }
    var ref = synth.collect().sortBy(_.getLong(0))
      .map(_.getString(1).split(" ", -1).toList).toSeq
    val want = (1 to 3).map { r =>
      val (a, b, n) = topPair(ref)
      ref = applyMerge(ref, a, b)
      (r.toLong, s"$a $b", n)
    }
    val got = TextOps.bpeMerges(synth, 3).as[(Long, String, Long)].collect().toSeq
    assert(got === want)
    // the live corpus never contains the encoding's whole alphabet --
    // the U+001F token sentinel and the U+001E merge joiner (the t18
    // scaladoc's precondition; both are control chars chosen to be
    // outside printable text, unlike an '@' joiner which real corpora
    // contain in emails/handles)
    assert(docs.filter(col("text").contains("\u001f") ||
      col("text").contains("\u001e")).count() === 0)
    // and the corpus run is deterministic with exactly `rounds` rows
    val full = TextOps.bpeMerges(docs, 2).as[(Long, String, Long)].collect().toSeq
    assert(full.map(_._1) === Seq(1L, 2L))
    assert(full.forall(_._3 > 0))
    // serve side: encoding with the learned table reproduces the model's
    // final tokenization lengths (ref now holds the post-merge lists)
    val orig = synth.collect().sortBy(_.getLong(0))
      .map(_.getString(1).split(" ", -1).length.toLong).toSeq
    val gotEnc = TextOps.bpeEncode(synth, want.map(_._2))
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotEnc.map(_._2) === orig)
    assert(gotEnc.map(_._3) === ref.map(_.length.toLong))
  }

  test("bpe training under reliable checkpoints equals the local-checkpoint run") {
    // the d6 cluster story applied to the BPE loop: a long run flips
    // reliableCheckpoints=true so executor loss replays from disk instead
    // of recomputing the merge chain — the learned table must be the same
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val saved = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      import spark.implicits._
      val local = TextOps.bpeMerges(docs, 3)
        .as[(Long, String, Long)].collect().toSeq
      val reliable = TextOps.bpeMerges(docs, 3, reliableCheckpoints = true)
        .as[(Long, String, Long)].collect().toSeq
      assert(reliable === local)
      val localSub = TextOps.bpeSubwordMerges(docs, 3)
        .as[(Long, String, Long)].collect().toSeq
      val reliableSub = TextOps.bpeSubwordMerges(docs, 3, reliableCheckpoints = true)
        .as[(Long, String, Long)].collect().toSeq
      assert(reliableSub === localSub)
    } finally saved.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("subword bpe matches a classic word-dict reference (t18c)") {
    import spark.implicits._
    // "loop" repeated inflates its char pairs by frequency; "polo" shares
    // the o-bearing pairs at lower weight; single-char word is inert
    val synth = Seq(
      (1L, "loop loop loop polo"), (2L, "pool loop x"), (3L, "oo polo")
    ).toDF("doc_id", "text")
    // independent reference: classic BPE over the (word-tuple, freq) dict
    var dict = scala.collection.mutable.Map.empty[List[String], Long]
    synth.collect().flatMap(_.getString(1).split(" ", -1))
      .foreach { w =>
        val k = w.split("").toList
        dict(k) = dict.getOrElse(k, 0L) + 1
      }
    val want = (1 to 3).flatMap { r =>
      val c = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, n) <- dict; i <- 0 until toks.length - 1)
        c((toks(i), toks(i + 1))) = c.getOrElse((toks(i), toks(i + 1)), 0L) + n
      if (c.isEmpty) Seq.empty
      else {
        val ((a, b), n) = c.minBy { case ((a, b), n) => (-n, s"$a $b") }
        val nd = scala.collection.mutable.Map.empty[List[String], Long]
        for ((toks, cnt) <- dict) {
          val out = List.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += toks(i); i += 1 }
          }
          val k = out.result()
          nd(k) = nd.getOrElse(k, 0L) + cnt
        }
        dict = nd
        Seq((r.toLong, s"$a $b", n))
      }
    }
    val got = TextOps.bpeSubwordMerges(synth, 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === want)
    // frequency weighting is load-bearing: the top pair must count word
    // OCCURRENCES, not distinct words ("oo" from 4×loop + pool + oo)
    assert(got.head._3 > 3, s"unweighted-looking top count: ${got.head}")
    // corpus sanity: 2 rounds on the real fixture, deterministic rows
    val full = TextOps.bpeSubwordMerges(docs, 2).as[(Long, String, Long)].collect().toSeq
    assert(full.map(_._1) === Seq(1L, 2L))
    assert(full.forall(_._3 > 0))
  }

  test("subword encode replays rules in order and counts tokens (t18d)") {
    import spark.implicits._
    val synth = Seq((1L, "loop polo x"), (2L, "oo oo pool")).toDF("doc_id", "text")
    // rules replayed IN ORDER: "o o"→oo first changes what "l o" can match
    val got = TextOps.bpeSubwordEncode(synth, Seq("o o", "l oo"))
      .as[(Long, Long, Long)].collect().toSeq
    // loop: l,o,o,p → l,oo,p → loo,p = 2; polo: p,o,l,o = 4 (no adjacent
    // o o); x = 1 → doc1: 3 words, 7 subwords
    // oo: o,o → oo = 1 each; pool: p,o,o,l → p,oo,l = 3 → doc2: 3 words, 5
    assert(got === Seq((1L, 3L, 7L), (2L, 3L, 5L)))
    // empty merge table = character count per word
    val chars = TextOps.bpeSubwordEncode(synth, Seq.empty)
      .as[(Long, Long, Long)].collect().toSeq
    assert(chars === Seq((1L, 3L, 9L), (2L, 3L, 8L)))
    // zero-join/zero-hash-shuffle plan gate (the t18b contract, serve tier)
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    plainPlanOf(TextOps.bpeSubwordEncode(docs, Seq("e r", "o r"))) { plan =>
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, s"t18d encode must not join:\n$plan")
      assert(plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }.isEmpty, s"t18d encode must not hash-shuffle:\n$plan")
    }
  }

  test("bpe encode plans as a zero-join narrow map (t18b plan gate)") {
    // the serve-side contract: the merge table rides as plan literals, so
    // encoding must plan with no join and no hash exchange — only the
    // oracle-determinism range sort
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    plainPlanOf(TextOps.bpeEncode(docs, Seq("order fast", "agg part"))) { plan =>
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.isEmpty, s"t18b encode must not join:\n$plan")
      val hashShuffles = plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }
      assert(hashShuffles.isEmpty, s"t18b encode must not hash-shuffle:\n$plan")
    }
  }

  test("served unigram NLL smooths OOV to the Laplace ceiling (t19 served)") {
    import spark.implicits._
    // corpus model: "a" 3×, "b" 2×, "c" 1× → N=6, V=3, denom=10
    val counts = Seq(("a", 3L), ("b", 2L), ("c", 1L)).toDF("word", "n")
    def nll(p: Double): Long = math.round(-math.log(p) * 10000.0)
    val probe = Seq((9L, "a zzz b")).toDF("doc_id", "text")
    val got = TextOps.unigramNllServed(probe, counts)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val want = nll(4.0 / 10) + nll(1.0 / 10) + nll(3.0 / 10)
    assert(got === Seq((9L, 3L, 1L, want, math.round(want / 3.0 / 10000.0 * 10000) / 10000.0)))
    // partials feed in un-summed (the maintained side's shape): same model
    val partials = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("c", 1L)).toDF("word", "n")
    assert(TextOps.unigramNllServed(probe, partials)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq === got)
    // and the OOV ceiling dominates: an all-OOV doc scores strictly above
    // an all-known doc of the same length
    val two = Seq((1L, "a b c"), (2L, "qq ww ee")).toDF("doc_id", "text")
    val scored = TextOps.unigramNllServed(two, counts)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r._5).toMap
    assert(scored(2L) > scored(1L))
  }

  test("served unigram NLL with an EMPTY model nulls the score (t19 served guard)") {
    import spark.implicits._
    // a never-admitted wordcounts side: V=0 degenerates the Laplace term
    // to −ln(1/1) = 0, which would read gibberish as PERFECT quality —
    // the score must be null, with n_oov == n_words carrying the signal
    val empty = Seq.empty[(String, Long)].toDF("word", "n")
    val probe = Seq((1L, "total gibberish words")).toDF("doc_id", "text")
    val rows = TextOps.unigramNllServed(probe, empty).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L,
      "all words are OOV under the empty model")
    assert(r.isNullAt(3) && r.isNullAt(4),
      "an empty model must score null, never a perfect 0")
  }

  test("served bigram NLL smooths unseen bigrams and OOV prevs (t19d served)") {
    import spark.implicits._
    // corpus model: uni alpha:2 beta:2 gamma:1 delta:1 (N=6, V=4,
    // uniDenom=11); bigrams (alpha,beta) (beta,alpha) (beta,gamma)
    // (gamma,delta) each 1 — the bigram side arrives as UNSUMMED partials
    // (two half-count rows per pair) to prove the per-key SUM semantics
    val uni = Seq(("alpha", 2L), ("beta", 2L), ("gamma", 1L), ("delta", 1L))
      .toDF("word", "n")
    val bgPairs = Seq(("alpha", "beta"), ("beta", "alpha"),
      ("beta", "gamma"), ("gamma", "delta"))
    val bg = (bgPairs.map { case (p, w) => (p, w, 0L) } ++
      bgPairs.map { case (p, w) => (p, w, 1L) })
      .toDF("prev", "word", "n")
    val probe = Seq(
      (10L, "alpha beta alpha"),  // all known: uni + two seen bigrams
      (11L, "zz alpha"),          // OOV prev: conditional degenerates to 1/(V+1)
      (12L, "alpha zz"))          // known prev, unseen bigram: per-context ceiling
      .toDF("doc_id", "text")
    def nll(p: Double): Long = math.round(-math.log(p) * 10000.0)
    val got = TextOps.bigramNllServed(probe, uni, bg)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) === ((3L, 0L, nll(3.0 / 11) + 2 * nll(2.0 / 7))))
    assert(got(11L) === ((2L, 1L, nll(1.0 / 11) + nll(1.0 / 5))))
    assert(got(12L) === ((2L, 1L, nll(3.0 / 11) + nll(1.0 / 7))))
    // EMPTY model (both sides): null score, n_oov carries the signal
    val emptyU = Seq.empty[(String, Long)].toDF("word", "n")
    val emptyB = Seq.empty[(String, String, Long)].toDF("prev", "word", "n")
    val r = TextOps.bigramNllServed(
      Seq((1L, "total gibberish words")).toDF("doc_id", "text"),
      emptyU, emptyB).collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.isNullAt(3) && r.isNullAt(4),
      "an empty model must score null, never a perfect 0")
  }

  test("ensemble election demotes the repetitive chant t5 promotes (c5 ∘ d6b)") {
    import spark.implicits._
    // doc 1: a stopword chant — aces t5 (length cap + stopword ratio) but
    // is pure repetition; doc 2: varied vocabulary, zero stopwords — t5
    // floor of 0.5. Same near-dup group (assignment is an input here).
    val chant = Seq.fill(50)("the a").mkString(" ")
    val varied = (0 until 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, chant), (2L, varied)).toDF("doc_id", "text")
    val groups = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "group_id")
    def keeperOf(quality: org.apache.spark.sql.DataFrame): Long =
      DedupOps.qualityKeepers(groups, quality)
        .filter(col("keep")).select("doc_id").as[Long].head()
    assert(keeperOf(TextOps.textStats(docs)) === 1L,
      "the heuristic-only policy keeps the chant")
    assert(keeperOf(CurationOps.ensembleQuality(docs)) === 2L,
      "the ensemble's repetition + LM legs elect the varied member")
    // and the ensemble row itself is exact-integer consistent
    val row = CurationOps.qualityEnsemble(docs).filter(col("doc_id") === 1L).head()
    val blend = (4 * row.getLong(1) + 2 * row.getLong(2) + row.getLong(3) +
      3 * row.getLong(4)) / 10
    assert(row.getLong(5) === blend)
    assert(row.getDouble(6) === row.getLong(5) / 10000.0)
  }

  test("registered served NLL never re-tokenizes the corpus (t19b plan gate)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
    val df = SparkEntry.queries("t19b_unigram_nll_served")(spark, sf0001)
    // the corpus enters ONLY through the maintained (word, n) table (an
    // InMemoryRelation of the served state): tokenization — explode over
    // split — must appear exactly once, over the increment's filter
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.size === 1,
      s"exactly one tokenization (the increment's) — got ${gens.size}:\n" +
        df.queryExecution.optimizedPlan)
    assert(gens.head.find {
      case f: Filter =>
        f.condition.toString.contains("doc_id") &&
          f.condition.toString.contains("400")
      case _ => false
    }.isDefined, "the single tokenize pass must sit over the increment filter")
    // and the screen itself answers: every increment doc scores
    val n = df.count()
    assert(n > 0 && n === Tables.documents(spark, sf0001)
      .filter(col("doc_id") >= 400).count())
  }

  test("registered served bigram NLL never re-tokenizes the corpus (t19d plan gate)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
    val df = SparkEntry.queries("t19d_bigram_nll_served")(spark, sf0001)
    // the corpus enters ONLY through the maintained unigram + bigram
    // count tables (InMemoryRelations of the served state): the one
    // Generate is the increment's pair explode (the first-word leg is
    // element_at — no explode), sitting over the increment filter
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.size === 1,
      s"exactly one pair explode (the increment's) — got ${gens.size}:\n" +
        df.queryExecution.optimizedPlan)
    assert(gens.head.find {
      case f: Filter =>
        f.condition.toString.contains("doc_id") &&
          f.condition.toString.contains("400")
      case _ => false
    }.isDefined, "the single pair-explode must sit over the increment filter")
    val n = df.count()
    assert(n > 0 && n === Tables.documents(spark, sf0001)
      .filter(col("doc_id") >= 400).count())
  }

  test("tokenizer card rolls up exact counts per language (t20)") {
    import spark.implicits._
    // empty merge table → every character is its own subword token, so
    // the hand model is pure counting: tokens = chars minus spaces
    val fixture = Seq(
      (1L, "en", "ab cd"), (2L, "en", "xyz"), (3L, "de", "qq rr ss"))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.tokenizerCard(fixture, Nil)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("de", 1L, 3L, 8L, 6L, 2.0, 1.3333),
      ("en", 2L, 3L, 8L, 7L, 2.3333, 1.1429)))
    // with a learned table, the card's totals must agree with the t18d
    // per-doc encode summed by hand (one definition shared in code, but
    // the ORACLE fragments are separate compositions — pin them equal)
    val merges = TextOps.bpeSubwordMerges(docs, 3)
      .collect().map(_.getString(1)).toSeq
    val perDoc = TextOps.bpeSubwordEncode(docs, merges)
      .as[(Long, Long, Long)].collect()
    val card = TextOps.tokenizerCard(docs, merges)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(card.map(_._2).sum === perDoc.length)
    assert(card.map(_._5).sum === perDoc.map(_._3).sum)
  }

  test("winnow sketch equals the window-min reimplementation; ≥8-word spans share a print (t21/t21b)") {
    import spark.implicits._
    // reimplementation equality (the m4 discipline): winnowing recomputed
    // in plain Scala from the SAME positional seed table the engine's
    // HOF chain reads
    def handSketch(d: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      DedupOps.positionalSeeds(d, 5).as[(Long, Int, Long)].collect()
        .groupBy(_._1).map { case (id, rows) =>
          val kh = rows.sortBy(_._2).map(_._3)
          val wins = (0 to math.max(kh.length - 4, 0))
            .map(i => kh.slice(i, i + 4).min)
          id -> wins.toSet
        }
    def engineSketch(d: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      DedupOps.winnowFingerprints(d).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (id, r) => id -> r.map(_._2).toSet }
    val fixture = Seq(
      (1L, "one two three four five six seven eight"),     // 8 words: 1 window
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")),      // 16 khs, 13 windows
      (3L, "short doc here"),                              // < k words: drops
      // 4 shares the verbatim 8-word span "s1 .. s8" with 5 — the
      // k + w - 1 guarantee says they MUST share a fingerprint
      (4L, "pre amble words " + (1 to 8).map(i => s"s$i").mkString(" ")),
      (5L, (1 to 8).map(i => s"s$i").mkString(" ") + " post text tail"))
      .toDF("doc_id", "text")
    assert(engineSketch(fixture) === handSketch(fixture))
    assert(!engineSketch(fixture).contains(3L))
    val pairs = DedupOps.winnowSimilarity(fixture, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 === 4L && p._2 === 5L), s"got ${pairs.toSeq}")
    // the engine-scale coherence claim: every d9 span pair (≥ 8 verbatim
    // words) surfaces in the winnow match report at minShared = 1 — the
    // sketch detects the span domain at ~1/4 the index size
    assert(engineSketch(docs) === handSketch(docs))
    val spanPairs = DedupOps.duplicatedSpans(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val winnowPairs = DedupOps.winnowSimilarity(docs, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(spanPairs.subsetOf(winnowPairs),
      s"span pairs missing from the sketch report: ${spanPairs -- winnowPairs}")
    DedupOps.releaseCaches()
  }

  test("served winnow screen: corpus rides id_a, replay pairs surface once (t21c)") {
    import spark.implicits._
    val sharedA = (1 to 12).map(i => s"z$i").mkString(" ")
    val sharedB = (1 to 12).map(i => s"y$i").mkString(" ")
    val corpus = Seq(
      (501L, "front matter words " + sharedA),
      (6L, "alpha " + sharedB), (7L, "beta " + sharedB))
      .toDF("doc_id", "text")
    val fps = DedupOps.winnowFingerprints(corpus)
    // non-monotone ids: corpus 501 > probe 3, yet the corpus member
    // rides as id_a (the d5/m4d orientation lesson)
    val hit = DedupOps.winnowScreen(fps,
      Seq((3L, sharedA + " closing bits")).toDF("doc_id", "text"),
      minShared = 1).as[(Long, Long, Long)].collect()
    assert(hit.exists(r => r._1 === 501L && r._2 === 3L), s"got ${hit.toSeq}")
    // replay: 6 and 7 are ALREADY in the corpus sketch; re-screening them
    // self-excludes their corpus rows, so their internal pair surfaces
    // exactly once, (min, max)-oriented — never twice via the corpus leg
    val replay = DedupOps.winnowScreen(fps,
      Seq((6L, "alpha " + sharedB), (7L, "beta " + sharedB))
        .toDF("doc_id", "text"),
      minShared = 1).as[(Long, Long, Long)].collect()
    assert(replay.count(r => Set(r._1, r._2) == Set(6L, 7L)) === 1,
      s"got ${replay.toSeq}")
    assert(replay.exists(r => r._1 === 6L && r._2 === 7L), s"got ${replay.toSeq}")
    DedupOps.releaseCaches()
  }

  test("word salad passes the unigram ensemble but fails the bigram one (c5 vs c5b)") {
    import spark.implicits._
    // 20 docs repeat one phrase; doc 21 is the SAME words reversed (no
    // bigram shared with the phrase, all words distinct — so heuristic,
    // repetition AND unigram-fluency legs are bag-identical)
    val t = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val salad = t.split(" ").reverse.mkString(" ")
    val corpus = ((1L to 20L).map(i => (i, t)) :+ (21L -> salad))
      .toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("doc_id", "ensemble_score").as[(Long, Double)].collect().toMap
    val uni = scores(CurationOps.qualityEnsemble(corpus))
    val bi = scores(CurationOps.qualityEnsembleBigram(corpus))
    // order-blind: the salad is indistinguishable from the prose under
    // the unigram ensemble — exactly why t19c exists
    assert(uni(21L) === uni(1L), s"uni salad ${uni(21L)} vs prose ${uni(1L)}")
    // order-sensitive: the bigram leg sees the transitions the corpus
    // never makes and demotes the salad; the repeated phrase promotes
    assert(bi(21L) < bi(1L), s"bi salad ${bi(21L)} vs prose ${bi(1L)}")
    // the filtering consequence at an explicit cut: a 0.55 quality gate
    // admits the salad under c5 and rejects it under c5b
    assert(uni(21L) >= 0.55 && bi(21L) < 0.55 && bi(1L) >= 0.55,
      s"uni(salad)=${uni(21L)} bi(salad)=${bi(21L)} bi(prose)=${bi(1L)}")
    DedupOps.releaseCaches()
  }

  test("filtered search pre-filters the allow-set; post-filtering would under-return (e13/e13b)") {
    import spark.implicits._
    // vectors fan out on a quarter-circle: cos(query, v_i) strictly
    // decreases in i, so every ranking is hand-readable
    val vecs = (0 to 10).map { i =>
      val th = i * 0.1
      (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val allowed = Seq(2L, 4L, 6L, 8L, 10L).toDF("vec_id")
    val query = emb.filter(col("vec_id") === 0)
    val got = SimilarityOps.filteredTopK(emb, allowed, query, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    // PRE-filter: the 3 nearest ALLOWED vectors — a post-filtered plain
    // top-3 (neighbors 1,2,3 ∩ allowed = {2}) would return one row
    assert(got === Seq((1, 2L), (2, 4L), (3, 6L)))
    val plain = SimilarityOps.bruteForceTopK(emb, query, 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert((plain & Set(2L, 4L, 6L, 8L, 10L)).size < 3,
      "fixture sanity: post-filtering the plain top-k must under-return")
    // the served-index form agrees when probing covers every cell
    val ix = SimilarityOps.ivfBuild(emb, nCells = 2, iterations = 1)
    val served = SimilarityOps.ivfFilteredTopK(ix, allowed, query, 3, nProbe = 2)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(served === Seq((1L, 2L), (2L, 4L), (3L, 6L)))
    // the DOCUMENTED recall caveat, pinned: at nProbe = 1 the probe set
    // is the query's own near cell, and an allow-set clustered in the
    // far cell under-returns — the ANN form is honest about being
    // approximate (widen nProbe with selectivity; e13 is the exact
    // baseline)
    val farCell = ix.cells.filter(col("vec_id") === 10L)
      .select("cell").as[Int].head()
    val nearCellOf0 = ix.cells.filter(col("vec_id") === 0L)
      .select("cell").as[Int].head()
    assume(farCell != nearCellOf0, "fixture sanity: 0 and 10 split cells")
    val farAllowed = ix.cells.filter(col("cell") === farCell)
      .filter(col("vec_id") =!= 0L).select("vec_id")
    val partial = SimilarityOps.ivfFilteredTopK(ix, farAllowed, query, 3, nProbe = 1)
      .collect()
    assert(partial.length < 3,
      s"nProbe=1 against a far-cell allow-set must under-return: ${partial.toSeq}")
    // the ADAPTIVE dial (e13c) recovers exactly that case: the measured
    // allowed fraction widens nProbe=1 to ⌈total/allowed⌉ ≥ 2 (capped at
    // the 2 cells), the far cell gets probed, and the full filtered
    // top-k returns — equal to the exact pre-filter baseline, since the
    // widened probe set covers every cell here
    val adaptive = SimilarityOps
      .ivfFilteredTopKAdaptive(ix, farAllowed, query, 3, nProbe = 1)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(adaptive.length === 3,
      s"the adaptive dial must recover k on the under-return fixture: $adaptive")
    val exact = SimilarityOps.filteredTopK(emb, farAllowed, query, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
      .map { case (r, n) => (r.toLong, n) }
    assert(adaptive === exact)
    // the dial arithmetic, pinned (exact integer ceil — no float path):
    // floor at nProbe, cap at nCells then maxProbe, zero-allowed guard
    assert(SimilarityOps.adaptiveProbeWidth(2, 250, 1000, 16) === 8)
    assert(SimilarityOps.adaptiveProbeWidth(2, 999, 1000, 16) === 3)
    assert(SimilarityOps.adaptiveProbeWidth(2, 1000, 1000, 16) === 2)
    assert(SimilarityOps.adaptiveProbeWidth(2, 10, 1000, 16) === 16)
    assert(SimilarityOps.adaptiveProbeWidth(2, 10, 1000, 16, maxProbe = 6) === 6)
    assert(SimilarityOps.adaptiveProbeWidth(2, 0, 1000, 16) === 16)
    // EMPTY allow-set: the wrapper short-circuits (no full-width probe of
    // a known-empty member frame) and returns the empty frame directly
    val none = SimilarityOps
      .ivfFilteredTopKAdaptive(ix, Seq.empty[Long].toDF("vec_id"), query, 3, nProbe = 1)
    assert(none.columns.contains("neighbor_id"), "schema stays the ranked one")
    assert(none.collect().isEmpty)
    DedupOps.releaseCaches()
  }

  test("media card equals the decoded metadata rolled up by hand (m6)") {
    import spark.implicits._
    val meta = MultimodalOps.mediaPipeline(spark, docs)
      .as[(Long, String, String, Long, Long, Long)].collect()
    val want = meta.groupBy(r => (r._2, r._3)).map { case ((mt, fmt), rs) =>
      (mt, fmt, rs.length.toLong, rs.map(_._6).sum,
        rs.map(_._4).min, rs.map(_._4).max, rs.map(_._5).min, rs.map(_._5).max)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = MultimodalOps.mediaCard(spark, docs)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // all three real decode paths represented: PNG and BMP images
    // (the mixed-container feed) and AVI videos
    assert(got.exists(_._2 === "png") && got.exists(_._2 === "bmp") &&
      got.exists(_._2 === "avi"))
  }

  test("unigram NLL matches a hand model and is partitioning-invariant (t19)") {
    import spark.implicits._
    // corpus: 6 words total — "a" 3×, "b" 2×, "c" 1×
    val fixture = Seq((1L, "a b a"), (2L, "b c a")).toDF("doc_id", "text")
    def nll(p: Double): Long = math.round(-math.log(p) * 10000.0)
    val (na, nb, nc) = (nll(3.0 / 6), nll(2.0 / 6), nll(1.0 / 6))
    val want = Map(
      1L -> (3L, na + nb + na),
      2L -> (3L, nb + nc + na))
    def got(df: org.apache.spark.sql.DataFrame) =
      TextOps.unigramNll(df).as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(fixture) === want)
    // the integer-quantized sum is exact → invariant under repartition
    assert(got(fixture.repartition(7)) === want)
    // banding sanity on the real corpus: rare-token docs score above the
    // median, and avg_nll is the exact ratio of the integer columns
    val real = TextOps.unigramNll(docs)
      .as[(Long, Long, Long, Double)].collect()
    assert(real.length === docs.count())
    assert(real.forall { case (_, n, s, avg) =>
      math.abs(avg - math.round(s.toDouble / n / 10000.0 * 10000) / 10000.0) < 1e-9
    })
  }

  test("bigram NLL matches a hand model; 1-word docs take only the unigram term (t19c)") {
    import spark.implicits._
    // uni: a:3 b:3 c:1 x:1 solo:1, N=9; bigrams: (a,b):3 (b,a):1 (b,c):1 (b,x):1
    val fixture = Seq(
      (1L, "a b a b c"), (2L, "a b x"), (3L, "solo")).toDF("doc_id", "text")
    def nll(p: Double): Long = math.round(-math.log(p) * 10000.0)
    val ln3 = nll(1.0 / 3)                       // 10986
    val want = Map(
      // first a: -ln(3/9)=ln3; (a,b): -ln(3/3)=0; (b,a),(b,c): -ln(1/3)
      1L -> (5L, ln3 + 0L + ln3 + 0L + ln3),
      2L -> (3L, ln3 + 0L + ln3),
      // a single word has no bigram: only -ln(1/9)
      3L -> (1L, nll(1.0 / 9)))
    def got(df: org.apache.spark.sql.DataFrame) =
      TextOps.bigramNll(df).as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(fixture) === want)
    DedupOps.releaseCaches()
    // exact integer sums → invariant under repartition
    assert(got(fixture.repartition(7)) === want)
    DedupOps.releaseCaches()
    // real corpus: every doc scored, avg is the exact ratio of the
    // integer columns, and the bigram model orders docs differently from
    // the unigram one (it sees word order, t19 cannot)
    val real = TextOps.bigramNll(docs).as[(Long, Long, Long, Double)].collect()
    DedupOps.releaseCaches()
    assert(real.length === docs.count())
    assert(real.forall { case (_, n, s, avg) =>
      math.abs(avg - math.round(s.toDouble / n / 10000.0 * 10000) / 10000.0) < 1e-9
    })
    val uniReal = TextOps.unigramNll(docs).as[(Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r._4).toMap
    DedupOps.releaseCaches()
    val ranksDiffer = real.exists { case (id, _, _, avg) => avg != uniReal(id) }
    assert(ranksDiffer, "bigram scores should not collapse to the unigram scores")
  }

  test("pq encode plans as a zero-join narrow map (e11 encode plan gate)") {
    // the codebooks ride as reference objects inside graft_nearest, so
    // encoding — the projection every coded-corpus scan pays — must plan
    // with no join and no hash exchange, exactly like the t18b serve
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val rnd = new scala.util.Random(11)
    val cbs = Seq.fill(4)(Array.fill(16, 16)(rnd.nextDouble()))
    plainPlanOf(SimilarityOps.pqEncode(emb, cbs)) { plan =>
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.isEmpty, s"pq encode must not join:\n$plan")
      val hashShuffles = plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }
      assert(hashShuffles.isEmpty, s"pq encode must not hash-shuffle:\n$plan")
    }
  }

  test("sample-trained subword serve plans as a zero-join narrow map (t18e plan gate)") {
    // t18e's serve half is t18d's projection with a sample-learned rule
    // table — the rules are plan string literals, so the full-corpus
    // encode must stay join-free and hash-shuffle-free
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    plainPlanOf(TextOps.bpeSubwordEncode(docs, Seq("a b", "ab c"))) { plan =>
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, s"t18e serve must not join:\n$plan")
      assert(plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }.isEmpty, s"t18e serve must not hash-shuffle:\n$plan")
    }
  }

  test("bpe training stops at pair exhaustion and emits realized merges (t18)") {
    import spark.implicits._
    // "a a" merges once, then every doc is a single token — round 2 finds
    // no adjacent pair and the loop must emit 1 row, not crash
    val tiny = Seq((1L, "a a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(tiny, 5).as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a a", 1L)))
    // encoding with the short table still works and counts the merged doc
    val enc = TextOps.bpeEncode(tiny, got.map(_._2))
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc === Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("vocabulary ranks by count then word, coverage sums to the stream (t13)") {
    import spark.implicits._
    val synth = Seq((1L, "a b a c a b"), (2L, "b d")).toDF("doc_id", "text")
    // counts: a=3 b=3 c=1 d=1 of 8 → rank (b? no: count desc, WORD asc)
    val got = TextOps.vocabulary(synth, maxVocab = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("a", 1L, 3L, 0.375), ("b", 2L, 3L, 0.75),
      ("c", 3L, 1L, 0.875)))
    // full-fixture sanity: coverage is monotone and ends ≤ 1
    val full = TextOps.vocabulary(docs).as[(String, Long, Long, Double)]
      .collect().toSeq
    assert(full.map(_._4) === full.map(_._4).sorted)
    assert(full.last._4 <= 1.0)
  }

  test("vocabulary top-N plans as TakeOrdered, never a global sort (t13 plan gate)") {
    val vocab = TextOps.vocabulary(docs, maxVocab = 100)
    vocab.count()
    val plan = vocab.queryExecution.executedPlan match {
      // descend through the AQE wrapper (its internal plan is not a child)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val takeOrdered = plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takeOrdered.nonEmpty,
      s"vocabulary top-N must plan TakeOrderedAndProject:\n$plan")
    // the only Sort allowed is the N-row rank window + final ORDER BY —
    // no sort may sit below the top-N boundary (a global vocabulary sort)
    val sortsBelowTopN = takeOrdered.head.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sortsBelowTopN.isEmpty,
      s"global sort under the top-N boundary:\n$plan")
  }

  test("corpus report matches per-doc stats aggregated driver-side (t14)") {
    import spark.implicits._
    val got = TextOps.corpusReport(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val perDoc = TextOps.textStats(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("lang", "n_tokens", "quality_score")
      .as[(String, Long, Double)].collect()
    val want = perDoc.groupBy(_._1).map { case (lang, rows) =>
      (lang, rows.length.toLong, rows.map(_._2).sum,
        rows.map(r => math.round(r._3 * 10000)).sum,
        rows.count(_._3 >= 0.5).toLong)
    }.toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("quality keepers: best-quality member wins, ties to lower id (d6b)") {
    import spark.implicits._
    // group 1 = {1,2,3} with 2 the best quality; group 10 = {10,11} tied
    // quality (keep 10); 20 = singleton
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("doc_id", "group_id")
    val quality = Seq((1L, 0.4), (2L, 0.9), (3L, 0.6), (10L, 0.5),
      (11L, 0.5), (20L, 0.1)).toDF("doc_id", "quality_score")
    val out = DedupOps.qualityKeepers(groups, quality)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.filter(_._4).map(_._1) === Seq(2L, 10L, 20L))
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 10L, 11L, 20L))
  }

  test("incremental admission: screen precedence and per-doc verdicts (c2)") {
    import spark.implicits._
    // span S is 10 words shared verbatim; fillers keep pair Jaccard < 0.5
    // so the span screen (not the minhash screen) must catch doc 402
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"),
      (2L, (1 to 20).map(i => s"c$i").mkString(" ") + " " + span + " " +
        (21 to 40).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val bench = Seq((50L, "alpha beta gamma delta benchmark probe words here"))
      .toDF("doc_id", "text")
    val increment = Seq(
      // near-dup of corpus doc 1 AND low quality: near_dup must win
      (401L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo zulu"),
      // shares only span S with corpus doc 2 → span_dup, witness 2
      (402L, (1 to 15).map(i => s"x$i").mkString(" ") + " " + span + " " +
        (16 to 30).map(i => s"x$i").mkString(" ")),
      // shares the 4-gram "alpha beta gamma delta" with the benchmark
      (403L, "noise one two three alpha beta gamma delta more noise tail"),
      (404L, "tiny junk words"),
      // 120 tokens, half stopwords → quality 0.75 ≥ 0.5 → admitted
      (405L, (1 to 60).map(i => s"the w$i").mkString(" "))).toDF("doc_id", "text")
    val corpusSh = DedupOps.shingleArrays(corpus)
    val out = graft.llm.CurationOps.admitIncrement(increment,
        DedupOps.incrementalNearDups(DedupOps.shingleArrays(increment),
          corpusSh, DedupOps.bandIndex(
            DedupOps.signaturesFromShingleArrays(corpusSh)), 0.5),
        {
          val cs = DedupOps.positionalSeeds(corpus)
          DedupOps.incrementalSpans(increment, cs, DedupOps.seedStats(cs))
        },
        DedupOps.contaminationHits(increment, bench, 4, 1))
      .as[(Long, String, Option[Long], Double)].collect().toSeq
    DedupOps.releaseCaches()
    // one verdict row per increment doc, in id order, all classes exercised
    assert(out.map(_._1) === Seq(401L, 402L, 403L, 404L, 405L))
    assert(out.map(r => (r._1, r._2, r._3)) === Seq(
      (401L, "near_dup", Some(1L)),
      (402L, "span_dup", Some(2L)),
      (403L, "contaminated", Some(50L)),
      (404L, "low_quality", None),
      (405L, "admitted", None)))
    // precedence, not absence: 401 also fails the quality gate on its own
    assert(out.find(_._1 == 401L).get._4 < 0.5)
  }

  test("oov stats served form scores against the MAINTAINED vocab, not the probe's own (t15)") {
    import spark.implicits._
    // vocab induced from the corpus doc alone: a(rank 1), x(rank 2)
    val corpus = Seq((1L, "a a x")).toDF("doc_id", "text")
    val vocab = TextOps.vocabulary(corpus, 2).select("word", "rank")
    // the increment's own top words (c, d) are NOT in the served vocab —
    // an inline re-induction over the increment would rank them 1 and 2
    val increment = Seq((2L, "c d a")).toDF("doc_id", "text")
    val out = TextOps.oovStats(increment, vocab)
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(out === Seq((2L, 3L, 2L, 0.6667, Some(1.0))),
      s"c/d must be OOV against the served vocab: $out")
  }

  test("oov stats: hand-computed ranks, rates and the no-invocab null (t15)") {
    import spark.implicits._
    val tiny = Seq((1L, "a a b"), (2L, "c d")).toDF("doc_id", "text")
    // counts: a=2, b/c/d=1 → top-2 vocab = a(rank 1), b(rank 2)
    val out = TextOps.oovStats(tiny, maxVocab = 2)
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 0L, 0.0, Some(1.3333)),   // ranks 1,1,2 → mean 4/3
      (2L, 2L, 2L, 1.0, None)))          // nothing in-vocab → null mean
    // full fixture: rates in [0,1], mean_rank within the vocab cut
    val full = TextOps.oovStats(docs).collect()
    assert(full.length === docs.count())
    assert(full.forall { r =>
      val rate = r.getDouble(3)
      rate >= 0.0 && rate <= 1.0 &&
        (r.isNullAt(4) || (r.getDouble(4) >= 1.0 && r.getDouble(4) <= 200.0))
    })
  }

  test("admission verdict assembly broadcasts every screen side (c2 plan gate)") {
    import spark.implicits._
    // the c2 contract: beyond the screens themselves, the verdict
    // assembly adds NO sort-merge join — the three rejected-id sides ride
    // as broadcasts over the increment's quality-stats spine
    val inc = docs.limit(50)
    val verdicts = graft.llm.CurationOps.admitIncrement(inc,
      Seq((1L, 401L, 0.9)).toDF("id_a", "id_b", "jaccard"),
      Seq((2L, 402L, 0L, 0L, 9L)).toDF("id_a", "id_b", "start_a", "start_b", "span_len"),
      Seq((403L, 50L, 2L)).toDF("doc_id", "bench_id", "n_shared"))
    verdicts.count()
    val plan = verdicts.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, s"verdict assembly must not sort-merge join:\n$plan")
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.size >= 3, s"expected 3 broadcast verdict joins:\n$plan")
  }

  test("oov stats broadcast the vocabulary; top-N never global-sorts (t15 plan gate)") {
    val stats = TextOps.oovStats(docs)
    stats.count()
    val plan = stats.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isEmpty, s"token→vocab join must broadcast, not sort-merge:\n$plan")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, s"expected a broadcast vocab join:\n$plan")
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"vocabulary cut must plan TakeOrderedAndProject:\n$plan")
  }

  test("cluster-balanced sample: round-robin coverage and prefix monotonicity (e8)") {
    import spark.implicits._
    val index = SimilarityOps.ivfBuild(emb, 16, 2)
    val out = SimilarityOps.clusterBalancedSample(index, 32)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._4) === (1L to 32L))
    // picks advance round-robin: rounds non-decreasing, cells ascending
    // within a round
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
    }
    // 32 picks over 16 cells: every non-empty cell is covered in round 1
    val nonEmpty = index.cells.select("cell").distinct().count()
    assert(out.filter(_._3 == 1L).map(_._2).distinct.size === nonEmpty)
    // a smaller draw is a prefix of a larger one (pilot ⊂ full run, t6's
    // monotonicity discipline in pick order)
    val small = SimilarityOps.clusterBalancedSample(index, 16)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(small === out.take(16))
  }

  test("semantic dedup: groups live within cells, keeper least centroid-similar (e7)") {
    import spark.implicits._
    val index = SimilarityOps.ivfBuild(emb, 16, 2)
    val out = SimilarityOps.semanticDedup(index, 0.4)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    DedupOps.releaseCaches()
    // one row per corpus vector, id-ordered; the fixture has real near-dups
    assert(out.map(_._1) === emb.select("vec_id").as[Long].collect().sorted.toSeq)
    val groups = out.groupBy(_._3)
    assert(groups.exists(_._2.size > 1))
    groups.foreach { case (gid, members) =>
      // group id is the canonical min member (d6's election)
      assert(members.map(_._1).min === gid)
      // pairs exist only within a cell, so a component cannot span cells
      assert(members.map(_._2).distinct.size === 1)
      // exactly one keeper: the LEAST centroid-similar member, ties low id
      assert(members.filter(_._5).map(_._1) ===
        Seq(members.minBy(m => (m._4, m._1))._1))
    }
  }

  test("semantic dedup maxCell rail: a degenerate one-cell corpus never goes quadratic (e7)") {
    import spark.implicits._
    // 1000 near-identical vectors — the SemDeDup target case — all land in
    // one Voronoi cell; without the rail the within-cell join is 1000²/2
    // pairs. With the rail the mega-cell is excluded from pair generation
    // and every vector degrades to a singleton keep (degrade, not destroy).
    val dim = 8
    val degenerate = (0 until 1000).map { i =>
      (i.toLong, Array.tabulate(dim)(d => 0.1f * (d + 1)))
    }.toDF("vec_id", "embedding")
    val index = SimilarityOps.ivfBuild(degenerate, 16, 2)
    val out = SimilarityOps.semanticDedup(index, 0.4, maxCell = 256)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    DedupOps.releaseCaches()
    assert(out.size === 1000)
    assert(out.forall(_._5), "rail-pruned cells degrade to singleton keeps")
    assert(out.forall(r => r._3 === r._1), "every vector is its own group")
    // the same corpus under a lifted cap DOES group (the rail, not the
    // scoring, is what pruned the pairs)
    val lifted = SimilarityOps.semanticDedup(index, 0.4, maxCell = 2000)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    DedupOps.releaseCaches()
    assert(lifted.count(_._5) < 1000, "lifting the cap re-enables grouping")
  }

  test("exact vector dedup collapses bit-identical embeddings, keeper min id (e10)") {
    import spark.implicits._
    val vecs = Seq(
      (5L, Array(1f, 2f, 3f)), (3L, Array(1f, 2f, 3f)), (8L, Array(1f, 2f, 3f)),
      (9L, Array(0f, 1f, 0f)),
      (7L, Array(1f, 2f, 3.0000002f)) // near-identical floats stay DISTINCT
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.exactVectorDedup(vecs)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((3L, 3L), (7L, 1L), (9L, 1L)))
    // the composition it exists for: pre-collapsed, the degenerate
    // 1000-identical corpus reaches SemDeDup as ONE representative —
    // no mega-cell, no rail trip, nothing for the pair front to square
    val degenerate = (0 until 1000).map { i =>
      (i.toLong, Array.tabulate(8)(d => 0.1f * (d + 1)))
    }.toDF("vec_id", "embedding")
    val keepers = SimilarityOps.exactVectorDedup(degenerate)
      .as[(Long, Long)].collect().toSeq
    assert(keepers === Seq((0L, 1000L)))
  }

  test("ivf drift stats: a shifted increment degrades mean_cos monotonically (e9)") {
    import spark.implicits._
    // corpus: two tight clusters at e0 and e1 → centroids converge there
    val corpus = (0 until 8).map { i =>
      (i.toLong, if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val index = SimilarityOps.ivfBuild(corpus, 2, 2)
    // increments rotated away from e0 in the (e0, e2) plane by theta:
    // assigned to the e0 centroid while cos-to-centroid = cos(theta)
    def incMean(theta: Double): Double = {
      val inc = (100 until 108).map { i =>
        (i.toLong, Array(math.cos(theta).toFloat, 0f, math.sin(theta).toFloat, 0f))
      }.toDF("vec_id", "embedding")
      SimilarityOps.ivfDriftStats(index, inc)
        .filter(col("segment") === "increment")
        .select("mean_cos").as[Double].head()
    }
    // the corpus segment itself sits ON its centroids
    val corpusMean = SimilarityOps.ivfDriftStats(index,
        corpus.limit(0))
      .filter(col("segment") === "corpus")
      .select("mean_cos").as[Double].head()
    assert(corpusMean === 1.0)
    val drift = Seq(0.1, 0.5, 1.0).map(incMean)
    assert(drift(0) > drift(1) && drift(1) > drift(2),
      s"mean_cos must degrade monotonically with the shift: $drift")
    assert(corpusMean > drift(0), "even a mild shift reads below the corpus")
  }

  test("semantic screen: corpus member stays id_a regardless of numeric order (c2b)") {
    import spark.implicits._
    // streaming ids are not monotone (the d5 lesson): the corpus vector's
    // id sorts ABOVE the increment's, and the screen must still report the
    // corpus member as the keeper id_a
    val corpusEmb = Seq((500L, Array(1f, 0f, 0f, 0f)), (600L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val incEmb = Seq((3L, Array(0.999f, 0.01f, 0f, 0f)), (4L, Array(0.998f, 0.02f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val index = SimilarityOps.ivfBuild(corpusEmb, 2, 2)
    val got = SimilarityOps.semanticScreen(index, incEmb, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(p => (p._1, p._2)) === Set(
      (500L, 3L), (500L, 4L), // corpus-vs-new: corpus id_a despite 500 > 3
      (3L, 4L)),              // new-vs-new: lower id first
      s"got $got")
  }
}
