package graft

import org.apache.spark.sql.functions._

import graft.llm.{DedupOps, SimilarityOps}
import graft.llm.DedupOps.BloomSizing

/** Adversarial-scale rail soak (round-13 verdict item 1): every scale rail
  * exercised against a degenerate corpus 10-50× the ordinary fixture, with
  * BOTH halves of the claim asserted — the rail actually FIRES (the
  * degenerate volume would otherwise enter the quadratic pair front) AND
  * the railed output is exactly right vs a small-N reference (result-set
  * equality against the engine run on the non-degenerate subset, or
  * analytic island arithmetic for the span split).
  *
  * Rails covered: d3b's maxBucket signature-bucket prune, m4c's image
  * band-bucket prune (round 14 — a constant-image flood), t21b's
  * winnow-sketch df prune (round 14 — a boilerplate flood), e7's
  * maxCell Voronoi-cell prune (members degrade to singleton keeps,
  * never disappear), d8b's combined-population maxCell, d9's df cap
  * (spans SPLIT at a pruned boilerplate seed, never lost), and d10's
  * Bloom FPR staying at its analytic design point as the key count
  * approaches and passes filter capacity. */
class RailSoakSpec extends SparkSpec {
  import spark.implicits._

  // ---- d3b: maxBucket signature-bucket rail -------------------------------

  test("d3b maxBucket binds on 5000 boilerplate twins; railed pairs equal the small-N run") {
    // 5000 byte-identical boilerplate docs (one signature bucket) would
    // contribute ~12.5M Hamming-0 pairs without the rail; 40 small
    // identical-triplet groups are the genuine content that must survive
    val boiler = (10000L until 15000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog boilerplate"))
    val groups = (0 until 40).flatMap { g =>
      val text = s"group $g alpha${g} beta${g} gamma${g} delta${g} epsilon${g}"
      (0 until 3).map(j => ((g * 3 + j).toLong, text))
    }
    val corpus = (boiler ++ groups).toDF("doc_id", "text")
    try {
      // the rail FIRES: the boilerplate bucket dwarfs maxBucket
      val maxBucketSize = DedupOps.simhash(corpus)
        .groupBy("simhash").count().agg(max("count")).head().getLong(0)
      assert(maxBucketSize >= 5000L, s"degenerate bucket only $maxBucketSize")

      val railed = DedupOps.simhashNearDups(corpus, maxBucket = 100)
        .as[(Long, Long)].collect().toSet
      // small-N oracle: the engine on the corpus WITHOUT the degenerate
      // bucket (signatures are per-doc, so removal changes nothing else)
      val reference = DedupOps.simhashNearDups(
        groups.toDF("doc_id", "text"), maxBucket = 100)
        .as[(Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      // and the surviving content is exactly the 40 triplets' 3 pairs each
      assert(railed.size === 120)
      assert(railed.forall { case (a, b) => a / 3 == b / 3 && a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  test("m4c maxBucket binds on a 3000-image constant flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    // 3000 images with ONE fingerprint (the generative pixels depend only
    // on text length) put the whole flood into a single bucket of every
    // band — ~4.5M Hamming-0 pairs without the rail; 10 identical-triplet
    // length classes are the genuine content that must survive
    val flood = (10000L until 13000L).map(i => (i, "src", "f" * 30))
    val groups = (0 until 10).flatMap { g =>
      (0 until 3).map(j => ((g * 3 + j).toLong, "src", "z" * (31 + g)))
    }
    val media = MultimodalOps.asMediaTable(
      (flood ++ groups).toDF("doc_id", "source", "text")
        .filter(!MultimodalOps.isVideoId(col("doc_id"))))
    try {
      // the rail FIRES: the flood's single fingerprint dwarfs maxBucket
      // (every one of its four band buckets holds the whole flood)
      val biggest = MultimodalOps.imageHashes(spark, media)
        .groupBy("h_hi", "h_lo").count().agg(max("count")).head().getLong(0)
      assert(biggest >= 2000L, s"degenerate fingerprint bucket only $biggest")
      val railed = MultimodalOps.imageNearDups(spark, media)
        .as[(Long, Long, Long)].collect().toSet
      // small-N oracle: the engine on the corpus WITHOUT the flood
      // (fingerprints are per-image, so removal changes nothing else)
      val reference = MultimodalOps.imageNearDups(spark,
        MultimodalOps.asMediaTable(
          groups.toDF("doc_id", "source", "text")
            .filter(!MultimodalOps.isVideoId(col("doc_id")))))
        .as[(Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      assert(railed.nonEmpty)
      // surviving pairs are exactly the within-length-class ones, and the
      // flood contributes none
      assert(railed.forall { case (a, b, ham) =>
        a / 3 == b / 3 && a < 10000 && b < 10000 && ham === 0L })
    } finally DedupOps.releaseCaches()
  }

  test("m4o tile-bucket rail binds on a 3000-copy image flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.MediaRecord
    // 3000 copies of ONE image put the whole flood into every one of its
    // tiles' (tx, ty, band, key) buckets — without the rail the 2-D
    // offset fan would multiply ~4.5M Hamming-0 pairs by the 9-cell
    // square. The genuine content is 10 identical-triplet classes of
    // RANDOM images (random pixels, unlike the generative ramp whose
    // tile prints genuinely collide across text lengths — a class whose
    // prints land in the flood's buckets is absorbed by design, the m5d
    // flood rule): their buckets are disjoint from the flood's w.h.p.,
    // so every within-class pair must survive the rail, at (0, 0) with
    // all 9 whole tiles matched.
    val rnd = new scala.util.Random(53)
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(48, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 48)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val floodPng = png()
    val flood = (10000L until 13000L).map(i =>
      MediaRecord(i, "image/png", floodPng))
    val groups = (0 until 10).flatMap { g =>
      val p = png()
      (0 until 3).map(j => MediaRecord((g * 3 + j).toLong, "image/png", p))
    }
    def tilesOf(rows: Seq[MediaRecord]) =
      MultimodalOps.tilePrintFrameRaw(rows.toDF())
    try {
      // the rail FIRES: the flood collapses a tile bucket far past 100
      val biggest = tilesOf(flood)
        .groupBy("tx", "ty", "h_hi", "h_lo").count()
        .agg(max("count")).head().getLong(0)
      assert(biggest >= 2000L, s"degenerate tile bucket only $biggest")
      val railed = MultimodalOps.imageTileNearDups(tilesOf(flood ++ groups))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val reference = MultimodalOps.imageTileNearDups(tilesOf(groups))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      // survivors are exactly the 30 within-class pairs at (0, 0) with
      // every whole tile matched; the flood contributes none
      assert(railed.size === 30)
      assert(railed.forall { case (a, b, dx, dy, n) =>
        a / 3 == b / 3 && a < 10000 && b < 10000 &&
          dx == 0L && dy == 0L && n == 9L })
    } finally DedupOps.releaseCaches()
  }

  test("m4r ktile rail binds on a 3000-copy image flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.MediaRecord
    // the m4o flood against the CANONICAL 4-family tile tier: 3000
    // copies of one image put the whole flood into every one of its
    // (fam, tx, ty, band, key) buckets — without the rail the 2-D fan
    // would multiply ~4.5M Hamming-0 pairs by the 9-cell square TIMES
    // the 4-family b side. Genuine content: 10 identical-triplet
    // classes of RANDOM 52×41 images (both axes carry a mod-16
    // remainder, so only the lt↔lt leg aligns for plain copies and the
    // expected rows are exactly one per pair): within-class pairs must
    // survive the rail on the 'lt' witness at (0, 0) with all 3×2 = 6
    // whole tiles matched.
    val rnd = new scala.util.Random(61)
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(52, 41,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 41; x <- 0 until 52)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val floodPng = png()
    val flood = (10000L until 13000L).map(i =>
      MediaRecord(i, "image/png", floodPng))
    val groups = (0 until 10).flatMap { g =>
      val p = png()
      (0 until 3).map(j => MediaRecord((g * 3 + j).toLong, "image/png", p))
    }
    def ktilesOf(rows: Seq[MediaRecord]) =
      MultimodalOps.tileKPrintFrameRaw(rows.toDF())
    try {
      val railed = MultimodalOps.imageTileKNearDups(ktilesOf(flood ++ groups))
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
      val reference = MultimodalOps.imageTileKNearDups(ktilesOf(groups))
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      assert(railed.size === 30)
      assert(railed.forall { case (a, b, fam, dx, dy, n) =>
        a / 3 == b / 3 && a < 10000 && b < 10000 &&
          fam == "lt" && dx == 0L && dy == 0L && n == 6L })
    } finally DedupOps.releaseCaches()
  }

  test("m4g lens-union rails bind on a 3000-image constant flood; railed union equals the small-N run") {
    import graft.llm.MultimodalOps
    // the m4c flood against BOTH lenses at once: 3000 same-length images
    // share ONE aHash and ONE dHash (generative pixels depend only on
    // text length), so the flood collapses a bucket of every band in
    // BOTH rails — without them the union's candidate front would carry
    // ~4.5M pairs TWICE (once per lens, deduped after the damage). The
    // union must drop the flood via both legs and keep every genuine
    // triplet pair, whose distances are 0 under both lenses.
    val flood = (10000L until 13000L).map(i => (i, "src", "f" * 30))
    val groups = (0 until 10).flatMap { g =>
      (0 until 3).map(j => ((g * 3 + j).toLong, "src", "z" * (31 + g)))
    }
    def lensOf(rows: Seq[(Long, String, String)]) =
      MultimodalOps.lensFingerprintFrameRaw(MultimodalOps.asMediaTable(
        rows.toDF("doc_id", "source", "text")
          .filter(!MultimodalOps.isVideoId(col("doc_id")))))
    try {
      val railed = MultimodalOps.imageLensUnionNearDups(lensOf(flood ++ groups))
        .as[(Long, Long, Long, Long)].collect().toSet
      val reference = MultimodalOps.imageLensUnionNearDups(lensOf(groups))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed union must equal the small-N run")
      assert(railed.nonEmpty)
      assert(railed.forall { case (a, b, hamA, hamD) =>
        a / 3 == b / 3 && a < 10000 && b < 10000 &&
          hamA === 0L && hamD === 0L })
    } finally DedupOps.releaseCaches()
  }

  test("m4l dihedral rail binds on a 3000-image constant flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    // the m4c flood against the CANONICAL print family: 3000 same-length
    // images share one canonical print (canonicalization is
    // deterministic over identical pixels), collapsing a bucket of every
    // band — the rail must drop the flood while the genuine triplets'
    // Hamming-0 pairs survive
    val flood = (10000L until 13000L).map(i => (i, "src", "f" * 30))
    val groups = (0 until 10).flatMap { g =>
      (0 until 3).map(j => ((g * 3 + j).toLong, "src", "z" * (31 + g)))
    }
    def printsOf(rows: Seq[(Long, String, String)]) =
      MultimodalOps.dihedralFingerprintFrameRaw(
        MultimodalOps.asMediaTable(rows.toDF("doc_id", "source", "text")
          .filter(!MultimodalOps.isVideoId(col("doc_id")))))
    try {
      val railed = MultimodalOps.imageNearDupsFromHashes(printsOf(flood ++ groups))
        .as[(Long, Long, Long)].collect().toSet
      val reference = MultimodalOps.imageNearDupsFromHashes(printsOf(groups))
        .as[(Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      assert(railed.nonEmpty)
      assert(railed.forall { case (a, b, ham) =>
        a / 3 == b / 3 && a < 10000 && b < 10000 && ham === 0L })
    } finally DedupOps.releaseCaches()
  }

  test("m5d band rail binds on a 5000-clip silence-class flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    // 5000 same-length clips share ONE acoustic print (the generative
    // samples depend only on text length), collapsing every band bucket
    // the flood touches — ~12.5M Hamming-0 pairs without the rail; 10
    // identical-triplet length classes are the genuine content whose
    // pairs must survive (the m4c flood on the audio modality — the
    // degenerate feed the r15 verdict asked to soak: every clip of one
    // re-used jingle/silence class lands in one bucket)
    val flood = (10000L until 15000L).map(i => (i, "s" * 30))
    // group lengths are SEARCHED off the generative formula so no group
    // print shares a band key with the flood print — acoustic prints
    // genuinely collide across lengths (the r15 advice's point), and a
    // class whose print IS the flood's is absorbed by the rail by
    // design, which is not what this soak measures
    def printOf(l: Int): (Long, Long) = {
      val (ch, nf) = graft.llm.MultimodalOps.AudioGen.params(l.toLong)
      graft.llm.MultimodalOps.acousticFingerprint(
        Array.tabulate(nf * ch)(i => graft.llm.MultimodalOps.AudioGen.sample(l.toLong, i.toLong)))
    }
    def bandsOf(p: (Long, Long)): Set[(Int, Long)] = Set(
      0 -> (p._2 & 0xffffL), 1 -> ((p._2 >> 16) & 0xffffL),
      2 -> (p._1 & 0xffffL), 3 -> ((p._1 >> 16) & 0xffffL))
    val floodBands = bandsOf(printOf(30))
    val groupLens = (31 to 300).iterator
      .filter(l => (bandsOf(printOf(l)) & floodBands).isEmpty)
      .take(10).toSeq
    assert(groupLens.size === 10, "fixture search: need 10 flood-disjoint lengths")
    val groups = groupLens.zipWithIndex.flatMap { case (len, g) =>
      (0 until 3).map(j => ((g * 3 + j).toLong, "z" * len))
    }
    try {
      val prints = MultimodalOps.audioFingerprintFrame(
        MultimodalOps.asAudioTable((flood ++ groups).toDF("doc_id", "text")))
      // the rail FIRES: the flood's single print dwarfs maxBucket in all
      // four of its band buckets
      val biggest = prints.groupBy("h_hi", "h_lo").count()
        .agg(max("count")).head().getLong(0)
      assert(biggest >= 5000L, s"degenerate print bucket only $biggest")
      val railed = MultimodalOps.imageNearDupsFromHashes(prints)
        .as[(Long, Long, Long)].collect().toSet
      // small-N oracle: the engine on the corpus WITHOUT the flood
      // (prints are per-clip, so removal changes nothing else)
      val reference = MultimodalOps.imageNearDupsFromHashes(
        MultimodalOps.audioFingerprintFrame(
          MultimodalOps.asAudioTable(groups.toDF("doc_id", "text"))))
        .as[(Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      assert(railed.nonEmpty)
      // every within-length-class triplet pair survives at Hamming 0;
      // the flood contributes none
      assert((0 until 10).forall { g =>
        val ids = (0 until 3).map(j => (g * 3 + j).toLong)
        ids.combinations(2).forall(p => railed.contains((p(0), p(1), 0L)))
      }, s"genuine triplet pairs lost: $railed")
      assert(railed.forall { case (a, b, _) => a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  test("m3b per-ordinal band rail binds on a 5000-clip flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.VideoGen
    // 5000 same-length clips share every sampled frame print, collapsing
    // every (ordinal, band, key) bucket the flood touches (~12.5M
    // Hamming-0 rows per ordinal unrailed); 10 identical-triplet length
    // classes are the genuine content. The per-ordinal rail is NEW CODE
    // (frameNearDups carries its own bucket prune keyed by the ordinal),
    // so it gets its own soak — group lengths are searched so no group
    // frame shares a band key with the flood's same-ordinal frame.
    val floodLen = 30
    def frameBandKeys(l: Int, i: Int): Set[(Int, Long)] = {
      val nf = 2 + l % 3
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        VideoGen.framePng(l.toLong, i * nf / 4)))
      val (hi, lo) = MultimodalOps.aHash(img)
      Set(0 -> (lo & 0xffffL), 1 -> ((lo >> 16) & 0xffffL),
        2 -> (hi & 0xffffL), 3 -> ((hi >> 16) & 0xffffL))
    }
    val floodKeys = (0 until 4).map(i => i -> frameBandKeys(floodLen, i)).toMap
    val groupLens = (31 to 400).iterator
      .filter(l => (0 until 4).forall(i =>
        (frameBandKeys(l, i) & floodKeys(i)).isEmpty))
      .take(10).toSeq
    assert(groupLens.size === 10, "fixture search: need 10 flood-disjoint lengths")
    // all VIDEO ids (doc_id % 4 == 0)
    val flood = (0 until 5000).map(k => (10000L + 4L * k, "src", "s" * floodLen))
    val groups = groupLens.zipWithIndex.flatMap { case (len, g) =>
      (0 until 3).map(j => ((g * 3 + j) * 4L, "src", "z" * len))
    }
    try {
      val frames = MultimodalOps.sampleFrames(spark,
        MultimodalOps.asMediaTable(
          (flood ++ groups).toDF("doc_id", "source", "text"))).toDF()
      val railed = MultimodalOps.frameNearDups(frames)
        .as[(Long, Long, Long, Long)].collect().toSet
      val reference = MultimodalOps.frameNearDups(
        MultimodalOps.sampleFrames(spark,
          MultimodalOps.asMediaTable(
            groups.toDF("doc_id", "source", "text"))).toDF())
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      assert(railed.nonEmpty)
      // every within-class triplet pair survives on EVERY sampled
      // ordinal at Hamming 0; the flood contributes none
      assert((0 until 10).forall { g =>
        val ids = (0 until 3).map(j => (g * 3 + j) * 4L)
        ids.combinations(2).forall(p =>
          (0 until 4).forall(i => railed.contains((p(0), p(1), i.toLong, 0L))))
      }, s"genuine triplet ordinals lost: ${railed.size}")
      assert(railed.forall { case (a, b, _, _) => a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  test("m5h per-ordinal rail binds on a 5000-clip silence-padded flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    // 5000 renditions of ONE base stream behind rotating whole-window
    // silence pads: each pad class shares every windowed sub-print, so
    // each (ordinal, band, key) bucket holds ~1667 clips — far past
    // maxBucket — and the ±3-ordinal fan-out would cube the pair front
    // unrailed. 8 triplet classes of DISTINCT random base streams are
    // the genuine content, each class's three renditions padded 0/1/2
    // windows, so the engine must catch every class pair at its true
    // nonzero offset while the rail drops the flood. Base streams are
    // searched (seeded, deterministic) so no group window shares a band
    // key with the flood's — removing the flood must not move any
    // group bucket's population, keeping the equality test exact.
    val rnd = new scala.util.Random(11)
    def stream(n: Int): Array[Int] =
      Array.fill(n * 128)(rnd.nextInt(65536) - 32768)
    def windowKeys(s: Array[Int]): Set[(Int, Long)] =
      (0 until s.length / 128).flatMap { w =>
        val (hi, lo) = MultimodalOps.acousticFingerprint(
          java.util.Arrays.copyOfRange(s, w * 128, (w + 1) * 128))
        Set(0 -> (lo & 0xffffL), 1 -> ((lo >> 16) & 0xffffL),
          2 -> (hi & 0xffffL), 3 -> ((hi >> 16) & 0xffffL))
      }.toSet
    val floodBase = stream(4)
    val floodKeys = windowKeys(floodBase)
    // 8 flood-disjoint 5-window base streams (mutually distinct prints
    // come free with random samples; only flood disjointness is load-
    // bearing for the removal test)
    val bases = Iterator.continually(stream(5))
      .filter(s => (windowKeys(s) & floodKeys).isEmpty).take(8).toSeq
    def padded(s: Array[Int], padWins: Int): Array[Byte] =
      AudioGen.wavOf(1, new Array[Int](padWins * 128) ++ s)
    val flood = (0 until 5000).map(k =>
      AudioRecord(10000L + k, "audio/wav", padded(floodBase, k % 3)))
    val groups = bases.zipWithIndex.flatMap { case (s, g) =>
      (0 until 3).map(j =>
        AudioRecord((g * 3 + j).toLong, "audio/wav", padded(s, j)))
    }
    def shiftPairsOf(rows: Seq[AudioRecord]) =
      MultimodalOps.audioShiftNearDups(
        MultimodalOps.audioWindowPrintsRaw(rows.toDS().toDF()))
    try {
      val railed = shiftPairsOf(flood ++ groups)
        .as[(Long, Long, Long, Long)].collect().toSet
      val reference = shiftPairsOf(groups)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      // every class pair is caught at EXACTLY its pad delta with all 5
      // base windows matched; the flood contributes nothing
      val expected = (0 until 8).flatMap { g =>
        val id = (j: Int) => (g * 3 + j).toLong
        Seq((id(0), id(1), 1L, 5L), (id(0), id(2), 2L, 5L),
          (id(1), id(2), 1L, 5L))
      }.toSet
      assert(expected.subsetOf(railed),
        s"class pairs lost or mis-offset: ${(expected -- railed).take(5)}")
      assert(railed.forall { case (a, b, _, _) => a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  test("m5i served shift rail binds on a 5000-clip padded flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    // the SERVED form's combined-population rail (corpus + increment per
    // (ordinal, band, key)) under a degenerate increment: 5000 padded
    // renditions of ONE stream — whose unpadded original sits in the
    // corpus, so without the rail every flood clip is a genuine
    // offset-match (5000 corpus hits + ~12.5M within-increment pairs).
    // 8 corpus streams with two genuine padded renditions each are the
    // content that must survive at its true offsets. Stream prints are
    // searched band-disjoint from the flood's so removing the flood
    // moves no genuine bucket.
    val rnd = new scala.util.Random(13)
    def stream(n: Int): Array[Int] =
      Array.fill(n * 128)(rnd.nextInt(65536) - 32768)
    def windowKeys(s: Array[Int]): Set[(Int, Long)] =
      (0 until s.length / 128).flatMap { w =>
        val (hi, lo) = MultimodalOps.acousticFingerprint(
          java.util.Arrays.copyOfRange(s, w * 128, (w + 1) * 128))
        Set(0 -> (lo & 0xffffL), 1 -> ((lo >> 16) & 0xffffL),
          2 -> (hi & 0xffffL), 3 -> ((hi >> 16) & 0xffffL))
      }.toSet
    val floodBase = stream(5)
    val floodKeys = windowKeys(floodBase)
    val bases = Iterator.continually(stream(5))
      .filter(s => (windowKeys(s) & floodKeys).isEmpty).take(8).toSeq
    def padded(s: Array[Int], padWins: Int): Array[Byte] =
      AudioGen.wavOf(1, new Array[Int](padWins * 128) ++ s)
    // corpus: the 8 streams AND the flood's original, all unpadded
    val corpus = bases.zipWithIndex.map { case (s, g) =>
      AudioRecord(g.toLong, "audio/wav", padded(s, 0)) } :+
      AudioRecord(50L, "audio/wav", padded(floodBase, 0))
    val genuine = bases.zipWithIndex.flatMap { case (s, g) =>
      Seq(AudioRecord(100L + 2 * g, "audio/wav", padded(s, 1)),
        AudioRecord(101L + 2 * g, "audio/wav", padded(s, 2)))
    }
    val flood = (0 until 5000).map(k =>
      AudioRecord(10000L + k, "audio/wav", padded(floodBase, k % 3)))
    def screen(incr: Seq[AudioRecord]) = {
      implicit val sqlCtx = spark.sqlContext
      MultimodalOps.audioShiftNearDupsServedWins(
        MultimodalOps.audioWindowPrintsRaw(corpus.toDS().toDF()),
        MultimodalOps.audioWindowPrintsRaw(incr.toDS().toDF()),
        incr.map(_.doc_id).toDF("doc_id"))
    }
    try {
      val railed = screen(genuine ++ flood)
        .as[(Long, Long, Long, Long)].collect().toSet
      val reference = screen(genuine)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      // every genuine rendition is caught against its corpus original at
      // exactly its pad offset with all 5 windows; the flood — corpus
      // partner and all — contributes nothing (its buckets are railed)
      val expected = (0 until 8).flatMap(g =>
        Seq((g.toLong, 100L + 2 * g, 1L, 5L), (g.toLong, 101L + 2 * g, 2L, 5L)))
        .toSet
      assert(expected.subsetOf(railed),
        s"genuine renditions lost or mis-offset: ${(expected -- railed).take(5)}")
      assert(railed.forall { case (a, b, _, _) => a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  test("m5m reversal-window rail binds on a 5000-clip reversed-padded flood; railed pairs equal the small-N run") {
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioGen, AudioRecord}
    // 5000 REVERSED renditions of ONE base stream behind rotating
    // whole-window silence pads: every clip shares both families'
    // canonical window prints (the b family pad-invariantly, the f
    // family shifted ≤ 2 ordinals), so each (family, ordinal, band, key)
    // bucket holds ~thousands — far past maxBucket — and the three-leg
    // family join would cube the pair front unrailed. 8 classes of
    // [plain, reversed+1-window pad, reversed+2-window pad] renditions
    // of DISTINCT streams are the genuine content the rail must keep,
    // each reversal caught on its cross legs at its exact offsets.
    // Streams are searched canonical-band-disjoint from the flood's so
    // removing the flood moves no genuine bucket.
    val rnd = new scala.util.Random(17)
    // length NOT a multiple of 128 — the b family must be load-bearing
    def stream(): Array[Int] =
      Array.fill(5 * 128 + 37)(rnd.nextInt(65536) - 32768)
    def canonKeys(s: Array[Int]): Set[(Int, Long)] =
      MultimodalOps.revWindowPrintsOfSamples(s).flatMap { w =>
        Seq(0 -> (w.h_lo & 0xffffL), 1 -> ((w.h_lo >> 16) & 0xffffL),
          2 -> (w.h_hi & 0xffffL), 3 -> ((w.h_hi >> 16) & 0xffffL))
      }.toSet
    val floodBase = stream()
    val floodKeys = canonKeys(floodBase) ++ canonKeys(floodBase.reverse)
    val bases = Iterator.continually(stream())
      .filter(s => ((canonKeys(s) ++ canonKeys(s.reverse)) & floodKeys).isEmpty)
      .take(8).toSeq
    def revPadded(s: Array[Int], padWins: Int): Array[Byte] =
      AudioGen.wavOf(1, new Array[Int](padWins * 128) ++ s.reverse)
    val flood = (0 until 5000).map(k =>
      AudioRecord(10000L + k, "audio/wav", revPadded(floodBase, k % 3)))
    val groups = bases.zipWithIndex.flatMap { case (s, g) =>
      Seq(AudioRecord((g * 3).toLong, "audio/wav", AudioGen.wavOf(1, s)),
        AudioRecord((g * 3 + 1).toLong, "audio/wav", revPadded(s, 1)),
        AudioRecord((g * 3 + 2).toLong, "audio/wav", revPadded(s, 2)))
    }
    def revPairsOf(rows: Seq[AudioRecord]) =
      MultimodalOps.audioRevShiftNearDups(
        MultimodalOps.audioRevWindowPrintsRaw(rows.toDS().toDF()))
    try {
      val railed = revPairsOf(flood ++ groups)
        .as[(Long, Long, String, Long, Long)].collect().toSet
      val reference = revPairsOf(groups)
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      // each class: both reversals caught against the plain original on
      // the pad-invariant (f,b) leg at offset 0 AND the (b,f) leg at the
      // pad offset; the two reversed renditions are a forward shift of
      // each other — the (f,f) leg at offset 1. The flood contributes
      // nothing.
      val expected = (0 until 8).flatMap { g =>
        val id = (j: Int) => (g * 3 + j).toLong
        Seq((id(0), id(1), "fb", 0L, 5L), (id(0), id(1), "bf", 1L, 5L),
          (id(0), id(2), "fb", 0L, 5L), (id(0), id(2), "bf", 2L, 5L),
          (id(1), id(2), "ff", 1L, 5L))
      }.toSet
      assert(expected.subsetOf(railed),
        s"class catches lost or mis-offset: ${(expected -- railed).take(5)}")
      assert(railed.forall { case (a, b, _, _, _) => a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  // ---- t21b: winnow-sketch df rail ----------------------------------------

  test("t21b df rail binds on a 5000-doc boilerplate flood; railed pairs equal the small-N run") {
    // 5000 byte-identical docs share ONE sketch whose every fingerprint
    // has df 5000 >> 100 — ~12.5M all-pairs matches without the rail;
    // 10 identical-triplet groups with distinct ≥ 8-word texts are the
    // genuine content whose pairs must survive (their prints sit at df 3)
    val boiler = (10000L until 15000L).map(i =>
      (i, (1 to 14).map(k => s"boiler$k").mkString(" ")))
    val groups = (0 until 10).flatMap { g =>
      val text = (1 to 14).map(k => s"g${g}w$k").mkString(" ")
      (0 until 3).map(j => ((g * 3 + j).toLong, text))
    }
    val corpus = (boiler ++ groups).toDF("doc_id", "text")
    try {
      // the rail FIRES: the flood's fingerprint df dwarfs maxDf
      val maxDf = DedupOps.winnowFingerprints(corpus)
        .groupBy("fp").count().agg(max("count")).head().getLong(0)
      assert(maxDf >= 5000L, s"degenerate fingerprint df only $maxDf")
      val railed = DedupOps.winnowSimilarity(corpus, minShared = 1)
        .as[(Long, Long, Long)].collect().toSet
      // small-N oracle: the engine on the corpus WITHOUT the flood
      // (sketches are per-doc, so removal changes nothing else)
      val reference = DedupOps.winnowSimilarity(
        groups.toDF("doc_id", "text"), minShared = 1)
        .as[(Long, Long, Long)].collect().toSet
      assert(railed === reference, "railed pairs must equal the small-N run")
      // surviving pairs are exactly the triplets' 3 pairs each, full
      // sketch overlap, and the flood contributes none
      assert(railed.size === 30)
      assert(railed.forall { case (a, b, _) =>
        a / 3 == b / 3 && a < 10000 && b < 10000 })
    } finally DedupOps.releaseCaches()
  }

  // ---- e7: maxCell Voronoi-cell rail --------------------------------------

  private def unit(dim: Int, seedV: Int): Array[Float] = {
    val rnd = new scala.util.Random(seedV)
    val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  test("e7 maxCell binds on a 3000-member mega-cell; members keep, small cells exact") {
    val dim = 16
    // ids 0..499: diverse unit vectors, with ids 100..179 forming 40 exact
    // twin pairs (the genuine near-dup content in SMALL cells);
    // ids 1000..3999: the mega-cell — near-identical jittered copies of
    // the axis vector, exactly the corpus shape SemDeDup targets
    val axis = Array.tabulate(dim)(i => if (i == 0) 1f else 0f)
    val diverse = (0L until 500L).map { i =>
      val v = if (i >= 100 && i < 180) unit(dim, 5000 + ((i - 100) / 2).toInt)
        else unit(dim, i.toInt)
      (i, v)
    }
    val mega = (1000L until 4000L).map { i =>
      val j = (i % 97).toFloat / 97000f
      (i, axis.zipWithIndex.map { case (x, d) => if (d == 1) x + j else x })
    }
    val emb = (Seq((998L, axis)) ++ diverse ++ mega).toDF("vec_id", "embedding")
    try {
      val idx = SimilarityOps.ivfBuild(emb, nCells = 16, iterations = 2)
      val cellSizes = idx.cells.groupBy("cell").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val megaCells = cellSizes.filter(_._2 > 256).keySet
      // the rail FIRES: the jittered copies collapse into oversize cells
      assert(megaCells.nonEmpty, s"no cell above maxCell: $cellSizes")
      assert(cellSizes.filter(_._2 > 256).values.sum >= 3000L)

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long, Double, Boolean)].collect().toSet
      val railed = rows(SimilarityOps.semanticDedup(idx, 0.95, maxCell = 256))
      DedupOps.releaseCaches()
      // no vector disappears, and every mega-cell member degrades to a
      // singleton keep (its own group, kept)
      assert(railed.size === 3501)
      val megaRows = railed.filter(r => megaCells.contains(r._2.toInt))
      assert(megaRows.size >= 3000)
      assert(megaRows.forall(r => r._5 && r._3 == r._1),
        "mega-cell members must be singleton keeps, never dropped")
      // small-N oracle: the engine on the index RESTRICTED to small cells,
      // with the rail effectively off — must match the railed run row-wise
      val smallIdx = SimilarityOps.IvfIndex(idx.centroids,
        idx.cells.filter(!col("cell").isin(megaCells.toSeq: _*)))
      val reference = rows(SimilarityOps.semanticDedup(smallIdx, 0.95, maxCell = 1000000))
      assert(railed.filterNot(r => megaCells.contains(r._2.toInt)) === reference,
        "small-cell rows must equal the unrailed small-N run")
      // the genuine twin pairs were actually found (keeper + dropped member)
      val dropped = reference.count(!_._5)
      assert(dropped >= 30, s"expected the twin content to dedup, got $dropped drops")
    } finally DedupOps.releaseCaches()
  }

  // ---- d8b: combined-population maxCell rail ------------------------------

  test("d8b combined-population maxCell binds; screened collisions equal the small-N run") {
    val dim = 16
    val axis = Array.tabulate(dim)(i => if (i == 0) 1f else 0f)
    val diverse = (0L until 400L).map(i => (i, unit(dim, i.toInt)))
    val mega = (1000L until 4000L).map { i =>
      val j = (i % 89).toFloat / 89000f
      (i, axis.zipWithIndex.map { case (x, d) => if (d == 1) x + j else x })
    }
    val emb = (Seq((998L, axis)) ++ diverse ++ mega).toDF("vec_id", "embedding")
    // benchmark: copies of two DIVERSE corpus vectors (must be flagged)
    // plus one mega-cell paraphrase (rail-suppressed, documented behavior)
    val bench = Seq(
      (9001L, unit(dim, 7)), (9002L, unit(dim, 13)), (9003L, axis))
      .toDF("vec_id", "embedding")
    try {
      val idx = SimilarityOps.ivfBuild(emb, nCells = 16, iterations = 2)
      val megaCells = idx.cells.groupBy("cell").agg(count(lit(1)).as("n"))
        .filter(col("n") > 256).select("cell").as[Int].collect().toSet
      assert(megaCells.nonEmpty, "rail precondition: a mega-cell exists")

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Double)].collect().toSet
      val railed = rows(SimilarityOps.semanticContamination(idx, bench, 0.99))
      // diverse-cell contamination is caught...
      assert(railed.map(_._1).intersect(Set(7L, 13L)) === Set(7L, 13L),
        s"diverse collisions must be flagged, got $railed")
      // ...and nothing from the suppressed mega-cells leaks past the rail
      val cellOf = idx.cells.select("vec_id", "cell")
        .as[(Long, Int)].collect().toMap
      assert(railed.forall(r => !megaCells.contains(cellOf(r._1))))
      // small-N oracle: identical collisions from the small-cell index
      val smallIdx = SimilarityOps.IvfIndex(idx.centroids,
        idx.cells.filter(!col("cell").isin(megaCells.toSeq: _*)))
      val reference = rows(SimilarityOps.semanticContamination(
        smallIdx, bench, 0.99, maxCell = 1000000))
      assert(railed === reference)
    } finally DedupOps.releaseCaches()
  }

  // ---- d9: df cap — spans split at a pruned seed, never lost --------------

  test("d9 df cap binds on a 5000-doc boilerplate seed; the long span splits, not lost") {
    // span of 20 words shared verbatim between docs A and B, with words
    // 8-12 a boilerplate 5-gram that also appears in 5000 other docs —
    // its seed's df blows past maxDf=100, so the island must SPLIT at
    // that one seed window while both flanks survive
    val span = ((1 to 7).map(i => s"u$i") ++ (1 to 5).map(i => s"b$i") ++
      (13 to 20).map(i => s"u$i")).mkString(" ")
    val a = s"preA1 preA2 $span postA"
    val b = s"$span postB1 postB2"
    val boiler = (100L until 5100L).map(i =>
      (i, s"noise${i}a noise${i}b b1 b2 b3 b4 b5 tail${i}"))
    val corpus = (Seq((1L, a), (2L, b)) ++ boiler).toDF("doc_id", "text")
    try {
      // the rail FIRES: the boilerplate 5-gram's df is 5002
      val seeds = DedupOps.positionalSeeds(corpus)
      val hotDf = seeds.groupBy("kh").agg(count(lit(1)).as("df"))
        .agg(max("df")).head().getLong(0)
      assert(hotDf >= 5002L, s"hot seed df only $hotDf")

      def spansAB(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("id_a") === 1L && col("id_b") === 2L)
          .select("start_a", "start_b", "span_len")
          .as[(Long, Long, Long)].collect().toSeq.sorted
      // unrailed small-N reference: docs A and B alone — the boilerplate
      // seed's df is 2 there, so the FULL 20-word span reports
      val full = spansAB(DedupOps.duplicatedSpans(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text")))
      assert(full.size === 1 && full.head._3 === 20L, s"reference span: $full")
      val (fullStart, _, fullLen) = full.head

      val railed = spansAB(DedupOps.duplicatedSpans(corpus))
      assert(railed.size === 2, s"expected the span to SPLIT in two, got $railed")
      // island arithmetic: seed windows 1-16 of the span lose exactly the
      // boilerplate window (span words 8-12), so the flanks carry windows
      // 1-7 (span_len 7+4=11) and 9-16 (span_len 8+4=12)
      assert(railed.map(_._3) === Seq(11L, 12L), s"flank lengths: $railed")
      // split, not lost: the two flanks' word ranges cover the entire
      // original span (the pruned window's words survive in both flanks)
      val covered = railed.flatMap { case (sa, _, len) => sa until sa + len }.toSet
      assert(covered === (fullStart until fullStart + fullLen).toSet,
        "the flanks must cover every word of the unrailed span")
      // and the boilerplate swarm itself reports no spans at all (single
      // shared seed < minSpan even unrailed — the rail just keeps its
      // 12.5M-pair match front from existing)
      assert(DedupOps.duplicatedSpans(corpus)
        .filter(col("id_a") >= 100L).count() === 0L)
    } finally DedupOps.releaseCaches()
  }

  // ---- d10: Bloom FPR at the capacity boundary ----------------------------

  test("d10 FPR tracks its analytic design point up to and past filter capacity") {
    val sizing = BloomSizing.Default
    val capacity = sizing.capacityAt(0.01)
    assert(capacity > 15000L && capacity < 30000L, s"default capacity $capacity")
    def keyDocs(from: Long, n: Long, tag: String) =
      (from until from + n).map(i => (i, s"$tag soak key $i body ${i * 2654435761L}"))
        .toDF("doc_id", "text")
    val probes = keyDocs(9000000L, 5000, "probe")
    // just under capacity, and 2× over it: measured FPR must track the
    // analytic fprAt(n) in BOTH regimes (the filter degrades exactly as
    // designed, no cliff), and the health warning flips exactly once
    val under = (capacity * 0.95).toLong
    val over = capacity * 2
    for ((n, expectWarn) <- Seq((under, false), (over, true))) {
      val bits = DedupOps.bloomBuild(keyDocs(0L, n, "corpus"), sizing)
      val theory = sizing.fprAt(n)
      val hits = DedupOps.bloomScreen(probes, bits, sizing)
        .collect().count(_.getBoolean(1))
      val measured = hits.toDouble / 5000
      info(f"n=$n%d (capacity=$capacity%d): theory=$theory%.4f measured=$measured%.4f")
      assert(measured <= theory * 1.6 + 0.002 && measured >= theory * 0.5 - 0.002,
        s"n=$n: measured $measured far from design point $theory")
      assert(DedupOps.bloomHealthWarning(bits, sizing).isDefined === expectWarn,
        s"n=$n: health warning expected=$expectWarn")
      // the no-false-negative guarantee holds even past capacity
      val members = DedupOps.bloomScreen(
        keyDocs(0L, math.min(n, 3000L), "corpus"), bits, sizing)
        .collect().map(_.getBoolean(1))
      assert(members.forall(identity), s"n=$n: member missed")
    }
  }
}
