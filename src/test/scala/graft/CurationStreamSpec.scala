package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._

import graft.llm.{CurationOps, DedupOps, SimilarityOps}
import graft.streaming.{CurationStream, DedupStream, VectorStream}

/** The dual-tier admission service (VERDICT r13 item 1): one call screens
  * an increment against BOTH maintained tiers and commits both, and the
  * cross-tier crash window — text tier committed, vector tier not — must
  * replay idempotently with a verdict equal to the batch c2b composition
  * (the oracle-checked reference answer). */
/** Shared driver-side print helpers for the curation-stream suites (the
  * suite is split in two so forked test groups can run the media-rung
  * half concurrently with the text/core half — same tests, same
  * assertions, two JVMs). */
trait CurationStreamHelpers extends SparkSpec {
  /** Driver-side generative frame print: frame `fno` of a length-`l`
    * clip through the REAL PNG round-trip + aHash. */
  protected def framePrintOf(l: Int, fno: Int = 0): (Long, Long) =
    graft.llm.MultimodalOps.aHash(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(
        graft.llm.MultimodalOps.VideoGen.framePng(l.toLong, fno))))

  protected def ham64(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
}

class CurationStreamSpec extends CurationStreamHelpers {
  import spark.implicits._

  /** The StreamingSpec c2-parity fixture, shared verbatim: corpus docs
    * 1–2 + vectors on distinct axes; increment 401–405 exercising every
    * verdict class (near_dup, span_dup, contaminated, semantic_dup,
    * admitted). */
  private val span = (1 to 10).map(i => s"s$i").mkString(" ")
  private val corpusDocs = Seq(
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"),
    (2L, (1 to 20).map(i => s"c$i").mkString(" ") + " " + span + " " +
      (21 to 40).map(i => s"c$i").mkString(" ")))
  private val corpusEmb = Seq(
    (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
  private val increment = Seq(
    (401L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo zulu"),
    (402L, (1 to 15).map(i => s"x$i").mkString(" ") + " " + span + " " +
      (16 to 30).map(i => s"x$i").mkString(" ")),
    (403L, "noise one two three alpha beta gamma delta more noise tail"),
    (404L, "tiny junk words"),
    (405L, (1 to 60).map(i => s"the w$i").mkString(" ")))
  private val incEmb = Seq(
    (401L, Array(0f, 0f, 1f, 0f)), (402L, Array(0f, 0f, 0f, 1f)),
    (403L, Array(0f, 0f, -1f, 0f)), (404L, Array(0.999f, 0.01f, 0f, 0f)),
    (405L, Array(0f, 0f, 0f, -1f)))
  private val benchRows = Seq((50L, "alpha beta gamma delta benchmark probe words here"))


  /** True iff EVERY sampled ordinal's frames sit > Hamming 3 apart —
    * the guard a "must be admitted" video-id fixture doc needs now that
    * both the keyframe rung and the shot-level rung screen it. */
  private def framesFarAll(la: Int, lb: Int): Boolean = {
    val (nfa, nfb) = (2 + la % 3, 2 + lb % 3)
    (0 until 4).forall { i =>
      ham64(framePrintOf(la, i * nfa / 4), framePrintOf(lb, i * nfb / 4)) > 3
    }
  }

  private def seedTiers(tmp: String): Unit = {
    DedupStream.admitBatch(corpusDocs.toDF("doc_id", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      corpusEmb.toDF("vec_id", "embedding"), nCells = 2, iterations = 2)
  }

  /** The reference answer: the batch c2b composition over explicitly
    * built corpus state — what the oracle checks for the registered
    * query, rebuilt here from scratch (no streaming state involved). */
  private def batchC2b(): Seq[(Long, String, Option[Long], Double)] = {
    val corpus = corpusDocs.toDF("doc_id", "text")
    val inc = increment.toDF("doc_id", "text")
    val corpusSh = DedupOps.shingleArrays(corpus)
    val out = CurationOps.admitIncrement(inc,
      DedupOps.incrementalNearDups(DedupOps.shingleArrays(inc), corpusSh,
        DedupOps.bandIndex(DedupOps.signaturesFromShingleArrays(corpusSh)), 0.5),
      {
        val cs = DedupOps.positionalSeeds(corpus)
        DedupOps.incrementalSpans(inc, cs, DedupOps.seedStats(cs))
      },
      DedupOps.contaminationHits(inc, benchRows.toDF("doc_id", "text"), 4, 1),
      semPairs = Some(SimilarityOps.semanticScreen(
        SimilarityOps.ivfBuild(corpusEmb.toDF("vec_id", "embedding"), 2, 2),
        incEmb.toDF("vec_id", "embedding"), 0.9)))
      .as[(Long, String, Option[Long], Double)].collect().toSeq
    DedupOps.releaseCaches()
    out
  }

  private def verdictRows(tmp: String): Seq[(Long, String, Option[Long], Double)] =
    CurationStream.verdictLog(spark, s"$tmp/out")
      .as[(Long, String, Option[Long], Double)].collect().toSeq

  test("crash between tiers replays idempotently with a verdict equal to batch c2b") {
    val tmp = Files.createTempDirectory("graft_curation").toString
    seedTiers(tmp)
    val expected = batchC2b()
    assert(expected.map(r => (r._1, r._2)) === Seq(
      401L -> "near_dup", 402L -> "span_dup", 403L -> "contaminated",
      404L -> "semantic_dup", 405L -> "admitted"),
      "fixture sanity: every verdict class exercised")
    val docs = increment.toDF("doc_id", "text")
    val vecs = incEmb.toDF("vec_id", "embedding")
    val bench = benchRows.toDF("doc_id", "text")

    // ---- attempt 1: crash BETWEEN the tiers ---------------------------
    intercept[CurationStream.CrashBetweenTiers] {
      CurationStream.admitBatchImpl(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
        s"$tmp/out", bench, 0.5, 0.9, 0.5, 4, 1, "cur", 256,
        DedupOps.BloomSizing.Default, failAfterTextTier = true)
    }
    // text tier committed the admitted doc; vector tier did NOT — and the
    // dual-tier metrics row, written last, must not exist yet (a present
    // row implies both tiers committed)
    assert(!new java.io.File(s"$tmp/out/metrics/batch=cur-1").exists(),
      "metrics must be absent after a crash between the tiers")
    assert(DedupStream.corpusShingles(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 405L),
      "text tier must hold seed + admitted docs after the crash")
    assert(VectorStream.corpusCells(spark, s"$tmp/vec")
      .select("vec_id").as[Long].collect().toSet === Set(1L, 2L),
      "vector tier must be untouched by the crashed attempt")
    // the crashed attempt's verdict is already the reference answer
    assert(verdictRows(tmp) === expected)

    // ---- attempt 2: full replay ---------------------------------------
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "cur")
    // verdict STABLE across the replay despite the text tier's committed
    // state (the own-batch exclusion: 405's shingles/seeds cannot flip it)
    assert(verdictRows(tmp) === expected)
    // both tiers now committed, exactly once
    val shingleRows = DedupStream.corpusShingles(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSeq
    assert(shingleRows.sorted === Seq(1L, 2L, 405L),
      "no double-indexed doc after replay over the committed text tier")
    assert(VectorStream.corpusCells(spark, s"$tmp/vec")
      .select("vec_id").as[Long].collect().toSet === Set(1L, 2L, 405L))
    assert(spark.read.parquet(s"$tmp/out/text/kept")
      .select("doc_id").as[Long].collect().toSeq === Seq(405L))
    // the dual-tier metrics row reports the VERDICT-level reject counts
    // (the per-tier metrics see only the admitted subset)
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(2) === 5L && m.getLong(3) === 1L,
      s"n_in=5, n_admitted=1: $m")
    // one reject per firing class; 404's low_quality is OUTRANKED by its
    // semantic_dup verdict, so n_low_quality is 0; the text-only fixture
    // never fires the media rungs (nor the shift/tile rungs). Read BY
    // NAME — a positional read broke on the r19 AND r20 schema growth.
    val rejectCols = Seq("n_near_dup", "n_span_dup", "n_semantic_dup",
      "n_image_dup", "n_image_shift_dup", "n_audio_dup", "n_audio_near_dup",
      "n_audio_shift_dup", "n_video_dup", "n_video_near_dup",
      "n_video_shift_dup", "n_contaminated", "n_low_quality")
    assert(rejectCols.map(n => m.getLong(m.fieldIndex(n))) ===
      Seq(1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 0L),
      m.toString)

    // ---- attempt 3: replay after FULL commit stays a no-op rewrite ----
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "cur")
    assert(verdictRows(tmp) === expected)
    assert(DedupStream.corpusShingles(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSeq.sorted === Seq(1L, 2L, 405L))
    assert(VectorStream.corpusCells(spark, s"$tmp/vec")
      .select("vec_id").as[Long].collect().toSet === Set(1L, 2L, 405L))

    // ---- the committed state SERVES: a near-dup of 405 in the next
    // batch is rejected by the state this batch committed ---------------
    CurationStream.admitBatch(
      Seq((501L, (1 to 60).map(i => s"the w$i").mkString(" ") + " coda"))
        .toDF("doc_id", "text"),
      Seq((501L, Array(0f, 1f, 1f, 0f))).toDF("vec_id", "embedding"),
      2L, s"$tmp/text", s"$tmp/vec", s"$tmp/out", bench, lineage = "cur")
    val next = CurationStream.verdictLog(spark, s"$tmp/out")
      .filter(col("doc_id") === 501L)
      .select("verdict").as[String].head()
    assert(next === "near_dup", s"501 duplicates committed 405, got $next")
  }

  test("advisory dual-tier verdicts match the committed composition (one call, both tiers)") {
    val tmp = Files.createTempDirectory("graft_curation_adv").toString
    seedTiers(tmp)
    val advisory = CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec",
      increment.toDF("doc_id", "text"), incEmb.toDF("vec_id", "embedding"),
      benchRows.toDF("doc_id", "text"))
      .as[(Long, String, Option[Long], Double)].collect().toSeq
    DedupOps.releaseCaches()
    assert(advisory === batchC2b())
    // the read-only half of the mediaconf discipline: an ADVISORY call
    // with a mismatched lens/rung must fail fast too — it would screen
    // against sides this index never maintained (empty reads, silent
    // recall loss), never stamp anything
    val ex = intercept[IllegalArgumentException] {
      CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec",
        increment.toDF("doc_id", "text"), incEmb.toDF("vec_id", "embedding"),
        benchRows.toDF("doc_id", "text"),
        imageLens = DedupStream.BothLens)
    }
    assert(ex.getMessage.contains("never maintained"), ex.getMessage)
  }

  test("the span rung serves from the configured index: sketch equals seeds on ≥ 8-word overlap") {
    val tmp = Files.createTempDirectory("graft_curation_rung").toString
    seedTiers(tmp)
    // the documented index-size tradeoff, MEASURED instead of prose: the
    // winnow sketch side is ~1/w the positional seed side the seeds rung
    // reads (both maintained off one hash evaluation at admission)
    val seedRows = DedupStream.corpusSeeds(spark, s"$tmp/text").count()
    val fpRows = DedupStream.corpusWinnowFps(spark, s"$tmp/text").count()
    assert(fpRows < seedRows, s"sketch side $fpRows must be < seed side $seedRows")
    val docs = increment.toDF("doc_id", "text")
    val vecs = incEmb.toDF("vec_id", "embedding")
    val bench = benchRows.toDF("doc_id", "text")
    // the fixture's span_dup doc (402) carries a 10-word verbatim span —
    // ≥ SeedK + WinnowW − 1 = 8 words, the bound at which the sketch is
    // FORCED to share a fingerprint: both rungs must produce the same
    // verdict for every doc, witness included
    def adv(rung: DedupStream.SpanRung) =
      CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec", docs, vecs,
        bench, spanRung = rung)
        .as[(Long, String, Option[Long], Double)].collect().toSeq
    val viaSeeds = adv(DedupStream.SeedsRung)
    val viaSketch = adv(DedupStream.SketchRung)
    DedupOps.releaseCaches()
    assert(viaSeeds === viaSketch)
    assert(viaSeeds.find(_._1 == 402L).map(_._2) === Some("span_dup"))
    // the COMMITTED path under the sketch rung: same verdicts, and the
    // replay — whose previous attempt already appended this batch's own
    // winnowfps rows — stays stable via the own-batch exclusion
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "rung",
      spanRung = DedupStream.SketchRung)
    assert(verdictRows(tmp) === viaSeeds)
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "rung",
      spanRung = DedupStream.SketchRung)
    assert(verdictRows(tmp) === viaSeeds)
    DedupOps.releaseCaches()
  }

  test("the sketch rung's minShared=1 precision asymmetry: a shared 5-word phrase diverges from the seeds rung (accepted)") {
    // the FALSE-POSITIVE direction of minShared = 1 (r16 advice): one
    // shared fingerprint only proves one shared SELECTED k-gram (SeedK =
    // 5 words), not the ≥ 8-word overlap the seeds rung requires — so a
    // short shared phrase, when winnowing happens to select its k-gram
    // in both docs, rejects span_dup under SketchRung where SeedsRung
    // admits. The divergence is ACCEPTED and documented (the SpanRung
    // scaladoc); this test pins its existence and direction.
    val tmp = Files.createTempDirectory("graft_curation_asym").toString
    def textOfLen(tag: String, len: Int, insert: String): String = {
      val sb = new StringBuilder(tag)
      if (insert.nonEmpty) sb.append(" ").append(insert)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      sb.append(" ").append("z" * (len - sb.length - 1))
      sb.toString
    }
    // search phrase variants until winnowing SELECTS the shared k-gram
    // in both surroundings (selection depends on neighboring hashes —
    // each variant has ~a-few-in-ten odds per doc, so a handful of
    // candidates always lands one); the seeds screen must stay empty for
    // EVERY variant (5 shared words can never reach an 8-word span)
    val hit = (1 to 40).iterator.map { i =>
      val phrase = s"qa$i qb$i qc$i qd$i qe$i"
      val corpus = Seq((1L, textOfLen("corp", 400, phrase))).toDF("doc_id", "text")
      val inc = Seq((401L, textOfLen("incr", 450, phrase))).toDF("doc_id", "text")
      val seeds = DedupOps.positionalSeeds(corpus)
      val spans = DedupOps.incrementalSpans(inc, seeds,
        DedupOps.seedStats(seeds), k = DedupStream.SeedK).count()
      assert(spans === 0L,
        s"a 5-word phrase must never form a span (variant $i)")
      val sketch = DedupOps.winnowScreen(
        DedupOps.winnowFingerprints(corpus, DedupStream.SeedK, DedupStream.WinnowW),
        inc, k = DedupStream.SeedK, w = DedupStream.WinnowW,
        minShared = 1).count()
      DedupOps.releaseCaches()
      (i, phrase, sketch)
    }.find(_._3 > 0L)
    assert(hit.isDefined,
      "fixture search: no variant's shared k-gram was winnow-selected in both docs")
    val (_, phrase, _) = hit.get
    // the rung-level divergence, end to end: same increment, same index,
    // opposite verdicts under the two configured rungs
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    DedupStream.admitBatch(
      Seq((1L, textOfLen("corp", 400, phrase))).toDF("doc_id", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val docs = Seq((401L, textOfLen("incr", 450, phrase))).toDF("doc_id", "text")
    val vecs = Seq((401L, e(2))).toDF("vec_id", "embedding")
    def verdictUnder(rung: DedupStream.SpanRung): String =
      CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec", docs, vecs,
        bench, spanRung = rung).select("verdict").as[String].head()
    assert(verdictUnder(DedupStream.SeedsRung) === "admitted",
      "the seeds rung needs a ≥ 8-word span and must admit")
    assert(verdictUnder(DedupStream.SketchRung) === "span_dup",
      "the sketch rung's k-gram-level evidence rejects — the documented asymmetry")
    DedupOps.releaseCaches()
  }

  test("a media feed's image rung rejects a corpus-image recycler (c6 streaming)") {
    val tmp = Files.createTempDirectory("graft_curation_img").toString
    // the fixture image depends only on text LENGTH: every text below is
    // built so lengths pair up exactly (398/398 and 406/406) while the
    // WORDS stay disjoint — fresh text, recycled image, the case the
    // image rung exists for (cross-length fingerprints sit at Hamming 32;
    // ~101 tokens half of them stopwords keeps quality_score ≈ 0.75)
    def shaped(prefix: String, tag: String, n: Int) =
      s"$prefix " + (1 to n).map(k => s"the $tag$k").mkString(" ")
    val corpusText = shaped("imgseed", "a", 50)    // len 398
    val recycler = shaped("recycle", "b", 50)      // len 398 — same image
    val fresh402 = shaped("fresh02", "c", 51)      // len 406
    val again403 = shaped("again03", "d", 51)      // len 406 — dups 402's
    assert(corpusText.length === recycler.length)
    assert(fresh402.length === again403.length)
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // corpus admitted WITH the media envelope → fingerprint side written
    DedupStream.admitBatch(
      Seq((1L, "src", corpusText)).toDF("doc_id", "source", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val docs = Seq((401L, "src", recycler), (402L, "src", fresh402))
      .toDF("doc_id", "source", "text")
    val vecs = Seq((401L, e(2)), (402L, e(3))).toDF("vec_id", "embedding")
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "img")
    def verdictOf(id: Long) = CurationStream.verdictLog(spark, s"$tmp/out")
      .filter(col("doc_id") === id)
      .select("verdict", "detail_id").as[(String, Option[Long])].head()
    // 401's TEXT is fresh (no shared shingle/span) but its IMAGE is the
    // corpus doc's: the image rung rejects it, witness = the corpus copy
    assert(verdictOf(401L) === ("image_dup", Some(1L)))
    assert(verdictOf(402L) === ("admitted", None))
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_image_dup")) === 1L, m.toString)
    // replay over the committed state: 402's own fingerprint now sits in
    // the side, and the id-level self-exclusion keeps the verdict stable
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "img")
    assert(verdictOf(401L) === ("image_dup", Some(1L)))
    assert(verdictOf(402L) === ("admitted", None))
    // the ADMITTED doc's fingerprint serves the next batch: 403 recycles
    // 402's image under fresh text and is rejected against it; the
    // REJECTED 401's fingerprint was never indexed
    CurationStream.admitBatch(
      Seq((403L, "src", again403)).toDF("doc_id", "source", "text"),
      Seq((403L, e(4))).toDF("vec_id", "embedding"),
      2L, s"$tmp/text", s"$tmp/vec", s"$tmp/out", bench, lineage = "img")
    assert(verdictOf(403L) === ("image_dup", Some(402L)))
    DedupOps.releaseCaches()
  }

  test("a media feed's audio rung rejects a clip recycler; image precedence holds (c6b streaming)") {
    val tmp = Files.createTempDirectory("graft_curation_aud").toString
    // fixture audio depends only on text LENGTH (like the image): the
    // corpus doc and both recyclers share len 398 with disjoint WORDS.
    // 404 is a VIDEO id (no image fingerprint), so the audio rung is the
    // one that catches its recycled clip; 401 is a non-video id whose
    // identical length trips image AND audio — precedence reports image.
    def shaped(prefix: String, tag: String, n: Int) =
      s"$prefix " + (1 to n).map(k => s"the $tag$k").mkString(" ")
    val corpusText = shaped("audseed", "a", 50)    // len 398
    val vidRecycler = shaped("vidclip", "v", 50)   // len 398, video id
    val imgRecycler = shaped("recycle", "b", 50)   // len 398, image id
    val fresh = shaped("fresh02", "c", 51)         // len 406
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    DedupStream.admitBatch(
      Seq((1L, "src", corpusText)).toDF("doc_id", "source", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val docs = Seq((404L, "src", vidRecycler), (401L, "src", imgRecycler),
      (402L, "src", fresh)).toDF("doc_id", "source", "text")
    val vecs = Seq((404L, e(2)), (401L, e(3)), (402L, e(4)))
      .toDF("vec_id", "embedding")
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "aud")
    def verdictOf(id: Long) = CurationStream.verdictLog(spark, s"$tmp/out")
      .filter(col("doc_id") === id)
      .select("verdict", "detail_id").as[(String, Option[Long])].head()
    assert(verdictOf(404L) === ("audio_dup", Some(1L)))
    assert(verdictOf(401L) === ("image_dup", Some(1L)),
      "image precedence over the co-firing audio rung")
    assert(verdictOf(402L) === ("admitted", None))
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_audio_dup")) === 1L, m.toString)
    assert(m.getLong(m.fieldIndex("n_image_dup")) === 1L, m.toString)
    // replay: the admitted 402's own audio fingerprint now sits in the
    // side; id-level self-exclusion keeps every verdict stable
    CurationStream.admitBatch(docs, vecs, 1L, s"$tmp/text", s"$tmp/vec",
      s"$tmp/out", bench, lineage = "aud")
    assert(verdictOf(404L) === ("audio_dup", Some(1L)))
    assert(verdictOf(402L) === ("admitted", None))
    // the ADMITTED doc's clip serves the next batch: a video-id doc
    // recycling 402's audio is rejected against it; the REJECTED 404's
    // clip was never indexed
    CurationStream.admitBatch(
      Seq((408L, "src", shaped("vidnext", "w", 51)))
        .toDF("doc_id", "source", "text"),
      Seq((408L, e(5))).toDF("vec_id", "embedding"),
      2L, s"$tmp/text", s"$tmp/vec", s"$tmp/out", bench, lineage = "aud")
    assert(verdictOf(408L) === ("audio_dup", Some(402L)))
    // the maintained side holds exactly the admitted docs' clips
    assert(DedupStream.corpusAudioHashes(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 402L))
    DedupOps.releaseCaches()
  }

  test("the perceptual audio rung rejects a re-encoded clip across microbatches (audio_near_dup, start)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_curation_audfp").toString
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen}
    // the generative formula evaluated driver-side (the same arithmetic
    // the decoder round-trips out of real WAV bytes): per text length,
    // the clip's acoustic print and its PCM content hash
    def samplesOf(l: Int): Array[Int] = {
      val (ch, nf) = AudioGen.params(l.toLong)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l.toLong, i.toLong))
    }
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val band = 350 to 520
    val prints = band.map(l => l -> MultimodalOps.acousticFingerprint(samplesOf(l))).toMap
    val hashes = band.map(l => l -> AudioDecoder.pcmHashOfSamples(samplesOf(l))).toMap
    // the RE-ENCODED-CLIP analog inside the generative fixture: two text
    // lengths whose clips have DIFFERENT PCM content (the exact rung is
    // blind) but near-identical energy contours (prints within Hamming 3
    // — the perceptual rung's catch); sf0.01 carries thousands of such
    // cross-length pairs, so the band search always lands one
    val pair = (for {
      la <- band.iterator
      lb <- band.iterator if lb > la
      if hamming(prints(la), prints(lb)) <= 3 && hashes(la) != hashes(lb)
    } yield (la, lb)).nextOption()
    assert(pair.isDefined, "fixture search: no near-print length pair in band")
    val (lenA, lenB) = pair.get
    // a seed length acoustically FAR from both (the witness must be the
    // microbatch-1 admission, not the seed) with a distinct content
    // hash, AND every sampled frame print far from the microbatch-1
    // clip's (all fixture ids are video ids, so the keyframe AND
    // shot-level video rungs also screen them — any near frame would
    // reject 404 before it could be admitted)
    val lenC = band.find(l => l != lenA && l != lenB &&
      hamming(prints(l), prints(lenA)) > 3 &&
      hamming(prints(l), prints(lenB)) > 3 &&
      framesFarAll(l, lenA) &&
      hashes(l) != hashes(lenA) && hashes(l) != hashes(lenB)).get
    // exact-length text with the quality shape (~half stopwords) and
    // DISJOINT words per tag — no text rung can fire
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
    // every doc id here is a VIDEO id (no image fingerprint exists), so
    // the audio tiers are the only modality rungs in play — the c6b trick
    DedupStream.admitBatch(
      Seq((8L, "src", textOfLen("seed", lenC))).toDF("doc_id", "source", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((8L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Array[Float])]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "source", "text", "embedding"),
      s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench)
    try {
      // microbatch 1: a fresh clip, acoustically far from the seed —
      // admitted, and its print lands on the audiofps side
      stream.addData((404L, "src", textOfLen("orig", lenA), e(2)))
      q.processAllAvailable()
      // microbatch 2: the re-encoded recycler — fresh text, fresh
      // embedding, DIFFERENT pcm_hash (the exact rung passes it), but
      // its energy contour matches the clip microbatch 1 committed: the
      // perceptual rung must reject it off the MAINTAINED side, across
      // the microbatch boundary
      stream.addData((408L, "src", textOfLen("redo", lenB), e(3)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = CurationStream.verdictLog(spark, s"$tmp/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(verdicts === Map(
      404L -> ("admitted", None),
      408L -> ("audio_near_dup", Some(404L))), verdicts.toString)
    // the metrics row names the new class
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_audio_near_dup")) === 1L, m.toString)
    // only ADMITTED clips' prints sit on the side — the rejected
    // recycler's never landed
    assert(DedupStream.corpusAudioFps(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(8L, 404L))
    DedupOps.releaseCaches()
  }

  test("the video rung rejects a keyframe recycler across microbatches (video_dup, start)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_curation_vid").toString
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, VideoGen}
    // driver-side generative evaluations: keyframe print (frame 0 through
    // the REAL PNG round-trip + aHash), acoustic print and PCM hash
    def kfOf(l: Int): (Long, Long) = MultimodalOps.aHash(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        VideoGen.framePng(l.toLong, 0))))
    def samplesOf(l: Int): Array[Int] = {
      val (ch, nf) = AudioGen.params(l.toLong)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l.toLong, i.toLong))
    }
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // the KEYFRAME-RECYCLER analog inside the generative fixture: lenB =
    // lenA + 48k keeps the frame dims identical (both dim formulas have
    // period 48) and shifts every pixel by a near-constant, which the
    // mean-relative aHash mostly cancels — keyframe prints land within
    // Hamming 3 — while the AUDIO diverges (sample count moves by
    // (48k·13) mod 600): different pcm_hash, acoustic prints far. The
    // video rung is then the ONLY rung that can see the recycling.
    val cand = (for {
      lenA <- (350 to 480).iterator
      k <- (1 to 6).iterator
      lenB = lenA + 48 * k
      if hamming(kfOf(lenA), kfOf(lenB)) <= 3
      if hamming(MultimodalOps.acousticFingerprint(samplesOf(lenA)),
        MultimodalOps.acousticFingerprint(samplesOf(lenB))) > 3
      if AudioDecoder.pcmHashOfSamples(samplesOf(lenA)) !=
        AudioDecoder.pcmHashOfSamples(samplesOf(lenB))
    } yield (lenA, lenB)).nextOption()
    assert(cand.isDefined, "fixture search: no keyframe-near/audio-far pair")
    val (lenA, lenB) = cand.get
    // a seed length FAR from both on EVERY print family — every sampled
    // ordinal, not just the keyframe, now that the shot-level rung also
    // screens these ids — and hash-distinct
    val lenC = (350 to 600).find(l => l != lenA && l != lenB &&
      framesFarAll(l, lenA) && framesFarAll(l, lenB) &&
      hamming(MultimodalOps.acousticFingerprint(samplesOf(l)),
        MultimodalOps.acousticFingerprint(samplesOf(lenA))) > 3 &&
      hamming(MultimodalOps.acousticFingerprint(samplesOf(l)),
        MultimodalOps.acousticFingerprint(samplesOf(lenB))) > 3 &&
      AudioDecoder.pcmHashOfSamples(samplesOf(l)) !=
        AudioDecoder.pcmHashOfSamples(samplesOf(lenA)) &&
      AudioDecoder.pcmHashOfSamples(samplesOf(l)) !=
        AudioDecoder.pcmHashOfSamples(samplesOf(lenB))).get
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
    // every doc id is a VIDEO id: no image prints exist, the audio rungs
    // are silenced by the search, and the video rung carries the catch
    DedupStream.admitBatch(
      Seq((8L, "src", textOfLen("seed", lenC))).toDF("doc_id", "source", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((8L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Array[Float])]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "source", "text", "embedding"),
      s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench)
    try {
      // microbatch 1: a fresh clip, far from the seed on every print
      // family — admitted; its keyframe print lands on the twelfth side
      stream.addData((404L, "src", textOfLen("orig", lenA), e(2)))
      q.processAllAvailable()
      // microbatch 2: the keyframe recycler — fresh text, fresh
      // embedding, fresh AUDIO (different pcm_hash, far acoustic print),
      // but its opening shot matches the clip microbatch 1 committed:
      // the video rung must reject it off the MAINTAINED side, across
      // the microbatch boundary
      stream.addData((408L, "src", textOfLen("redo", lenB), e(3)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = CurationStream.verdictLog(spark, s"$tmp/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(verdicts === Map(
      404L -> ("admitted", None),
      408L -> ("video_dup", Some(404L))), verdicts.toString)
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_video_dup")) === 1L, m.toString)
    // only ADMITTED clips' keyframe prints sit on the side
    assert(DedupStream.corpusVideoHashes(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(8L, 404L))
    DedupOps.releaseCaches()
  }

  test("the shot-level rung rejects a re-edit across microbatches (video_near_dup, start)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_curation_shot").toString
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen}
    def samplesOf(l: Int): Array[Int] = {
      val (ch, nf) = AudioGen.params(l.toLong)
      Array.tabulate(nf * ch)(i => AudioGen.sample(l.toLong, i.toLong))
    }
    def afpOf(l: Int): (Long, Long) =
      MultimodalOps.acousticFingerprint(samplesOf(l))
    def pcmOf(l: Int): Long = AudioDecoder.pcmHashOfSamples(samplesOf(l))
    // the RE-EDIT analog inside the generative fixture: a pair of
    // lengths whose KEYFRAMES are far (the video_dup rung is blind) but
    // some LATER sampled ordinal's frames collide — ordinal i maps to
    // frame i·nf/4 per clip, and differing frame counts can land one
    // clip's later frame on the other's opening footage — while the
    // audio is far on both tiers. Memoized frame prints keep the
    // search driver-cheap.
    val fpMemo = scala.collection.mutable.HashMap.empty[(Int, Int), (Long, Long)]
    def fp(l: Int, fno: Int) = fpMemo.getOrElseUpdate((l, fno), framePrintOf(l, fno))
    def shotNearKeyframeFar(la: Int, lb: Int): Boolean = {
      val (nfa, nfb) = (2 + la % 3, 2 + lb % 3)
      ham64(fp(la, 0), fp(lb, 0)) > 3 &&
        (1 until 4).exists(i =>
          ham64(fp(la, i * nfa / 4), fp(lb, i * nfb / 4)) <= 3)
    }
    val cand = (for {
      la <- (330 to 560).iterator
      lb <- (la + 1 to 560).iterator
      if shotNearKeyframeFar(la, lb)
      if ham64(afpOf(la), afpOf(lb)) > 3 && pcmOf(la) != pcmOf(lb)
    } yield (la, lb)).nextOption()
    assert(cand.isDefined, "fixture search: no shot-near/keyframe-far pair")
    val (lenA, lenB) = cand.get
    val lenC = (330 to 620).find(l => l != lenA && l != lenB &&
      framesFarAll(l, lenA) && framesFarAll(l, lenB) &&
      ham64(afpOf(l), afpOf(lenA)) > 3 && ham64(afpOf(l), afpOf(lenB)) > 3 &&
      pcmOf(l) != pcmOf(lenA) && pcmOf(l) != pcmOf(lenB)).get
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
    DedupStream.admitBatch(
      Seq((8L, "src", textOfLen("seed", lenC))).toDF("doc_id", "source", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((8L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Array[Float])]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "source", "text", "embedding"),
      s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench)
    try {
      stream.addData((404L, "src", textOfLen("orig", lenA), e(2)))
      q.processAllAvailable()
      // the re-edit: fresh text, embedding and audio; its OPENING shot
      // is new (the keyframe rung passes it) but a later sampled
      // ordinal matches footage the microbatch-1 clip kept — the
      // shot-level rung must reject it off the MAINTAINED framehashes
      // side, across the microbatch boundary
      stream.addData((408L, "src", textOfLen("redo", lenB), e(3)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = CurationStream.verdictLog(spark, s"$tmp/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(verdicts === Map(
      404L -> ("admitted", None),
      408L -> ("video_near_dup", Some(404L))), verdicts.toString)
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .filter(col("batch_id") === 1L).head()
    assert(m.getLong(m.fieldIndex("n_video_near_dup")) === 1L, m.toString)
    // only ADMITTED clips' frame prints sit on the side (≤ 4 per clip)
    assert(DedupStream.corpusFrameHashes(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(8L, 404L))
    DedupOps.releaseCaches()
  }

  test("an index stamped under an older side set fails fast: admission and rung screens route through a backfill") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_sidesver").toString
    // a LEGACY (r17–r19) media-config stamp: no sides_version column —
    // the index's earlier batches predate the r20 always-on sides
    Seq(("ahash", false)).toDF("image_lens", "dihedral_rung")
      .coalesce(1).write.parquet(s"$tmp/text/mediaconf")
    // ADMISSION fails fast with the index untouched: further admissions
    // would leave the newer sides partially populated (the mediaconf
    // all-or-nothing discipline applied to side-set growth)
    val e1 = intercept[IllegalArgumentException] {
      DedupStream.admitBatch(
        Seq((1L, "src", "alpha beta gamma delta epsilon zeta"))
          .toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/legacyout", 0.5, "legacy")
    }
    assert(e1.getMessage.contains("side-set version 0"), e1.getMessage)
    assert(e1.getMessage.contains("backfill"), e1.getMessage)
    assert(!new java.io.File(s"$tmp/text/shingles").exists,
      "the failed admission must leave the index untouched")
    // a shift/tile-rung SCREEN fails fast too (the advisory read-only
    // path): the rungs would read sides the pre-upgrade corpus never
    // wrote and silently under-screen forever — the exact failure the
    // r19 advice named
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    val probe = Seq((2L, "src", "some fresh probe words here indeed truly"))
      .toDF("doc_id", "source", "text")
    val probeVecs = Seq((2L, e(2))).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec",
        probe, probeVecs, bench, audioShiftRung = true)
    }
    assert(e2.getMessage.contains("side-set version 0"), e2.getMessage)
    // with the rungs OFF (the default) the advisory path still serves —
    // the older side set only starves the rung screens
    val v = CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec",
      probe, probeVecs, bench)
    assert(v.count() === 1L)
    DedupOps.releaseCaches()
  }

  test("the streaming entry drives the full ladder per microbatch, media envelope intact (start)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_curation_start").toString
    def shaped(prefix: String, tag: String, n: Int) =
      s"$prefix " + (1 to n).map(k => s"the $tag$k").mkString(" ")
    val corpusText = shaped("imgseed", "a", 50)    // len 398
    val recycler = shaped("recycle", "b", 50)      // len 398 — same image
    val fresh402 = shaped("fresh02", "c", 51)      // len 406, fresh image
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    DedupStream.admitBatch(
      Seq((1L, "src", corpusText)).toDF("doc_id", "source", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Array[Float])]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "source", "text", "embedding"),
      s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench)
    try {
      // microbatch 1: an image recycler (fresh text, corpus image) and a
      // genuinely fresh doc — the foreachBatch wiring must carry the
      // media envelope through to the image rung
      stream.addData((401L, "src", recycler, e(2)), (402L, "src", fresh402, e(3)))
      q.processAllAvailable()
      // microbatch 2: a near-dup of the JUST-committed 402 — the state
      // microbatch 1 admitted serves microbatch 2's screens
      stream.addData((403L, "src", fresh402 + " coda", e(4)))
      q.processAllAvailable()
      // microbatch 3: 402's IMAGE recycled under fresh text (same
      // length, disjoint words; 406 dodges the fixture's video modulus)
      // — the image rung must fire ACROSS microbatch boundaries under
      // start(): the verdict reads the MAINTAINED imagehashes side
      // microbatch 1 committed, not this batch's increment
      stream.addData((406L, "src", shaped("again06", "g", 51), e(5)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = CurationStream.verdictLog(spark, s"$tmp/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(verdicts === Map(
      401L -> ("image_dup", Some(1L)),
      402L -> ("admitted", None),
      403L -> ("near_dup", Some(402L)),
      406L -> ("image_dup", Some(402L))), verdicts.toString)
    // both tiers committed exactly the admitted survivor of each batch
    assert(DedupStream.corpusShingles(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 402L))
    assert(VectorStream.corpusCells(spark, s"$tmp/vec")
      .select("vec_id").as[Long].collect().toSet === Set(1L, 402L))
    // the admitted doc's fingerprint landed on the imagehashes side; the
    // rejected recyclers' never did
    assert(DedupStream.corpusImageHashes(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 402L))
    // per-batch dual-tier accounting, image rung included
    val m = CurationStream.metrics(spark, s"$tmp/out")
      .select("batch_id", "n_in", "n_admitted", "n_image_dup", "n_near_dup")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(m === Set((0L, 2L, 1L, 1L, 0L), (1L, 1L, 0L, 0L, 1L),
      (2L, 1L, 0L, 1L, 0L)), m.toString)
    DedupOps.releaseCaches()
  }

  test("restart from the same checkpoint: no re-admission, stable verdicts, one metrics row per batch per tier (start)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_curation_restart").toString
    // quality-passing unique docs (the soak fixture's shape)
    def doc(i: Long) =
      s"doc$i " + (1 to 50).map(k => s"the t${i}w$k").mkString(" ")
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    DedupStream.admitBatch(Seq((1L, doc(1L))).toDF("doc_id", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1))).toDF("vec_id", "embedding"), nCells = 1, iterations = 1)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Array[Float])]
    def startQuery() = CurationStream.start(
      stream.toDF().toDF("doc_id", "text", "embedding"),
      s"$tmp/text", s"$tmp/vec", s"$tmp/out", s"$tmp/ckpt", bench)
    // ---- run 1: admit batches 0 and 1, then STOP ----------------------
    val q1 = startQuery()
    try {
      // batch 0: 401 fresh, 402 near-dups the seed corpus doc
      stream.addData((401L, doc(401L), e(2)), (402L, doc(1L) + " coda", e(3)))
      q1.processAllAvailable()
      // batch 1: fresh
      stream.addData((403L, doc(403L), e(4)))
      q1.processAllAvailable()
    } finally q1.stop()
    val verdictsBefore = CurationStream.verdictLog(spark, s"$tmp/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(verdictsBefore === Map(
      401L -> ("admitted", None), 402L -> ("near_dup", Some(1L)),
      403L -> ("admitted", None)), verdictsBefore.toString)
    // ---- run 2: SAME checkpoint, a new query, a new batch -------------
    val q2 = startQuery()
    try {
      // 404 near-dups 401 — admitted BEFORE the restart: the recovered
      // query must keep screening against the pre-restart state; 405 is
      // fresh and must admit
      stream.addData((404L, doc(401L) + " coda", e(5)), (405L, doc(405L), e(6)))
      q2.processAllAvailable()
    } finally q2.stop()
    // pre-restart verdicts are byte-stable (no batch re-ran with a
    // different answer) and the new batch's verdicts land beside them
    val verdictsAfter = CurationStream.verdictLog(spark, s"$tmp/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(verdictsAfter === verdictsBefore ++ Map(
      404L -> ("near_dup", Some(401L)), 405L -> ("admitted", None)),
      verdictsAfter.toString)
    // NO re-admission: each admitted doc is indexed exactly once in the
    // text tier and assigned exactly once in the vector tier
    val shingleDocs = DedupStream.corpusShingles(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSeq
    assert(shingleDocs.sorted === Seq(1L, 401L, 403L, 405L), s"got $shingleDocs")
    val cellRows = VectorStream.corpusCells(spark, s"$tmp/vec")
      .select("vec_id").as[Long].collect().toSeq
    assert(cellRows.sorted === Seq(1L, 401L, 403L, 405L), s"got $cellRows")
    // one DUAL-TIER metrics row per batch — and one row per batch in
    // EACH tier's own accounting (a replayed batch rewrites, never adds)
    val dual = CurationStream.metrics(spark, s"$tmp/out")
      .groupBy("lineage", "batch_id").count()
      .select("count").as[Long].collect()
    assert(dual.length === 3 && dual.forall(_ === 1L), s"dual rows: ${dual.toSeq}")
    val textM = DedupStream.metrics(spark, s"$tmp/out/text")
      .groupBy("lineage", "batch_id").count()
      .select("count").as[Long].collect()
    assert(textM.length === 3 && textM.forall(_ === 1L), s"text rows: ${textM.toSeq}")
    val vecM = VectorStream.metrics(spark, s"$tmp/out/vec")
      .groupBy("lineage", "batch_id").count()
      .select("count").as[Long].collect()
    assert(vecM.length === 3 && vecM.forall(_ === 1L), s"vec rows: ${vecM.toSeq}")
    DedupOps.releaseCaches()
  }

  test("mixed-modality soak: five microbatches plant every verdict class, equal the one-batch run, sides fold-equal across compactIfDue") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.MultimodalOps
    import graft.llm.MultimodalOps.{AudioDecoder, AudioGen, ImageGen}
    // ---- driver-side generative print helpers, memoized ----------------
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
    val imgMemo = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    def imgOf(l: Int) = imgMemo.getOrElseUpdate(l, MultimodalOps.aHash(
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ImageGen.png(l.toLong)))))
    def farAudio(a: Int, b: Int): Boolean =
      ham64(afpOf(a), afpOf(b)) > 3 && pcmOf(a) != pcmOf(b)
    def farImage(a: Int, b: Int): Boolean = ham64(imgOf(a), imgOf(b)) > 3
    val fpMemo = scala.collection.mutable.HashMap.empty[(Int, Int), (Long, Long)]
    def fp(l: Int, fno: Int) = fpMemo.getOrElseUpdate((l, fno), framePrintOf(l, fno))
    def framesFar(la: Int, lb: Int): Boolean = {
      val (nfa, nfb) = (2 + la % 3, 2 + lb % 3)
      (0 until 4).forall(i =>
        ham64(fp(la, i * nfa / 4), fp(lb, i * nfb / 4)) > 3)
    }
    // ---- the VIDEO length family: one original supporting all three
    // planted video-side recyclers (keyframe-near, shot-near, afp-near),
    // the three recyclers pairwise far so the one-batch twin's
    // new-vs-new legs cannot flip a class ------------------------------
    // every family member is also audio-far from the low-quality doc's
    // length (15): its afp colliding with a video-family clip would flip
    // that doc's class through the one-batch twin's new-vs-new legs
    def vidFamily(la: Int): Option[(Int, Int, Int)] = for {
      _ <- Some(la).filter(l => farAudio(l, 15))
      kf <- (1 to 7).map(k => la + 48 * k).find(l =>
        ham64(imgOf(l), imgOf(la)) <= 3 && farAudio(l, la) && farAudio(l, 15))
      shot <- (la + 1 to 700).find(l => l != kf &&
        ham64(fp(l, 0), fp(la, 0)) > 3 && {
          val (nfa, nfl) = (2 + la % 3, 2 + l % 3)
          (1 until 4).exists(i => ham64(fp(l, i * nfl / 4), fp(la, i * nfa / 4)) <= 3)
        } && farAudio(l, la) && farAudio(l, kf) && framesFar(l, kf) &&
          farAudio(l, 15))
      aud <- (330 to 700).find(l => l != kf && l != shot && l != la &&
        ham64(afpOf(l), afpOf(la)) <= 3 && pcmOf(l) != pcmOf(la) &&
        farAudio(l, kf) && farAudio(l, shot) && framesFar(l, shot) &&
        farAudio(l, 15))
    } yield (kf, shot, aud)
    val (lVid, (lbKf, lbShot, lbAud)) = (330 to 700).iterator
      .flatMap(la => vidFamily(la).map(la -> _)).next()
    // ---- the clean pool: six non-video lengths pairwise far on image
    // and audio, and far from every video-family length and from the
    // low-quality doc's length (15) on audio (+ image, it carries one) --
    val taken = Seq(lVid, lbKf, lbShot, lbAud)
    val pool = scala.collection.mutable.ArrayBuffer.empty[Int]
    val poolIt = (330 to 700).iterator.filterNot(taken.contains)
    while (pool.size < 9 && poolIt.hasNext) {
      val l = poolIt.next()
      if ((pool.toSeq ++ taken :+ 15).forall(p => farAudio(l, p)) &&
        (pool.toSeq :+ 15).forall(p => farImage(l, p)))
        pool += l
    }
    assert(pool.size === 9, "fixture search: clean pool incomplete")
    val Seq(lA, lS, lF, lSp, lSem, lCon, lF2, lF3, lF4) = pool.toSeq
    // ---- texts: exact-length, disjoint words, quality-passing ----------
    def textOfLen(tag: String, len: Int, insert: String = ""): String = {
      val sb = new StringBuilder(tag)
      if (insert.nonEmpty) sb.append(" ").append(insert)
      var k = 1
      while (sb.length < len - 24) { sb.append(s" the $tag$k"); k += 1 }
      val pad = len - sb.length - 1
      assert(pad >= 1, s"textOfLen($tag, $len): insert too long")
      sb.append(" ").append("z" * pad)
      assert(sb.length === len, s"textOfLen($tag, $len)")
      sb.toString
    }
    val span = (1 to 10).map(i => s"sp$i").mkString(" ")
    val s1Text = textOfLen("seedi", lA)
    // the near-dup variant: same length (so its prints are s1's, already
    // committed — no fresh print interactions), one token changed
    val nearText = s1Text.dropRight(s1Text.length - s1Text.lastIndexOf(' ')) +
      " " + "y" * (s1Text.length - s1Text.lastIndexOf(' ') - 1)
    assert(nearText.length === lA)
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    // seeds: the image/audio original (1), the clip original (4, a video
    // id), the span + semantic original (5)
    val seedDocs = Seq((1L, "src", s1Text), (4L, "src", textOfLen("seedv", lVid)),
      (5L, "src", textOfLen("seeds", lS, insert = span)))
    val seedVecs = Seq((1L, e(1)), (4L, e(2)), (5L, e(3)))
    // the increment: one planted recycler per verdict class + one fresh
    val incDocs = Seq(
      (101L, "src", textOfLen("fresh", lF)),          // admitted
      (102L, "src", nearText),                        // near_dup(1)
      (103L, "src", textOfLen("imgcp", lA)),          // image_dup(1): same image, fresh words
      (104L, "src", textOfLen("audcp", lVid)),        // audio_dup(4): video id, same clip
      (105L, "src", textOfLen("spans", lSp, insert = span)), // span_dup(5)
      (106L, "src", textOfLen("semcp", lSem)),        // semantic_dup(5): e(3) vector
      (107L, "src", textOfLen("contm", lCon, insert = "benchmark only words qq")),
      (109L, "src", "tiny junk words"),               // low_quality
      (112L, "src", textOfLen("audnr", lbAud)),       // audio_near_dup(4): video id
      (116L, "src", textOfLen("vidcp", lbKf)),        // video_dup(4): video id
      (120L, "src", textOfLen("shotc", lbShot)),      // video_near_dup(4): video id
      // fresh admissions spread across batches so each batch COMMITS —
      // the compactIfDue interleaves have real dirs to fold (a batch
      // whose every doc is rejected writes nothing; carried
      // latest-per-lineage dirs are never foldable)
      (113L, "src", textOfLen("fres2", lF2)),
      (117L, "src", textOfLen("fres3", lF3)),
      (121L, "src", textOfLen("fres4", lF4)))
    val incVecs = Map(101L -> e(7), 102L -> e(8), 103L -> e(9), 104L -> e(10),
      105L -> e(11), 106L -> e(3), 107L -> e(12), 109L -> e(13),
      112L -> e(6), 116L -> e(14), 120L -> e(15),
      113L -> e(4), 117L -> e(5), 121L -> e(0))
    val expected = Map(
      101L -> ("admitted", None), 102L -> ("near_dup", Some(1L)),
      103L -> ("image_dup", Some(1L)), 104L -> ("audio_dup", Some(4L)),
      105L -> ("span_dup", Some(5L)), 106L -> ("semantic_dup", Some(5L)),
      107L -> ("contaminated", Some(9000L)), 109L -> ("low_quality", None),
      112L -> ("audio_near_dup", Some(4L)), 116L -> ("video_dup", Some(4L)),
      120L -> ("video_near_dup", Some(4L)),
      113L -> ("admitted", None), 117L -> ("admitted", None),
      121L -> ("admitted", None))
    def seedAt(tmp: String): Unit = {
      DedupStream.admitBatch(seedDocs.toDF("doc_id", "source", "text"),
        0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
      DedupOps.releaseCaches()
      VectorStream.build(spark, s"$tmp/vec",
        seedVecs.toDF("vec_id", "embedding"), nCells = 2, iterations = 2)
    }
    // ---- run A: FIVE microbatches under start(), compactIfDue (forced
    // thresholds) interleaved on BOTH tiers ------------------------------
    val tmpA = Files.createTempDirectory("graft_soak_mm_stream").toString
    seedAt(tmpA)
    val batches = Seq(Seq(101L, 102L), Seq(103L, 104L, 113L),
      Seq(105L, 106L, 117L), Seq(107L, 109L, 121L), Seq(112L, 116L, 120L))
    val byId = incDocs.map(d => d._1 -> d).toMap
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Array[Float])]
    val policy = graft.streaming.CompactionPolicy(maxFoldableDirs = 1)
    var compactions = 0
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "source", "text", "embedding"),
      s"$tmpA/text", s"$tmpA/vec", s"$tmpA/out", s"$tmpA/ckpt", bench)
    try {
      batches.zipWithIndex.foreach { case (ids, i) =>
        stream.addData(ids.map(id =>
          (id, byId(id)._2, byId(id)._3, incVecs(id))): _*)
        q.processAllAvailable()
        if (i == 1 || i == 3) {
          // the cron seam, between microbatches (single-writer window)
          if (DedupStream.compactIfDue(spark, s"$tmpA/text", policy)) compactions += 1
          if (VectorStream.compactIfDue(spark, s"$tmpA/vec", policy)) compactions += 1
        }
      }
    } finally q.stop()
    assert(compactions >= 2, s"forced thresholds must fire: $compactions")
    val streamed = CurationStream.verdictLog(spark, s"$tmpA/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed === expected, s"streamed: $streamed")
    // ---- run B: the SAME feed as ONE batch on fresh dirs ---------------
    val tmpB = Files.createTempDirectory("graft_soak_mm_batch").toString
    seedAt(tmpB)
    CurationStream.admitBatch(incDocs.toDF("doc_id", "source", "text"),
      incVecs.toSeq.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding"),
      1L, s"$tmpB/text", s"$tmpB/vec", s"$tmpB/out", bench, lineage = "one")
    val oneBatch = CurationStream.verdictLog(spark, s"$tmpB/out")
      .select("doc_id", "verdict", "detail_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(oneBatch === expected, s"one-batch: $oneBatch")
    // ---- fold-equality: every maintained side's CONTENT is identical
    // between the compacted five-batch run and the one-batch run --------
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      }).toSet
    def foldedEqual(side: String, get: String => org.apache.spark.sql.DataFrame): Unit =
      assert(rowsOf(get(s"$tmpA/text")) === rowsOf(get(s"$tmpB/text")),
        s"side $side diverged between the compacted and one-batch runs")
    foldedEqual("shingles", DedupStream.corpusShingles(spark, _))
    foldedEqual("bands", DedupStream.corpusBands(spark, _))
    foldedEqual("seeds", DedupStream.corpusSeeds(spark, _))
    foldedEqual("winnowfps", DedupStream.corpusWinnowFps(spark, _))
    foldedEqual("imagehashes", DedupStream.corpusImageHashes(spark, _))
    foldedEqual("audiohashes", DedupStream.corpusAudioHashes(spark, _))
    foldedEqual("audiofps", DedupStream.corpusAudioFps(spark, _))
    foldedEqual("audiowins", DedupStream.corpusAudioWins(spark, _))
    foldedEqual("audiorwins", DedupStream.corpusAudioRWins(spark, _))
    foldedEqual("videohashes", DedupStream.corpusVideoHashes(spark, _))
    foldedEqual("framehashes", DedupStream.corpusFrameHashes(spark, _))
    foldedEqual("framestride", DedupStream.corpusFrameStrides(spark, _))
    foldedEqual("seedstats", d => DedupStream.corpusSeedStats(spark, d)
      .groupBy("kh").agg(sum("df").as("df")))
    foldedEqual("wordcounts", d => DedupStream.corpusWordCounts(spark, d)
      .groupBy("word").agg(sum("n").as("n")))
    foldedEqual("bigramcounts", d => DedupStream.corpusBigramCounts(spark, d)
      .groupBy("prev", "word").agg(sum("n").as("n")))
    assert(java.util.Arrays.equals(DedupStream.corpusBloom(spark, s"$tmpA/text"),
      DedupStream.corpusBloom(spark, s"$tmpB/text")), "bloom fold diverged")
    assert(rowsOf(DedupStream.corpusGroups(spark, s"$tmpA/text")) ===
      rowsOf(DedupStream.corpusGroups(spark, s"$tmpB/text")), "groups diverged")
    assert(rowsOf(VectorStream.corpusCells(spark, s"$tmpA/vec")) ===
      rowsOf(VectorStream.corpusCells(spark, s"$tmpB/vec")), "vector cells diverged")
    // both runs admitted exactly the fresh docs + seeds
    assert(DedupStream.corpusShingles(spark, s"$tmpA/text")
      .select("doc_id").as[Long].collect().toSet ===
      Set(1L, 4L, 5L, 101L, 113L, 117L, 121L))
    DedupOps.releaseCaches()
  }

  test("dual-tier reads stay complete and coherent under concurrent admissions + compactions") {
    val tmp = Files.createTempDirectory("graft_curation_soak").toString
    // quality-passing unique docs (near 100 tokens, ~0.5 stopword ratio)
    def doc(i: Long) = (i,
      s"doc$i " + (1 to 50).map(k => s"the t${i}w$k").mkString(" "))
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    DedupStream.admitBatch(Seq(doc(1L), doc(2L)).toDF("doc_id", "text"),
      0L, s"$tmp/text", s"$tmp/seedout", 0.5, "seed")
    DedupOps.releaseCaches()
    VectorStream.build(spark, s"$tmp/vec",
      Seq((1L, e(1)), (2L, e(2))).toDF("vec_id", "embedding"),
      nCells = 2, iterations = 1)
    val bench = Seq((9000L, "benchmark only words qq ww ee rr")).toDF("doc_id", "text")
    val committed = new AtomicReference(Set(1L, 2L))
    val offered = new AtomicReference(Set(1L, 2L))

    val cycles = IndexedSeq.fill(2)(new java.util.concurrent.atomic.AtomicLong(0L))
    @volatile var stop = false
    def quiesce(): Unit = {
      val targets = cycles.map(_.get() + 1)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (cycles.zip(targets).exists { case (c, t) => c.get() < t } &&
          !stop && System.nanoTime() < deadline)
        Thread.sleep(20)
    }
    val failures = new ConcurrentLinkedQueue[String]
    val readers = Seq(
      // reader 0: both tiers' completeness/boundedness + cell coherence
      () => {
        val mustHave = committed.get()
        val seenText = DedupStream.corpusShingles(spark, s"$tmp/text")
          .select("doc_id").as[Long].collect().toSet
        val ix = VectorStream.index(spark, s"$tmp/vec")
        val cells = ix.cells.select("vec_id", "cell").as[(Long, Int)].collect()
        val mayHave = offered.get()
        val seenVec = cells.map(_._1).toSet
        assert(mustHave.subsetOf(seenText), s"text read lost ${mustHave -- seenText}")
        assert(seenText.subsetOf(mayHave), s"text read foreign ${seenText -- mayHave}")
        assert(mustHave.subsetOf(seenVec), s"vec read lost ${mustHave -- seenVec}")
        assert(seenVec.subsetOf(mayHave), s"vec read foreign ${seenVec -- mayHave}")
        assert(cells.forall(c => c._2 >= 0 && c._2 < ix.centroids.length),
          "mixed vector tree")
      },
      // reader 1: the dual-tier ADVISORY verdict on a probe duplicating a
      // doc committed before the readers started — must answer near_dup
      // through every publication
      () => {
        val v = CurationStream.verdicts(spark, s"$tmp/text", s"$tmp/vec",
          Seq((8001L, doc(1L)._2)).toDF("doc_id", "text"),
          Seq((8001L, e(1))).toDF("vec_id", "embedding"), bench)
          .select("verdict").as[String].head()
        assert(v === "near_dup", s"probe verdict drifted to $v mid-publication")
      })
    val threads = readers.zipWithIndex.map { case (body, i) =>
      val t = new Thread(() => {
        while (!stop) {
          try { body(); cycles(i).incrementAndGet() }
          catch { case ex: Throwable =>
            failures.add(s"reader$i: ${ex.getClass.getSimpleName}: ${ex.getMessage}")
            stop = true
          }
        }
      }, s"curation-soak-$i")
      t.start(); t
    }
    try {
      (3L to 7L).foreach { i =>
        offered.set(offered.get() + i)
        CurationStream.admitBatch(
          Seq(doc(i)).toDF("doc_id", "text"),
          Seq((i, e(i.toInt))).toDF("vec_id", "embedding"),
          i, s"$tmp/text", s"$tmp/vec", s"$tmp/out", bench, lineage = "soak")
        committed.set(committed.get() + i)
        quiesce()
        if (i == 5L) {
          DedupStream.compact(spark, s"$tmp/text")
          VectorStream.compact(spark, s"$tmp/vec")
          quiesce()
        }
      }
    } finally { stop = true; threads.foreach(_.join(30000)) }
    assert(failures.isEmpty, failures.toArray.mkString("\n"))
    assert(DedupStream.corpusShingles(spark, s"$tmp/text")
      .select("doc_id").as[Long].collect().toSet === (1L to 7L).toSet)
    assert(VectorStream.corpusCells(spark, s"$tmp/vec")
      .select("vec_id").as[Long].collect().toSet === (1L to 7L).toSet)
  }
}
