package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ModelConf, ObjectsModel, Tables}
import graft.ops.{AggOps, PipelineOps, QuerySurface, StoreLayout}
import graft.ops.QuerySurface.{DynamicFieldQuery, ObjectsArgs}
import graft.llm.{DedupOps, MultimodalOps, SamplingOps, SimilarityOps, TextOps}

/** Driver contract — one named query per implemented operator (SURVEY.md §2
  * + LLM-pipeline extensions), each with a DuckDB oracle in
  * [[graft.oracle.Oracles]]. */
object SparkEntry {

  private val ObjCols = Seq(
    "_id", "version", "version_hex", "deleted", "owner_kind", "owner",
    "type_full", "storage_rebate")

  private def out(df: DataFrame): DataFrame =
    df.select(ObjCols.map(col): _*)

  /** Serving-layer cache of the hot derived tables (SURVEY §4 "caching"):
    * the objects table and change stream are consumed by nearly every
    * query in a session; persist them once per (session, sfDir). At
    * deployment scale this is the materialized, `_id`-bucketed objects
    * table instead of an in-memory cache. */
  // Plain map + reentrant synchronized (NOT ConcurrentHashMap.computeIfAbsent:
  // cache builders recursively populate other keys — completed → kept — and
  // nested computeIfAbsent on one CHM is unspecified and can deadlock).
  private val dfCache =
    scala.collection.mutable.HashMap.empty[(Int, String, String), DataFrame]
  private def cachedDf(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = dfCache.synchronized {
    // Evict entries whose session has stopped — also guards the (rare)
    // identityHashCode reuse after a session is GC'd. A hit must also
    // belong to the CALLER's session (`eq`): two live sessions with
    // colliding identity hashes must not share cached frames.
    dfCache.filterInPlace((_, df) => !df.sparkSession.sparkContext.isStopped)
    val k = (System.identityHashCode(s), dir, key)
    dfCache.get(k).filter(_.sparkSession eq s) match {
      case Some(df) => df
      case None =>
        // a colliding OTHER-session entry is evicted: unpersist it (lazily
        // — its session recomputes on next touch) so alternating collided
        // sessions can't accumulate orphaned persisted blocks
        dfCache.get(k).foreach(_.unpersist(blocking = false))
        val df = build.persist(); dfCache.update(k, df); df
    }
  }

  private def objects(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "objects")(ObjectsModel.objects(s, dir))
  private def documents(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "documents")(Tables.documents(s, dir))
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "embeddings")(Tables.embeddings(s, dir))
  private def keptChanges(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "kept")(ObjectsModel.kept(ObjectsModel.changes(s, dir)))
  private def completedCps(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "completed")(ObjectsModel.completedCheckpoints(keptChanges(s, dir)))
  /** d2's verified pair set, cached across queries like the other serving
    * tables: d6 composes ON it (group resolution is a consumer of the pair
    * frame, not of the corpus text), so d6 times label propagation rather
    * than a second full d2 — in deployment the pair set is likewise a
    * materialized table the grouping job reads. d2 itself still pays the
    * full pipeline on first touch (it sorts before d6 in the bench). */
  private def d2Pairs(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "d2pairs")(DedupOps.minhashNearDups(documents(s, dir), 0.5))
  /** The d5/d7 MAINTAINED corpus state (docs < 400): shingle side table,
    * LSH band index, and group assignment. In deployment these are tables
    * the admission pipeline appends to — never rebuilt per increment — so
    * the incremental queries time increment work against ambient state,
    * with the state built once on first touch (inside d5's own timing). */
  private def d5CorpusShingles(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "d5sh")(
      DedupOps.shingleArrays(documents(s, dir).filter(col("doc_id") < 400)))
  private def d5CorpusIndex(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "d5idx")(DedupOps.bandIndex(
      DedupOps.signaturesFromShingleArrays(d5CorpusShingles(s, dir))))
  /** The increment's d5 pair verdicts, cached across queries: in the
    * streaming admission loop (DedupStream.admitBatch) these are computed
    * ONCE per batch and shared by the index append and the group
    * maintenance — d5 and d7 mirror that sharing, with the build paid by
    * whichever runs first (d5, in bench order). */
  private def d5Pairs(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "d5pairs") {
      DedupOps.incrementalNearDups(
        DedupOps.shingleArrays(documents(s, dir).filter(col("doc_id") >= 400)),
        d5CorpusShingles(s, dir), d5CorpusIndex(s, dir), 0.5)
    }
  /** The d9b maintained corpus state: the positional seed table (d9's
    * index schema), appended per admitted increment in deployment — same
    * ingest-side class as the d5 band index. */
  private def d9CorpusSeeds(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "d9seeds")(
      DedupOps.positionalSeeds(documents(s, dir).filter(col("doc_id") < 400)))
  /** The (kh, df) seed-stats table maintained BESIDE the seed index
    * (DedupStream keeps a sum-mergeable partial per admitted batch): span
    * screening joins the increment's kh set against it, so the corpus seed
    * table is never re-aggregated per increment. */
  private def d9CorpusSeedStats(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "d9stats")(DedupOps.seedStats(d9CorpusSeeds(s, dir)))
  /** The D10 maintained Bloom bitset (same corpus split as d5/d9b) — the
    * cheapest rung of the admission ladder, built once per (session, dir)
    * beside the other dedup serving state. */
  private val bloomCache =
    scala.collection.mutable.HashMap.empty[(Int, String), (SparkSession, Array[Byte])]
  /** Memoize a driver VALUE per (session, dir) with stopped-session
    * eviction — identityHashCode reuse after a session is GC'd could
    * otherwise alias a fresh session onto state built from
    * since-regenerated parquet at the same dir. A hit additionally
    * verifies the stored session IS the caller's (`eq`): two LIVE
    * sessions whose identity hashes collide must not share serving
    * state, so a mismatched entry is rebuilt and overwritten. The build
    * (a Spark job, seconds for BPE training) runs OUTSIDE the lock —
    * double-checked, so a lost race discards its duplicate rather than
    * serializing every cache behind one training job. One definition for
    * every driver-value serving cache (Bloom bits, BPE merge tables). */
  private def driverCached[T](cache: scala.collection.mutable.HashMap[(Int, String), (SparkSession, T)],
      s: SparkSession, dir: String)(build: => T): T = {
    val key = (System.identityHashCode(s), dir)
    val hit = cache.synchronized {
      cache.filterInPlace((_, v) => !v._1.sparkContext.isStopped)
      cache.get(key).filter(_._1 eq s)
    }
    hit match {
      case Some((_, v)) => v
      case None =>
        val built = build
        cache.synchronized {
          cache.get(key).filter(_._1 eq s) match {
            case Some((_, v)) => v
            case None => cache.update(key, (s, built)); built
          }
        }
    }
  }
  private def d10CorpusBits(s: SparkSession, dir: String): Array[Byte] =
    driverCached(bloomCache, s, dir)(
      DedupOps.bloomBuild(documents(s, dir).filter(col("doc_id") < 400)))
  /** D10b's geometry: per-shard 2^15 bits (deliberately NOT the default —
    * the config value must demonstrably flow), 3 hashes, 4 md5-routed
    * key-range shards. */
  private val D10bSizing = DedupOps.BloomSizing(1 << 15, 3, 4)
  private val bloomShardCache =
    scala.collection.mutable.HashMap.empty[(Int, String), (SparkSession, Array[Array[Byte]])]
  private def d10bCorpusShardBits(s: SparkSession, dir: String): Array[Array[Byte]] =
    driverCached(bloomShardCache, s, dir)(
      DedupOps.bloomBuildSharded(
        documents(s, dir).filter(col("doc_id") < 400), D10bSizing))
  /** The t18 learned merge table (3 rounds over the corpus) — t18b's
    * serving state, a driver VALUE cached with the same stopped-session
    * eviction as the Bloom bits. */
  private val bpeCache =
    scala.collection.mutable.HashMap.empty[(Int, String), (SparkSession, Seq[String])]
  private def t18Merges(s: SparkSession, dir: String): Seq[String] =
    driverCached(bpeCache, s, dir)(
      TextOps.bpeMerges(documents(s, dir), 3).collect().map(_.getString(1)).toSeq)
  /** The t18c learned SUBWORD merge table — t18d's serving state, same
    * cache discipline. */
  private val bpeSubCache =
    scala.collection.mutable.HashMap.empty[(Int, String), (SparkSession, Seq[String])]
  private def t18cMerges(s: SparkSession, dir: String): Seq[String] =
    driverCached(bpeSubCache, s, dir)(
      TextOps.bpeSubwordMerges(documents(s, dir), 3).collect().map(_.getString(1)).toSeq)
  /** The SAMPLE-TRAINED subword merge table (t18e): t18c's trainer fed
    * the t6 hash sample (same salt/rate as the registered t6 row, via the
    * shared predicate) instead of the full corpus — the deployment shape
    * SCALE.md documents, where thousands of rounds run over a sample's
    * word dict and the learned rules encode the whole lake. */
  private val bpeSampleCache =
    scala.collection.mutable.HashMap.empty[(Int, String), (SparkSession, Seq[String])]
  private def t18eMerges(s: SparkSession, dir: String): Seq[String] =
    driverCached(bpeSampleCache, s, dir)(
      TextOps.bpeSubwordMerges(
        documents(s, dir).filter(
          graft.llm.SamplingOps.hashSamplePredicate(10, 100, "s1")), 3)
        .collect().map(_.getString(1)).toSeq)
  /** cachedDf variant for group-resolution outputs: the build runs a
    * multi-pass dedup pipeline whose tracked intermediates must be
    * materialized INTO the cache (count) and then released — without the
    * count-then-release the scaffolding frames would outlive the build. */
  private def cachedGroups(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = dfCache.synchronized {
    dfCache.filterInPlace((_, df) => !df.sparkSession.sparkContext.isStopped)
    val k = (System.identityHashCode(s), dir, key)
    dfCache.get(k).filter(_.sparkSession eq s) match {
      case Some(g) => g
      case None =>
        dfCache.get(k).foreach(_.unpersist(blocking = false)) // evicted collider
        val g = build.persist()
        g.count() // materialize INTO the cache before the scaffolding
        DedupOps.releaseCaches() // (tracked pair/label frames) is dropped
        dfCache.update(k, g)
        g
    }
  }
  private def d7CorpusGroups(s: SparkSession, dir: String): DataFrame =
    cachedGroups(s, dir, "d7groups") {
      val corpusDocs = documents(s, dir).filter(col("doc_id") < 400)
      DedupOps.nearDupGroups(corpusDocs, DedupOps.minhashNearDups(corpusDocs, 0.5))
    }
  /** The FULL-corpus group assignment (d6's output) as maintained serving
    * state: keeper selection (d6b) consumes the assignment table the d6/d7
    * pipeline maintains — in deployment a doc_id-bucketed table MERGEd per
    * increment — so its query times the selection join, not a group
    * recompute. d6 itself still times label propagation (it calls
    * nearDupGroups directly, never this cache). */
  private def d6Groups(s: SparkSession, dir: String): DataFrame =
    cachedGroups(s, dir, "d6groups")(
      DedupOps.nearDupGroups(documents(s, dir), d2Pairs(s, dir)))

  /** The t15 MAINTAINED vocabulary (t13's induction at the top-200 cut) —
    * served state like the d5/d9b index tables: the OOV screen joins a
    * maintained (word, rank) table instead of re-inducing the vocabulary
    * per call. */
  private def vocab200(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "vocab200")(
      TextOps.vocabulary(documents(s, dir), 200).select("word", "rank"))

  /** The t19b MAINTAINED word-counts side (DedupStream's wordcounts
    * schema): the admitted corpus's unigram model as served state —
    * Heaps'-law sized, appended per admitted batch in deployment
    * (`DedupStream.corpusWordCounts`). The served NLL screen scores
    * increments against THIS table; corpus text is tokenized once here
    * (ingest-side), never at query time. Same d5/d9b corpus split. */
  private def t19WordCounts(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "t19counts")(
      documents(s, dir).filter(col("doc_id") < 400)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n")))

  /** The t19d MAINTAINED bigram-counts side (DedupStream's bigramcounts
    * schema): the admitted corpus's conditional model beside the unigram
    * one — pair extraction shared with the batch scorer via
    * [[graft.llm.TextOps.bigramPairs]]. Same d5/d9b corpus split. */
  private def t19BigramCounts(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "t19bigrams")(
      graft.llm.TextOps.bigramPairs(
        documents(s, dir).filter(col("doc_id") < 400))
        .groupBy("prev", "word").agg(count(lit(1)).as("n")))

  /** The m4 MAINTAINED image-fingerprint table: aHashes are ingest-side
    * serving state like the IVF cells or the PQ coded corpus (built once
    * when media lands; m4 itself keeps pricing the inline decode+hash
    * build, the e11 pattern), so the m4b/m4c dedup queries time
    * fingerprint READS, never a pixel re-decode. */
  private def m4Hashes(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m4hashes")(
      MultimodalOps.imageHashes(s, MultimodalOps.asMediaTable(
        documents(s, dir).filter(!MultimodalOps.isVideoId(col("doc_id"))))))

  /** The MAINTAINED multi-lens + tile print table (aHash + dHash +
    * dihedral + TILE sub-prints off ONE decode —
    * [[MultimodalOps.lensTileFrame]], since round 20): the m4Hashes
    * discipline with every extra family riding the same pixels, so
    * m4f/m4g/m4p time print READS + bit work, never a re-decode. Each
    * consumer PROJECTS its column set ([[MultimodalOps.dHashOf]] /
    * [[MultimodalOps.tilesOf]]) from this one persisted frame — the
    * m5Full pattern on the image modality. */
  private def m4Lens(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m4lens")(
      MultimodalOps.lensTileFrame(MultimodalOps.asMediaTable(
        documents(s, dir).filter(!MultimodalOps.isVideoId(col("doc_id"))))))

  /** The dHash-lens projection of [[m4Lens]] (no second persist). */
  private def m4DHashes(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.dHashOf(m4Lens(s, dir))

  /** The m4p/m4q MAINTAINED tile-print table (the imagetiles side's
    * rows) — the tiles projection of the same one decode. */
  private def m4Tiles(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.tilesOf(m4Lens(s, dir))

  /** The m4s/m4t MAINTAINED canonical tile table (the imagetilesk
    * side's rows — 'lt' family only, the stored shape) — the
    * ktileSideOf projection of the same one decode. */
  private def m4KTiles(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.ktileSideOf(m4Lens(s, dir))

  /** The m4s/m4t INCREMENT: the increment images' CROP∘TRANSFORM
    * re-uploads (cropped wherever dims allow AND mirrored/flipped/
    * rotated by the id % 3 rule — the composed recycler feed that
    * evades the full-frame lenses AND the plain tile tier
    * simultaneously) decoded to 4-family canonical tile prints once
    * per (session, sfDir). */
  private def m4KTileIncr(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m4ktileincr")(
      MultimodalOps.tileKPrintFrame(
        MultimodalOps.asCropMirrorIncrementMediaTable(
          documents(s, dir).filter(col("doc_id") >= 400)
            .filter(!MultimodalOps.isVideoId(col("doc_id"))))))

  /** The m4p/m4q INCREMENT: the increment images' CROPPED re-uploads
    * (one tile column + one tile row off wherever the dims allow — the
    * spatial recycler feed every full-frame lens misses) decoded to
    * tile prints once per (session, sfDir). */
  private def m4TileIncr(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m4tileincr")(
      MultimodalOps.tilePrintFrame(
        MultimodalOps.asCropIncrementMediaTable(
          documents(s, dir).filter(col("doc_id") >= 400)
            .filter(!MultimodalOps.isVideoId(col("doc_id"))))))

  /** The MAINTAINED dihedral-canonical print table (m4k/m4l's serving
    * state — the m4Hashes discipline on the orientation-invariant
    * family). */
  private def m4KHashes(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m4khashes")(
      MultimodalOps.dihedralFingerprintFrame(MultimodalOps.asMediaTable(
        documents(s, dir).filter(!MultimodalOps.isVideoId(col("doc_id"))))))

  /** The COMBINED audio decode frame (header + content hash + acoustic
    * print off ONE container parse — [[MultimodalOps.decodeAudioFull]]),
    * decoded once per (session, sfDir): the m4Hashes discipline on the
    * third modality, with the exact tier (m5b/m5c) and the perceptual
    * tier (m5d/m5e) PROJECTING their column sets from this one persisted
    * frame — the corpus's samples are touched once per session however
    * many audio rows run. */
  private def m5Full(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m5full")(
      MultimodalOps.decodeAudioFull(s,
        MultimodalOps.asAudioTable(documents(s, dir))).toDF())

  /** The m5b/m5c meta projection of [[m5Full]] (no second persist — a
    * narrow column select over the cached frame). */
  private def m5Meta(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.audioMetaOf(m5Full(s, dir))

  /** The m5d/m5e acoustic-print projection of [[m5Full]]. */
  private def m5Afp(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.audioFpOf(m5Full(s, dir))

  /** The m5i/m5j windowed-sub-print projection of [[m5Full]] (the
    * audiowins side's rows — the nested wins exploded, no second
    * decode). */
  private def m5Wins(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.audioWinsOf(m5Full(s, dir))

  /** The m5i/m5j INCREMENT: the d5/d9b increment docs' SILENCE-PADDED
    * renditions (doc_id % 3 whole windows ahead of the generative
    * stream) decoded to window prints once per (session, sfDir) — the
    * recycler feed the shift screens catch against the UNPADDED
    * admitted corpus. */
  private def m5ShiftIncr(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m5shiftincr")(
      MultimodalOps.audioWindowPrints(
        MultimodalOps.asShiftedAudioTable(
          documents(s, dir).filter(col("doc_id") >= 400))))

  /** The m5n/m5o reversal-canonical window projection of [[m5Full]]
    * (the audiorwins side's rows — the nested rwins exploded, no second
    * decode). */
  private def m5RWins(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.audioRWinsOf(m5Full(s, dir))

  /** The m5n/m5o INCREMENT: the d5/d9b increment docs under the MIXED
    * reversed/plain rule (odd ids REVERSED behind doc_id%3 windows of
    * leading silence — the recycler feed that slips the exact, contour,
    * forward-window AND whole-clip-canonical rungs at once; even ids
    * plain copies), decoded to dual-family canonical window prints once
    * per (session, sfDir). */
  private def m5RevIncr(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m5revincr")(
      MultimodalOps.audioRevWindowPrints(
        MultimodalOps.asReversedAudioTable(
          documents(s, dir).filter(col("doc_id") >= 400))))

  /** The ONE maintained COMBINED video decode of the corpus clips
    * ([[MultimodalOps.decodeVideoFull]]: proportional dual-family frame
    * samples + fixed-stride prints in BOTH families off one container
    * parse and one frame memo), built in warm() — since round 20 every
    * served video projection (frames, keyframes, canonical frames,
    * plain strides, canonical strides) is a column projection of THIS
    * frame, so the corpus containers parse exactly once per
    * (session, sfDir) and no serve row pays a first-touch cache build
    * inside its own timing (the r19 verdict's build-tier ask). */
  private def m3VFull(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m3vfull")(
      MultimodalOps.decodeVideoFull(s, MultimodalOps.asMediaTable(
        documents(s, dir).filter(MultimodalOps.isVideoId(col("doc_id")))))
        .toDF())

  private def m3Frames(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.videoFramesOf(m3VFull(s, dir))

  private def m7Keyframes(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.keyframeOf(m3Frames(s, dir))

  /** The dihedral-canonical projections of [[m3Frames]] (no second
    * parse): per-ordinal frame prints (m3d) and their ordinal-0 keyframe
    * table (m7e/m7f). */
  private def m3KFrames(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.frameDihedralOf(m3Frames(s, dir))
  private def m7KKeyframes(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.keyframeOf(m3KFrames(s, dir))

  /** The m3g/m3h MAINTAINED fixed-stride frame-print table (the
    * framestride side's rows): every frame of the UNPREPENDED corpus
    * videos printed at stride 1 — since round 20 a PROJECTION of the
    * one combined decode [[m3VFull]], never a second container parse. */
  private def m3Strides(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.videoStridesOf(m3VFull(s, dir))

  /** The m3j/m3k MAINTAINED dihedral-CANONICAL stride-print table (the
    * framestridek side's rows) — the same [[m3VFull]] projection on the
    * orientation-invariant family: the k-print rides the frame memo, so
    * carrying the second stride family costs bit arithmetic, never a
    * second decode. */
  private def m3KStrides(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.videoStrideKOf(m3VFull(s, dir))

  /** The m3g/m3h INCREMENT: the d5/d9b increment videos' PREPENDED-intro
    * re-edits (doc_id % 3 intro frames ahead of the real footage — the
    * recycler feed whose every proportionally-sampled ordinal shifts, so
    * the keyframe AND shot rungs miss it) decoded to stride prints once
    * per (session, sfDir). Warmed (round 20): in deployment the
    * increment decodes once at admission, so the screen rows time the
    * SEARCH, not the rendition decode. */
  private def m3StrideIncr(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m3strideincr")(
      MultimodalOps.frameStridePrints(s,
        MultimodalOps.asPrependedMediaTable(
          documents(s, dir).filter(col("doc_id") >= 400)
            .filter(MultimodalOps.isVideoId(col("doc_id"))))))

  /** The m3j/m3k INCREMENT: the increment videos' MIRRORED-and-PREPENDED
    * re-edits (footage horizontally flipped behind doc_id % 3 intro
    * frames — the COMPOSED recycler feed that evades the keyframe, shot,
    * dihedral AND plain-stride rungs all at once) decoded to canonical
    * stride prints once per (session, sfDir). */
  private def m3KStrideIncr(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "m3kstrideincr")(
      MultimodalOps.frameStrideKPrints(s,
        MultimodalOps.asMirrorPrependedMediaTable(
          documents(s, dir).filter(col("doc_id") >= 400)
            .filter(MultimodalOps.isVideoId(col("doc_id"))))))

  /** The m4d MAINTAINED corpus fingerprint side (DedupStream's
    * imagehashes schema) under the d5/d9b corpus split: the increment
    * (doc_id ≥ 400) screens against THESE rows only. */
  private def m4CorpusHashes(s: SparkSession, dir: String): DataFrame =
    // a filter over the already-cached fingerprint table — no second pin
    m4Hashes(s, dir).filter(col("doc_id") < 400)

  /** The t21c MAINTAINED corpus winnow-sketch table under the d5/d9b
    * corpus split — the 1/w-sized dedup index a deployment maintains
    * when it needs pair detection, not span coordinates. */
  private def t21CorpusFps(s: SparkSession, dir: String): DataFrame =
    cachedDf(s, dir, "t21fps")(
      DedupOps.winnowFingerprints(documents(s, dir).filter(col("doc_id") < 400)))

  /** The t21d index: a REAL on-disk [[graft.streaming.DedupStream]]
    * index (every maintained side) built once per JVM per sfDir by admitting
    * the corpus docs through the SAME `admitBatch` the streaming loop
    * runs — the StoreLayout.ensureServingTables discipline applied to
    * the text tier, so the t21d row serves its winnow screen from the
    * maintained PARQUET side, not a session cache (t21c keeps the
    * session-cache twin; the pair is the serve-vs-cache seam, measured).
    * The build admits everything (threshold > 1): admission POLICY is
    * orthogonal to the side under test, and an all-admitted corpus makes
    * the maintained sketch exactly t21c's oracle corpus — the e4/e5
    * shared-oracle discipline. A leftover dir from a previous JVM is
    * rebuilt (the driver regenerates testdata between rounds); within a
    * JVM the sides are immutable parquet any session can read. */
  // memo of completed ON-DISK state builds. The build root is
  // FINGERPRINT-SUFFIXED (the IndexSides.compact generation-tree
  // discipline, r17 advice): regenerated fixture parquet under the same
  // sfDir changes the fingerprint, so a rebuild lands in its OWN
  // generation dir and never deletes the one a concurrent session — or
  // any caller holding a lazy, not-yet-executed Spark read of the
  // returned path — is still scanning (the reader/deleter race the old
  // delete-and-rebuild-in-place carried). Superseded generations are
  // left for the JVM's lifetime: test-fixture-sized state, one extra
  // copy per fixture regeneration, under the session warehouse dir. The
  // per-generation critical section still serializes two sessions
  // building the SAME generation; the same-generation delete inside it
  // only ever removes a dir no reader can hold yet (a path escapes this
  // method only after its memo entry is installed) — it exists to
  // rebuild a previous JVM's crashed half-build.
  private val diskStateBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private val diskStateLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def onDiskState(s: SparkSession, d: String, name: String)(
      build: String => Unit): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    // PLAIN local path (no file: scheme): the t21d groups side is a
    // BucketStore, whose manifest IO is java.nio over local paths
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir")).toUri.getPath
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
    val st = src.getFileSystem(conf).getFileStatus(src)
    val fingerprint = s"${st.getLen}_${st.getModificationTime}"
    val root = new org.apache.hadoop.fs.Path(
      wh, s"g_${name}_${tag}_$fingerprint")
    val rootKey = root.toString
    if (!diskStateBuilt.containsKey(rootKey))
      diskStateLocks.computeIfAbsent(rootKey, _ => new Object).synchronized {
        if (!diskStateBuilt.containsKey(rootKey)) {
          val fs = root.getFileSystem(conf)
          if (fs.exists(root)) fs.delete(root, true)
          build(rootKey)
          diskStateBuilt.put(rootKey, java.lang.Boolean.TRUE)
        }
      }
    rootKey
  }

  private def t21dIndexDir(s: SparkSession, d: String): String =
    onDiskState(s, d, "t21d") { root =>
      // the corpus is admitted WITH its media envelope (`source`), so the
      // media fingerprint sides — imagehashes, audiohashes, and the
      // audiofps acoustic prints — land beside the text sides: the m5f
      // row serves the audio near-dup screen off THIS maintained index,
      // the t21d graduation on the print table. Built under BothLens
      // (round 17): the dual-lens decode additionally writes the
      // imagedhashes side, so the m4i row serves the CANDIDATE-UNION
      // screen off maintained parquet — one decode, both lens sides,
      // the admitBatch fallback's decode-once seam
      graft.streaming.DedupStream.admitBatch(
        documents(s, d).filter(col("doc_id") < 400)
          .select("doc_id", "source", "text"),
        0L, s"$root/index", s"$root/out", threshold = 1.1, lineage = "t21d",
        imageLens = graft.streaming.DedupStream.BothLens,
        // dihedralRung additionally stocks the imagekhashes side (m4n's
        // serving state) off the same multi-lens decode
        dihedralRung = true)
    } + "/index"

  /** Pre-generated PAYLOAD tables — the decode-only twins' input: a real
    * corpus STORES media bytes, so the fixture's encode cost (PNG/AVI/
    * WAV generation) is ingest-side state, written once per JVM per
    * sfDir; the m1b/m5g rows read these and time the DECODE alone,
    * where m1/m5 keep pricing generation+decode inline (the measured
    * encode-vs-decode seam, the e4/e5 discipline on fixtures). */
  private def mediaTableDir(s: SparkSession, d: String): String =
    onDiskState(s, d, "media") { root =>
      MultimodalOps.asMediaTable(documents(s, d))
        .write.mode("overwrite").parquet(s"$root/media")
      MultimodalOps.asAudioTable(documents(s, d))
        .write.mode("overwrite").parquet(s"$root/audio")
    }

  /** The served IVF ANN index (E5): build once per (session, sfDir) —
    * centroids + persisted cell assignment — exactly the artifacts a
    * deployment materializes offline so query time pays cell probing
    * only. Built in warm() like the other ingest-side serving state. */
  private val ivfCache =
    scala.collection.mutable.HashMap.empty[(Int, String, String), SimilarityOps.IvfIndex]
  private def ivfCached(s: SparkSession, d: String, tag: String)(
      build: => SimilarityOps.IvfIndex): SimilarityOps.IvfIndex =
    ivfCache.synchronized {
      ivfCache.filterInPlace((_, idx) => !idx.cells.sparkSession.sparkContext.isStopped)
      ivfCache.getOrElseUpdate((System.identityHashCode(s), d, tag), {
        val built = build
        val cells = built.cells.persist()
        cells.count()
        built.copy(cells = cells)
      })
    }
  private def ivfIndex(s: SparkSession, d: String): SimilarityOps.IvfIndex =
    ivfCached(s, d, "full")(SimilarityOps.ivfBuild(embeddings(s, d)))
  /** The corpus-built IVF index (vec_id < 400) — e5b's base and the
    * served index the c2b semantic admission screen probes. */
  private def ivfCorpusIndex(s: SparkSession, d: String): SimilarityOps.IvfIndex =
    ivfCached(s, d, "corpus")(
      SimilarityOps.ivfBuild(embeddings(s, d).filter(col("vec_id") < 400)))
  /** The e5b MAINTAINED index: the corpus-built index with increments
    * folded in by frozen-centroid assignment — never a recluster. Same
    * ingest-side serving state class as the d5/d9b index tables. */
  private def ivfAppendedIndex(s: SparkSession, d: String): SimilarityOps.IvfIndex =
    ivfCached(s, d, "appended") {
      SimilarityOps.ivfAppend(ivfCorpusIndex(s, d),
        embeddings(s, d).filter(col("vec_id") >= 400))
    }

  /** The served PQ index (E11b): codebooks + persisted coded corpus,
    * built once per (session, sfDir) — the e4→e5 build-∉-query
    * discipline applied to product quantization. e11 itself deliberately
    * keeps the inline build (the e4 twin) so the seam is a measured
    * number. */
  private val pqCache =
    scala.collection.mutable.HashMap.empty[(Int, String, String), SimilarityOps.PqIndex]
  private def pqIndex(s: SparkSession, d: String): SimilarityOps.PqIndex =
    pqCache.synchronized {
      pqCache.filterInPlace((_, idx) => !idx.codes.sparkSession.sparkContext.isStopped)
      pqCache.getOrElseUpdate((System.identityHashCode(s), d, "full"), {
        val built = SimilarityOps.pqBuild(embeddings(s, d), m = 16, k = 16)
        val codes = built.codes.persist()
        codes.count()
        built.copy(codes = codes)
      })
    }

  /** The served IVFADC index (E12): the e5 IVF cells encoded on the e11b
    * codebooks — one narrow projection composing the two served
    * artifacts. */
  private val ivfPqCache =
    scala.collection.mutable.HashMap.empty[(Int, String, String), SimilarityOps.IvfPqIndex]
  private def ivfPqIndex(s: SparkSession, d: String): SimilarityOps.IvfPqIndex =
    ivfPqCache.synchronized {
      ivfPqCache.filterInPlace((_, idx) => !idx.codedCells.sparkSession.sparkContext.isStopped)
      ivfPqCache.getOrElseUpdate((System.identityHashCode(s), d, "full"), {
        val built = SimilarityOps.ivfPqBuild(ivfIndex(s, d), pqIndex(s, d))
        val coded = built.codedCells.persist()
        coded.count()
        built.copy(codedCells = coded)
      })
    }

  /** Flagship query on sf=0.001 — the `objects(args)` surface: objects by
    * owner (server/src/main.rs:283-284) with pagination. */
  def entry(spark: SparkSession): DataFrame =
    out(QuerySurface.objectsQuery(
      objects(spark, "/root/testdata/sf0.001"),
      ObjectsArgs(owners = Seq("0xa00000", "0xa00004"), limit = 50)))

  /** Registry rows that price an inline index BUILD (Lloyd passes, PQ
    * codebook training) rather than serving a maintained artifact — the
    * deployment story runs these out-of-band (VectorStream.build) while
    * e5/e11b/e12 are the serving rows. The bench splits them into a
    * `build` subtotal so a load spike on one build row reads as exactly
    * that instead of inflating the serving headline (e11 alone was 16%
    * of the r11 driver total). ContractSpec pins membership ⊆ registry. */
  val buildQueries: Set[String] =
    Set("e4_ivf_topk", "e11_pq_topk", "t18_bpe_merges", "t18c_bpe_subwords",
      "t18e_bpe_sample_trained")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- serving query surface (P1-P8, O1-O4) --------------------------
    "p1_point_lookup" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(ids = Seq("0x000007"))))),
    "p2_multi_id" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(ids = Seq("0x000007", "0x000011", "0x000042", "0x000123"))))),
    "p3_owner" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(owner = Some("0xa00000"))))),
    "p4_owners" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(owners = Seq("0xa00000", "0xa00004", "0xa00008"))))),
    "p5_type_prefix" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(tpe = Some("0x1::click"), limit = 100)))),
    "p6_multi_type" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(types = Seq(
        "0x0::view", "0x2::dynamic_field::Field<0x1::string::String,0x0"), limit = 100)))),
    "p7_dynfield_parents" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(dynamicField = Some(DynamicFieldQuery(
        names = Seq("87", "12"), nameKey = Some("k"))), limit = 100)))),
    "p7b_value_owner_filter" -> ((s, d) =>
      // the reference's app-specific "capsules" index path:
      // object.content.fields.value.fields.owner (server/src/main.rs:575-590)
      out(QuerySurface.paginate(
        objects(s, d).filter(
          get_json_object(col("fields_json"), "$.value.fields.owner") === "0xa00001"),
        100, 0))),
    "p8_children" -> ((s, d) => out(QuerySurface.paginate(
      objects(s, d).filter(
        QuerySurface.dynamicFieldChildFilter && col("owner").isin("0x000010")),
      100, 0))),
    "o1_latest_checkpoint" -> ((s, d) =>
      completedCps(s, d).orderBy(col("_id").desc).limit(1)),
    "o2_pagination" -> ((s, d) =>
      out(QuerySurface.paginate(objects(s, d), 20, 40))),
    "o2b_keyset" -> ((s, d) =>
      out(QuerySurface.paginateAfter(objects(s, d), "0x000059", 20))),
    "o3_count_by_owner_kind" -> ((s, d) =>
      objects(s, d).groupBy("owner_kind").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("owner_kind"))),
    "s1_tail_poll_page" -> ((s, d) => {
      val page = PipelineOps.latestPageAscending(Tables.events(s, d), 100)
      page.select(col("event_id"), col("event_type"), Tables.tsMillis(page).as("ts_ms"))
    }),

    // ---- joins ---------------------------------------------------------
    "j1_dynfield_parent_join" -> ((s, d) => out(QuerySurface.objectsQuery(
      objects(s, d), ObjectsArgs(dynamicField = Some(DynamicFieldQuery(
        values = Seq("7", "21"), valueKey = Some("v"))), limit = 100)))),
    "j2_children_resolver" -> ((s, d) => {
      val objs = objects(s, d)
      val parents = objs.filter(QuerySurface.typePrefixFilter(Seq("0x0::signup")))
      QuerySurface.childrenResolver(objs, parents, 3)
        .select(col("parent_id"), col("child_id"), col("child_version"),
          col("rn").cast("long").as("rn"))
        .orderBy("parent_id", "rn")
    }),
    "j3_enrichment" -> ((s, d) =>
      PipelineOps.enrich(keptChanges(s, d).filter(col("cp") < 20), Tables.nation(s, d))
        .select("_id", "version", "n_name").orderBy("version")),
    "j3b_enrich_fallback" -> ((s, d) =>
      PipelineOps.enrichWithFallback(
        keptChanges(s, d).filter(col("cp") < 20), Tables.nation(s, d))
        .select("_id", "version", "n_name", "fetch_status", "retry_waves", "backoff_ms")
        .orderBy("version")),
    "j4_first_seen_dedup" -> ((s, d) =>
      PipelineOps.firstSeenWins(keptChanges(s, d))
        .select("_id", "version").orderBy("_id")),
    "j5_cross_source_dedup" -> ((s, d) =>
      PipelineOps.dedupAcrossRoutes(PipelineOps.unionRoutes(keptChanges(s, d)))
        .groupBy("route").agg(count(lit(1)).as("n")).orderBy("route")),

    // ---- ingest pipeline -----------------------------------------------
    "k1_latest_wins" -> ((s, d) =>
      ObjectsModel.latestWins(keptChanges(s, d))
        .select(col("_id"), col("version"), col("deletion").as("deleted"))
        .orderBy("_id")),

    // ---- bucketed serving variants (deployment shape) ------------------
    // Same results as j1/j2/k1 (same oracles), served from StoreLayout's
    // bucketed catalog tables: the joins, distinct, and latest-wins window
    // all key-align with the bucketing, so the plans carry ZERO hash
    // shuffles (StoreLayoutSpec + PlanAudit gate both assert it) — only
    // the deterministic output ORDER BY remains, which is harness-only.
    // At 100 TB this is the difference between re-shuffling the store per
    // query and reading co-located buckets.
    "j1b_bucketed_parent_join" -> ((s, d) => {
      val t = StoreLayout.ensureServingTables(s, d, objects(s, d), keptChanges(s, d))
      val q = DynamicFieldQuery(values = Seq("7", "21"), valueKey = Some("v"))
      val children = s.table(t._2).filter(QuerySurface.dynamicFieldMatch(q))
        .select(col("owner").as("__parent_id")).distinct()
      out(QuerySurface.paginate(
        s.table(t._1).join(children, col("_id") === col("__parent_id"), "inner")
          .drop("__parent_id"), 100, 0))
    }),
    "j2b_bucketed_children" -> ((s, d) => {
      val t = StoreLayout.ensureServingTables(s, d, objects(s, d), keptChanges(s, d))
      val parents = s.table(t._1)
        .filter(QuerySurface.typePrefixFilter(Seq("0x0::signup")))
        .select(col("_id").as("parent_id"))
      val children = s.table(t._2)
        .select(col("owner").as("parent_id"), col("_id").as("child_id"),
          col("version").as("child_version"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("parent_id").orderBy(col("child_version").desc, col("child_id"))
      parents.join(children, Seq("parent_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("parent_id"), col("child_id"), col("child_version"),
          col("rn").cast("long").as("rn"))
        .orderBy("parent_id", "rn")
    }),
    "k1b_bucketed_latest_wins" -> ((s, d) => {
      val t = StoreLayout.ensureServingTables(s, d, objects(s, d), keptChanges(s, d))
      ObjectsModel.latestWins(s.table(t._3))
        .select(col("_id"), col("version"), col("deletion").as("deleted"))
        .orderBy("_id")
    }),
    "k2_checkpoint_commits" -> ((s, d) => completedCps(s, d).orderBy("_id")),
    "k3_dlq" -> ((s, d) =>
      ObjectsModel.failures(keptChanges(s, d))
        .select("_id", "version", "cp").orderBy("version")),
    "k4_metrics" -> ((s, d) =>
      PipelineOps.metricsSummary(keptChanges(s, d)).orderBy("metric")),
    "a1_completion_countdown" -> ((s, d) => completedCps(s, d).orderBy("_id")),
    "a2_max_checkpoint" -> ((s, d) => AggOps.maxCheckpoint(completedCps(s, d))),
    "a3_batch_outcomes" -> ((s, d) =>
      PipelineOps.batchOutcomes(keptChanges(s, d).filter(col("cp") < 50)).orderBy("cp")),
    "s2_range_scan_skip" -> ((s, d) => {
      // The DSv2 source plans the skip BEFORE producing rows: scan bounds
      // and the (tiny) completed-range list are plan parameters, exactly
      // like the reference's scan setup (main/src/etl.rs:902,913-939).
      // cps are dense 0..max by construction, so range == distinct cps.
      val maxCp = ObjectsModel.changes(s, d).agg(max("cp")).head().getLong(0)
      val ranges = PipelineOps.descendingRanges(completedCps(s, d))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      s.read.format("cp-range")
        .option("start", 0).option("end", maxCp).option("partitions", 8)
        .option("completed", graft.sources.CpRangeSource.formatRanges(ranges))
        .load()
        .orderBy(col("cp").desc)
    }),
    "s3_first_page_per_cp" -> ((s, d) =>
      PipelineOps.firstPagePerCheckpoint(keptChanges(s, d).filter(col("cp") < 30), 3)
        .select(col("cp"), col("version"), col("page_rn").cast("long").as("page_rn"))
        .orderBy("cp", "page_rn")),
    "s4_cursor_walk" -> ((s, d) =>
      PipelineOps.walkSegments(completedCps(s, d), 2L)),
    "s6_watermark" -> ((s, d) => AggOps.maxCheckpoint(completedCps(s, d))),
    "s7_objects_scan" -> ((s, d) =>
      QuerySurface.paginate(QuerySurface.serveProjection(objects(s, d)), 200, 0)),
    "u1_union_routes" -> ((s, d) =>
      PipelineOps.unionRoutes(keptChanges(s, d))
        .groupBy("route").agg(count(lit(1)).as("n")).orderBy("route")),
    "u2_descending_ranges" -> ((s, d) =>
      PipelineOps.descendingRanges(completedCps(s, d))),
    "u2b_ranges_with_stop" -> ((s, d) =>
      // fixture stop rule: newest cp with _id % 89 == 21 carries the marker
      PipelineOps.descendingRangesWithStop(
        completedCps(s, d).withColumn("stop", col("_id") % 89 === 21))),
    "u3_range_anti_join" -> ((s, d) => {
      val maxCp = ObjectsModel.changes(s, d).agg(max("cp")).head().getLong(0)
      PipelineOps.remainingCheckpoints(s, maxCp, completedCps(s, d))
    }),
    "p9_deletion_split" -> ((s, d) =>
      PipelineOps.withEnrichmentShortCircuit(keptChanges(s, d), Tables.nation(s, d))
        .groupBy(col("deletion"), col("n_name").isNull.as("skipped_fetch"))
        .agg(count(lit(1)).as("n"))
        .orderBy("deletion", "skipped_fetch")),
    "p10_change_kinds" -> ((s, d) =>
      ObjectsModel.changes(s, d).groupBy("change_kind")
        .agg(count(lit(1)).as("n")).orderBy("change_kind")),
    "p11_type_allowlist" -> ((s, d) =>
      PipelineOps.typeAllowlist(objects(s, d),
        Seq("0x0::view::T1", "0x1::click::T2"), Nil)
        .select(ObjCols.map(col): _*).orderBy("_id")),
    "p12_projection" -> ((s, d) =>
      objects(s, d).select("_id", "type_package").orderBy("_id").limit(50)),
    "p13_typed_parse" -> ((s, d) =>
      objects(s, d).select(col("_id"), col("type_package"), col("type_module"),
        col("type_struct"), col("type_generics_raw"), col("version_hex"),
        col("storage_rebate"), length(col("bcs")).cast("long").as("bcs_len"))
        .orderBy("_id").limit(100)),
    "p14_json_decode" -> ((s, d) =>
      objects(s, d).filter(QuerySurface.dynamicFieldChildFilter)
        .select(col("_id"),
          get_json_object(col("fields_json"), "$.name.fields.k").as("name_k"),
          get_json_object(col("fields_json"), "$.value.fields.owner").as("value_owner"),
          get_json_object(col("fields_json"), "$.value.fields.v").as("value_v"))
        .orderBy("_id").limit(200)),
    "p14b_variant_decode" -> ((s, d) =>
      // Spark 4 VariantType path for the same recursive decode: the
      // open-ended Move-value tree parsed once into a variant, fields
      // extracted with variant_get — binary-encoded, no schema freeze
      objects(s, d).filter(QuerySurface.dynamicFieldChildFilter)
        .withColumn("fv", expr("parse_json(fields_json)"))
        .select(col("_id"),
          expr("variant_get(fv, '$.name.fields.k', 'string')").as("name_k"),
          expr("variant_get(fv, '$.value.fields.owner', 'string')").as("value_owner"),
          expr("variant_get(fv, '$.value.fields.v', 'string')").as("value_v"))
        .orderBy("_id").limit(200)),

    // ---- aggregations / example-query corpus ---------------------------
    "a4_count_per_type" -> ((s, d) => AggOps.countPerType(objects(s, d))),
    "a5_distinct_types" -> ((s, d) => AggOps.distinctTypes(objects(s, d))),
    "a5b_distinct_types_by_owner" -> ((s, d) =>
      AggOps.distinctTypesByOwner(objects(s, d), "0xa00000")),
    "a5c_count_unique_types" -> ((s, d) => AggOps.countUniqueTypes(objects(s, d))),
    "a6_largest_doc" -> ((s, d) => AggOps.largestDocSize(objects(s, d))),
    "a7_table_count" -> ((s, d) => AggOps.tableCount(objects(s, d))),

    // ---- stream-window extensions (batch forms) ------------------------
    "w1_hourly_counts" -> ((s, d) => AggOps.hourlyEventCounts(Tables.events(s, d))),
    "w2_sliding_counts" -> ((s, d) => AggOps.slidingEventCounts(Tables.events(s, d))),
    "w3_session_counts" -> ((s, d) => AggOps.sessionCounts(Tables.events(s, d), 30)),

    // ---- LLM data-pipeline operators -----------------------------------
    "d1_exact_dedup" -> ((s, d) => DedupOps.exactDedup(documents(s, d))),
    "d2_minhash_neardups" -> ((s, d) => d2Pairs(s, d)),
    "d2x_minhash_xxh64" -> ((s, d) =>
      // the PRODUCTION hash path: d2's full pipeline under Spark's own
      // xxhash64 word/shingle hash instead of the oracle-portable md5 —
      // bench-recorded so the swap seam's speedup is a measured number.
      // No DuckDB oracle (it cannot mirror xxh64); LlmSpec asserts the
      // verified pair set is identical under both hashes on the fixture,
      // and the driver records a rows-only check.
      DedupOps.minhashNearDups(documents(s, d), 0.5, algo = "xxh64")),
    "d3_simhash" -> ((s, d) => DedupOps.simhash(documents(s, d)).orderBy("doc_id")),
    "d3b_simhash_neardups" -> ((s, d) =>
      DedupOps.simhashNearDups(documents(s, d))),
    "d4_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccardDups(documents(s, d), 0.3)),
    "d6_dedup_groups" -> ((s, d) =>
      DedupOps.nearDupGroups(documents(s, d), d2Pairs(s, d))),
    "d5_incremental_dedup" -> ((s, d) =>
      // corpus = doc_id < 400, increment = the rest; the corpus side
      // enters only through its two maintained tables (band index +
      // shingle arrays) — served from the cross-query cache exactly like
      // the objects/documents serving tables, since deployment appends
      // them per admitted increment rather than rebuilding
      d5Pairs(s, d)),
    "d10_bloom_screen" -> ((s, d) =>
      // the pre-screen rung for the EXACT tier: increment docs test the
      // corpus's maintained Bloom bitset (no false negatives for
      // byte-identical re-ingests), so "definitely new" docs skip the d1
      // exact-dup check and only maybe-dups pay its verification — near-dup
      // tiers (d5's band joins) still see every doc, since a near-duplicate
      // shares no content fingerprint. A zero-shuffle narrow map.
      DedupOps.bloomScreen(documents(s, d).filter(col("doc_id") >= 400),
        d10CorpusBits(s, d))),
    "d10b_bloom_screen_sharded" -> ((s, d) =>
      // the key-range shard seam as a served query: each doc's md5 route
      // picks a word array out of a shards × m/64 plan literal, so the
      // screen stays a zero-join zero-shuffle narrow map at any shard
      // count — the scale path once one bitset can't hold the corpus
      DedupOps.bloomScreenSharded(documents(s, d).filter(col("doc_id") >= 400),
        d10bCorpusShardBits(s, d).toSeq, D10bSizing)),
    "d7_incremental_groups" -> ((s, d) => {
      // same corpus/increment split as d5: the maintained state is the
      // corpus's (doc_id, group_id) assignment + the d5 index tables; the
      // increment contributes only its d5 pair set. The oracle runs d6's
      // full-corpus recursive CTE — the incremental fold must land on the
      // identical assignment.
      val newDocs = documents(s, d).filter(col("doc_id") >= 400)
      DedupOps.incrementalGroups(d7CorpusGroups(s, d), d5Pairs(s, d),
        newDocs.select("doc_id"))
    }),
    "d8_decontamination" -> ((s, d) => {
      // benchmark = every 50th doc (the held-out eval set); the rest is
      // the training corpus to screen. The published rule is 8-13-gram
      // collision (GPT-3 appendix C); the fixture's near-dups substitute
      // words rather than share long spans, so the QUERY runs k=4 to
      // exercise a meaningful hit set — the operator takes any k ≤ 7.
      val docs = documents(s, d)
      DedupOps.contaminationHits(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), 4, 1)
    }),
    "d8b_semantic_decontamination" -> ((s, d) =>
      // the embedding-tier complement of d8: benchmark vectors probe
      // their 3 nearest cells of the SERVED corpus index (recall dial),
      // within-cell cosine vs the corpus cells — catches paraphrased
      // leakage the n-gram screen misses
      SimilarityOps.semanticContamination(ivfCorpusIndex(s, d),
        embeddings(s, d).filter(col("vec_id") % 50 === 0), 0.4, nProbe = 3)),
    "d9_span_dedup" -> ((s, d) =>
      // verbatim shared spans ≥ 8 words (Lee et al.-style substring dedup;
      // pair-level Jaccard can't see a pasted block inside a long doc)
      DedupOps.duplicatedSpans(documents(s, d))),
    "d9c_span_scrub" -> ((s, d) =>
      // the remediation of d9: spans keep their first occurrence, the
      // later doc's covered words are removed; whole corpus passes through
      DedupOps.spanScrub(documents(s, d))),
    "d6b_quality_keepers" -> ((s, d) =>
      // keeper policy over the MAINTAINED group assignment: keep the
      // best-quality member per near-dup group, not the min doc_id
      DedupOps.qualityKeepers(d6Groups(s, d), TextOps.textStats(documents(s, d)))),
    "c1_curated_corpus" -> ((s, d) => {
      // the end-to-end curation pipeline over the d8 train/bench split:
      // exact dedup → near-dup quality keepers → decontaminate → pack
      val docs = documents(s, d)
      graft.llm.CurationOps.curateCorpus(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), 8000L)
    }),
    "d9b_incremental_spans" -> ((s, d) =>
      // d5's corpus/increment split: the corpus enters ONLY through its
      // maintained positional seed table + (kh, df) stats side; spans
      // where id_b is new
      DedupOps.incrementalSpans(
        documents(s, d).filter(col("doc_id") >= 400), d9CorpusSeeds(s, d),
        d9CorpusSeedStats(s, d))),
    "c2_incremental_admission" -> ((s, d) => {
      // c1's incremental twin: one verdict per increment doc, composed
      // from the SERVED screens (d5 pairs off the band index, d9b spans
      // off the seed index, d8 hits vs the held-out set, t5 quality) —
      // the corpus enters only through its maintained tables. A benchmark
      // doc arriving in the training feed flags itself `contaminated`,
      // which is exactly the decontamination contract.
      val inc = documents(s, d).filter(col("doc_id") >= 400)
      val bench = documents(s, d).filter(col("doc_id") % 50 === 0)
      graft.llm.CurationOps.admitIncrement(inc,
        d5Pairs(s, d),
        DedupOps.incrementalSpans(inc, d9CorpusSeeds(s, d),
          d9CorpusSeedStats(s, d)),
        DedupOps.contaminationHits(inc, bench, 4, 1))
    }),
    "c2b_semantic_admission" -> ((s, d) => {
      // c2 + the embedding-tier screen: increment vectors assigned to the
      // SERVED corpus index's frozen centroids (e5b), within-cell cosine
      // pairs against the served cells only (e7's recipe + maxCell rail),
      // verdict `semantic_dup` slotted between span_dup and contaminated.
      // The corpus enters only through its maintained tables — text via
      // the band/seed indexes, vectors via the IVF cells.
      val inc = documents(s, d).filter(col("doc_id") >= 400)
      val bench = documents(s, d).filter(col("doc_id") % 50 === 0)
      graft.llm.CurationOps.admitIncrement(inc,
        d5Pairs(s, d),
        DedupOps.incrementalSpans(inc, d9CorpusSeeds(s, d),
          d9CorpusSeedStats(s, d)),
        DedupOps.contaminationHits(inc, bench, 4, 1),
        semPairs = Some(SimilarityOps.semanticScreen(ivfCorpusIndex(s, d),
          embeddings(s, d).filter(col("vec_id") >= 400), 0.4)))
    }),
    "c6_multimodal_admission" -> ((s, d) => {
      // the COMPLETE admission ladder: c2b's text + vector screens plus
      // the IMAGE rung — the increment's media fingerprints against the
      // maintained corpus fingerprint table (m4d's served screen), verdict
      // `image_dup` slotted between semantic_dup and contaminated. Every
      // tier enters only through its maintained state: band/seed indexes,
      // IVF cells, 16-byte aHash rows — a doc recycling a corpus image
      // under fresh text is caught without a single corpus pixel decoded.
      val inc = documents(s, d).filter(col("doc_id") >= 400)
      val bench = documents(s, d).filter(col("doc_id") % 50 === 0)
      graft.llm.CurationOps.admitIncrement(inc,
        d5Pairs(s, d),
        DedupOps.incrementalSpans(inc, d9CorpusSeeds(s, d),
          d9CorpusSeedStats(s, d)),
        DedupOps.contaminationHits(inc, bench, 4, 1),
        semPairs = Some(SimilarityOps.semanticScreen(ivfCorpusIndex(s, d),
          embeddings(s, d).filter(col("vec_id") >= 400), 0.4)),
        imagePairs = Some(MultimodalOps.imageNearDupsServed(
          m4CorpusHashes(s, d),
          MultimodalOps.asMediaTable(
            inc.filter(!MultimodalOps.isVideoId(col("doc_id")))))))
    }),
    "c6b_trimodal_admission" -> ((s, d) => {
      // the TRIMODAL ladder: c6 + the AUDIO rung — the increment's PCM
      // content hashes against the maintained corpus hash side, verdict
      // `audio_dup` slotted after image_dup (a non-video doc recycling
      // a corpus length trips the image rung first; video-id docs have
      // no image fingerprint, so their recycled clips surface here).
      // Every tier serves from maintained state; no corpus pixel or
      // sample is ever re-decoded.
      val inc = documents(s, d).filter(col("doc_id") >= 400)
      val bench = documents(s, d).filter(col("doc_id") % 50 === 0)
      graft.llm.CurationOps.admitIncrement(inc,
        d5Pairs(s, d),
        DedupOps.incrementalSpans(inc, d9CorpusSeeds(s, d),
          d9CorpusSeedStats(s, d)),
        DedupOps.contaminationHits(inc, bench, 4, 1),
        semPairs = Some(SimilarityOps.semanticScreen(ivfCorpusIndex(s, d),
          embeddings(s, d).filter(col("vec_id") >= 400), 0.4)),
        imagePairs = Some(MultimodalOps.imageNearDupsServed(
          m4CorpusHashes(s, d),
          MultimodalOps.asMediaTable(
            inc.filter(!MultimodalOps.isVideoId(col("doc_id")))))),
        audioPairs = Some(MultimodalOps.audioExactDupsServedHashes(
          m5Meta(s, d).filter(col("doc_id") < 400),
          m5Meta(s, d).filter(col("doc_id") >= 400),
          inc.select("doc_id"))))
    }),
    "c6c_shift_admission" -> ((s, d) => {
      // the SHIFT-rung ladder: the text tier + the composed audio WINDOW
      // rung (forward-shift ∪ reversal screens — exactly what
      // CurationStream unions under audioShiftRung) + the video STRIDE
      // rung (videoShiftRung) — the increments' renditions are the
      // recycler feeds (silence-padded, reversed+padded, intro-
      // prepended) that the exact, contour, keyframe AND shot rungs all
      // structurally miss; the window/stride screens catch them at their
      // true offsets off maintained-shape state, and the verdict classes
      // them audio_shift_dup / video_shift_dup below the whole-clip
      // rungs (precedence owns any offset-0 overlap — no suppression)
      val inc = documents(s, d).filter(col("doc_id") >= 400)
      val bench = documents(s, d).filter(col("doc_id") % 50 === 0)
      val ids = inc.select("doc_id")
      graft.llm.CurationOps.admitIncrement(inc,
        d5Pairs(s, d),
        DedupOps.incrementalSpans(inc, d9CorpusSeeds(s, d),
          d9CorpusSeedStats(s, d)),
        DedupOps.contaminationHits(inc, bench, 4, 1),
        audioShiftPairs = Some(
          MultimodalOps.audioShiftNearDupsServedWins(
              m5Wins(s, d).filter(col("doc_id") < 400),
              m5ShiftIncr(s, d), ids)
            .select("id_a", "id_b")
            .unionByName(MultimodalOps.audioRevNearDupsServedWins(
                m5RWins(s, d).filter(col("doc_id") < 400),
                m5RevIncr(s, d), ids)
              .select("id_a", "id_b"))
            .distinct()),
        videoShiftPairs = Some(
          MultimodalOps.audioShiftNearDupsServedWins(
              m3Strides(s, d).filter(col("doc_id") < 400),
              m3StrideIncr(s, d), ids)
            .select("id_a", "id_b").distinct()))
    }),
    "c3_leakage_safe_split" -> ((s, d) =>
      // group-aware train/val/test split: buckets hash the d6 GROUP id,
      // so near-dup components co-travel — the eval-leakage guard. The
      // assignment enters as the maintained serving table (d6Groups).
      graft.llm.CurationOps.leakageSafeSplit(documents(s, d), d6Groups(s, d))),
    "c4_curate_and_split" -> ((s, d) => {
      // the full production chain as one composition: c1's curation
      // stages + the c3 split rule keyed by the SAME group assignment the
      // keeper election used — pack rows carry their split out of the box
      val docs = documents(s, d)
      graft.llm.CurationOps.curateAndSplit(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), 8000L)
    }),
    "c5_quality_ensemble" -> ((s, d) =>
      // CCNet-style combined quality: t5 heuristics + t10 repetition +
      // t19 LM-NLL blended with documented integer weights (×10⁴
      // quantized longs, exact arithmetic end to end) — the ONE score
      // deployment filters on and d6b's alternative election policy
      graft.llm.CurationOps.qualityEnsemble(documents(s, d))),
    "c5b_quality_ensemble_bigram" -> ((s, d) =>
      // the ensemble with t19c's BIGRAM model as the fluency term:
      // unigram fluency is order-blind (word salad scores like prose);
      // the bigram leg sees transitions — same weights, same integer
      // arithmetic, so c5 vs c5b isolates the fluency model's effect
      graft.llm.CurationOps.qualityEnsembleBigram(documents(s, d))),
    "e1_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),
    "e2_ann_lsh_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 8), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),
    "e4_ivf_topk" -> ((s, d) => {
      // IVF k-means ANN — oracle unrolls the deterministic Lloyd passes as
      // chained DuckDB CTEs; LlmSpec additionally asserts recall vs e1
      val emb = embeddings(s, d)
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 8), 5)
    }),
    "e3_cosine_neardups" -> ((s, d) =>
      SimilarityOps.cosineNearDups(embeddings(s, d), 0.4)),
    "e13_filtered_topk" -> ((s, d) =>
      // filtered search, exact baseline: top-k among the ENGLISH docs'
      // vectors only — the filter lands BEFORE ranking (pre-filter
      // semantics), so the selective case still returns k
      SimilarityOps.filteredTopK(embeddings(s, d),
        documents(s, d).filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id")),
        embeddings(s, d).filter(col("vec_id") < 8), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))),
    "e13b_filtered_ivf_topk" -> ((s, d) =>
      // the scale path: same filter as a semi join on the SERVED index's
      // cell list, then e5's probe-and-rank — centroids untouched
      SimilarityOps.ivfFilteredTopK(ivfIndex(s, d),
        documents(s, d).filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id")),
        embeddings(s, d).filter(col("vec_id") < 8), 5)),
    "e13c_filtered_ivf_adaptive" -> ((s, d) =>
      // e13b's recall dial as code: probe width = exact-integer
      // ⌈nProbe·corpus/allowed⌉ capped at the cell count, from ONE
      // measured count ratio (the oracle recomputes the same arithmetic
      // as a scalar subquery) — a selective filter automatically probes
      // wider instead of under-returning; fixed nProbe stays e13b
      SimilarityOps.ivfFilteredTopKAdaptive(ivfIndex(s, d),
        documents(s, d).filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id")),
        embeddings(s, d).filter(col("vec_id") < 8), 5)),
    "e5_ivf_served_topk" -> ((s, d) =>
      // e4's result served from the MAINTAINED index (build ∉ query):
      // the j1b/k1b/d7 decomposition applied to ANN — same oracle as e4
      SimilarityOps.ivfQueryTopK(ivfIndex(s, d),
        embeddings(s, d).filter(col("vec_id") < 8), 5)),
    "e5b_ivf_appended_topk" -> ((s, d) =>
      // the corpus-built index with the increment folded in by
      // frozen-centroid assignment (IVF `add`): same serve path as e5
      SimilarityOps.ivfQueryTopK(ivfAppendedIndex(s, d),
        embeddings(s, d).filter(col("vec_id") < 8), 5)),
    "e8_cluster_sample" -> ((s, d) =>
      // diversity sampling round-robin over the served index's cells —
      // the embedding-space analog of t8's quota mix
      SimilarityOps.clusterBalancedSample(ivfIndex(s, d), 32)),
    "e7_semantic_dedup" -> ((s, d) =>
      // SemDeDup served from the SAME maintained IVF index as e5/e6:
      // within-cell cosine pairs → groups → keep the least-centroid-
      // similar member per group (the paper's diversity-preserving pick)
      SimilarityOps.semanticDedup(ivfIndex(s, d), 0.4)),
    "e6_knn_classify" -> ((s, d) =>
      // kNN auto-labeling from the served index: scale a labeled seed set
      // to the corpus by majority vote of approximate neighbors
      SimilarityOps.knnClassify(ivfIndex(s, d),
        embeddings(s, d).filter(col("vec_id") < 8), embeddings(s, d), 5)),
    "e10_exact_vector_dedup" -> ((s, d) =>
      // exact-duplicate vector collapse (d1-before-d2 applied to the
      // embedding tier): the documented pre-collapse that keeps e7's
      // cells out of the maxCell rail; n_copies = reweighting multiplicity
      SimilarityOps.exactVectorDedup(embeddings(s, d))),
    "e11_pq_topk" -> ((s, d) => {
      // product quantization + asymmetric-distance search: the corpus
      // contributes only its m=16 subspace codes (16 bytes vs 256 raw —
      // 16× less scan volume); queries stay full-precision
      val emb = embeddings(s, d)
      SimilarityOps.pqTopK(SimilarityOps.pqBuild(emb, m = 16, k = 16),
        emb.filter(col("vec_id") < 8), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
    }),
    "e11b_pq_served_topk" -> ((s, d) =>
      // e11 served from the MAINTAINED PQ index (build ∉ query): the
      // e4→e5 decomposition applied to ADC — same oracle as e11, so the
      // served index must land on the identical result
      SimilarityOps.pqTopK(pqIndex(s, d),
        embeddings(s, d).filter(col("vec_id") < 8), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))),
    "e12_ivfadc_topk" -> ((s, d) =>
      // IVFADC: probe the coarse cells, ADC-rank codes within probed
      // cells only — probe pruning × code compression, the extreme-scale
      // composition SCALE.md's e11 row names
      SimilarityOps.ivfAdcTopK(ivfPqIndex(s, d),
        embeddings(s, d).filter(col("vec_id") < 8), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))),
    "e9_ivf_drift" -> ((s, d) =>
      // the centroid-drift dial over the SERVED corpus index: the
      // increment assigned on frozen centroids vs the stored cells —
      // e5b's documented rebuild trigger as an oracle-checked number
      SimilarityOps.ivfDriftStats(ivfCorpusIndex(s, d),
        embeddings(s, d).filter(col("vec_id") >= 400))),
    "a5d_approx_distinct" -> ((s, d) =>
      // KMV sketch — deterministic hash arithmetic, oracle-checkable
      // (the HLL++ variant stays test-gated in AggSpec)
      AggOps.kmvDistinctTypes(objects(s, d))),
    "t1_text_stats" -> ((s, d) => TextOps.textStats(documents(s, d))),
    "t2_lang_id" -> ((s, d) => TextOps.langId(documents(s, d))),
    "t3_token_counts" -> ((s, d) => TextOps.tokenCounts(documents(s, d))),
    "t4_fingerprints" -> ((s, d) => TextOps.fingerprints(documents(s, d))),
    "t5_quality_filter" -> ((s, d) => TextOps.qualityFilter(documents(s, d), 0.5)),
    "t15_oov_stats" -> ((s, d) =>
      // served from the MAINTAINED top-200 vocabulary table (t13's cut),
      // not a per-call re-induction — same oracle, served-state plan
      TextOps.oovStats(documents(s, d), vocab200(s, d))),
    "t16_temp_budgets" -> ((s, d) =>
      // τ=1/2 temperature mix budgets per language, feeding t8's quota map
      SamplingOps.temperatureBudgets(documents(s, d), 8000L)),
    "t17_quantile_gate" -> ((s, d) =>
      // per-language top-40% quality cut off a binned CDF: thresholds from
      // a bounded histogram, never a corpus-wide rank window
      SamplingOps.quantileGate(documents(s, d), 2, 5)),
    "t20_tokenizer_card" -> ((s, d) =>
      // per-language fertility / compression of the t18c-learned subword
      // table — the tokenizer-eval data card; exact-long sums, ratios
      // derived at the end, one zero-join encode + one lang roll-up
      TextOps.tokenizerCard(documents(s, d), t18cMerges(s, d))),
    "t21_winnow_fingerprints" -> ((s, d) =>
      // MOSS winnowing sketches: window-min over d9's positional k-gram
      // hash chain — any ≥ 8-word verbatim overlap must share a
      // fingerprint, at ~1/4 the seed-index size
      DedupOps.winnowFingerprints(documents(s, d))),
    "t21b_winnow_similarity" -> ((s, d) =>
      // the MOSS match report: pairs sharing ≥ 2 sketch fingerprints via
      // an inverted-index join under the d4/d9 df rail
      DedupOps.winnowSimilarity(documents(s, d))),
    "t21c_winnow_screen" -> ((s, d) =>
      // the SERVED sketch screen: an increment's winnow prints against
      // the MAINTAINED corpus sketch table — the m4d serving discipline
      // (combined-population df rail, corpus as id_a, id-level
      // self-exclusion) on the 1/w-sized text-dedup index
      DedupOps.winnowScreen(t21CorpusFps(s, d),
        documents(s, d).filter(col("doc_id") >= 400))),
    "t21d_winnow_screen_served" -> ((s, d) =>
      // the same screen off the STREAMING-MAINTAINED ninth side: the
      // increment's sketches against winnowfps parquet rows a real
      // DedupStream admitBatch wrote (one hash evaluation shared with
      // the seed side at admission) — t21c's serve-from-session-cache
      // vs THIS serve-from-maintained-state is the measured seam, same
      // oracle (the e4/e5 discipline)
      graft.streaming.DedupStream.screenWinnow(s, t21dIndexDir(s, d),
        documents(s, d).filter(col("doc_id") >= 400))),
    "t19_unigram_nll" -> ((s, d) =>
      // CCNet-class unigram-LM quality scoring: per-doc NLL under the
      // corpus's own word distribution, integer-quantized per word so the
      // reduction is an exact long sum (engine-portable); deployment
      // scores increments against the maintained wordcounts side
      TextOps.unigramNll(documents(s, d))),
    "t19d_bigram_nll_served" -> ((s, d) =>
      // t19c's SERVED twin: the increment scored against the MAINTAINED
      // unigram + bigram count sides, Laplace-smoothed on both models —
      // unseen bigrams take the per-context ceiling, OOV prevs 1/(V+1);
      // corpus text never re-tokenized at query time
      TextOps.bigramNllServed(
        documents(s, d).filter(col("doc_id") >= 400),
        t19WordCounts(s, d), t19BigramCounts(s, d))),
    "t19c_bigram_nll" -> ((s, d) =>
      // one Markov order up from t19 toward CCNet's KenLM filter: first
      // word under the unigram model, later words under the MLE
      // conditional; bigrams via a narrow zip_with — no corpus window
      TextOps.bigramNll(documents(s, d))),
    "t19b_unigram_nll_served" -> ((s, d) =>
      // t19's SERVED twin (the DedupStream deployment path): the increment
      // is scored against the MAINTAINED word-counts side, Laplace-smoothed
      // so OOV words hit the ceiling; the corpus enters only through the
      // vocabulary-sized count table — its text is never re-tokenized
      TextOps.unigramNllServed(
        documents(s, d).filter(col("doc_id") >= 400), t19WordCounts(s, d))),
    "t18_bpe_merges" -> ((s, d) =>
      // 3 rounds of most-frequent-pair merge — the BPE tokenizer-training
      // loop: per round one map-side pair count, a driver top-1 (bytes),
      // one narrow literal-replace map; sample-fed with the same plan at
      // deployment scale
      TextOps.bpeMerges(documents(s, d), 3)),
    "t18b_bpe_encode" -> ((s, d) =>
      // serve side of t18: the LEARNED merge table rides as plan string
      // literals, so tokenization is one zero-shuffle narrow projection
      TextOps.bpeEncode(documents(s, d), t18Merges(s, d))),
    "t18c_bpe_subwords" -> ((s, d) =>
      // canonical char-level BPE on the word-frequency dict: ONE corpus
      // pass (the word count), then vocab-sized rounds — the form
      // tokenizer trainers ship, and the 1000-round scale path
      TextOps.bpeSubwordMerges(documents(s, d), 3)),
    "t18d_bpe_subword_encode" -> ((s, d) =>
      // serve side of t18c: replay the learned subword rules per word
      // inside a transform/aggregate lambda — zero-shuffle tokenization
      TextOps.bpeSubwordEncode(documents(s, d), t18cMerges(s, d))),
    "t18e_bpe_sample_trained" -> ((s, d) =>
      // the deployment composition end-to-end: t6 hash-sample → t18c dict
      // training on the SAMPLE → t18d full-corpus encode with the learned
      // rules; proves the sample-trained tokenizer is deterministic and
      // engine-portable (first touch pays the training — a build row)
      TextOps.bpeSubwordEncode(documents(s, d), t18eMerges(s, d))),
    "t6_hash_sample" -> ((s, d) =>
      SamplingOps.hashSample(documents(s, d), 10, 100, "s1")),
    "t7_budget_pack" -> ((s, d) =>
      SamplingOps.packToBudget(documents(s, d), 8000L)),
    "t8_lang_mix" -> ((s, d) =>
      SamplingOps.mixByQuota(documents(s, d), Map(
        "en" -> 5000L, "de" -> 2000L, "es" -> 2000L, "fr" -> 2000L, "zh" -> 1500L))),
    "t7b_budget_pack_scalable" -> ((s, d) =>
      SamplingOps.packToBudgetScalable(documents(s, d), 8000L)),
    "t9_seq_pack" -> ((s, d) =>
      SamplingOps.packSequences(documents(s, d), 2048L)),
    "t9b_seq_pack_scalable" -> ((s, d) =>
      SamplingOps.packSequencesScalable(documents(s, d), 2048L)),
    "t10_repetition" -> ((s, d) => TextOps.repetitionStats(documents(s, d))),
    "t12_chunking" -> ((s, d) => SamplingOps.chunkDocuments(documents(s, d))),
    "t13_vocabulary" -> ((s, d) => TextOps.vocabulary(documents(s, d))),
    "t14_corpus_report" -> ((s, d) => TextOps.corpusReport(documents(s, d))),
    "t8b_source_mix" -> ((s, d) =>
      // t8 stratified by source: cap any single crawl dump's contribution
      SamplingOps.mixByKeyQuota(documents(s, d), Map(
        "src0" -> 800L, "src7" -> 800L, "src12" -> 600L, "src19" -> 600L),
        "source")),
    "t11_pii_scrub" -> ((s, d) => TextOps.piiScrub(documents(s, d))),
    "m1_media_meta" -> ((s, d) => MultimodalOps.mediaPipeline(s, documents(s, d))),
    "m1b_media_meta_from_table" -> ((s, d) =>
      // m1's DECODE-ONLY twin: payloads read from the pre-generated
      // parquet table (warm()-built ingest-side state — a real corpus
      // stores media bytes), so this row trends the decoder alone while
      // m1 keeps pricing generation+decode inline; same oracle
      MultimodalOps.decodeMeta(s,
        s.read.parquet(s"${mediaTableDir(s, d)}/media"))
        .toDF().orderBy("doc_id")),
    "m2_resize" -> ((s, d) =>
      // box = 32 so the fixture's 16–63-px dims exercise BOTH branches
      // (fit-through and the floor-arithmetic downscale)
      MultimodalOps.resizeMeta(s, MultimodalOps.asMediaTable(documents(s, d)), 32L)
        .toDF().orderBy("doc_id")),
    "m2b_thumb_hashes" -> ((s, d) =>
      // m2 made REAL: the fitted pixels are MATERIALIZED (nearest-neighbor
      // sampling — the one resize rule the oracle can mirror exactly) and
      // the thumbnail is aHashed; the oracle recomputes the sampled grid
      // at thumb dims through the nested-floor arithmetic, so agreement
      // proves the engine resized exactly as declared (the rendition-
      // invariance seam image dedup leans on; LlmSpec pins the
      // aHash(thumb) == aHash(original) property at integer scale)
      MultimodalOps.thumbHashes(s, MultimodalOps.asMediaTable(
        documents(s, d).filter(!MultimodalOps.isVideoId(col("doc_id")))), 32L)),
    "m4_image_phash" -> ((s, d) =>
      // perceptual fingerprints of the image modality, aHashed from
      // pixels the engine DECODED out of real PNG bytes — the oracle
      // recomputes the hash from the generative pixel formula, so
      // agreement proves the decode round-trip bit-exactly
      MultimodalOps.imageHashes(s, MultimodalOps.asMediaTable(
        documents(s, d).filter(!MultimodalOps.isVideoId(col("doc_id")))))),
    "m4e_image_dhash" -> ((s, d) =>
      // the GRADIENT lens beside m4's mean-threshold aHash: bit (x,y) =
      // luma(x+1,y) > luma(x,y) over a 9×8 nearest grid — robust to any
      // within-row order-preserving luma transform (brightness shifts,
      // vertical gradients/vignettes) where the global-mean hash moves;
      // production dedup stacks several hash families over one decode
      MultimodalOps.imageDHashes(s, MultimodalOps.asMediaTable(
        documents(s, d).filter(!MultimodalOps.isVideoId(col("doc_id")))))),
    "m4f_image_dhash_near_dups" -> ((s, d) =>
      // m4c's banded near-dup search over the GRADIENT lens: the shared
      // 64-bit print schema means the pigeonhole machinery runs
      // unchanged over dHash tables — served from the maintained
      // dual-lens frame (one decode built both lenses), pure bit work
      MultimodalOps.imageNearDupsFromHashes(m4DHashes(s, d))),
    "m4g_image_lens_union" -> ((s, d) =>
      // the MULTI-LENS candidate union over one decode: aHash candidates
      // ∪ dHash candidates (each under its own band rail), dedup on
      // (id_a, id_b), ONE verify computing BOTH exact distances — a pair
      // within Hamming 3 under EITHER lens surfaces (the recall win the
      // second lens exists for: vignettes/vertical gradients move the
      // global mean but no within-row comparison)
      MultimodalOps.imageLensUnionNearDups(m4Lens(s, d))),
    "m4k_image_dihedral_phash" -> ((s, d) =>
      // the ORIENTATION-INVARIANT print: minimum over the 8 dihedral
      // permutations of the symmetric-grid mean-threshold print —
      // exactly invariant under flips/rotations/transposes by
      // construction (the transform permutes the sampled grid; the min
      // ranges over the orbit), the family that catches the MIRROR-FLIP
      // recycler plain orientation-sensitive hashes miss by ~half their
      // bits; the oracle recomputes all 8 orientations and their
      // HUGEINT-packed minimum from the generative pixels
      m4KHashes(s, d).orderBy("doc_id")),
    "m4l_image_dihedral_near_dups" -> ((s, d) =>
      // the banded pigeonhole over canonical prints — a mirrored
      // re-upload lands at Hamming 0 of its original here; one serving
      // path for every 64-bit print family, unchanged
      MultimodalOps.imageNearDupsFromHashes(m4KHashes(s, d))),
    "m4n_image_dihedral_served_maintained" -> ((s, d) =>
      // the dihedral rung SERVED from the streaming-maintained fifteenth
      // side (the t21d index builds under dihedralRung = true): the
      // increment's canonical prints against imagekhashes parquet — the
      // admission-time form of the mirror-flip catch, exactly what
      // CurationStream's image rung unions in under dihedralRung
      MultimodalOps.imageNearDupsServedHashes(
        graft.streaming.DedupStream.corpusImageKHashes(s, t21dIndexDir(s, d)),
        m4KHashes(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m4m_image_dihedral_dup_groups" -> ((s, d) =>
      // d1's exact-dedup semantics on the CANONICAL print: every
      // orientation variant of one image shares the canonical form, so
      // mirrored/rotated re-uploads COLLAPSE INTO ONE GROUP (keeper =
      // min doc_id) — the trio rule: every print family carries
      // exact-groups / near-dups / a serving path
      MultimodalOps.imageDupGroupsFromHashes(m4KHashes(s, d))),
    "m4h_image_lens_union_served" -> ((s, d) => {
      // the m4g union as the ADMISSION-TIME screen: the increment's two
      // lens prints (one decode) against the corpus split of the session
      // dual-lens cache — m4d's serving discipline per lens, pairs
      // unioned on (id_a, id_b); a pair rejects if EITHER lens sees it
      val lens = m4Lens(s, d)
      val corpus = lens.filter(col("doc_id") < 400)
      val incr = lens.filter(col("doc_id") >= 400)
      graft.streaming.DedupStream.imageScreenOfHashes(
        graft.streaming.DedupStream.BothLens,
        MultimodalOps.aHashOf(corpus), MultimodalOps.dHashOf(corpus),
        MultimodalOps.aHashOf(incr), MultimodalOps.dHashOf(incr),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))
        .orderBy("id_a", "id_b")
    }),
    "m4i_image_lens_union_maintained" -> ((s, d) => {
      // m4h off the STREAMING-MAINTAINED sides: the t21d index is built
      // under BothLens, so its imagehashes AND imagedhashes parquet
      // sides exist off one admission-time decode — the t21c→t21d /
      // m5e→m5f graduation on the lens union (same oracle, the e4/e5
      // shared-oracle discipline); this is exactly what CurationStream's
      // image rung reads under imageLens = BothLens
      val incr = m4Lens(s, d).filter(col("doc_id") >= 400)
      graft.streaming.DedupStream.imageScreenOfHashes(
        graft.streaming.DedupStream.BothLens,
        graft.streaming.DedupStream.corpusImageHashes(s, t21dIndexDir(s, d)),
        graft.streaming.DedupStream.corpusImageDHashes(s, t21dIndexDir(s, d)),
        MultimodalOps.aHashOf(incr), MultimodalOps.dHashOf(incr),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))
        .orderBy("id_a", "id_b")
    }),
    "m4o_image_tile_near_dups" -> ((s, d) =>
      // SPATIAL-CROP-robust image near-dups (the r19 verdict's image
      // ask): a re-upload cropped by whole 16-px tiles moves every
      // sample of all three full-frame lenses — aHash, dHash, even the
      // dihedral-canonical print (a crop is not a dihedral transform) —
      // so the whole m4 ladder misses it; this rung prints each tile's
      // own aHash keyed by 2-D ordinal and matches per (tx, ty) under a
      // ±1 offset fan (the m5h discipline on the spatial axes).
      // Fixture: odd docs crop a tile column, %3-remainder-1 docs a tile
      // row (wherever dims allow) — x-only, y-only, both and no-crop
      // renditions all exercised. Prices the inline decode + tile prints
      MultimodalOps.imageTileNearDups(
        MultimodalOps.tilePrintFrameRaw(
          MultimodalOps.asCroppedMediaTable(
            documents(s, d).filter(!MultimodalOps.isVideoId(col("doc_id"))))))),
    "m4p_image_tile_served" -> ((s, d) =>
      // the m4o screen SERVED: the increment's cropped re-uploads
      // against the session cache's UNCROPPED corpus tile prints —
      // caught at their true (dx, dy); combined-population rail per
      // (tx, ty, band, key), increment-side 2-D fan-out, corpus as
      // id_a. m4q is the deployment twin off the maintained
      // twenty-second side — the serve-vs-cache seam, measured
      MultimodalOps.imageTileNearDupsServed(
        m4Tiles(s, d).filter(col("doc_id") < 400),
        m4TileIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m4q_image_tile_maintained" -> ((s, d) =>
      // m4p off the STREAMING-MAINTAINED twenty-second side: imagetiles
      // parquet a real DedupStream admitBatch wrote off the SAME
      // combined image decode as the lens sides (the tiles projection
      // of one lensTileFrame row) — the m5i→m5j graduation on the
      // spatial tier (same oracle, the e4/e5 shared-oracle discipline)
      MultimodalOps.imageTileNearDupsServed(
        graft.streaming.DedupStream.corpusImageTiles(s, t21dIndexDir(s, d)),
        m4TileIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m4r_image_ktile_near_dups" -> ((s, d) =>
      // CROP∘DIHEDRAL-robust image near-dups (r20 — the composed
      // evasion the r19 verdict predicted next): a re-upload that crops
      // whole tiles AND mirrors the footage moves every full-frame
      // lens sample AND scrambles every plain tile print; here each
      // tile prints its DIHEDRAL-CANONICAL hash (symmetric sample
      // grid, min over the 8-orbit — exactly invariant under any
      // dihedral transform of the tile content) in FOUR anchor
      // families (the m5m dual-cut-family discipline on both spatial
      // axes), so whatever axis-preserving transform recycled the
      // pair, its g-family prints land on the other side's lt prints
      // at bounded whole-tile offsets. Fixture: the m4o crop rules
      // composed with the id % 5 transform rule (mirror-x / flip-y /
      // 180° / plain all in the mix). Prices the inline decode +
      // 4-family prints
      MultimodalOps.imageTileKNearDups(
        MultimodalOps.tileKPrintFrameRaw(
          MultimodalOps.asCropMirrorMediaTable(
            documents(s, d).filter(!MultimodalOps.isVideoId(col("doc_id"))))))),
    "m4s_image_ktile_served" -> ((s, d) =>
      // the m4r screen SERVED: the increment's composed re-uploads
      // (crop + mirror/flip/180°) against the session cache's PLAIN
      // corpus canonical tiles — 'lt' family only on the corpus side
      // (the stored side never pays the 4-family fan, the 100 TB
      // asymmetry); caught at their true (dx, dy) with the transform
      // WITNESS. m4t is the deployment twin off the maintained
      // twenty-third side — the serve-vs-cache seam, measured
      MultimodalOps.imageTileKNearDupsServed(
        m4KTiles(s, d).filter(col("doc_id") < 400),
        m4KTileIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m4t_image_ktile_maintained" -> ((s, d) =>
      // m4s off the STREAMING-MAINTAINED twenty-third side: imagetilesk
      // parquet a real DedupStream admitBatch wrote off the SAME
      // combined image decode as every other image side (the
      // ktileSideOf projection of one lensTileFrame row) — the m5i→m5j
      // graduation on the canonical spatial tier (same oracle, the
      // e4/e5 shared-oracle discipline)
      MultimodalOps.imageTileKNearDupsServed(
        graft.streaming.DedupStream.corpusImageTileKs(s, t21dIndexDir(s, d)),
        m4KTileIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m4c_image_near_dups" -> ((s, d) =>
      // Hamming ≤ 3 pairs via the d3b pigeonhole on the fingerprint's 4
      // disjoint 16-bit bands: equal-band candidates, exact verify on
      // candidates only — never an all-pairs product; reads the
      // MAINTAINED fingerprint table, never re-decodes pixels
      MultimodalOps.imageNearDupsFromHashes(m4Hashes(s, d))),
    "m4b_image_dup_groups" -> ((s, d) =>
      // d1's exact-dedup semantics on the image modality: identical
      // fingerprints group, keeper = min doc_id; served off the
      // maintained fingerprint table like m4c
      MultimodalOps.imageDupGroupsFromHashes(m4Hashes(s, d))),
    "m4d_image_near_dups_served" -> ((s, d) =>
      // the image rung of the admission ladder: a media increment
      // screened against the MAINTAINED corpus fingerprint side — corpus
      // pixels never touched, combined-population band prune (d9b's
      // union-df rule); same d5/d9b corpus split
      MultimodalOps.imageNearDupsServed(
        m4CorpusHashes(s, d),
        MultimodalOps.asMediaTable(
          documents(s, d).filter(col("doc_id") >= 400)
            .filter(!MultimodalOps.isVideoId(col("doc_id")))))),
    "m3_frame_sample" -> ((s, d) =>
      // REAL keyframe extraction: parse the RIFF/AVI container, decode
      // the evenly-sampled frames, aHash each — the oracle recomputes
      // the prints from the generative frame-pixel formula, so agreement
      // proves the whole container→frame→pixel round-trip. Prune to the
      // video modality BEFORE the generation map (a media_type filter
      // above the opaque map would pay the PNG/AVI encode for the whole
      // corpus and then discard 3/4 of it)
      MultimodalOps.sampleFrames(s,
        MultimodalOps.asMediaTable(
          documents(s, d).filter(MultimodalOps.isVideoId(col("doc_id")))))
        .toDF().orderBy("doc_id", "frame_idx")),
    "m3b_frame_near_dups" -> ((s, d) =>
      // SHOT-LEVEL video near-dups: same-ordinal sampled frames within
      // Hamming 3, banded candidates keyed (ordinal, band, key) — the
      // re-edit that swaps the opening shot but keeps later footage
      // still matches on the ordinals it kept (keyframe screens can't
      // see that); frame prints decoded once (tracked), the rail keys
      // per ordinal
      MultimodalOps.frameNearDups(
        MultimodalOps.sampleFramesRaw(s,
          MultimodalOps.asMediaTable(
            documents(s, d).filter(MultimodalOps.isVideoId(col("doc_id"))))))),
    "m3c_frame_near_dups_served" -> ((s, d) =>
      // the SHOT-LEVEL screen served from the STREAMING-MAINTAINED
      // thirteenth side: the increment's sampled-frame prints against
      // framehashes parquet rows a real DedupStream admitBatch wrote off
      // ONE frame decode shared with the keyframe side — the rung that
      // catches a re-edit keeping later footage under a new opening shot
      MultimodalOps.frameNearDupsServedHashes(
        graft.streaming.DedupStream.corpusFrameHashes(s, t21dIndexDir(s, d)),
        m3Frames(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400)
          .filter(MultimodalOps.isVideoId(col("doc_id"))).select("doc_id"))),
    "m7_video_meta" -> ((s, d) =>
      // the last modality made real: header fields + frame count parsed
      // off an actual RIFF/AVI container by the pure-JDK chunk walk —
      // the oracle predicts every field from the generative formula
      // (the m1/m5 round-trip discipline)
      MultimodalOps.videoMeta(s,
        documents(s, d).filter(MultimodalOps.isVideoId(col("doc_id"))))),
    "m7b_video_near_dups" -> ((s, d) =>
      // NEAR-duplicate videos via KEYFRAME prints (frame 0's aHash —
      // the thumbnail-print form of clip identity): the banded
      // pigeonhole machinery runs unchanged over the prints because the
      // schema is the image hash table's by design — one serving path
      // for every 64-bit print family (images, audio, now video)
      MultimodalOps.imageNearDupsFromHashes(
        MultimodalOps.videoKeyframeHashesRaw(MultimodalOps.asMediaTable(
          documents(s, d).filter(MultimodalOps.isVideoId(col("doc_id"))))))),
    "m7c_video_near_dups_served" -> ((s, d) =>
      // the VIDEO rung served from the STREAMING-MAINTAINED twelfth
      // side: the increment's keyframe prints against videohashes
      // parquet rows a real DedupStream admitBatch wrote off the same
      // media-table materialization as the image side — the m5f
      // discipline on the fourth modality (same oracle family, served
      // pair restriction; corpus containers parse once, at admission)
      MultimodalOps.imageNearDupsServedHashes(
        graft.streaming.DedupStream.corpusVideoHashes(s, t21dIndexDir(s, d)),
        m7Keyframes(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400)
          .filter(MultimodalOps.isVideoId(col("doc_id"))).select("doc_id"))),
    "m7d_video_dup_groups" -> ((s, d) =>
      // d1's exact-dedup semantics on the fourth modality: identical
      // keyframe prints group, keeper = min doc_id — m4b/m5b's rule over
      // the video print family (every print family now carries the
      // exact-group / near-dup / served trio); serves the cached print
      // table like m4b — m7b alone keeps pricing the inline parse
      MultimodalOps.imageDupGroupsFromHashes(m7Keyframes(s, d))),
    "m7e_video_dihedral_near_dups" -> ((s, d) =>
      // the DIHEDRAL-CANONICAL print carried to the video tier: keyframe
      // prints that are exactly flip/rotation-invariant (m4k's symmetric
      // grid + min-over-8-orientations per frame), so a clip re-uploaded
      // MIRRORED or rotated lands at Hamming 0 of its original — the
      // orientation evasion the plain keyframe screen (m7b) misses by
      // ~half its bits; the canonical prints ride the SAME frame decode
      // as m3/m7b (one dual-family sampler, column projections), and the
      // banded machinery runs unchanged over the shared print schema
      MultimodalOps.imageNearDupsFromHashes(m7KKeyframes(s, d))),
    "m7f_video_dihedral_served_maintained" -> ((s, d) =>
      // m7e SERVED from the STREAMING-MAINTAINED sixteenth side: the
      // increment's canonical keyframe prints against videokhashes
      // parquet a real DedupStream admitBatch wrote under dihedralRung
      // off the same frame decode as the other video sides — exactly
      // what CurationStream's video rung unions in under the rung (the
      // m4n discipline on the fourth modality)
      MultimodalOps.imageNearDupsServedHashes(
        graft.streaming.DedupStream.corpusVideoKHashes(s, t21dIndexDir(s, d)),
        m7KKeyframes(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400)
          .filter(MultimodalOps.isVideoId(col("doc_id"))).select("doc_id"))),
    "m3d_frame_dihedral_near_dups" -> ((s, d) =>
      // the SHOT-LEVEL screen on canonical prints: same-ordinal sampled
      // frames matched orientation-invariantly — catches the re-edit
      // that keeps later footage AND flips it (m3b sees the kept
      // ordinals only if orientation survives; this rung does not care);
      // per-ordinal band rail, prints off the shared dual-family frame
      MultimodalOps.frameNearDups(m3KFrames(s, d))),
    "m3e_frame_dihedral_served_maintained" -> ((s, d) =>
      // m3d SERVED from the STREAMING-MAINTAINED eighteenth side: the
      // increment's canonical per-ordinal prints against framekhashes
      // parquet a real DedupStream admitBatch wrote under dihedralRung
      // off the same dual-family frame decode — exactly what
      // CurationStream's shot-level rung unions in under the rung (the
      // m7f discipline one rung down)
      MultimodalOps.frameNearDupsServedHashes(
        graft.streaming.DedupStream.corpusFrameKHashes(s, t21dIndexDir(s, d)),
        m3KFrames(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400)
          .filter(MultimodalOps.isVideoId(col("doc_id"))).select("doc_id"))),
    "m3f_frame_shift_near_dups" -> ((s, d) =>
      // TIME-SHIFT-ROBUST video near-dups: a re-edit that PREPENDS intro
      // frames shifts every proportionally-sampled ordinal (fno = i·nf/4
      // moves when nf grows), so the keyframe (m7b) AND shot (m3b) gates
      // both miss it — this rung prints every frame at a fixed STRIDE
      // and matches per ordinal under a ±3 offset via the m5h machinery
      // VERBATIM over frame-axis rows (one serving path per schema).
      // Fixture: each video re-edited behind doc_id%3 intro frames, so
      // equal-length clips under different prepends are caught at
      // exactly their prepend delta. Prices the inline container parse +
      // frame decode (the m5h seam)
      MultimodalOps.audioShiftNearDups(
        MultimodalOps.frameStridePrintsRaw(s,
          MultimodalOps.asPrependedMediaTable(
            documents(s, d).filter(MultimodalOps.isVideoId(col("doc_id"))))))),
    "m3g_frame_shift_served" -> ((s, d) =>
      // the m3f screen SERVED: the increment's prepended re-edits against
      // the session cache's UNPREPENDED corpus stride prints — caught at
      // exactly their intro offsets; combined-population rail per
      // (ordinal, band, key), increment-side fan-out, corpus as id_a.
      // m3h is the deployment twin off the maintained twentieth side —
      // the serve-vs-cache seam, measured
      MultimodalOps.audioShiftNearDupsServedWins(
        m3Strides(s, d).filter(col("doc_id") < 400),
        m3StrideIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m3i_frame_kstride_near_dups" -> ((s, d) =>
      // DIHEDRAL∘SHIFT-robust video near-dups: a re-edit that MIRRORS
      // the footage AND prepends intro frames evades every other rung —
      // plain stride prints differ by ~half their bits under the mirror,
      // and the canonical keyframe/shot prints live on proportionally-
      // sampled frames that all shift — so this rung matches the
      // dihedral-CANONICAL print of every stride frame per ordinal under
      // the ±3 offset fan (the m5h machinery verbatim; the k-print rides
      // the same frame memo as the plain one, zero extra decode).
      // Fixture: every other video mirrored behind doc_id%3 intros (the
      // m5m mixed-rule discipline on the video modality). Prices the
      // inline container parse + dual-family stride prints
      MultimodalOps.audioShiftNearDups(
        MultimodalOps.frameStrideKPrintsRaw(s,
          MultimodalOps.asMirrorMixMediaTable(
            documents(s, d).filter(MultimodalOps.isVideoId(col("doc_id"))))))),
    "m3j_frame_kstride_served" -> ((s, d) =>
      // the m3i screen SERVED: the increment's mirrored+prepended
      // re-edits against the session cache's PLAIN corpus canonical
      // stride prints — the composed recycler caught at exactly its
      // intro offset; combined-population rail per (ordinal, band, key),
      // increment-side fan-out, corpus as id_a. m3k is the deployment
      // twin off the maintained twenty-first side — the serve-vs-cache
      // seam, measured
      MultimodalOps.audioShiftNearDupsServedWins(
        m3KStrides(s, d).filter(col("doc_id") < 400),
        m3KStrideIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m3k_frame_kstride_maintained" -> ((s, d) =>
      // m3j off the STREAMING-MAINTAINED twenty-first side: framestridek
      // parquet a real DedupStream admitBatch wrote off the SAME
      // combined frame decode as every other video side (the strides
      // projection's k columns of one VideoFull row) — the m3g→m3h
      // graduation on the dihedral∘shift tier (same oracle, the e4/e5
      // shared-oracle discipline)
      MultimodalOps.audioShiftNearDupsServedWins(
        graft.streaming.DedupStream.corpusFrameKStrides(s, t21dIndexDir(s, d)),
        m3KStrideIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m3h_frame_shift_maintained" -> ((s, d) =>
      // m3g off the STREAMING-MAINTAINED twentieth side: framestride
      // parquet a real DedupStream admitBatch wrote off the SAME
      // combined frame decode as the keyframe/shot/canonical sides (the
      // strides projection of one VideoFull row) — the m5i→m5j
      // graduation on the video shift tier (same oracle, the e4/e5
      // shared-oracle discipline)
      MultimodalOps.audioShiftNearDupsServedWins(
        graft.streaming.DedupStream.corpusFrameStrides(s, t21dIndexDir(s, d)),
        m3StrideIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5_audio_meta" -> ((s, d) =>
      // the REAL audio modality: WAV payloads parsed by
      // javax.sound.sampled (header fields) + a content hash over the
      // DECODED PCM — the oracle recomputes both from the generative
      // formula, so agreement proves the container round-trip bit-exactly
      // (the m4 discipline on the third modality). Like m4, this row
      // deliberately prices the INLINE decode; m5b serves the cached
      // fingerprints — the pair is the serve-vs-inline seam, measured.
      MultimodalOps.audioMeta(s, documents(s, d))),
    "m5g_audio_meta_from_table" -> ((s, d) =>
      // m5's DECODE-ONLY twin (the m1b discipline): WAV payloads read
      // from the pre-generated parquet table, pricing the
      // javax.sound.sampled parse + PCM fold alone; same oracle
      MultimodalOps.decodeAudioMeta(s,
        s.read.parquet(s"${mediaTableDir(s, d)}/audio"))
        .toDF().orderBy("doc_id")),
    "m5b_audio_dup_groups" -> ((s, d) =>
      // d1's exact-dedup semantics on audio: identical PCM content
      // groups, keeper = min doc_id; served off the maintained meta
      // frame like m4b — samples hash once, at decode
      MultimodalOps.audioDupGroupsFromMeta(m5Meta(s, d))),
    "m5d_audio_near_dups" -> ((s, d) =>
      // NEAR-duplicate audio at Hamming ≤ 3 over acoustic fingerprints
      // (sign-of-energy-delta over 65 windows — the aHash idea on the
      // time axis): the banded pigeonhole near-dup machinery is
      // modality-AGNOSTIC over (doc_id, h_hi, h_lo), so the image
      // tier's operator runs unchanged over the audio print table —
      // one serving path for every 64-bit fingerprint family
      MultimodalOps.imageNearDupsFromHashes(m5Afp(s, d))),
    "m5e_audio_near_dups_served" -> ((s, d) =>
      // m4d's SERVED screen verbatim over audio prints: a media
      // increment's acoustic fingerprints against the maintained corpus
      // print table — combined-population band prune, corpus as id_a,
      // id-level self-exclusion; the image tier's serving operator runs
      // unchanged because the print schema is shared by design. Same
      // d5/d9b corpus split; m5f is the deployment twin whose corpus
      // side is the MAINTAINED audiofps parquet instead of this session
      // cache — the pair is the serve-vs-cache seam, measured
      MultimodalOps.imageNearDupsServedHashes(
        m5Afp(s, d).filter(col("doc_id") < 400),
        m5Afp(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5f_audio_near_dups_maintained" -> ((s, d) =>
      // m5e's screen off the STREAMING-MAINTAINED eleventh side: the
      // increment's acoustic prints against audiofps parquet rows a real
      // DedupStream admitBatch wrote off ONE combined decode shared with
      // the audiohashes side — the t21c→t21d graduation on the print
      // table (same oracle, the e4/e5 shared-oracle discipline); the
      // perceptual rung CurationStream's ladder serves reads exactly
      // this side
      MultimodalOps.imageNearDupsServedHashes(
        graft.streaming.DedupStream.corpusAudioFps(s, t21dIndexDir(s, d)),
        m5Afp(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5k_audio_reversal_phash" -> ((s, d) =>
      // the REVERSAL-CANONICAL acoustic print: symmetric window bounds
      // make time reversal exactly REVERSE the 65 window energies, so
      // min over the two packed sign-of-delta prints is exactly
      // reversal-invariant (the m4k dihedral argument on the time axis)
      // — the print family that catches the REVERSED clip recycler every
      // orientation-sensitive contour print misses by ~half its bits;
      // prices the inline decode (the m5/m4k discipline)
      MultimodalOps.audioReversalFrame(
        MultimodalOps.asAudioTable(documents(s, d))).orderBy("doc_id")),
    "m5l_audio_reversal_near_dups" -> ((s, d) =>
      // the banded pigeonhole over canonical prints — a reversed
      // re-upload lands at Hamming 0 of its original; one serving path
      // for every 64-bit print family, unchanged
      MultimodalOps.imageNearDupsFromHashes(
        MultimodalOps.audioReversalFrameRaw(
          MultimodalOps.asAudioTable(documents(s, d))))),
    "m5m_audio_revwin_near_dups" -> ((s, d) =>
      // the REVERSAL∘SHIFT composition: reversalAHash's symmetric-bound
      // argument applied PER 128-sample window, in TWO cut families (f
      // from the head, b from the tail — the tail anchor is what makes
      // window-level reversal matching exact whatever n mod 128 is).
      // Catches the recycler that evades m5h AND m5k at once: a clip
      // re-uploaded REVERSED behind leading silence prints forward
      // windows m5h never saw and a whole-clip print m5k canonicalized
      // over different boundaries; here it matches on the cross-family
      // legs at its true offset. Fixture: odd docs reversed behind
      // doc_id%3 silence windows, even docs plain — both channels fire.
      // Prices the inline decode + dual-family prints (the m5h seam)
      MultimodalOps.audioRevShiftNearDups(
        MultimodalOps.audioRevWindowPrintsRaw(
          MultimodalOps.asReversedAudioTable(documents(s, d))))),
    "m5n_audio_revwin_served" -> ((s, d) =>
      // the m5m screen SERVED: the increment's mixed reversed/plain
      // renditions against the session cache's PLAIN corpus canonical
      // window prints — the reversed recycler caught at admission time;
      // combined-population rail per (family, ordinal, band, key),
      // increment-side ±3-ordinal fan-out only, corpus as id_a. m5o is
      // the deployment twin off the maintained nineteenth side — the
      // serve-vs-cache seam, measured
      MultimodalOps.audioRevNearDupsServedWins(
        m5RWins(s, d).filter(col("doc_id") < 400),
        m5RevIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5o_audio_revwin_maintained" -> ((s, d) =>
      // m5n off the STREAMING-MAINTAINED nineteenth side: audiorwins
      // parquet a real DedupStream admitBatch wrote off the SAME
      // combined decode as the other three audio sides (the nested
      // rwins column of one AudioFull row) — the m5i→m5j graduation on
      // the reversal∘shift tier (same oracle, the e4/e5 shared-oracle
      // discipline)
      MultimodalOps.audioRevNearDupsServedWins(
        graft.streaming.DedupStream.corpusAudioRWins(s, t21dIndexDir(s, d)),
        m5RevIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5h_audio_shift_near_dups" -> ((s, d) =>
      // TIME-SHIFT-ROBUST audio near-dups: the clip recycled behind
      // leading silence shifts every window of m5d's whole-clip contour
      // print — this rung prints fixed 128-sample WINDOWS instead
      // (constant/silence windows drop) and matches them per ordinal
      // under a ±3-window offset via the m3b pigeonhole on the TIME
      // axis, reporting each pair at its true offset with the matched-
      // window count; the fixture pads doc_id%3 windows of silence ahead
      // of the generative stream, so equal-length clips under different
      // pads are caught at exactly their pad delta — the evasion the
      // whole-clip gate structurally misses. Prices the inline decode +
      // window prints (the m7b seam); the search is pure bit work over
      // banded 16-byte sub-prints
      MultimodalOps.audioShiftNearDups(
        MultimodalOps.audioWindowPrintsRaw(
          MultimodalOps.asShiftedAudioTable(documents(s, d))))),
    "m5i_audio_shift_served" -> ((s, d) =>
      // the m5h screen SERVED: the increment's silence-padded renditions
      // (pads of doc_id%3 whole windows — the recycler feed) against the
      // session cache's UNPADDED corpus window prints — caught at
      // exactly their pad offsets, which the whole-clip contour rung
      // (m5e) structurally misses; combined-population rail per
      // (ordinal, band, key), increment-side ±3-ordinal fan-out, corpus
      // as id_a. m5j is the deployment twin off the maintained
      // seventeenth side — the serve-vs-cache seam, measured
      MultimodalOps.audioShiftNearDupsServedWins(
        m5Wins(s, d).filter(col("doc_id") < 400),
        m5ShiftIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5j_audio_shift_maintained" -> ((s, d) =>
      // m5i off the STREAMING-MAINTAINED seventeenth side: audiowins
      // parquet a real DedupStream admitBatch wrote off the SAME
      // combined decode as the audiohashes/audiofps sides (the nested
      // wins column of one AudioFull row) — the t21c→t21d / m5e→m5f
      // graduation on the shift tier (same oracle, the e4/e5
      // shared-oracle discipline)
      MultimodalOps.audioShiftNearDupsServedWins(
        graft.streaming.DedupStream.corpusAudioWins(s, t21dIndexDir(s, d)),
        m5ShiftIncr(s, d),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m5c_audio_dups_served" -> ((s, d) =>
      // the audio rung of the admission ladder: a media increment's PCM
      // content hashes against the MAINTAINED corpus hash side — corpus
      // samples never touched, one equality join over long keys; same
      // d5/d9b corpus split, m4d orientation + self-exclusion rules
      MultimodalOps.audioExactDupsServedHashes(
        m5Meta(s, d).filter(col("doc_id") < 400),
        m5Meta(s, d).filter(col("doc_id") >= 400),
        documents(s, d).filter(col("doc_id") >= 400).select("doc_id"))),
    "m6_media_card" -> ((s, d) =>
      // the media-tier data card: per-(modality, format) counts, total
      // pixels and dim ranges off the decoded metadata — the decode
      // budget a curation run publishes beside the tokenizer card
      MultimodalOps.mediaCard(s, documents(s, d))),

    // ---- flagship relational agg ---------------------------------------
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // BIGINT cents: the driver's hash rejects DECIMAL columns even
          // when values are bit-identical (r2+r3), so pre-scale each row to
          // integer cents and sum longs — the one type 60+ queries prove
          // hash-safe. No .5 ties exist in the data (verified all SFs).
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  /** Warm the serving cache and table IO (the reference server likewise
    * does its index setup at startup, server/src/main.rs:532-590): Bench
    * calls this so per-query timings measure queries, not JVM warmup. */
  def warm(spark: SparkSession, dir: String): Unit = {
    Tables.All.foreach(n => Tables.load(spark, dir, n).count())
    objects(spark, dir).count()
    keptChanges(spark, dir).count()
    completedCps(spark, dir).count()
    // LLM-table caches too: the first d*/e* query otherwise pays the
    // persist + first-compile inside its own timing
    documents(spark, dir).count()
    embeddings(spark, dir).count()
    // bucketed serving tables: ingest-side cost (the pipeline maintains
    // them in deployment) — built here so the first j1b/j2b/k1b query
    // times the READ path, not the one-time table build
    StoreLayout.ensureServingTables(spark, dir, objects(spark, dir), keptChanges(spark, dir))
    // the d5/d7 maintained corpus state (shingle side table, band index,
    // group assignment) is the same class of ambient ingest-side state:
    // deployment appends it per admitted increment, so the incremental
    // queries should time increment work, not corpus state construction
    d5CorpusShingles(spark, dir).count()
    d5CorpusIndex(spark, dir).count()
    d7CorpusGroups(spark, dir).count()
    d9CorpusSeeds(spark, dir).count()
    d9CorpusSeedStats(spark, dir).count()
    vocab200(spark, dir).count()
    t19WordCounts(spark, dir).count()
    t19BigramCounts(spark, dir).count()
    m4Hashes(spark, dir).count()
    m4Lens(spark, dir).count()
    m4KHashes(spark, dir).count()
    m5Full(spark, dir).count()
    // the ONE combined corpus video decode (frames + both stride
    // families project from it) and the shift tiers' INCREMENT decode
    // caches — warmed since round 20 (the r19 verdict's build-tier ask):
    // in deployment both are ingest-side state (the corpus sides are
    // maintained; the increment decodes once at admission), so the
    // serve rows time the screens, never a first-touch cache build
    m3VFull(spark, dir).count()
    m3StrideIncr(spark, dir).count()
    m3KStrideIncr(spark, dir).count()
    m5ShiftIncr(spark, dir).count()
    m5RevIncr(spark, dir).count()
    m4TileIncr(spark, dir).count()
    m4KTileIncr(spark, dir).count()
    t21CorpusFps(spark, dir).count()
    // the t21d on-disk index (a real DedupStream admitBatch over the
    // corpus): ingest-side state, built here so the t21d row times the
    // maintained-side READ, not the one-time admission
    t21dIndexDir(spark, dir)
    // the pre-generated payload tables: the decode-only twins (m1b/m5g)
    // read these, so their rows time the decoders, not the fixture's
    // PNG/AVI/WAV encode
    mediaTableDir(spark, dir)
    // d6Groups is NOT warmed: its build rides on d2Pairs, and warming it
    // would silently lift d2's documented first-touch pipeline cost out of
    // d2's own bench timing — d6b pays the assignment build on first touch
    ivfIndex(spark, dir)
    ivfAppendedIndex(spark, dir)
    // the served PQ/IVFADC artifacts (e11b/e12): codebook training +
    // corpus encoding are ingest-side builds — e11 alone keeps paying
    // the inline build so the serve-vs-inline seam stays measured
    pqIndex(spark, dir)
    ivfPqIndex(spark, dir)
    // the d10 bitset and t18 merge table are the same serving-state class
    // (driver values maintained ingest-side): built here so the d10/t18b
    // serve rows time the zero-shuffle screen/encode, not the build —
    // t18_bpe_merges itself stays an inline build row (tagged in
    // buildQueries), pricing the training loop like e4/e11
    d10CorpusBits(spark, dir)
    t18Merges(spark, dir)
    t18cMerges(spark, dir)
    ()
  }

  def oracleSql: Map[String, String] = graft.oracle.Oracles.sql
}
