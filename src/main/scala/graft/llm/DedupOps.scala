package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale design: every near-dup variant here is **candidate-generation by
  * bucketing + verification on candidates only** — never an all-pairs
  * (O(n²)) comparison. Bucket keys (band hashes / simhash / shared
  * shingles) shuffle only (doc_id, key) pairs; the verify join touches only
  * within-bucket pairs. That is the MinHash-LSH recipe (Broder '97 /
  * Leskovec-Rajaraman-Ullman ch.3) and is how it must run on a cluster.
  */
object DedupOps {
  import TextOps.{h60, P}

  /** Intermediate frames persisted by the multi-pass dedup pipelines are
    * tracked so long-lived hosts (a serving session running these queries
    * repeatedly) can release them between invocations — otherwise every
    * call pins fresh copies in the block store until eviction.
    * The registry is process-global: call releaseCaches() only BETWEEN
    * dedup invocations (as Bench/Verify do), never while another dedup
    * query may still be executing — a concurrent multi-tenant host should
    * isolate sessions per request instead of releasing globally. */
  private val trackedPersists = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private[llm] def tracked(df: DataFrame): DataFrame = trackedPersists.synchronized {
    val p = df.persist(); trackedPersists += p; p
  }
  def releaseCaches(): Unit = trackedPersists.synchronized {
    trackedPersists.foreach(_.unpersist(blocking = false))
    trackedPersists.clear()
  }

  /** D1 — exact dedup by content hash: canonical keep = lowest doc_id per
    * md5(text). One shuffle on the 128-bit hash, not the text. */
  def exactDedup(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    documents
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Distinct word-k-shingle HASHES per document (k=3), as a per-doc ARRAY
    * column (doc_id, sh_arr: array<long>). Words are hashed once (60-bit
    * md5 prefix mod p), then shingle hashes combine adjacent word hashes
    * polynomially — no shingle strings are ever materialized, and all
    * downstream set ops (minhash, banding, Jaccard) run on longs. Hash
    * collisions are negligible at p≈2^30 per doc-pair and, being
    * deterministic, identical in the DuckDB oracle.
    *
    * Shape: ZERO shuffles — one codegen'd [[graft.functions.ShinglesExpr]]
    * call per document (narrow map; the whole candidate-generation front of
    * d2/d4 is embarrassingly parallel with the corpus). Replaces the
    * round-5 explode + md5 + collect_list form (one shuffle of every word
    * hash, kept below as [[sqlShingleArrays]] for parity testing) which
    * itself replaced the round-3 window-`lead` + `distinct()` form (three
    * shuffles). Docs with fewer than k words produce no row (mirrored by
    * the oracle's `len(w) >= 3`) — keeping them as empty arrays would give
    * every short doc the identical all-`P` minhash signature and bucket
    * them all together in LSH.
    *
    * Production note: md5 is the default ONLY because the DuckDB oracle
    * can reproduce it bit-for-bit; the deployment swap is `algo =
    * "xxh64"` (Spark's own XXH64, ~an order of magnitude cheaper, no
    * crypto state), which leaves every downstream set operation untouched
    * — LlmSpec asserts the verified near-dup pair set is identical under
    * both hashes on the fixture. */
  def shingleArrays(documents: DataFrame, k: Int = 3,
      algo: String = "md5"): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        call_function("graft_shingles", col("text"), lit(k), lit(algo)).as("sh_arr"))
      .filter(size(col("sh_arr")) > 0)
  }

  /** The built-in-functions formulation of [[shingleArrays]] — kept as the
    * portability reference the fused expression is parity-verified against
    * (LlmSpec, bit-identical arrays incl. order). This was the ONLY
    * shuffle in the shingling path (explode each word, md5 the exploded
    * stream, collect_list back to per-doc arrays — the aggregation doubles
    * as the barrier that stops CollapseProject from inlining the word-hash
    * array quadratically); `graft_shingles` computes the same array in one
    * codegen pass per row, no explode, no shuffle, no barrier needed. */
  private[graft] def sqlShingleArrays(documents: DataFrame, k: Int = 3): DataFrame = {
    val comb = (0 until k)
      .map(j => s"element_at(whs, i + ${j + 1}) * ${math.pow(31, k - 1 - j).toLong}L")
      .mkString("(", " + ", s") % ${P}L")
    documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"),
        expr(s"cast(conv(substr(md5(w),1,15),16,10) as bigint) % ${P}L").as("wh"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, wh))), s -> s.wh)").as("whs"))
      .filter(size(col("whs")) >= k)
      .select(col("doc_id"),
        expr(s"array_distinct(transform(sequence(0, size(whs) - $k), i -> $comb))").as("sh_arr"))
  }

  /** Exploded (doc_id, sh) view of [[shingleArrays]], for consumers that
    * need the inverted-index shape (d4, tests). */
  def shingleSet(documents: DataFrame, k: Int = 3): DataFrame =
    shingleArrays(documents, k).select(col("doc_id"), explode(col("sh_arr")).as("sh"))

  /** D2 — MinHash signatures: numPerms permutations over 60-bit shingle
    * hashes, perm_i(h) = ((2i+3)·h + 7i+1) mod p. */
  def minhashSignatures(documents: DataFrame, numPerms: Int = 32, k: Int = 3): DataFrame =
    signaturesFromShingleArrays(shingleArrays(documents, k), numPerms)

  /** Signature computation over the per-doc shingle arrays: one pass per
    * doc through the codegen'd `graft_minhash` expression
    * ([[graft.functions.MinHashExpr]]) — a pure per-row expression, zero
    * shuffles (the round-3 form re-shuffled the exploded shingle set into
    * a 32-min-column hash aggregation). Output is bit-identical to the
    * HOF formulation below (LlmSpec parity test). */
  def signaturesFromShingleArrays(shingleArrs: DataFrame, numPerms: Int = 32): DataFrame = {
    graft.functions.GraftFunctions.register(shingleArrs.sparkSession)
    shingleArrs.select(col("doc_id"),
      call_function("graft_minhash", col("sh_arr"), lit(numPerms)).as("minhash"))
  }

  /** The built-in-functions formulation of the same signature (an
    * `aggregate` carrying a numPerms-element running-min accumulator) —
    * kept as the portability reference the custom expression is verified
    * against; HOFs run interpreted, so the hot path uses graft_minhash. */
  private[graft] def hofSignatures(shingleArrs: DataFrame, numPerms: Int = 32): DataFrame =
    shingleArrs.select(col("doc_id"), expr(
      s"""aggregate(sh_arr, array_repeat(${P}L, $numPerms),
            (acc, h) -> transform(sequence(0, ${numPerms - 1}),
              i -> least(element_at(acc, i + 1), ((2*i + 3) * h + 7*i + 1) % ${P}L)))"""
    ).as("minhash"))

  /** The banded view of a signature frame — (doc_id, band, key), the LSH
    * index shape: docs sharing any full band land in the same bucket. This
    * is also the PERSISTED-INDEX schema for incremental dedup ([[
    * incrementalNearDups]]): in deployment it is a table bucketed by
    * (band, key), appended per ingest increment, never recomputed. */
  def bandIndex(signatures: DataFrame, numPerms: Int = 32, bands: Int = 8): DataFrame = {
    val r = numPerms / bands
    signatures
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b AS band, array_join(slice(minhash, b*$r+1, $r), '-') AS key))")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** D2 — banded LSH candidate pairs: self-join the band index. Shuffles
    * only (band_idx, band_key, doc_id); pairs are generated within buckets.
    */
  def lshCandidates(signatures: DataFrame, numPerms: Int = 32, bands: Int = 8): DataFrame = {
    val banded = bandIndex(signatures, numPerms, bands)
    // Both sides of the self-join read this; without persist the whole
    // signature pipeline (md5 + 32-way min agg) runs twice. ~bands rows
    // per doc — small relative to the corpus.
    val bandedCached = tracked(banded)
    val a = bandedCached.as("a")
    val b = bandedCached.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification on a candidate-pair set, over the per-doc
    * shingle-array frame. Set sizes are `size(sh_arr)` (free — no groupBy
    * shuffle); the two intersection-join sides explode the cached arrays
    * on the fly. */
  def jaccardVerify(candidates: DataFrame, shingleArrs: DataFrame, threshold: Double): DataFrame = {
    // Read three times (two join sides + sizes): materialize once.
    val ss = tracked(shingleArrs)
    val sizes = ss.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"))
    val sa = ss.select(col("doc_id").as("id_a"), explode(col("sh_arr")).as("sh"))
    val sb = ss.select(col("doc_id").as("id_b"), explode(col("sh_arr")).as("sh"))
    candidates
      .join(sa, "id_a").join(sb, Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** D2 — full MinHash-LSH near-dup pipeline: sign → band → bucket-join →
    * exact-Jaccard verify. */
  def minhashNearDups(documents: DataFrame, threshold: Double = 0.5,
      numPerms: Int = 32, bands: Int = 8, k: Int = 3,
      algo: String = "md5"): DataFrame = {
    // One persisted shingle-array frame feeds both the signature and verify
    // paths — the shingling pipeline is the expensive front and must not
    // run twice.
    val ss = tracked(shingleArrays(documents, k, algo))
    jaccardVerify(
      lshCandidates(signaturesFromShingleArrays(ss, numPerms), numPerms, bands),
      ss, threshold)
  }

  /** D4 — n-gram Jaccard near-dup without LSH: inverted-index join on the
    * shingle with two standard prunings, then exact verify over FULL
    * shingle sets:
    *  - df-pruning: shingles in more than `maxDf` docs are dropped from
    *    candidate generation (ubiquitous shingles generate quadratic
    *    candidates but carry no similarity signal);
    *  - count prefilter: candidate pairs must share ≥ `minShared` pruned
    *    shingles. At threshold t, a true pair shares ≥ t/(1+t)·(|A|+|B|)
    *    shingles, far above `minShared` for real documents — the prefilter
    *    trims the verify join from millions of 1-shingle coincidences to
    *    the plausible few.
    * Both prunings are mirrored in the oracle. */
  def ngramJaccardDups(documents: DataFrame, threshold: Double,
      k: Int = 3, maxDf: Int = 100, minShared: Int = 5): DataFrame = {
    val ssArr = tracked(shingleArrays(documents, k))
    val ss = ssArr.select(col("doc_id"), explode(col("sh_arr")).as("sh"))
    val rare = ss.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
    val pruned = tracked(ss.join(rare.select("sh"), "sh"))
    val candidates = pruned.select(col("doc_id").as("id_a"), col("sh"))
      .join(pruned.select(col("doc_id").as("id_b"), col("sh")), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("id_a", "id_b")
    jaccardVerify(candidates, ssArr, threshold)
  }

  /** D3 — SimHash: 16-bit signature from distinct-word hashes; bit j is the
    * sign of Σ±1 over words (+ if word-hash bit j set). Near-dups = equal
    * simhash (bucketing on the signature — constant-size key).
    *
    * One aggregation with `bits` ± sum columns instead of exploding
    * (word × bit) rows: no 16× row inflation, single map-side-combined
    * shuffle on doc_id. */
  /** D3b — SimHash near-dups at Hamming distance ≤ 1: the plain
    * equal-signature bucket join misses pairs one flipped bit apart, which
    * at 100 TB is most true near-dups (any single differing word can flip
    * a bit). Candidate generation is the PIGEONHOLE band split (the
    * standard multi-index Hamming trick): a pair within Hamming distance 1
    * agrees EXACTLY on at least one half of the signature, so each doc
    * posts just 2 (band, half-key) rows, bucket-equal halves join, and a
    * codegen'd `bit_count(xor) <= 1` verifies the survivors. Shuffle
    * volume is 2 constant-width rows per doc — it does not grow with
    * `bits` (the previous multi-probe formulation posted bits+1 probes per
    * doc: 49× at the default width) — and the final distinct() touches
    * candidates only (equal signatures match on both halves).
    *
    * Two safety rails against bucket explosion (a hot bucket makes the
    * band join quadratic in its size):
    *   - `bits` defaults to 48, wide enough that same-domain docs no
    *     longer collide by chance (16 bits produced ~25k pairs from 500
    *     synthetic docs). The portable md5-based [[graft.llm.TextOps.h60]]
    *     word hash carries 60 usable bits and the DuckDB oracle's
    *     `pow(2,b)` mirror is exact through 2^53, so `bits` ≤ 53; a
    *     production xxhash64 swap (same seam as d2's) lifts it to 64.
    *   - degenerate docs (empty/boilerplate text — identical signatures by
    *     the thousand) are df-pruned like d4's shingles: any full-signature
    *     bucket holding more than `maxBucket` docs is dropped before the
    *     band join, capping the worst bucket at maxBucket² pairs. The
    *     prune is mirrored in the oracle. */
  def simhashNearDups(documents: DataFrame, bits: Int = 48,
      maxBucket: Int = 100, algo: String = "md5"): DataFrame = {
    require(bits >= 2 && bits <= (if (algo == "xxh64") 64 else 53),
      s"bits out of range for algo $algo (md5: [2,53] — h60 word hash + " +
        s"exact DuckDB pow mirror; xxh64: [2,64]), got $bits")
    val sigs = tracked(simhash(documents, bits, algo))
    val smallBuckets = sigs.groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxBucket)
      .select("simhash")
    val safe = sigs.join(smallBuckets, "simhash")
    val low = bits / 2
    val banded = safe.select(col("doc_id"), col("simhash"), explode(array(
      struct(lit(0).as("band"), shiftright(col("simhash"), low).as("key")),
      struct(lit(1).as("band"),
        col("simhash").bitwiseAND(lit((1L << low) - 1)).as("key")))).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val left = banded.select(col("band"), col("key"),
      col("doc_id").as("id_a"), col("simhash").as("sig_a"))
    val right = banded.select(col("band"), col("key"),
      col("doc_id").as("id_b"), col("simhash").as("sig_b"))
    left.join(right, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(expr("bit_count(sig_a ^ sig_b) <= 1"))
      .select("id_a", "id_b")
      .distinct()
      .orderBy("id_a", "id_b")
  }

  /** Unsorted: the d3 query surface adds its own deterministic ORDER BY;
    * pipeline consumers (d3b) persist and join the signatures — a sort
    * here would cost a range exchange for nothing.
    *
    * One codegen'd [[graft.functions.SimHashExpr]] call per document — a
    * narrow map, no explode, no shuffle. The previous formulation exploded
    * (doc × distinct-word) rows and ran a `bits`-column conditional
    * aggregation just to reassemble per-doc bit sums; at bits=48 that was
    * the dominant cost of d3b (7.2 s of its sf0.1 time was signatures). */
  def simhash(documents: DataFrame, bits: Int = 16,
      algo: String = "md5"): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents.select(col("doc_id"),
      call_function("graft_simhash", col("text"), lit(bits), lit(algo)).as("simhash"))
  }

  /** D5 — INCREMENTAL near-dup: dedupe an incoming batch against an
    * existing corpus WITHOUT touching corpus text. This is the shape dedup
    * actually takes in a production training-data pipeline: re-running d2
    * over corpus+increment is O(corpus) per increment — a 100 TB corpus
    * ingesting 100 GB/day would re-shingle the whole lake daily. Here the
    * corpus contributes only its two maintained side tables, each appended
    * (never rebuilt) when an increment is admitted:
    *   - `corpusIndex` — the (doc_id, band, key) LSH [[bandIndex]];
    *   - `corpusShingles` — (doc_id, sh_arr), for Jaccard verification of
    *     matched candidates only.
    * The increment's shingles/signatures/bands are a narrow map over the
    * new docs alone ([[ShinglesExpr]]/[[graft.functions.MinHashExpr]]);
    * candidates = new-vs-corpus (join on the index's (band, key) — at
    * deployment scale the index is bucketed on that key, so the join
    * shuffles only the increment) ∪ new-vs-new (self-join of the
    * increment's bands). Per-increment cost is O(increment + matches),
    * independent of corpus size.
    *
    * Returns (id_a, id_b, jaccard) with id_b ALWAYS in the increment and
    * id_a its keeper from corpus or increment — for a corpus-vs-new pair
    * id_a is the corpus member whatever the numeric order (streaming ids
    * are not monotone); within the increment the lower id keeps. When
    * corpus ids sort below increment ids (as in the d5 fixture) this is
    * exactly d2's pair set restricted to pairs whose later member is new
    * (the oracle mirrors this as the d2 SQL + `id_b > split`). */
  def incrementalNearDups(newShingles: DataFrame, corpusShingles: DataFrame,
      corpusIndex: DataFrame, threshold: Double = 0.5,
      numPerms: Int = 32, bands: Int = 8): DataFrame = {
    val newSh = tracked(newShingles)
    val newBands = tracked(
      bandIndex(signaturesFromShingleArrays(newSh, numPerms), numPerms, bands))
    val newSide = newBands.select(col("band"), col("key"), col("doc_id").as("id_b"))
    // Corpus-vs-new pairs are kept REGARDLESS of id order (the corpus
    // member is the keeper id_a, the new member id_b): streaming ingest
    // does not guarantee monotone doc_ids, and an `id_a < id_b` filter
    // here would silently admit any new doc whose id sorts below its
    // corpus near-duplicate. Only the identity pair of a replayed,
    // already-admitted doc (same id on both sides) is dropped.
    val vsCorpus = corpusIndex
      .select(col("band"), col("key"), col("doc_id").as("id_a"))
      .join(newSide, Seq("band", "key"))
      .filter(col("id_a") =!= col("id_b"))
    // Within the increment the lower id is the keeper, as in d2.
    val vsBatch = newBands.select(col("band"), col("key"), col("doc_id").as("id_a"))
      .join(newSide, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
    // Normalize per UNORDERED pair (a replayed doc can surface the same
    // pair via both routes with swapped roles); corpus orientation (pri 0)
    // wins so id_b is always the new member — the admission loop rejects
    // id_b. Same single shuffle as the previous `distinct()`.
    val candidates = vsCorpus.select(col("id_a"), col("id_b"), lit(0).as("pri"))
      .unionByName(vsBatch.select(col("id_a"), col("id_b"), lit(1).as("pri")))
      .groupBy(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .agg(min_by(struct(col("id_a"), col("id_b")),
        struct(col("pri"), col("id_a"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    // A replayed increment whose previous attempt was already admitted
    // appears on BOTH sides; duplicated shingle rows would inflate the
    // verify intersection (n_inter > n_a, a zero/negative Jaccard
    // denominator). The increment wins; the corpus copy is dropped via a
    // broadcast anti-join on the (small) increment id set — never a
    // corpus-wide dedup shuffle.
    val corpusOnly = corpusShingles.join(
      broadcast(newSh.select("doc_id")), Seq("doc_id"), "left_anti")
    jaccardVerify(candidates, corpusOnly.unionByName(newSh), threshold)
  }

  /** D6 — near-dup GROUP RESOLUTION: pairs are not yet a dedup decision.
    * This turns a pair set (id_a < id_b) into connected components and
    * elects the minimum doc_id of each component as its canonical
    * representative — transitive closure, so a chain a≈b≈c collapses to
    * one kept doc even when (a,c) itself never passed the threshold.
    *
    * Algorithm: min-label propagation WITH POINTER DOUBLING — each round
    * every doc takes the min over (its own label, its neighbors' labels,
    * its label's label). The neighbor term alone converges in O(component
    * diameter) rounds; the pointer-jump term (adopt the label of the doc
    * you currently point at — sound because that doc's label is in the
    * same component, monotone because labels only decrease) doubles the
    * reach per round, so convergence is O(log diameter) — the
    * large-star/pointer-jumping acceleration from the Hash-to-Min /
    * large-star-small-star literature (Vassilvitskii et al.). maxRounds =
    * 20 therefore covers components of diameter ~2^20; if an adversarial
    * corpus still hasn't converged the result is EMITTED, not aborted
    * (degrade-don't-destroy): every doc's group_id is already a genuine
    * member of its component — merely possibly not yet the global min, so
    * one component may elect more than one keeper — and a warning names
    * the residual. At 100 TB each round shuffles (doc, label) longs only —
    * never text — and exactly one label frame stays persisted between
    * rounds (the previous round is unpersisted as soon as the next is
    * materialized).
    *
    * Returns (doc_id, group_id, keep) for every document in `allDocs`;
    * docs in no pair are their own singleton group (keep = true). */
  def nearDupGroups(allDocs: DataFrame, pairs: DataFrame,
      maxRounds: Int = 20, reliableCheckpoints: Boolean = false): DataFrame = {
    val edges = tracked(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // Each round's frame has its LOGICAL PLAN TRUNCATED, not merely
    // persisted: round r's plan references round r-1 three times (union +
    // neighbor join + pointer self-join), so without truncation the plan
    // grows ~4× per round — Catalyst re-analysis and plan stringification
    // go quadratic-to-OOM long before the data does (the standard
    // iterative-algorithm hazard; GraphFrames CC checkpoints for the same
    // reason). The default re-wraps the round's RDD in a fresh one-node
    // plan and persists it through the cache manager — eager (like
    // checkpoint), no disk round-trip, and unpersist() actually frees it
    // (localCheckpoint caches at the RDD layer where Dataset.unpersist
    // cannot reach). A long multi-hour cluster run passes
    // reliableCheckpoints=true (requires spark.sparkContext
    // .setCheckpointDir) so an executor loss replays from the checkpoint
    // instead of recomputing the round chain.
    def snap(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(eager = false)
      else df.sparkSession.createDataFrame(df.rdd, df.schema).persist()
    // `persisted` is the handle unpersist acts on; `labels` is its
    // (doc_id, label) view (identical in round 0, a projection once the
    // round frames carry the `old` column — unpersisting a projection
    // would silently miss the cache entry).
    var persisted = snap(allDocs.select(col("doc_id"), col("doc_id").as("label")))
    var labels = persisted
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val viaNeighbors = edges
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .select(col("dst").as("doc_id"), col("label"))
      // pointer doubling: doc -> label -> that doc's own (smaller) label
      val viaPointer = labels.select(col("doc_id"), col("label").as("ptr"))
        .join(labels.select(col("doc_id").as("ptr"), col("label")), "ptr")
        .select(col("doc_id"), col("label"))
      // The convergence check rides INSIDE the round's one aggregation:
      // the own-label row carries `old`, min() ignores the nulls on the
      // propagated rows, and the post-agg `label < old` filter count both
      // MATERIALIZES the new frame (filling its cache) and reports how
      // many labels moved — one job per round where the previous form
      // paid a materialization job plus a labels⋈next join job.
      val next = snap(
        labels.withColumn("old", col("label"))
          .unionByName(viaNeighbors.withColumn("old", lit(null).cast("long")))
          .unionByName(viaPointer.withColumn("old", lit(null).cast("long")))
          .groupBy("doc_id").agg(min("label").as("label"), min("old").as("old")))
      changed = next.filter(col("label") < col("old")).count()
      // only now is the previous round released — ≤ 1 label frame
      // persisted between rounds, 2 transiently during the count
      persisted.unpersist(blocking = false)
      persisted = next
      labels = next.select("doc_id", "label")
      round += 1
    }
    if (changed != 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"nearDupGroups: $changed labels still moving after $maxRounds rounds " +
          "(component diameter > 2^maxRounds); emitting the current refinement")
    // survives until the caller's releaseCaches(), like every tracked frame
    trackedPersists.synchronized { trackedPersists += persisted }
    labels
      .select(col("doc_id"), col("label").as("group_id"),
        (col("doc_id") === col("label")).as("keep"))
      .orderBy("doc_id")
  }

  /** D8 — benchmark DECONTAMINATION: flag training documents sharing at
    * least `minShared` distinct word-k-shingles with any document of a
    * held-out benchmark set — the n-gram collision rule from published
    * LM training-data pipelines (GPT-3 appendix C / The Pile use 8-13
    * grams; k ≤ 7 here keeps the polynomial shingle combine inside the
    * overflow bound shared with the DuckDB oracle, see [[
    * graft.functions.ShinglesExpr]]). Returns (doc_id, bench_id,
    * n_shared) per contaminated (train, benchmark) pair.
    *
    * Scale shape: the benchmark is the SMALL side by construction (eval
    * sets are thousands of docs, the corpus is the 100 TB side), so its
    * exploded shingle set is broadcast and the corpus is one narrow
    * scan + hash lookup — no corpus shuffle; only the HITS (tiny) reach
    * the (doc, bench) aggregation. A benchmark too large to broadcast
    * falls back to dropping the hint (shingle-key shuffle join of the
    * hits-bearing side). */
  def contaminationHits(documents: DataFrame, benchmark: DataFrame,
      k: Int = 7, minShared: Int = 1, algo: String = "md5"): DataFrame =
    contaminationHitsFromShingles(
      shingleArrays(documents, k, algo), benchmark, k, minShared, algo)

  /** [[contaminationHits]] over an EXISTING (doc_id, sh_arr) shingle
    * table — the form a maintained corpus uses (e.g. the d5 admission
    * index via [[graft.streaming.DedupStream.screenBenchmark]]): a new
    * benchmark release screens the whole corpus without re-reading or
    * re-shingling any corpus text. The rule's k is bound to the table's
    * shingle width. */
  def contaminationHitsFromShingles(docShingles: DataFrame, benchmark: DataFrame,
      k: Int, minShared: Int = 1, algo: String = "md5"): DataFrame = {
    val docSh = docShingles
      .select(col("doc_id"), explode(col("sh_arr")).as("sh"))
    val benchSh = shingleArrays(benchmark, k, algo)
      .select(col("doc_id").as("bench_id"), explode(col("sh_arr")).as("sh"))
    docSh.join(broadcast(benchSh), Seq("sh"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_id", "bench_id")
  }

  /** The filtering form of [[contaminationHits]]: the corpus minus every
    * flagged doc (broadcast anti-join on the small flagged id set). */
  def decontaminate(documents: DataFrame, benchmark: DataFrame,
      k: Int = 7, minShared: Int = 1, algo: String = "md5"): DataFrame =
    documents.join(
      broadcast(contaminationHits(documents, benchmark, k, minShared, algo)
        .select("doc_id").distinct()),
      Seq("doc_id"), "left_anti")

  /** D7 — INCREMENTAL group maintenance (d6 ∘ d5): fold an increment's
    * near-dup pairs into an EXISTING (doc_id, group_id) assignment without
    * recomputing connected components over the corpus. The observation
    * that makes this cheap: new pairs can only MERGE existing components
    * (or attach new docs) — they never split one — so it suffices to run
    * label propagation on the SUPER-NODE graph whose vertices are the
    * touched old group ids plus the new doc ids, and whose edges are the
    * increment's pairs with each corpus endpoint replaced by its group id.
    * That graph is O(increment), not O(corpus): at 100 TB the corpus
    * enters only through (a) the endpoint→group lookup join (new pairs
    * against the doc_id-bucketed assignment table — shuffles only the
    * pairs) and (b) the final relabel, a broadcast of the (tiny) changed
    * group remap against the assignment table — a narrow map, no shuffle.
    *
    * Because an old group id IS the min doc_id of its members, the merged
    * super-component's min label equals the true min over all underlying
    * docs — the result is EXACTLY what d6 would produce over
    * corpus ∪ increment (the d7 oracle runs d6's recursive CTE over the
    * full document set to pin this). Requires corpus and increment doc_ids
    * to be disjoint (the admission pipeline guarantees it — an already-
    * admitted id is never re-admitted).
    *
    * [[incrementalGroupDelta]] returns only the CHANGED rows (remapped
    * corpus docs + new docs) — the upsert batch a maintained assignment
    * store merges; [[incrementalGroups]] returns the full post-increment
    * view in d6's (doc_id, group_id, keep) shape. */
  def incrementalGroups(corpusGroups: DataFrame, newPairs: DataFrame,
      newDocIds: DataFrame, maxRounds: Int = 20): DataFrame = {
    val (remap, assign) = superNodeResolve(corpusGroups, newPairs, newDocIds, maxRounds)
    corpusGroups.select("doc_id", "group_id")
      .join(broadcast(remap), Seq("group_id"), "left")
      .select(col("doc_id"), coalesce(col("new_group"), col("group_id")).as("group_id"))
      .unionByName(assign)
      .select(col("doc_id"), col("group_id"),
        (col("doc_id") === col("group_id")).as("keep"))
      .orderBy("doc_id")
  }

  /** The changed-rows-only form of [[incrementalGroups]]: corpus docs
    * whose group id moved (their old component merged with a smaller one)
    * plus the increment's assignments. Size O(touched components +
    * increment); a deployment MERGEs this into the bucketed assignment
    * table so untouched groups' rows are never rewritten. */
  def incrementalGroupDelta(corpusGroups: DataFrame, newPairs: DataFrame,
      newDocIds: DataFrame, maxRounds: Int = 20): DataFrame = {
    val (remap, assign) = superNodeResolve(corpusGroups, newPairs, newDocIds, maxRounds)
    corpusGroups.select("doc_id", "group_id")
      .join(broadcast(remap), Seq("group_id"))
      .select(col("doc_id"), col("new_group").as("group_id"))
      .unionByName(assign)
  }

  /** Shared core: label-propagate the super-node graph; returns
    * (remap: old group_id → new_group for groups that CHANGED,
    *  assign: (doc_id, group_id) for every new doc). Both are
    * increment-sized. */
  private def superNodeResolve(corpusGroups: DataFrame, newPairs: DataFrame,
      newDocIds: DataFrame, maxRounds: Int): (DataFrame, DataFrame) = {
    val g = corpusGroups.select("doc_id", "group_id")
    // The pair frame feeds endpoints (twice), the super-edge build, and —
    // symmetrized — every CC round; without a persist each consumer would
    // re-execute the whole upstream pair pipeline (for d5 input, a full
    // verify join per consumption).
    val p = tracked(newPairs.select("id_a", "id_b"))
    // Lift each pair endpoint to its super-node: corpus doc → its group
    // id, new doc → itself. The lookup is one STREAMED corpus scan probed
    // by the broadcast endpoint set (increment-sized); its result is again
    // small and broadcast back into the pair frame — the assignment table
    // is never exchanged, which the d7 plan gate asserts. A plain left
    // join here would sort-merge-shuffle the corpus per increment.
    val endpoints = p.select(col("id_a").as("doc_id"))
      .unionByName(p.select(col("id_b").as("doc_id"))).distinct()
    val lifted = tracked(
      g.join(broadcast(endpoints), Seq("doc_id"), "left_semi"))
    val superEdges = p
      .join(broadcast(lifted.select(col("doc_id").as("id_a"), col("group_id").as("ga"))),
        Seq("id_a"), "left")
      .join(broadcast(lifted.select(col("doc_id").as("id_b"), col("group_id").as("gb"))),
        Seq("id_b"), "left")
      .select(coalesce(col("ga"), col("id_a")).as("id_a"),
        coalesce(col("gb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val nodes = tracked(
      superEdges.select(col("id_a").as("doc_id"))
        .unionByName(superEdges.select(col("id_b").as("doc_id")))
        .unionByName(newDocIds.select(col("doc_id")))
        .distinct())
    val cc = nearDupGroups(nodes, superEdges, maxRounds)
      .select(col("doc_id").as("node"), col("group_id").as("new_group"))
    // Old-group nodes are exactly the cc nodes that are NOT new docs (a
    // node enters either from newDocIds or as a lifted corpus group id) —
    // identified with a broadcast anti-join on the increment's own ids.
    // Deriving them from the assignment table instead (distinct group_id)
    // would shuffle the whole corpus, the exact cost this operator exists
    // to avoid.
    val remap = cc
      .join(broadcast(newDocIds.select(col("doc_id").as("node"))), Seq("node"), "left_anti")
      .filter(col("node") =!= col("new_group"))
      .select(col("node").as("group_id"), col("new_group"))
    val assign = cc
      .join(broadcast(newDocIds.select(col("doc_id").as("node"))), Seq("node"))
      .select(col("node").as("doc_id"), col("new_group").as("group_id"))
    (remap, assign)
  }

  /** D9 — duplicated-SPAN detection: find maximal runs of consecutive
    * word-k-grams shared verbatim between two documents, the distributed
    * re-expression of exact-substring dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" — their
    * suffix-array pass finds verbatim ≥50-token spans; near-dup pair
    * metrics like d2's Jaccard can't see a 200-word boilerplate block
    * pasted into an otherwise-unique 10k-word doc).
    *
    * Algorithm (seed-and-extend, the standard diagonal trick from
    * bioinformatics seed alignment): (1) each doc emits its POSITIONAL
    * k-gram hash array — one codegen'd [[graft.functions.PosShinglesExpr]]
    * call, a narrow map; (2) seeds in more than `maxDf` positions
    * corpus-wide are df-pruned (ubiquitous k-grams — "of the same" —
    * generate quadratic candidates and no span evidence; a span crossing a
    * pruned seed splits into two reported spans, an accepted and mirrored
    * approximation); (3) the pruned seed table self-joins on the hash —
    * matched positions of a shared substring all lie on one DIAGONAL
    * (pos_a − pos_b constant), so (4) per (pair, diagonal), consecutive
    * pos_a values merge into maximal runs with one gaps-and-islands window
    * (the u2 pattern), and a run of m seeds is a shared span of m + k − 1
    * words, reported when ≥ `minSpan`.
    *
    * Scale shape: the self-join shuffles (kh, doc_id, pos) longs — O(corpus
    * tokens), the irreducible cost of token-resolution dedup (the
    * suffix-array construction it replaces is likewise O(tokens)) — with
    * the df-prune capping any hot key at maxDf² matches; the islands
    * window shuffles MATCHED seeds only, partitioned by (pair, diagonal).
    * Seed WIDTH is the match-volume lever, not the df cap: k = 5 default
    * because common 3-grams just under any reasonable cap still generate
    * quadratic noise (fixture measurement: 1.27M seed matches at k=3 vs
    * 18k truly-span-bearing ones; 5-gram collisions are rare enough that
    * the result is identical and the match join shrinks ~50×). Any
    * maximal span ≥ max(k, minSpan) words is k-invariant, so widening k
    * below minSpan changes cost, not output.
    *
    * Hash-collision honesty: a SINGLE-seed span (span_len == k) can be a
    * phantom — two different k-grams colliding in the 2^30 hash domain
    * (≈ seeds²/2p expected phantoms corpus-wide; the sf0.001 fixture
    * exhibits exactly one under xxh64). Runs of ≥ 2 seeds require
    * independent simultaneous collisions and are collision-proof in
    * practice — the default minSpan = 8 (4 seeds) is far past it, and
    * the verbatim-confirmation seam below removes even the single-seed
    * residue.
    * Never text: a doc's words enter as 60-bit hashes and leave as span
    * coordinates. At 100 TB the seed table is the thing to bucket by hash
    * prefix and the verbatim-span confirmation (re-reading the two docs'
    * texts at the reported offsets) rides the d2-style verify seam; hash
    * seeds are deterministic in both engines so the oracle needs no such
    * re-read. */
  /** The positional seed table (doc_id, pos, kh) — d9's working set and
    * its MAINTAINED-INDEX schema for the incremental form: in deployment
    * it is a table bucketed by kh (hash prefix), appended per admitted
    * increment, exactly the d5 band-index discipline applied to span
    * detection. */
  def positionalSeeds(documents: DataFrame, k: Int = 5,
      algo: String = "md5"): DataFrame =
    seedsFromKhArrays(khArrays(documents, k, algo))

  /** The per-doc positional k-gram hash ARRAY — the ONE
    * `graft_pos_shingles` evaluation both positional-index families
    * derive from: [[seedsFromKhArrays]] posexplodes it into d9's seed
    * rows, [[winnowFromKhArrays]] window-mins it into t21's sketch. The
    * admission loop materializes THIS frame once per batch and writes
    * both sides off it, so maintaining the sketch beside the seeds never
    * hashes the text a second time. */
  def khArrays(documents: DataFrame, k: Int = 5,
      algo: String = "md5"): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents.select(col("doc_id"),
      call_function("graft_pos_shingles", col("text"), lit(k), lit(algo))
        .as("kh_arr"))
  }

  /** d9's (doc_id, pos, kh) seed rows off a [[khArrays]] frame. */
  def seedsFromKhArrays(kh: DataFrame): DataFrame =
    kh.select(col("doc_id"),
      posexplode(col("kh_arr")).as(Seq("pos", "kh")))

  /** t21's (doc_id, fp) winnow sketch off a [[khArrays]] frame — the
    * window-min HOF chain of [[winnowFingerprints]] with the hash
    * evaluation factored out (shared with the seed side at admission). */
  def winnowFromKhArrays(kh: DataFrame, w: Int = 4): DataFrame =
    kh.filter(size(col("kh_arr")) > 0)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), greatest(size(col("kh_arr")) - w, lit(0))),
          i => array_min(slice(col("kh_arr"), i + 1, lit(w)))))).as("fp"))

  /** Per-kh seed-position counts of a seed frame — the (kh, df) STATS row
    * schema maintained beside the seed index (sum-mergeable partials: the
    * admission loop appends one stats file per batch and compaction folds
    * them, so [[incrementalSpans]]' df prune joins maintained counts
    * instead of re-aggregating the corpus-sized seed table). */
  def seedStats(seeds: DataFrame): DataFrame =
    seeds.groupBy("kh").agg(count(lit(1)).as("df"))

  /** T21 — WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003 — the MOSS algorithm): over the doc's positional k-gram hash
    * sequence (d9's seed chain, shared via `graft_pos_shingles` so the
    * two fingerprint families cannot drift), slide a window of `w`
    * consecutive hashes and keep each window's MINIMUM; the distinct
    * kept hashes are the doc's sketch. The guarantee that makes it a
    * dedup primitive: any verbatim overlap of ≥ k + w − 1 words (= 8 at
    * the defaults, exactly d9's minSpan) contains a full window on both
    * sides, so the two docs MUST share a fingerprint — detection at
    * ~1/w the index size of the full seed table.
    *
    * Short-doc clamp (the domain rule's fine print): docs shorter than
    * k words have no k-gram and DROP (the d9 domain rule); docs with at
    * least k but fewer than k + w − 1 words have fewer than w k-gram
    * hashes — no full window exists, and the clamped start index
    * (`greatest(m − w, 0)`) makes them fingerprint their GLOBAL minimum
    * over the short window instead. Consequence: the ≥ k + w − 1
    * guarantee above is a LOWER bound on when a shared fingerprint is
    * forced, not an upper bound on when one can occur — two sub-window
    * docs (or a sub-window doc against a long one) can still pair on an
    * overlap below that threshold when the short doc's global min falls
    * inside it. That is standard winnowing behavior (MOSS fingerprints
    * short files too); a consumer wanting strict ≥ k + w − 1 semantics
    * pre-filters probes to `size(split(text)) >= k + w - 1`.
    *
    * Scale shape: one narrow all-codegen HOF chain per doc (transform
    * over `sequence(0, greatest(m − w, 0))` — greatest() because a
    * start>stop sequence runs DESCENDING — array_min over slice,
    * array_distinct, explode); the sketch shuffles at ~tokens/w rows per
    * doc and text never leaves the projection. */
  def winnowFingerprints(documents: DataFrame, k: Int = 5, w: Int = 4,
      algo: String = "md5"): DataFrame =
    winnowRaw(documents, k, w, algo).orderBy("doc_id", "fp")

  private def winnowRaw(documents: DataFrame, k: Int, w: Int,
      algo: String): DataFrame =
    winnowFromKhArrays(khArrays(documents, k, algo), w)

  /** T21b — winnow-sketch similarity: pairs sharing ≥ `minShared`
    * fingerprints, the MOSS match report. Inverted-index join on the
    * fingerprint (the d4 shape over the 1/w-sized sketch instead of the
    * full shingle set), (min, max) orientation, and the d4/d9 df rail:
    * a fingerprint carried by more than `maxDf` docs is boilerplate and
    * is pruned before the pair join — the worst key posts maxDf² pairs,
    * never corpus². `n_shared` counts distinct shared fingerprints
    * (each doc's sketch is distinct by construction). */
  def winnowSimilarity(documents: DataFrame, k: Int = 5, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 100,
      algo: String = "md5"): DataFrame = {
    val fps = tracked(winnowRaw(documents, k, w, algo))
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val pr = fps.join(rare, Seq("fp"))
    pr.as("a").join(pr.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("id_a", "id_b")
  }

  /** T21c — the SERVED winnow screen: an increment's sketches against a
    * MAINTAINED corpus fingerprint table (the t21 sketch as serving
    * state — in a deployment that needs pair-level duplicate detection
    * but not span coordinates, the 1/w-sized sketch table replaces the
    * full seed index). The m4d serving discipline: the corpus enters
    * only through its (doc_id, fp) rows; the COMBINED population drives
    * the df rail (pruning the increment side suffices — every candidate
    * has a new-side row); corpus member rides as id_a whatever the
    * numeric order; the increment's own ids are anti-joined out of the
    * corpus side so a replayed batch's internal pairs surface exactly
    * once, (min, max)-oriented. */
  def winnowScreen(corpusFps: DataFrame, newDocs: DataFrame,
      k: Int = 5, w: Int = 4, minShared: Int = 2, maxDf: Int = 100,
      algo: String = "md5"): DataFrame = {
    val incr = tracked(winnowRaw(newDocs, k, w, algo))
    val cf = corpusFps.select("doc_id", "fp")
      .join(broadcast(newDocs.select("doc_id")), Seq("doc_id"), "left_anti")
    val ok = incr.groupBy("fp").agg(count(lit(1)).as("nn"))
      .join(cf.groupBy("fp").agg(count(lit(1)).as("nc")), Seq("fp"), "left")
      .filter(col("nn") + coalesce(col("nc"), lit(0L)) <= maxDf)
      .select("fp")
    val np = incr.join(ok, Seq("fp"))
    def sided(df: DataFrame, side: String) =
      df.select(col("fp"), col("doc_id").as(s"id_$side"))
    val vsCorpus = sided(cf, "a").join(sided(np, "b"), Seq("fp"))
      .filter(col("id_a") =!= col("id_b"))
    val vsNew = sided(np, "a").join(sided(np, "b"), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
    vsCorpus.unionByName(vsNew)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("id_a", "id_b")
  }

  /** Shared islands tail: merge matched seed positions (id_a, id_b, pos_a,
    * pos_b) into maximal diagonal runs and report spans ≥ minSpan words. */
  private def spanIslands(matches: DataFrame, k: Int, minSpan: Int): DataFrame = {
    val m = matches.withColumn("diag", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    m.withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy("id_a", "id_b", "diag", "island")
      .agg(min(col("pos_a")).as("sa"), count(lit(1)).as("n_seeds"))
      .filter(col("n_seeds") + (k - 1) >= minSpan)
      .select(col("id_a"), col("id_b"),
        col("sa").cast("long").as("start_a"),
        (col("sa") - col("diag")).cast("long").as("start_b"),
        (col("n_seeds") + (k - 1)).cast("long").as("span_len"))
      .orderBy("id_a", "id_b", "start_a", "start_b")
  }

  def duplicatedSpans(documents: DataFrame, k: Int = 5, minSpan: Int = 8,
      maxDf: Int = 100, algo: String = "md5"): DataFrame = {
    val seeds = tracked(positionalSeeds(documents, k, algo))
    val rare = seeds.groupBy("kh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("kh")
    val pruned = tracked(seeds.join(rare, "kh"))
    val matches = pruned.select(col("kh"), col("doc_id").as("id_a"), col("pos").as("pos_a"))
      .join(pruned.select(col("kh"), col("doc_id").as("id_b"), col("pos").as("pos_b")), "kh")
      .filter(col("id_a") < col("id_b"))
    spanIslands(matches, k, minSpan)
  }

  /** D9b — INCREMENTAL span screening (d9 ∘ d5): find verbatim shared
    * spans between an increment and an existing corpus WITHOUT touching
    * corpus text. The corpus contributes only its maintained positional
    * seed table ([[positionalSeeds]] schema, appended per admitted
    * increment); the increment's seeds are one narrow codegen map over the
    * new docs. Candidates are corpus-vs-new (seed-hash join against the
    * index — kh-bucketed at deployment, so only the increment shuffles)
    * plus new-vs-new (increment self-join); per-increment cost is
    * O(increment tokens + matches), independent of corpus size.
    *
    * Output spans carry the CORPUS member as id_a for corpus-vs-new pairs
    * REGARDLESS of numeric id order (streaming ids are not monotone — the
    * d5 lesson) and the lower id as id_a within the increment. The df
    * prune uses seed frequency over index ∪ increment, computed as
    * increment counts + the MAINTAINED (kh, df) stats table
    * ([[seedStats]] schema, sum-mergeable partial rows updated per
    * admission beside the seed index) — the corpus seed table is never
    * re-aggregated, so per-increment cost really is O(increment tokens +
    * matches). Requires corpus and increment doc ids to be disjoint (the
    * admission pipeline guarantees it, as for d7). */
  def incrementalSpans(newDocs: DataFrame, corpusSeeds: DataFrame,
      corpusSeedStats: DataFrame, k: Int = 5, minSpan: Int = 8,
      maxDf: Int = 100, algo: String = "md5"): DataFrame = {
    val newSeeds = tracked(positionalSeeds(newDocs, k, algo))
    // df prune against the maintained stats: the increment's per-kh counts
    // (increment-sized) pull the stats rows for exactly those kh — the
    // semi-join prunes the stats scan (kh-bucketed at deployment, it
    // prunes to the increment's buckets) and the partial-row sum runs on
    // the matched, increment-kh-sized remainder only. No frame here is
    // corpus-sized after the semi-join. No forced broadcast: the
    // increment's distinct-kh set is O(increment tokens), so a large
    // backfill increment would make a broadcast hint an unbounded
    // driver-side build — AQE broadcasts the expected-small case by size
    // and degrades to a shuffle semi-join for oversized increments.
    val newDfs = tracked(newSeeds.groupBy("kh").agg(count(lit(1)).as("df_new")))
    val corpusDf = corpusSeedStats
      .join(newDfs.select("kh"), Seq("kh"), "left_semi")
      .groupBy("kh").agg(sum("df").as("df_corpus"))
    val rare = newDfs.join(corpusDf, Seq("kh"), "left")
      .filter(col("df_new") + coalesce(col("df_corpus"), lit(0L)) <= maxDf)
      .select("kh")
    val newPruned = tracked(newSeeds.join(rare, "kh"))
    // pruning the INCREMENT side alone suffices: every candidate match has
    // a new-side seed, so a pruned kh generates no rows from either route —
    // the corpus index is never re-filtered
    val vsCorpus = corpusSeeds
      .select(col("kh"), col("doc_id").as("id_a"), col("pos").as("pos_a"))
      .join(newPruned.select(col("kh"), col("doc_id").as("id_b"), col("pos").as("pos_b")), "kh")
    val vsNew = newPruned.select(col("kh"), col("doc_id").as("id_a"), col("pos").as("pos_a"))
      .join(newPruned.select(col("kh"), col("doc_id").as("id_b"), col("pos").as("pos_b")), "kh")
      .filter(col("id_a") < col("id_b"))
    spanIslands(vsCorpus.drop("kh").unionByName(vsNew.drop("kh")), k, minSpan)
  }

  /** D9c — duplicated-span SCRUB: the remediation half of d9's detection
    * (Lee et al. 2022's dedup policy — "remove all but one occurrence"):
    * every reported maximal span keeps its FIRST occurrence (the lower
    * doc_id, d9's id_a) and its covered words are removed from the later
    * doc's text. Output is the whole corpus — (doc_id, text_clean,
    * n_words, n_removed) — untouched docs pass through verbatim at
    * n_removed = 0. Chained copies converge to ONE surviving occurrence:
    * with A < B < C sharing a span, B scrubs as (A,B)'s b-side and C as
    * (A,C)/(B,C)'s, leaving only A's copy. Overlapping spans from
    * different pairs union their position sets (the exists() test below
    * is a union by construction).
    *
    * Scale shape: d9's detection dominates; remediation adds ONE
    * doc_id-keyed left join against per-later-doc interval lists (the
    * collect_list is doc-bounded — ≤ words/k intervals per doc — never
    * corpus-sized) and a narrow all-codegen higher-order chain: kept
    * positions = filter(sequence, ¬exists(intervals)), rebuilt by
    * transform + array_join. No window, no second text shuffle, and the
    * interval join carries span coordinates only — text stays in its
    * scan partition. */
  def spanScrub(documents: DataFrame, k: Int = 5, minSpan: Int = 8,
      maxDf: Int = 100, algo: String = "md5"): DataFrame = {
    val spans = duplicatedSpans(documents, k, minSpan, maxDf, algo)
    val intervals = spans.groupBy(col("id_b").as("doc_id"))
      .agg(collect_list(struct(col("start_b").as("s"),
        (col("start_b") + col("span_len")).as("e"))).as("iv"))
    documents.join(intervals, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        // null-UNSAFE lambda below: an absent interval list must read as
        // the empty list, not null (exists over null nulls the keep test
        // and would scrub the whole untouched doc)
        coalesce(col("iv"),
          array().cast("array<struct<s:bigint,e:bigint>>")).as("iv"))
      .withColumn("words", split(col("text"), " ", -1))
      .withColumn("kept", filter(
        sequence(lit(0), size(col("words")) - 1),
        p => not(exists(col("iv"), i => p >= i("s") && p < i("e")))))
      .select(col("doc_id"),
        array_join(transform(col("kept"),
          p => element_at(col("words"), p + 1)), " ").as("text_clean"),
        size(col("words")).cast("long").as("n_words"),
        (size(col("words")) - size(col("kept"))).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /** D6b — quality-aware KEEPER SELECTION: d6/d7 elect the minimum doc_id
    * of each near-dup group, which is the right CANONICAL id but the wrong
    * editorial policy — a production pipeline keeps the best-quality
    * member (longest, least boilerplate; the curation rule in
    * Gopher/FineWeb-class pipelines) and drops the rest. Input is the
    * MAINTAINED group assignment (d6's output, a served table like d7's)
    * joined to the t1/t5 quality score; per group the max-score member
    * wins, ties to the lower doc_id for determinism.
    *
    * Scale shape: the doc→group join is doc_id-keyed (co-located when the
    * assignment table is doc_id-bucketed, the d7 deployment layout); the
    * per-group argmax is one map-side-combinable `max_by` aggregation on
    * (group, score, id) triples — no window over the corpus, no text. The
    * broadcast back to members is group-keyed and the winners frame is
    * groups-sized (≤ docs). */
  def qualityKeepers(groups: DataFrame, quality: DataFrame): DataFrame = {
    val members = groups.select("doc_id", "group_id")
      .join(quality.select("doc_id", "quality_score"), "doc_id")
    // argmax(quality_score), tie → min doc_id: max_by over a struct whose
    // second key inverts the id order (doc ids are non-negative longs)
    val winners = members.groupBy("group_id")
      .agg(max_by(col("doc_id"),
        struct(col("quality_score"), lit(Long.MaxValue) - col("doc_id"))).as("keep_id"))
    members.join(winners, "group_id")
      .select(col("doc_id"), col("group_id"), col("quality_score"),
        (col("doc_id") === col("keep_id")).as("keep"))
      .orderBy("doc_id")
  }

  // ---- D10: Bloom-filter membership pre-screen ------------------------

  /** D10 filter geometry — (m bits, k hashes, shard count) as an engine
    * CONFIG value rather than compile-time constants: a deployment sizes
    * the filter from its corpus cardinality (the a5d sketch) and target
    * FPR via [[BloomSizing.forCapacity]], and past single-bitset scale
    * routes keys across `shards` independent filters (each still a
    * bytes-sized plan parameter; `bits` is Int-typed, so one shard caps
    * just under 2^31 bits = 256 MiB ≈ 2.2×10⁸ keys at 1% — ~10⁹ keys is
    * 5 shards, which is exactly what the shard seam is for).
    * [[BloomSizing.Default]] is the test-corpus geometry the registered
    * d10 query and its oracle share. */
  final case class BloomSizing(bits: Int, hashes: Int, shards: Int = 1,
      designFpr: Double = 0.01) {
    require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")
    require(hashes >= 1, s"hashes must be >= 1, got $hashes")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(designFpr > 0 && designFpr < 1, s"designFpr must be in (0,1), got $designFpr")
    def bytes: Int = bits / 8
    /** Physical compatibility: two sizings whose (bits, hashes, shards)
      * agree produce OR-compatible partials regardless of their design
      * points — the check admission compatibility uses, since designFpr
      * is a warning threshold, not geometry. */
    def sameGeometry(o: BloomSizing): Boolean =
      bits == o.bits && hashes == o.hashes && shards == o.shards
    /** Theoretical FPR with `n` keys in ONE shard's filter:
      * (1 − e^(−k·n/m))^k. */
    def fprAt(n: Long): Double =
      math.pow(1.0 - math.exp(-hashes.toDouble * n / bits), hashes)
    /** Largest per-shard key count whose theoretical FPR stays ≤ target —
      * the design point a soak measures drift against. */
    def capacityAt(targetFpr: Double): Long = {
      require(targetFpr > 0 && targetFpr < 1, s"fpr must be in (0,1), got $targetFpr")
      // invert fprAt: n = −m·ln(1 − fpr^(1/k)) / k
      val n = -bits * math.log1p(-math.pow(targetFpr, 1.0 / hashes)) / hashes
      math.max(0L, math.floor(n).toLong)
    }
  }
  object BloomSizing {
    /** The test-corpus geometry (2^18 bits, 3 hashes): `capacityAt(0.01)`
      * ≈ 21k keys — k is pinned at 3 (the oracle mirrors 3 salts), below
      * the 1%-optimal k≈7, so capacity is ~21k, not the 10-bits/key rule's
      * 27k. RailSoakSpec measures the FPR curve at this boundary. */
    val Default: BloomSizing = BloomSizing(1 << 18, 3)
    /** Size a filter for `n` expected keys at `targetFpr`: the classic
      * m = ⌈−n·ln(fpr)/ln(2)²⌉ (≈ 10 bits/key at 1%) rounded up to whole
      * 64-bit words, k = round(m/n·ln 2), keys split across `shards`. */
    def forCapacity(n: Long, targetFpr: Double, shards: Int = 1): BloomSizing = {
      require(n > 0, s"capacity must be positive, got $n")
      require(targetFpr > 0 && targetFpr < 1, s"fpr must be in (0,1), got $targetFpr")
      require(shards >= 1, s"shards must be >= 1, got $shards")
      val perShard = math.max(1L, (n + shards - 1) / shards)
      val ln2 = math.log(2.0)
      val mRaw = math.ceil(-perShard * math.log(targetFpr) / (ln2 * ln2)).toLong
      val bits = ((mRaw + 63) / 64) * 64
      require(bits <= Int.MaxValue - 63,
        s"single-shard filter of $bits bits exceeds the bitset limit — raise shards")
      val k = math.max(1L, math.round(bits.toDouble / perShard * ln2)).toInt
      // the sized filter CARRIES its design-point FPR, so serving-path
      // drift checks compare against what the operator configured, not a
      // hardcoded constant
      BloomSizing(bits.toInt, k, shards, designFpr = targetFpr)
    }
  }

  /** [[BloomSizing.forCapacity]] fed by the corpus itself: cardinality
    * from the SAME HLL sketch a5d serves (approx_count_distinct over the
    * d1 exact-dedup key) with headroom for sketch error — the
    * deployment's sizing call, one narrow aggregation, never text. */
  def bloomSizingFor(corpus: DataFrame, targetFpr: Double = 0.01,
      shards: Int = 1, headroom: Double = 1.2): BloomSizing = {
    val n = corpus.select(approx_count_distinct(md5(col("text"))).as("n"))
      .head().getLong(0)
    BloomSizing.forCapacity(math.max(1L, math.ceil(n * headroom).toLong),
      targetFpr, shards)
  }

  /** The default geometry's constants — referenced by the d10 oracle SQL
    * (which mirrors the position arithmetic) and the streaming side. */
  val BloomBits: Int = BloomSizing.Default.bits
  val BloomHashes: Int = BloomSizing.Default.hashes

  /** The k bit positions of one document's content fingerprint: the
    * md5(text) exact-dedup key (d1's identity) re-hashed under k salts via
    * the shared 60-bit md5 prefix [[TextOps.h60]] — deterministic, so the
    * DuckDB oracle computes the identical positions. */
  private def bloomPositions(text: Column,
      sizing: BloomSizing = BloomSizing.Default): Seq[Column] =
    (0 until sizing.hashes).map(i =>
      h60(concat(lit(s"bloom$i-"), md5(text))) % sizing.bits)

  /** Shard route of one key — h60 under a salt DISJOINT from the position
    * salts (the same key must land on one filter while its positions stay
    * uncorrelated with the route). The key-range seam past single-bitset
    * scale: build and screen group by this column. */
  def bloomShardCol(text: Column, shards: Int): Column =
    if (shards == 1) lit(0L)
    else h60(concat(lit("bloomshard-"), md5(text))) % shards

  /** In-place OR of bitset `b` into `a` — the one merge both Bloom
    * aggregators share. Fails fast on a foreign-length buffer rather
    * than silently under-ORing. */
  private def orInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(b.length == a.length, s"bitset partial of ${b.length} bytes")
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  /** Typed Aggregator folding bit positions into one filter's byte-array
    * bitset (geometry from `bytes`). Associative + commutative → Spark
    * runs it MAP-SIDE: each partition reduces its positions into one
    * local m/8-byte buffer and only #partitions buffers reach the final
    * merge — the corpus itself is never shuffled (SURVEY §2.10's
    * aggregator discipline, applied to the classic scalable-dedup
    * build). */
  final case class BloomBitsetAgg(bytes: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    // The zero is an EMPTY sentinel, never written: Spark evaluates the
    // initial buffer once and can hand the SAME object to every group in
    // a task, so an in-place first write would bleed bits across groups
    // (observed as cumulative shard filters in the sharded build). The
    // first reduce/merge therefore allocates the group's OWN buffer.
    override def zero: Array[Byte] = Array.emptyByteArray
    private def own(b: Array[Byte]): Array[Byte] =
      if (b.length == 0) new Array[Byte](bytes) else b
    override def reduce(b: Array[Byte], p: Long): Array[Byte] = {
      val t = own(b)
      val i = p.toInt // p < bits by construction
      t(i >> 3) = (t(i >> 3) | (1 << (i & 7))).toByte; t
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (b.length == 0) own(a) else orInto(own(a), b)
    override def finish(r: Array[Byte]): Array[Byte] = own(r)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
  /** The default-geometry instance the streaming side shares. */
  val BloomAgg: BloomBitsetAgg = BloomBitsetAgg(BloomSizing.Default.bytes)

  /** OR-fold of bitset PARTIALS — the merge of per-batch [[bloomBuild]]
    * outputs, for the streaming side's compaction and serving (the same
    * sum-mergeable-partial discipline as the (kh, df) seed stats, with OR
    * as the merge). Associative + commutative; the zero (no partials) is
    * the empty filter. */
  final case class BloomOrFoldAgg(bytes: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    // Same empty-sentinel zero + copy-on-first-write as [[BloomBitsetAgg]]
    // (the shared-zero hazard is a property of mutable typed buffers, not
    // of this aggregator's input type).
    override def zero: Array[Byte] = Array.emptyByteArray
    private def own(b: Array[Byte]): Array[Byte] =
      if (b.length == 0) new Array[Byte](bytes) else b
    override def reduce(b: Array[Byte], r: Array[Byte]): Array[Byte] =
      if (r.length == 0) own(b) else orInto(own(b), r)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (b.length == 0) own(a) else orInto(own(a), b)
    override def finish(r: Array[Byte]): Array[Byte] = own(r)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
  /** The default-geometry instance the streaming side shares. */
  val BloomOrAgg: BloomOrFoldAgg = BloomOrFoldAgg(BloomSizing.Default.bytes)

  /** Fold a `bits` partials frame down to ONE bitset row — the shared
    * tail of [[graft.streaming.DedupStream.corpusBloom]] (serving) and
    * the compact() side fold. */
  def bloomFold(partials: DataFrame,
      sizing: BloomSizing = BloomSizing.Default): DataFrame =
    partials.select(col("bits")).as[Array[Byte]](Encoders.BINARY)
      .select(BloomOrFoldAgg(sizing.bytes).toColumn.name("bits"))
      .toDF("bits")

  /** Per-shard OR-fold of (shard, bits) partial rows — one bitset row per
    * shard (a NULL shard, i.e. a legacy pre-shard partial, folds as shard
    * 0, so unsharded history and sharded appends coexist). The streaming
    * side's compaction fold and serving read share this. */
  def bloomFoldSharded(partials: DataFrame, sizing: BloomSizing): DataFrame = {
    val spark = partials.sparkSession
    import spark.implicits._
    partials.select(coalesce(col("shard"), lit(0)).as("shard"), col("bits"))
      .as[(Int, Array[Byte])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(BloomOrFoldAgg(sizing.bytes).toColumn.name("bits"))
      .toDF("shard", "bits")
  }

  /** D10 build — the corpus's Bloom bitset as a driver-side value: one
    * narrow projection (k positions per doc, no text leaves the scan) +
    * one map-side-combining aggregation down to a single m/8-byte row.
    * Like the IVF centroids and PQ codebooks, the result is a bytes-sized
    * PLAN PARAMETER (32 KiB at the default geometry), not data. In
    * deployment it is built out-of-band beside the other maintained dedup
    * state and refreshed per admitted batch (bitsets OR, so increments
    * fold in associatively without touching the corpus), with `sizing`
    * from [[bloomSizingFor]]. */
  def bloomBuild(corpus: DataFrame,
      sizing: BloomSizing = BloomSizing.Default): Array[Byte] =
    corpus
      .select(explode(array(bloomPositions(col("text"), sizing): _*)).as("p"))
      .as[Long](Encoders.scalaLong)
      .select(BloomBitsetAgg(sizing.bytes).toColumn)
      .head()

  /** Sharded [[bloomBuild]] — the key-range seam past single-bitset
    * scale: keys route by [[bloomShardCol]] and each shard folds its own
    * m-bit filter in the SAME map-side aggregation (one pass, one
    * shards-row result — still bytes-sized: shards × m/8). Element `s` of
    * the result is shard s's bitset (empty shards yield empty filters, so
    * the array is always shards-long). */
  def bloomBuildSharded(corpus: DataFrame,
      sizing: BloomSizing): Array[Array[Byte]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val built = corpus
      .select(bloomShardCol(col("text"), sizing.shards).as("shard"),
        explode(array(bloomPositions(col("text"), sizing): _*)).as("p"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(BloomBitsetAgg(sizing.bytes).toColumn.name("bits"))
      .collect().toMap
    Array.tabulate(sizing.shards)(s =>
      built.getOrElse(s.toLong, new Array[Byte](sizing.bytes)))
  }

  /** D10 serve — screen an increment against the corpus bitset:
    * `maybe_dup` ⇔ all k positions set. The bitset rides in the plan as a
    * word-array literal (the e11b typedlit-codebook discipline) and each
    * test is element_at + bitwiseAND — a pure codegen'd narrow map, ZERO
    * shuffles and zero joins. This is the cheap first rung of the
    * admission ladder, and its guarantee covers the EXACT tier only: no
    * false negatives for byte-identical re-ingests (the filter is built
    * over md5(text) fingerprints), tunable-FPR false positives, so
    * "definitely new" docs skip the d1 exact-dup check and only
    * maybe-dups pay its verification. It cannot license skipping the
    * near-dup tiers — a near-duplicate shares no content fingerprint, so
    * d5's band joins must still see every doc.
    * Bits pack little-endian within each 64-bit word: bit p ↦ word
    * p>>6, in-word bit p&63 (= 8·(byte-in-word) + bit-in-byte). */
  def bloomScreen(increment: DataFrame, bits: Array[Byte],
      sizing: BloomSizing = BloomSizing.Default): DataFrame = {
    require(bits.length == sizing.bytes, s"bitset must be ${sizing.bytes} bytes")
    val words = typedlit(wordsOfBits(bits))
    val masks = typedlit((0 until 64).map(1L << _))
    val hit = bloomPositions(col("text"), sizing).map { p =>
      element_at(words, (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(masks, (p % 64).cast("int") + 1)) =!= 0L
    }.reduce(_ && _)
    increment
      .select(col("doc_id"), hit.as("maybe_dup"))
      .orderBy("doc_id")
  }

  /** Byte bitset → little-endian 64-bit words (the plan-literal packing
    * both screens share). */
  private def wordsOfBits(bits: Array[Byte]): Seq[Long] =
    bits.grouped(8).map(g =>
      g.zipWithIndex.map { case (b, i) => (b & 0xffL) << (8 * i) }
        .foldLeft(0L)(_ | _)).toSeq

  /** Realized health of a BUILT filter, from its fill alone: (fill
    * fraction, current FPR = fill^k, implied key count ≈ −m/k·ln(1−fill)
    * — the standard Bloom cardinality estimate). The admitted-corpus
    * cardinality is not a config value, so design-point drift must be
    * read off the serving bitset itself. */
  def bloomHealth(bits: Array[Byte],
      sizing: BloomSizing = BloomSizing.Default): (Double, Double, Long) = {
    require(bits.length == sizing.bytes, s"bitset must be ${sizing.bytes} bytes")
    val set = bits.foldLeft(0L)((n, b) => n + java.lang.Integer.bitCount(b & 0xff))
    val fill = set.toDouble / sizing.bits
    val keys = if (fill >= 1.0) Long.MaxValue
      else math.round(-sizing.bits.toDouble / sizing.hashes * math.log1p(-fill))
    (fill, math.pow(fill, sizing.hashes), keys)
  }

  /** Some(warning) when the filter has drifted past its design-point FPR
    * — the serving-path guard ([[graft.streaming.DedupStream.screenExact]]
    * surfaces it): the screen stays correct (no false negatives, ever)
    * but its "definitely new" yield decays, so the operator should
    * resize via [[BloomSizing.forCapacity]] and rebuild from the corpus. */
  def bloomHealthWarning(bits: Array[Byte],
      sizing: BloomSizing = BloomSizing.Default): Option[String] = {
    val (fill, fpr, keys) = bloomHealth(bits, sizing)
    // the threshold is the SIZING's design point (stamped with the
    // geometry) — a 0.005-target deployment warns at 0.005, not at a
    // hardcoded 1%
    if (fpr <= sizing.designFpr) None
    else Some(f"bloom filter past its design point: fill=$fill%.3f → " +
      f"FPR=$fpr%.4f > target ${sizing.designFpr}%.4f (≈$keys%d keys in " +
      f"${sizing.bits}%d bits); " +
      "screen stays no-false-negative but its skip yield decays — resize " +
      s"with BloomSizing.forCapacity and rebuild")
  }

  /** Sharded [[bloomScreen]] — each doc tests against ITS shard's filter:
    * the shard route picks a word array out of a 2-D plan literal
    * (shards × m/64 words), so the screen stays a pure codegen'd narrow
    * map with zero joins and zero shuffles at any shard count. */
  def bloomScreenSharded(increment: DataFrame, shardBits: Seq[Array[Byte]],
      sizing: BloomSizing): DataFrame = {
    require(shardBits.length == sizing.shards,
      s"expected ${sizing.shards} shard bitsets, got ${shardBits.length}")
    shardBits.foreach(b => require(b.length == sizing.bytes,
      s"bitset must be ${sizing.bytes} bytes"))
    val words2d = typedlit(shardBits.map(wordsOfBits))
    val masks = typedlit((0 until 64).map(1L << _))
    val shardWords = element_at(words2d,
      bloomShardCol(col("text"), sizing.shards).cast("int") + 1)
    val hit = bloomPositions(col("text"), sizing).map { p =>
      element_at(shardWords, (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(masks, (p % 64).cast("int") + 1)) =!= 0L
    }.reduce(_ && _)
    increment
      .select(col("doc_id"), hit.as("maybe_dup"))
      .orderBy("doc_id")
  }

  /** The built-in-functions formulation of the same signature (explode
    * distinct words → per-bit ±1 conditional sums → sign-pack) — kept as
    * the portability reference [[simhash]] is parity-verified against
    * (LlmSpec); the hot path uses the fused expression. */
  private[graft] def aggSimhash(documents: DataFrame, bits: Int = 16): DataFrame = {
    val words = documents
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", h60(col("w")))
    val bitSums = (0 until bits).map { j =>
      sum(when(expr(s"shiftright(h, $j) % 2") === 1, 1L).otherwise(-1L)).as(s"b$j")
    }
    words.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(j => when(col(s"b$j") > 0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }
}
