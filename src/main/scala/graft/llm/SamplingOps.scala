package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and data-mixing operators over the `documents` table — the
  * selection stage of a training-data pipeline: after cleaning (T1-T5) and
  * dedup (D1-D5), decide WHICH documents, and how much of each slice,
  * actually enter a training mix under a token budget.
  */
object SamplingOps {
  import TextOps.{h60, P}

  /** T6 — deterministic salted hash sample: keep a doc iff
    * h60(salt ‖ doc_id) mod `den` < `num`. Properties a training pipeline
    * needs that `rand()`/`TABLESAMPLE` lack: reproducible across runs and
    * engines (md5 is mirrored by the oracle), stable under repartition,
    * monotone in the rate (raising num strictly grows the sample, so a 1%
    * pilot is a subset of the later 10% run), and per-salt independent
    * (new salt → fresh draw). Pure narrow filter — pipelines with the
    * scan at any scale. */
  def hashSample(documents: DataFrame, num: Int, den: Int, salt: String): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"bad rate $num/$den")
    documents
      .filter(hashSamplePredicate(num, den, salt))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** The t6 membership predicate alone — for pipelines that need the
    * sampled rows with their FULL columns (t18e trains a tokenizer on the
    * sample's text), so the sample definition cannot fork from t6's. */
  def hashSamplePredicate(num: Int, den: Int, salt: String): Column = {
    require(num >= 0 && den > 0 && num <= den, s"bad rate $num/$den")
    h60(concat(lit(salt), lit("-"), col("doc_id"))) % den < num
  }

  private def withQualityAndTokens(documents: DataFrame,
      keyCol: String = "lang"): DataFrame = {
    val t = col("text")
    val padded = concat(lit(" "), t, lit(" "))
    val nTokens = TextOps.wsTokens(t)
    val nStop = TextOps.substrCount(padded, " the ") + TextOps.substrCount(padded, " a ")
    documents.select(
      col("doc_id"), col(keyCol),
      nTokens.as("n_tokens"),
      // same composite as T1's quality_score (round 4dp = oracle-portable)
      round(least(nTokens.cast("double") / lit(100.0), lit(1.0)) * 0.5 +
        (nStop.cast("double") / nTokens) * 0.5, 4).as("quality_score"))
  }

  /** The greedy budget rule: best-first order, keep while the running
    * token total (current row included) fits. */
  private def packWindow(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
      budget: Column): DataFrame =
    packWindow0(df, w).filter(col("cum_tokens") <= budget)

  /** T7 — pack a token budget with the best-quality documents: order by
    * (quality desc, doc_id), keep docs while cumulative tokens ≤ budget.
    *
    * The unpartitioned window is a single-reducer sort — fine for the
    * final mix of a few million rows, NOT for a raw 100 TB corpus. The
    * scale path is [[packToBudgetScalable]]; this form exists because it
    * is the direct statement of the semantics the scalable form must (and
    * is tested to) reproduce. */
  def packToBudget(documents: DataFrame, budgetTokens: Long): DataFrame =
    packWindow(withQualityAndTokens(documents),
      Window.orderBy(col("quality_score").desc, col("doc_id")), lit(budgetTokens))
      .select("doc_id", "lang", "n_tokens", "quality_score", "cum_tokens")
      .orderBy(col("quality_score").desc, col("doc_id"))

  /** Distributed exact prefix sum of `n_tokens` in the total order given
    * by `order` — the TWO-PHASE scan that replaces a single-reducer global
    * window: range-partition by the order so partition p holds a
    * contiguous slice, compute per-partition token totals (tiny: one row
    * per partition, collected to the driver), broadcast each partition's
    * starting offset back, and add it to a partition-local cumsum. The
    * expensive ordering is a range exchange across all reducers; the only
    * driver-side data is #partitions longs. Same recipe as
    * PipelineOps.descendingRangesScalable (U2). */
  private def twoPhaseCumTokens(scoredIn: DataFrame, order: Seq[Column],
      partitions: Int)(body: DataFrame => DataFrame): DataFrame = {
    // `pid` must be BAKED INTO a column on the materialized range
    // partitions: spark_partition_id() re-evaluated after the window's own
    // hash exchange would name the post-shuffle partitions instead
    val scored = scoredIn
      .repartitionByRange(partitions, order: _*)
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val offsets = scored
        .groupBy("pid").agg(sum("n_tokens").as("part_tokens"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val starts = (0 until partitions).scanLeft(0L) {
        case (acc, pid) => acc + offsets.getOrElse(pid, 0L)
      }
      val startCol = element_at(
        array(starts.take(partitions).map(lit): _*), col("pid") + 1)
      val local = Window.partitionBy(col("pid")).orderBy(order: _*)
      body(scored.withColumn("cum_tokens", sum(col("n_tokens")).over(
        local.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + startCol))
    } finally scored.unpersist(blocking = false)
  }

  /** T7 at scale — the same greedy pack via [[twoPhaseCumTokens]]. Output
    * is row-identical to [[packToBudget]] (spec-asserted). */
  def packToBudgetScalable(documents: DataFrame, budgetTokens: Long,
      partitions: Int = 32): DataFrame =
    twoPhaseCumTokens(withQualityAndTokens(documents),
      Seq(col("quality_score").desc, col("doc_id")), partitions) {
      _.filter(col("cum_tokens") <= budgetTokens)
        .select("doc_id", "lang", "n_tokens", "quality_score", "cum_tokens")
        .orderBy(col("quality_score").desc, col("doc_id"))
    }

  private def seqPackColumns(df: DataFrame, seqLen: Long): DataFrame =
    df.withColumn("start_token", col("cum_tokens") - col("n_tokens"))
      .withColumn("seq_id", floor(col("start_token") / seqLen).cast("long"))
      .withColumn("seq_offset", col("start_token") % seqLen)
      .select("doc_id", "n_tokens", "start_token", "seq_id", "seq_offset")
      .orderBy("doc_id")

  /** T9 — sequence packing: concatenate documents in doc_id order and cut
    * the token stream into fixed `seqLen` training sequences (the
    * packed-pretraining layout: documents are split across sequence
    * boundaries rather than padded). Emits each doc's global token offset
    * and the sequence id / in-sequence offset where it starts — the index
    * a loader needs to materialize any sequence. Single-window reference
    * form; [[packSequencesScalable]] is the distributed prefix-sum form
    * (row-identical, spec-asserted). */
  def packSequences(documents: DataFrame, seqLen: Long): DataFrame =
    seqPackColumns(
      packWindow0(withQualityAndTokens(documents), Window.orderBy(col("doc_id"))),
      seqLen)

  /** T9 at scale via [[twoPhaseCumTokens]]. */
  def packSequencesScalable(documents: DataFrame, seqLen: Long,
      partitions: Int = 32): DataFrame =
    twoPhaseCumTokens(withQualityAndTokens(documents),
      Seq(col("doc_id")), partitions)(seqPackColumns(_, seqLen))

  private def packWindow0(df: DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    df.withColumn("cum_tokens", sum(col("n_tokens")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** T12 — document CHUNKING with overlap: cut each document's word
    * stream into windows of `chunkTokens` words advancing by
    * `chunkTokens − overlap` (the standard long-document layout for
    * pretraining and retrieval corpora: every token appears in ≥ 1 chunk,
    * consecutive chunks share `overlap` words of context, the tail chunk
    * is short rather than padded). Every doc emits ≥ 1 chunk (an
    * under-length doc is its own chunk).
    *
    * Scale shape: one narrow per-row pass — the word split, the chunk
    * count arithmetic, and the slice/join all happen inside a single
    * projection + explode, no shuffle, no state; the output is ordered
    * only by the query surface's deterministic ORDER BY. Chunk count is
    * 1 + ⌈(n − chunkTokens)/step⌉ so starts are 0, step, 2·step, … and
    * the last start is < n. */
  def chunkDocuments(documents: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"bad chunking: chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    documents
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_chunks",
        (lit(1) + greatest(lit(0L),
          ceil((size(col("w")) - lit(chunkTokens)) / lit(step.toDouble)))).cast("int"))
      .select(col("doc_id"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"), col("w"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * step).cast("long").as("start_word"),
        size(slice(col("w"), col("chunk_id") * step + 1, lit(chunkTokens)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("w"), col("chunk_id") * step + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** T8 — mixture under per-language token quotas (data mixing): within
    * each language, best-quality docs fill that language's quota. The
    * window partitions by lang — state is bounded per key and languages
    * pack in parallel, so this form IS the scale path (a skewed dominant
    * language range-partitions within its key like [[packToBudgetScalable]]
    * if ever needed). Languages without a quota are excluded — the mix is
    * a whitelist, as in published LM data recipes. */
  def mixByQuota(documents: DataFrame, quotas: Map[String, Long]): DataFrame =
    mixByKeyQuota(documents, quotas, "lang")

  /** T8b — the same quota pack stratified by ANY key column: `source`
    * caps any one crawl dump's contribution (the Common-Crawl-dump mixing
    * rule), `lang` is T8, a domain column would cap sites. Same plan
    * shape — per-key window, bounded state, keys pack in parallel. */
  def mixByKeyQuota(documents: DataFrame, quotas: Map[String, Long],
      keyCol: String): DataFrame = {
    val quotaCol = quotas.foldLeft(lit(null).cast("long")) {
      case (acc, (key, q)) => when(col(keyCol) === key, q).otherwise(acc)
    }
    packWindow(
      withQualityAndTokens(documents, keyCol)
        .withColumn("quota", quotaCol).filter(col("quota").isNotNull),
      Window.partitionBy(keyCol).orderBy(col("quality_score").desc, col("doc_id")),
      col("quota"))
      .select(Seq("doc_id", keyCol, "n_tokens", "quality_score", "cum_tokens").map(col): _*)
      .orderBy(col(keyCol), col("quality_score").desc, col("doc_id"))
  }

  /** T16 — TEMPERATURE-flattened mixture budgets: per-key token budgets
    * B_k = ⌊B · w_k / Σw⌋ with w_k = n_k^τ — the multilingual sampling
    * rule of T5/mT5-class pipelines (τ < 1 upweights low-resource slices
    * so the mix isn't dominated by the biggest language/domain). Computed
    * here at τ = 1/2, the EXACT form: IEEE-754 sqrt is correctly rounded
    * in every engine while pow(x, τ) is not — arbitrary τ is the
    * documented one-expression swap, the t15 transcendental seam again.
    * The budgets then feed [[mixByKeyQuota]] as its quota map.
    *
    * Determinism discipline: Σw is read as max over the KEY-ORDERED
    * running sum, so both engines add the weights in the same sequence —
    * a frame-order hazard an unordered total would reintroduce. The
    * whole computation runs on the per-key aggregate (keys-sized — a plan
    * parameter, like the IVF centroid matrix), after one map-side
    * combined token-count shuffle over the corpus. */
  def temperatureBudgets(documents: DataFrame, budgetTokens: Long,
      keyCol: String = "lang"): DataFrame = {
    val t = col("text")
    val nTokens = TextOps.wsTokens(t)
    val perKey = documents.select(col(keyCol), nTokens.as("n"))
      .groupBy(keyCol).agg(sum("n").as("n_tokens"))
      .withColumn("weight", round(sqrt(col("n_tokens").cast("double")), 6))
    val run = Window.orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perKey
      .withColumn("cum_w", sum(col("weight")).over(run))
      .withColumn("total_w", max(col("cum_w")).over(all))
      .select(col(keyCol), col("n_tokens"), col("weight"),
        floor(lit(budgetTokens.toDouble) * col("weight") / col("total_w"))
          .cast("long").as("budget_tokens"))
      .orderBy(keyCol)
  }

  /** T17 — per-language quality-QUANTILE gate: keep the top keepNum/keepDen
    * fraction of each language's documents by quality score, with the
    * threshold read off a binned CDF instead of a per-doc rank.
    *
    * Why not percent_rank/ntile: a rank window partitioned by language
    * sorts EVERY document of the corpus — a full-corpus range exchange at
    * 100 TB just to learn ~L cutoffs. The 4-dp score is already discrete
    * (≤ 10001 distinct bins), so the CDF is exact on a bounded-cardinality
    * HISTOGRAM: one map-side-combining (lang, bin) count, a window over
    * ≤ L×10001 tiny rows, and a broadcast join of L thresholds back onto
    * the scan — the corpus is touched by narrow maps only. Same
    * fixed-point-binning trick as the e9 drift dial's integer-cents sums.
    *
    * Threshold rule (deterministic, tie-inclusive): thr_b = the largest
    * bin with cumulative-from-top count ≥ target, target = ⌈n·keepNum/
    * keepDen⌉; keep score-bin ≥ thr_b. Ties at the threshold inflate a
    * language's kept set past target rather than dropping arbitrarily. */
  def quantileGate(documents: DataFrame, keepNum: Int = 2, keepDen: Int = 5): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum, s"bad fraction $keepNum/$keepDen")
    val scored = withQualityAndTokens(documents)
      .withColumn("b", round(col("quality_score") * 10000).cast("long"))
    val hist = scored.groupBy("lang", "b").agg(count(lit(1)).as("c"))
    val target = hist.groupBy("lang").agg(sum("c").as("n"))
      .withColumn("target", expr(s"(n * $keepNum + ${keepDen - 1}) div $keepDen"))
    val cum = hist.withColumn("cc",
      sum("c").over(Window.partitionBy("lang").orderBy(col("b").desc)))
    val thr = cum.join(target, "lang")
      .filter(col("cc") >= col("target"))
      .groupBy("lang").agg(max("b").as("thr_b"))
    scored.join(broadcast(thr), "lang")
      .filter(col("b") >= col("thr_b"))
      .select(col("doc_id"), col("lang"), col("quality_score"), col("thr_b"))
      .orderBy("doc_id")
  }
}
