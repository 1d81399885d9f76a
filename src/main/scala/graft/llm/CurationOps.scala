package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C1 — the END-TO-END curation pipeline: the composition every operator
  * in the d/t tier exists to serve, as one callable unit. Order follows
  * the published pipelines (C4/Gopher/FineWeb): exact dedup first
  * (collapse identical texts so LSH never buckets exact copies — the d2
  * degenerate-corpus rule), then near-dup group resolution with
  * QUALITY-aware keeper election (d2→d6→d6b), then benchmark
  * decontamination (d8's k-gram collision rule), and finally the greedy
  * token-budget pack (t7) over the admitted survivors.
  *
  * Scale shape: no stage introduces a plan shape not already audited on
  * its standalone operator — the composition is pure DataFrame plumbing
  * (id-keyed joins and broadcast anti-joins between stages; the id sets
  * flowing between stages are keeper/contamination lists, corpus-sized at
  * worst and usually far smaller). At deployment each stage boundary is a
  * materialization point (the maintained tables d5/d7/d6b serve), so a
  * daily increment replays only the incremental forms; this one-shot form
  * is the ground-up batch build those increments fold into. */
object CurationOps {

  /** Returns the packed training mix in t7's shape (doc_id, lang,
    * n_tokens, quality_score, cum_tokens), best-quality-first. */
  def curateCorpus(documents: DataFrame, benchmark: DataFrame,
      budgetTokens: Long, threshold: Double = 0.5, contamK: Int = 4,
      contamMinShared: Int = 1): DataFrame = {
    // stage 1 — exact dedup: one keeper per identical text (d1)
    val keepExact = DedupOps.exactDedup(documents)
    val surviving = documents.join(keepExact, "doc_id")
    // stage 2 — near-dup groups + quality keeper election (d2 → d6 → d6b)
    val pairs = DedupOps.minhashNearDups(surviving, threshold)
    val groups = DedupOps.nearDupGroups(surviving, pairs)
    val keepQuality = DedupOps.qualityKeepers(groups, TextOps.textStats(surviving))
      .filter(col("keep")).select("doc_id")
    // stage 3 — decontamination: drop survivors colliding with the
    // held-out benchmark (d8 rule; hits are tiny → broadcast anti-join)
    val contaminated = DedupOps
      .contaminationHits(surviving, benchmark, contamK, contamMinShared)
      .select("doc_id").distinct()
    val admitted = keepQuality.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    // stage 4 — pack the token budget best-quality-first (t7)
    SamplingOps.packToBudget(documents.join(admitted, "doc_id"), budgetTokens)
  }
}
