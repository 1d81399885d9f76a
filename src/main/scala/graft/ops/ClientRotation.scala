package graft.ops

/** Provider-pool ROTATION BOOKKEEPING — the deterministic model of the
  * reference's `with_client_rotation` macro (macros/src/lib.rs:31-122)
  * and its `ClientPool` state (main/src/client.rs:24-54: the pool opens
  * with ONE client; further providers spawn lazily).
  *
  * This is driver-side orchestration state, not a data-plane operator —
  * a Spark pipeline holds exactly one such pool per ingest driver, so it
  * is modeled as a pure state machine over scripted outcomes (the analog
  * of the macro's generated code over live RPC results) rather than as a
  * DataFrame op. The data-plane consequences of the same schedule are
  * already modeled where they touch rows: the retry ladder + cumulative
  * backoff column ([[PipelineOps.enrichWithFallback]], j3b).
  *
  * Reference semantics reproduced exactly, including the two surprises:
  *
  *  1. A rate-limited call whose re-sort leaves a backoff-FREE client at
  *     the front returns the 429 to the caller (macros/src/lib.rs:121
  *     reaches the trailing `res`) — rotation re-prioritizes the NEXT
  *     call; only when EVERY live client is in backoff does the macro
  *     retry transparently (spawn-or-sleep, then recurse, :85-118).
  *  2. Backoff state: failure factor f sleeps `min(2^f · 250 ms, 10 s)`
  *     (:77), a SUCCESS resets the serving client's backoff to None
  *     (:70-72), and the priority re-sort is a STABLE sort on expiry
  *     with backoff-free clients first (:53-57, 84).
  */
object ClientRotation {

  /** Active backoff: earliest allowed next use + the escalation factor
    * the NEXT 429 on this client will sleep with. */
  final case class Backoff(notBefore: Long, factor: Int)

  /** One live client; `id` indexes the provider config list, `reqs`
    * counts attempts served (client.rs:34 — observability, the macro
    * increments it per call). */
  final case class Client(id: Int, reqs: Long = 0L, backoff: Option[Backoff] = None)

  /** Pool state. `providers` are the configured names in spawn order
    * (conf.rs picks the list by net); `failingSpawns` models providers
    * whose client construction errors (lib.rs:98-104 warns and falls
    * through to the sleep path). `now`/`slept` are the model clock —
    * virtual millis, so the backoff schedule is assertable. */
  final case class Pool(
      providers: Seq[String],
      clients: Vector[Client],
      now: Long = 0L,
      slept: Long = 0L,
      failingSpawns: Set[Int] = Set.empty) {
    require(providers.nonEmpty, "no RPC providers configured") // conf.rs:215-217
    /** Rotation order as provider names — the observable the fixture
      * tests pin (head = the client the next call will use). */
    def order: Seq[String] = clients.map(c => providers(c.id))
  }

  /** The pool as constructed (client.rs:50-55): the FIRST provider only;
    * the rest spawn lazily at exhaustion. */
  def open(providers: Seq[String], failingSpawns: Set[Int] = Set.empty): Pool =
    Pool(providers, Vector(Client(0)), failingSpawns = failingSpawns)

  /** `min(2^f · 250 ms, 10 s)` — macros/src/lib.rs:77. The factor is
    * clamped before the shift: 2^6·250 ms already exceeds the 10 s cap,
    * and an unclamped `1L << f` wraps for f ≥ 64 (and overflows the
    * multiply from f ≥ 56), which would turn a long 429 storm's backoff
    * NEGATIVE instead of capped. */
  def backoffMillis(factor: Int): Long =
    math.min((1L << math.min(factor, 6)) * 250L, 10000L)

  /** One LOGICAL call through the macro: consumes one scripted outcome
    * (true = rate-limited) per physical attempt, transparently retrying
    * exactly when the reference does. Returns the evolved pool, the
    * unconsumed outcomes, and whether the call ultimately succeeded
    * (false = the 429 was returned to the caller, semantics №1 above). */
  def call(pool: Pool, outcomes: List[Boolean]): (Pool, List[Boolean], Boolean) = {
    require(outcomes.nonEmpty, "scripted outcomes exhausted mid-call")
    val limited :: rest = outcomes: @unchecked
    val head = pool.clients(0).copy(reqs = pool.clients(0).reqs + 1)
    if (!limited) {
      // client is OK → reset its backoff, if any (lib.rs:70-72)
      (pool.copy(clients = pool.clients.updated(0, head.copy(backoff = None))),
        rest, true)
    } else {
      // escalate the serving client's backoff (lib.rs:75-80)
      val f = head.backoff.map(_.factor).getOrElse(0)
      val escalated = head.copy(
        backoff = Some(Backoff(pool.now + backoffMillis(f), f + 1)))
      // re-prioritize: STABLE sort by expiry, backoff-free first
      // (lib.rs:84 — Option ordering puts None before every Some)
      val sorted = pool.clients.updated(0, escalated)
        .sortBy(_.backoff.map(_.notBefore))(
          Ordering.Option(Ordering.Long))
      val rotated = pool.copy(clients = sorted)
      sorted(0).backoff match {
        case None =>
          // a free client exists → the 429 propagates; the rotation
          // pays off on the NEXT call (lib.rs:121 trailing `res`)
          (rotated, rest, false)
        case Some(soonest) =>
          // every live client is limited: spawn the next provider if any
          // (inserted at the FRONT, lib.rs:92-96), else sleep out the
          // soonest expiry (lib.rs:109-114); then retry transparently
          val spawnIx = sorted.size
          val spawnable =
            pool.providers.size > spawnIx && !pool.failingSpawns(spawnIx)
          val next =
            if (spawnable)
              rotated.copy(clients = Client(spawnIx) +: sorted)
            else {
              val wait = math.max(0L, soonest.notBefore - pool.now)
              rotated.copy(now = pool.now + wait, slept = pool.slept + wait)
            }
          call(next, rest)
      }
    }
  }

  /** Fold a scripted outcome sequence through repeated logical calls —
    * the fixture harness: each element is one physical attempt's result,
    * and a new logical call begins wherever the previous one returned. */
  def run(pool: Pool, outcomes: List[Boolean]): (Pool, List[Boolean]) = {
    var p = pool
    var rest = outcomes
    var results = List.empty[Boolean]
    while (rest.nonEmpty) {
      val (p2, r2, ok) = call(p, rest)
      p = p2; rest = r2; results ::= ok
    }
    (p, results.reverse)
  }
}
