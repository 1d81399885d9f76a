package graft.model

/** Single source of truth for the synthetic Sui-shaped data model that the
  * engine derives from the driver testdata (`events.parquet`).
  *
  * The reference engine (cozy-creator/huracan) indexes Sui *objects*: an
  * object-change stream (`ObjectItem`, main/src/etl.rs:53-63) is folded into
  * a current-state `objects` store with latest-version-wins upserts
  * (main/src/etl.rs:1227-1267). We reproduce that data model
  * deterministically from the `events` table so every operator has a DuckDB
  * oracle. The SAME constants drive both the Spark DataFrame derivation
  * ([[ObjectsModel]]) and the oracle SQL ([[graft.oracle.OracleSql]]) — keep
  * the two in sync through this object only.
  *
  * Mapping (events → object-change stream):
  *  - `cp`          = event_id / 10          (checkpoint sequence, dense)
  *  - `_id`         = "0x" + lpad(event_id % IdSpace, 6, '0')
  *  - `version`     = event_id               (monotone, unique → total order)
  *  - change kind   = signup→created, purchase→deleted, error→wrapped
  *                    (dropped, cf. parse_change main/src/client.rs:178-190),
  *                    click/view→mutated
  *  - ownership     = user_id % 4 → Address|Object|Shared|Immutable
  *                    (server/src/main.rs:157-164); Object-owned rows are
  *                    dynamic-field children whose `owner` is a parent _id
  *  - type tag      = pkg::module::Struct[<generics>]
  *                    (server/src/main.rs:166-176)
  *  - failures      = version % FailureMod == FailureRem → dead-letter queue
  *                    (Pulsar DLQ, main/src/pulsar.rs:10-20)
  */
object ModelConf {
  /** Events per checkpoint (reference: checkpoints contain many tx). */
  val CpSize = 10L
  /** Live-object id space: distinct `_id`s = min(events, IdSpace). */
  val IdSpace = 1000L
  /** Owner id space for Address-owned objects. */
  val OwnerPad = 5
  val IdPad    = 6
  /** Simulated poison items: version % FailureMod == FailureRem fail the
    * enrichment fetch and land in the DLQ (K3). */
  val FailureMod = 97L
  val FailureRem = 13L
  /** Number of distinct packages / structs in the synthetic type space. */
  val PkgMod    = 3L
  val StructMod = 5L
  /** Dynamic-field child's value payload modulus. */
  val DynValMod = 50L
  /** storage_rebate synthesis (stored as *string*, parsed on read —
    * server/src/main.rs:441). */
  val RebateMul = 37L
  val RebateMod = 10000L

  /** Poll route covers cp % 3 == 0; livescan covers cp % 2 == 0 → overlap on
    * cp % 6 == 0 exercises J5 cross-source dedup (main/src/etl.rs:274-346). */
  val PollMod = 3L
  val LivescanMod = 2L

  /** Simulated ingest delay: ts_first_seen = ts_ms + version % IngestDelayMod
    * (ObjectItem carries both chain time `ts_sui` and pipeline-arrival time
    * `ts_first_seen`, main/src/etl.rs:59-60; the spread feeds the
    * extraction_latency metric, main/src/influx.rs:291-304). */
  val IngestDelayMod = 500L
}
