package graft.model

import org.apache.spark.sql.streaming.Trigger

/** S8 + §2.9 — the reference's operational configuration envelope
  * (main/config.yaml, main/src/conf.rs) mapped onto Spark's knobs. The
  * reference hand-tunes a channel topology (worker counts, batch sizes,
  * timeouts); here the same intent lands on trigger cadence, partition
  * counts and microbatch sizing.
  *
  * | reference knob (config.yaml)      | here |
  * |---|---|
  * | `pollintervalms` 100 (:17)        | [[trigger]] ProcessingTime |
  * | `backfillthreshold` 3 (:11)       | [[backfillThreshold]] → IngestPipeline.decideMode |
  * | workers 4/8/2 (:36-39,59-62)      | [[scanPartitions]]/[[shufflePartitions]] |
  * | `objectqueries.batchsize` 50 (:41)| [[enrichBatchSize]] → MultimodalOps-style batch shape |
  * | `mongo.batchsize` 1024/4096 (:44,67) | [[storeBatchRows]] → microbatch admission hint |
  * | provider list per `net` (conf.rs:205-219) | [[sourceFor]] — named source roots |
  * | RPC rotation pool (client.rs:50-55)  | [[clientPool]] → ClientRotation.open |
  */
final case class EngineConf(
    pollIntervalMs: Long = 100L,
    backfillThreshold: Long = 3L,
    scanPartitions: Int = 4,
    shufflePartitions: Int = 32,
    enrichBatchSize: Int = 50,
    storeBatchRows: Int = 1024,
    net: String = "test",
    sources: Map[String, String] = Map("test" -> "/root/testdata/sf0.001"),
    providers: Map[String, Seq[String]] =
      Map("test" -> Seq("rpc-0", "rpc-1", "rpc-2")),
    bloomTargetFpr: Double = 0.01,
    bloomShards: Int = 1) {

  def trigger: Trigger = Trigger.ProcessingTime(s"$pollIntervalMs milliseconds")

  /** Config-driven source selection (S8): the reference picks its RPC
    * provider list by `net`; the engine picks the source root the same
    * way. Unknown net is a config error, as in conf.rs. */
  def sourceFor(netName: String = net): String =
    sources.getOrElse(netName,
      throw new IllegalArgumentException(s"no source configured for net '$netName'"))

  /** The rotation pool over `net`'s provider list
    * (conf.rs:205-219 selects the list; client.rs:50-55 opens the pool
    * on the FIRST provider, the rest spawn lazily at exhaustion —
    * [[graft.ops.ClientRotation]] carries the bookkeeping). Unknown or
    * empty net is a config error, as in conf.rs:213-217. */
  def clientPool(netName: String = net): graft.ops.ClientRotation.Pool = {
    val ps = providers.getOrElse(netName,
      throw new IllegalArgumentException(s"unknown net configuration: $netName"))
    graft.ops.ClientRotation.open(ps)
  }

  /** The d10 Bloom geometry for THIS deployment's corpus: capacity from
    * the a5d cardinality sketch, target FPR and shard count from config —
    * the round-13 replacement for the compile-time `BloomBits`/
    * `BloomHashes` constants (those remain only as the test-corpus
    * default the registered d10 query and its oracle share). */
  def bloomSizingFor(corpus: org.apache.spark.sql.DataFrame): graft.llm.DedupOps.BloomSizing =
    graft.llm.DedupOps.bloomSizingFor(corpus, bloomTargetFpr, bloomShards)

  /** Apply engine settings to a session builder. */
  def sparkSettings: Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.adaptive.enabled" -> "true")
}
