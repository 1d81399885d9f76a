package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.{ModelConf, ObjectsModel}
import graft.sources.JsonIngest

/** Structured Streaming assembly of the reference ingest pipeline
  * (etl::run, main/src/etl.rs:102-397):
  *
  *   source (S1 poll / S2 scan) → change parse (P10) → dedup (J4/J5)
  *   → enrichment (J3) → versioned upsert + checkpoint commit (K1/K2,
  *   via foreachBatch) → DLQ (K3) → metrics (K4 listener)
  *
  * The reference's hand-built channel topology (bounded channels, worker
  * pools, chunks_timeout batching, config.yaml:29-73) collapses into the
  * microbatch model: trigger interval = poll cadence, partition count =
  * worker parallelism, state store (RocksDB in both systems!) = the dedup
  * maps. Exactly-once = at-least-once microbatches + the idempotent,
  * commutative latest-wins MERGE (main/src/etl.rs:1249-1266) — replaying a
  * batch cannot regress the store.
  *
  * Scale: the store MERGE shuffles only on `_id` (the store's bucket key);
  * dedup state is keyed and watermark-bounded; nothing collects to the
  * driver.
  */
object IngestPipeline {

  /** Streaming change stream from a raw event stream (same derivation as
    * batch — ObjectsModel.deriveChanges is shared, P10 applied). */
  def changeStream(events: DataFrame): DataFrame =
    ObjectsModel.kept(ObjectsModel.deriveChanges(events))

  /** J4/J5 streaming dedup: one sighting per (id, version) across routes,
    * state in the (RocksDB-capable) state store, bounded by watermark —
    * the streaming form of the reference's RocksDB id-check
    * (main/src/etl.rs:963-975) + tx-digest map (:274-346, GC'd after 120
    * checkpoints ≈ our watermark horizon). Requires an event-time column
    * `ts_event` on the input. */
  def dedupStream(changes: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts_event", expr("timestamp_millis(ts_ms)"))
      .withWatermark("ts_event", watermarkDelay)
      .dropDuplicatesWithinWatermark("_id", "version")

  /** K1+K2 — idempotent versioned MERGE into the bucketed objects store
    * plus checkpoint-watermark append, executed per microbatch. The union +
    * window dedup is the pure-Spark MERGE equivalent (SURVEY §2.2 K1).
    *
    * Physical layout and crash safety live in [[BucketStore]]: immutable
    * per-bucket delta dirs + an atomically-renamed CURRENT manifest
    * pointer, with each merge rewriting ONLY the hash buckets containing
    * the batch's `_id`s — per-microbatch cost ∝ touched data, not store
    * size. A Delta/Iceberg MERGE INTO would replace these two calls
    * one-for-one (same seam as before, now with the incremental semantics
    * already in place). */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    BucketStore.read(spark, storeDir)

  def mergeStore(spark: SparkSession, storeDir: String, batch: DataFrame): Unit =
    BucketStore.merge(spark, storeDir, batch)

  /** A1 — per-checkpoint completion countdown as a stateful streaming
    * aggregation (flatMapGroupsWithState): counts arrivals per cp and emits
    * the cp exactly once when all `expected` items have been seen
    * (main/src/etl.rs:518-570). State is one counter per in-flight cp —
    * bounded, keyed, timeout-evicted. */
  /** `committed` is a tombstone: once a cp has emitted CpDone, late or
    * replayed sightings must not re-open the countdown and double-commit
    * (at-least-once upstream delivery). Tombstones are evicted by the
    * optional timeout in operational deployments — the timeout therefore
    * MUST exceed the replay horizon (the dedup watermark upstream bounds
    * it); a replay arriving after tombstone eviction would re-commit.
    * Note on upgrades: this state schema is persisted in the streaming
    * checkpoint; changing CpProgress requires a fresh checkpoint dir. */
  final case class CpProgress(seen: Long, committed: Boolean = false)
  final case class CpDone(cp: Long, items: Long)

  def completionCountdown(
      spark: SparkSession,
      items: Dataset[(Long, Long)], // (cp, expected)
      timeout: Option[String] = None): Dataset[CpDone] = {
    import spark.implicits._
    // Timeout eviction is opt-in: with ProcessingTimeTimeout pending,
    // Trigger.AvailableNow cannot terminate (it keeps scheduling batches to
    // fire timeouts), so operational deployments pass Some(duration) and
    // run a continuous trigger; bounded runs use NoTimeout.
    val timeoutConf = timeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    items
      .groupByKey(_._1)
      .flatMapGroupsWithState[CpProgress, CpDone](
        OutputMode.Append(), timeoutConf) {
        case (cp, rows, state: GroupState[CpProgress]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.getOption.exists(_.committed)) {
            rows.size // drain; replayed sightings of a committed cp are dropped
            timeout.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.seen).getOrElse(0L)
            var expected = -1L
            rows.foreach { case (_, exp) => seen += 1; expected = exp }
            if (expected >= 0 && seen >= expected) {
              state.update(CpProgress(seen, committed = true))
              timeout.foreach(state.setTimeoutDuration)
              Iterator.single(CpDone(cp, seen))
            } else {
              state.update(CpProgress(seen))
              timeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            }
          }
      }
  }

  /** W1 streaming — tumbling-window counts with watermark-bounded late
    * data (capability extension; batch equivalent in AggOps). */
  def windowedCounts(changes: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    changes
      .withColumn("ts_event", expr("timestamp_millis(ts_ms)"))
      .withWatermark("ts_event", watermarkDelay)
      .groupBy(window(col("ts_event"), "1 hour"), col("change_kind"))
      .agg(count(lit(1)).as("n"))

  /** Subscription surface (the reference ships a GraphQL subscription STUB
    * that echoes the requested type once, server/src/main.rs:489-498; ours
    * is the real thing): a push stream of change events matching a type
    * prefix. Caller attaches any sink (`memory` for tests, a socket/queue
    * sink in deployment). */
  def subscribe(changes: DataFrame, typePrefix: String): DataFrame =
    changes.filter(col("type_full").startsWith(typePrefix))
      .select("_id", "version", "change_kind", "type_full", "cp", "ts_ms")

  /** Ingest-mode selection (the monitor loop, main/src/etl.rs:145-391):
    * livescan while close to the tip, auto-backfill when more than
    * `backfillThreshold` checkpoints behind (config.yaml:11 → 3), and
    * backfill pauses the poll route (etl.rs:219-240). Pure decision
    * function — the scheduler acts on it per monitor tick. */
  sealed trait IngestMode { def pausePoll: Boolean }
  case object Livescan extends IngestMode { val pausePoll = false }
  case object Backfill extends IngestMode { val pausePoll = true }

  def decideMode(latestCp: Long, maxCompletedCp: Long, backfillThreshold: Long = 3): IngestMode = {
    val behind = math.max(0L, latestCp - maxCompletedCp)
    if (behind > backfillThreshold) Backfill else Livescan
  }

  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(dir)) {
      val w = Files.walk(dir)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }

  /** K3 message format — every dead letter is a JSON ENVELOPE
    * `(kind, payload)`, matching the reference's Pulsar DLQ messages,
    * which are JSON-serialized items (main/src/pulsar.rs:10-20,
    * macros/src/lib.rs:4-28). `payload` is the JSON serialization of the
    * failed change row (`change_failure`) or the original raw input line
    * (`corrupt_line`, S9's parse-error path). Parquet is only the
    * CONTAINER — the reference's is a Pulsar topic — so both kinds share
    * one directory, one replay consumer, and full line fidelity for
    * operator inspection/repair. */
  val KindChangeFailure = "change_failure"
  val KindCorruptLine = "corrupt_line"

  def deadLetterEnvelope(rows: DataFrame, kind: String): DataFrame = {
    val payload =
      if (kind == KindCorruptLine) col("raw_line")
      else to_json(struct(rows.columns.map(col).toSeq: _*))
    rows.select(lit(kind).as("kind"), payload.as("payload"))
  }

  /** Schema the `change_failure` payloads parse back into: the change-row
    * schema as derived from the declared event schema (computed from an
    * empty frame — pure schema arithmetic, no data pass). */
  private def changeRowSchema(spark: SparkSession): StructType = {
    val eventFields = JsonIngest.EventSchema.fields
      .filterNot(_.name == JsonIngest.Corrupt)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), StructType(eventFields))
    ObjectsModel.kept(ObjectsModel.deriveChanges(empty)).schema
  }

  /** S9 streaming source: PERMISSIVE JSONL scan with the declared event
    * schema; corrupt lines ride along in the [[JsonIngest.Corrupt]] column
    * until [[startCorruptLineDlq]] (bad side) / [[start]] (good side,
    * after dropping the corrupt column) consume them. */
  def jsonEventsStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(JsonIngest.EventSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", JsonIngest.Corrupt)
      .json(path)

  /** S9 → K3 wiring: streams the CORRUPT raw lines of a JSONL ingest into
    * the same batchId-keyed DLQ that [[replayDlq]] consumes — the
    * reference's parse-error path feeds the same dead-letter flow as fetch
    * errors (parse failures warned + metered, main/src/client.rs:118-143;
    * error items dead-lettered, main/src/etl.rs:480-488). Runs as its own
    * query beside the main ingest (own checkpoint; the file source tracks
    * consumed files per query), with a `jsonl-` batch prefix so its
    * batchId-keyed overwrite dirs can never collide with the main ingest's.
    * Clean batches write nothing. */
  def startCorruptLineDlq(
      spark: SparkSession,
      jsonPath: String,
      dlqDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    jsonEventsStream(spark, jsonPath).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val routed = JsonIngest.route(batch)
        try {
          if (!routed.bad.isEmpty)
            deadLetterEnvelope(routed.bad, KindCorruptLine)
              .write.mode("overwrite").parquet(s"$dlqDir/batch=jsonl-$batchId")
        } finally routed.release()
      }
      .start()

  /** K3 replay — dead letters re-enter the MERGE (SURVEY K3: "replay =
    * union back into source"; the reference replays from the Pulsar DLQ
    * topic, main/src/pulsar.rs:10-20). Safe under at-least-once replay
    * delivery: the latest-wins MERGE is idempotent, so replaying the same
    * dead letters twice cannot duplicate or regress the store. Returns the
    * number of items replayed.
    *
    * `change_failure` payloads parse straight back into change rows;
    * `corrupt_line` payloads are re-parsed against the declared event
    * schema and re-derived — lines an operator has repaired in place (or
    * that failed on a since-widened schema) revive, lines that are still
    * unparsable replay as nothing and should be inspected before `drain`
    * (drain deletes them with the rest).
    *
    * PRECONDITION: the store must have a single writer at a time — stop
    * the streaming query (or run replay from its own maintenance window)
    * before calling. The manifest protocol tolerates crashes, not
    * concurrent merges: two writers would both read CURRENT=manifest-n and
    * race on manifest-(n+1). (The reference has the same discipline: its
    * replay consumer is a separate run mode, not concurrent with ingest.) */
  def replayDlq(spark: SparkSession, storeDir: String, dlqDir: String,
      drain: Boolean = false): Long = {
    if (!Files.exists(Paths.get(dlqDir))) return 0L
    // batch=<id> subdirectories surface as a partition column on read;
    // persisted so the two kind-splits don't each re-scan the DLQ
    val dead = spark.read.parquet(dlqDir).drop("batch").persist()
    try {
      val failures = dead.filter(col("kind") === KindChangeFailure)
        .select(from_json(col("payload"), changeRowSchema(spark)).as("c"))
        .select("c.*")
      val revivedLines = dead.filter(col("kind") === KindCorruptLine)
        .select(from_json(col("payload"),
          StructType(JsonIngest.EventSchema.filterNot(_.name == JsonIngest.Corrupt))).as("e"))
        .select("e.*")
        .filter(col("event_id").isNotNull) // still-unparsable lines stay dead
      val replayable =
        failures.unionByName(ObjectsModel.kept(ObjectsModel.deriveChanges(revivedLines)))
          .persist()
      try {
        val n = replayable.count()
        if (n > 0) mergeStore(spark, storeDir, replayable)
        // drain = the consumer ACK after successful replay (pulsar.rs
        // consumer ack); merge-then-delete ordering means a crash in between
        // only causes a harmless re-replay next time
        if (drain) deleteRecursively(Paths.get(dlqDir))
        n
      } finally { replayable.unpersist(); () }
    } finally { dead.unpersist(); () }
  }

  /** Full pipeline wiring: change parse → dedup → split DLQ (K3) / store
    * MERGE (K1) + watermark commit (K2). Returns the started query.
    *
    * Per microbatch the ingest MODE is consulted (decideMode; monitor loop
    * main/src/etl.rs:215-240): `behind` is the cp GAP between the store's
    * tip and where the incoming batch starts — zero in contiguous steady
    * state, positive after downtime. When the gap exceeds
    * `backfillThreshold` the backfill takes over and the low-latency poll
    * route is PAUSED (pause_livescan, etl.rs:219-227): its rows spill to a
    * deferred area and re-enter the MERGE on the first caught-up batch
    * (resume, etl.rs:233-240). Deferral, like the DLQ, is batchId-keyed +
    * overwrite, and the deferred MERGE is idempotent — replays are safe.
    *
    * `eventsStream` must carry the raw event columns plus an event-time
    * `ts_event` timestamp column. */
  def start(
      spark: SparkSession,
      eventsStream: DataFrame,
      storeDir: String,
      dlqDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      backfillThreshold: Long = 3L,
      // K4 hook: mode-transition metrics fire exactly where the reference
      // writes them from the monitor loop (backfill_init etl.rs:222 →
      // influx.rs:232, pause_livescan :221 → :252, start_livescan resume
      // :238 → :271). Point it at MetricsListener.record to merge with the
      // listener's engine-observed points into one exported series.
      metricSink: (String, Double) => Unit = (_, _) => (),
      // K4 data-derived measurements per microbatch (opt-in: costs one
      // map-side-combined agg pass over the cached batch): the full
      // metricsSummary set through the same sink, minus the rows whose
      // STREAMING truth is emitted at the transition sites above
      // (backfill_init / pause_livescan / start_livescan /
      // checkpoints_behind) — the batch-derived approximations of those
      // would double-report under different semantics.
      emitBatchMetrics: Boolean = false): StreamingQuery = {
    val changes = dedupStream(changeStream(eventsStream))
    // Driver-side per-query state: the store tip is read from the store
    // ONCE (on the first batch after a [re]start) and then advanced from
    // each batch's own max(cp) — the mode check costs no extra store scan
    // in steady state. `paused` tracks the previous mode so transition
    // metrics fire per TRANSITION, as the reference's monitor loop does,
    // not per batch.
    var tipCache: Option[Long] = None
    var paused = false
    var started = false
    changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try {
          // K3: poisoned items → dead letters. Written to a batchId-keyed
          // directory with overwrite so an at-least-once batch REPLAY
          // rewrites the same partition instead of appending duplicates;
          // clean batches write nothing (at a 1 s trigger an unconditional
          // write would grow the DLQ by ~86k empty directories per day).
          val fails = ObjectsModel.failures(cached).drop("ts_event")
          if (!fails.isEmpty)
            deadLetterEnvelope(fails, KindChangeFailure)
              .write.mode("overwrite").parquet(s"$dlqDir/batch=$batchId")
          val ok = ObjectsModel.processed(cached).drop("ts_event")
          // bounds over the WHOLE kept batch, not just processed rows: an
          // all-poison batch still advances cp progress (its items are
          // accounted for in the DLQ), so it must still drive the mode
          // decision — otherwise deferred poll rows could strand behind a
          // poison-only batch. Truly empty batches (trailing idle
          // triggers) change nothing and must NOT force an early resume.
          val bounds = cached.agg(min(col("cp")), max(col("cp"))).head()
          if (!started) { metricSink("start_livescan", 1.0); started = true } // influx.rs:271
          if (emitBatchMetrics && !cached.isEmpty) {
            val transitionOwned =
              Set("backfill_init", "pause_livescan", "start_livescan", "checkpoints_behind")
            graft.ops.PipelineOps.metricsSummary(cached.drop("ts_event"), backfillThreshold)
              .collect().foreach { r =>
                val metric = r.getString(0)
                if (!transitionOwned(metric) && !r.isNullAt(1))
                  metricSink(metric, r.getLong(1).toDouble)
              }
          }
          val deferPath = Paths.get(storeDir, "_defer")
          if (!bounds.isNullAt(0)) {
            val batchStart = bounds.getLong(0)
            // store tip: last cp the MERGE has seen; a fresh store has
            // missed nothing by definition (backfill_init covers genesis)
            val storeTip = tipCache.getOrElse {
              if (BucketStore.exists(storeDir))
                Option(readStore(spark, storeDir).agg(max(col("cp"))).head().get(0))
                  .map(_.asInstanceOf[Long]).getOrElse(batchStart - 1)
              else batchStart - 1
            }
            val behind = math.max(0L, batchStart - 1 - storeTip)
            metricSink("checkpoints_behind", behind.toDouble) // influx.rs:170
            val mode = decideMode(batchStart - 1, storeTip, backfillThreshold)
            if (mode.pausePoll) {
              if (!paused) { // transition into backfill, etl.rs:219-227
                metricSink("backfill_init", 1.0)  // influx.rs:232
                metricSink("pause_livescan", behind.toDouble) // influx.rs:252
              }
              paused = true
              ok.filter(col("ingested_via") === "poll")
                .write.mode("overwrite").parquet(s"$deferPath/batch=$batchId")
              mergeStore(spark, storeDir, ok.filter(col("ingested_via") =!= "poll"))
            } else {
              if (paused) metricSink("start_livescan", 1.0) // resume, influx.rs:238/271
              paused = false
              val withDeferred =
                if (Files.exists(deferPath))
                  ok.unionByName(spark.read.parquet(deferPath.toString).drop("batch"))
                else ok
              mergeStore(spark, storeDir, withDeferred)
              deleteRecursively(deferPath)
            }
            tipCache = Some(math.max(storeTip, bounds.getLong(1)))
          }
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
