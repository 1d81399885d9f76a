package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.ModelConf._

/** Batch-form implementations of the ingest-pipeline operators (SURVEY §2.1,
  * §2.2, §2.4, §2.7). Batch-first so each is oracle-checkable; the streaming
  * assembly in [[graft.streaming.IngestPipeline]] reuses these functions
  * inside `foreachBatch` / stateful operators.
  */
object PipelineOps {

  /** S2 — partitioned range scan: walk checkpoints hi→lo skipping already-
    * completed ranges (do_scan, main/src/etl.rs:886-1025; skip consumption
    * :913-939). The reference round-robins cp ranges across N workers
    * (`step_by` with offset, :428-442); Spark's `range` source partitions
    * the id space the same way, and the skip is a broadcast LEFT ANTI join
    * (U3) — never a driver-side set. */
  def remainingCheckpoints(spark: SparkSession, maxCp: Long, completed: DataFrame): DataFrame =
    spark.range(0, maxCp + 1).toDF("cp")
      .join(broadcast(completed.select(col("_id").as("cp"))), Seq("cp"), "left_anti")
      .orderBy(col("cp").desc)

  /** S3 — paginated per-checkpoint scan: page size caps each checkpoint read
    * (≤1000 tx/page, main/src/etl.rs:46-48,942-952). Batch analog: first
    * page per cp via a bounded per-key window (state bounded by page size —
    * this is a top-k per key, so partial aggregation applies). */
  def firstPagePerCheckpoint(kept: DataFrame, pageSize: Int): DataFrame = {
    val w = Window.partitionBy("cp").orderBy(col("version"))
    kept.withColumn("page_rn", row_number().over(w))
      .filter(col("page_rn") <= pageSize)
  }

  /** S5/J3 — enrichment lookup join: the batched `multi_get_object` point
    * lookup (transform_batched, main/src/etl.rs:1135-1201) becomes a
    * broadcast-hash equi-join against the small provider dimension — no
    * shuffle of the big change stream, no per-row RPC. */
  def enrich(kept: DataFrame, nation: DataFrame): DataFrame =
    kept.join(
      broadcast(nation.select((col("n_nationkey").cast("long")).as("__nk"), col("n_name"))),
      kept("user_id") % 25 === col("__nk"), "left")
      .drop("__nk")

  /** J3b — enrichment with the reference's batch→per-item RETRY LADDER
    * (transform_batched error path, main/src/etl.rs:1156-1196): when a
    * BATCH fetch fails ("multi_get_object_with_options" rpc_error), each
    * of its items is retried individually; only items whose individual
    * fetch also fails dead-letter ("get_object_with_options"). Deletions
    * never fetch (:1152-1154). Modeled deterministically: the fetch of any
    * batch containing a poisoned item (FailureMod rule) fails wholesale —
    * exactly the reference failure shape, where one bad id fails the whole
    * multi-get — and `fetch_status` records which rung served each item.
    * The failed-batch key set is tiny (≤ poison count) → broadcast join;
    * the big stream never shuffles. */
  def enrichWithFallback(kept: DataFrame, nation: DataFrame, batchSize: Int = 50): DataFrame = {
    val itemPoisoned = col("version") % FailureMod === FailureRem
    val batchKey = floor(col("version") / batchSize)
    val failedBatches = kept.filter(itemPoisoned)
      .select(batchKey.as("__fb")).distinct()
    val withBatch = kept.withColumn("__bk", batchKey)
      .join(broadcast(failedBatches), col("__bk") === col("__fb"), "left")
    enrich(withBatch, nation)
      .withColumn("fetch_status",
        when(col("deletion"), "skipped_deletion")
          .when(itemPoisoned, "dead_letter")
          .when(col("__fb").isNotNull, "item_retry_ok")
          .otherwise("batch_ok"))
      .withColumn("n_name",
        when(col("deletion") || itemPoisoned, lit(null).cast("string"))
          .otherwise(col("n_name")))
      .withColumn("retry_waves",
        when(col("fetch_status") === "dead_letter", 2L)
          .when(col("fetch_status") === "item_retry_ok", 1L)
          .otherwise(0L))
      // The reference's rate-limit schedule (macros/src/lib.rs:75-79):
      // failure f backs off min(2^f × 250 ms, 10 s) before the next rung.
      // backoff_ms is the cumulative sleep an item's serving rung paid:
      // batch_ok/skipped = 0, item_retry_ok = 250, dead_letter = 750
      // (250 + 500). Provider ROTATION itself stays config, not an
      // operator (SURVEY §2.1): Spark task retry + this ladder carry the
      // semantics; the schedule is what was left unmodeled.
      .withColumn("backoff_ms", element_at(
        array(backoffSchedule.map(lit): _*), col("retry_waves").cast("int") + 1))
      .drop("__bk", "__fb")
  }

  /** backoffSchedule(w) = Σ_{f<w} min(2^f × 250 ms, 10 s) — cumulative
    * sleep before wave w is served, straight from the reference macro. */
  private[graft] val backoffSchedule: Seq[Long] =
    (0 to 7).scanLeft(0L)((acc, f) => acc + math.min((1L << f) * 250L, 10000L))

  /** P9 — deletion short-circuit: deletions bypass the (expensive)
    * enrichment fetch (main/src/etl.rs:1152-1154). Filter-split + union
    * keeps both branches fully parallel. */
  def withEnrichmentShortCircuit(kept: DataFrame, nation: DataFrame): DataFrame = {
    val dels = kept.filter(col("deletion")).withColumn("n_name", lit(null).cast("string"))
    val live = enrich(kept.filter(!col("deletion")), nation)
    live.unionByName(dels)
  }

  /** P11 — whitelist/blacklist type filter (main/src/client.rs:146-170,
    * exact ObjectType equality per utils.rs:29-37). */
  def typeAllowlist(df: DataFrame, whitelist: Seq[String], blacklist: Seq[String]): DataFrame = {
    val afterWl = if (whitelist.nonEmpty) df.filter(col("type_full").isin(whitelist: _*)) else df
    if (blacklist.nonEmpty) afterWl.filter(!col("type_full").isin(blacklist: _*)) else afterWl
  }

  /** J4 — persistent dedup, first-seen-wins per object id (RocksDB check in
    * do_scan, main/src/etl.rs:963-975). The reference is version-blind
    * (FIXME :968-969) but arrival order is scan order; we define arrival
    * order = version order so the batch form is deterministic. In streaming
    * this is `dropDuplicates("_id")` on the RocksDB state store. */
  def firstSeenWins(kept: DataFrame): DataFrame = {
    val w = Window.partitionBy("_id").orderBy(col("version"))
    kept.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** U1 — union of ingest routes (poll tee + livescan merge,
    * main/src/etl.rs:112-139,366-371). Routes overlap (poll covers cp%3==0,
    * livescan cp%2==0) which J5 then reconciles. */
  def pollRoute(kept: DataFrame): DataFrame =
    kept.filter(col("cp") % PollMod === 0).withColumn("route", lit("poll"))
  def livescanRoute(kept: DataFrame): DataFrame =
    kept.filter(col("cp") % LivescanMod === 0).withColumn("route", lit("livescan"))
  def unionRoutes(kept: DataFrame): DataFrame =
    pollRoute(kept).unionByName(livescanRoute(kept))

  /** J5 — cross-source tx dedup (txns_already_processed reconciliation,
    * main/src/etl.rs:274-346): keep one sighting per tx digest. The
    * reference keeps whichever route saw the tx first (arrival order);
    * routes are unordered here, so we fix a deterministic total order —
    * lexicographic on route name, i.e. 'livescan' wins an overlap. In
    * streaming: `dropDuplicates("previous_transaction")` with a watermark
    * bounding state (the reference GCs after 120 checkpoints). */
  def dedupAcrossRoutes(unioned: DataFrame): DataFrame = {
    val w = Window.partitionBy("previous_transaction")
      .orderBy(col("route"), col("version"))
    unioned.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** A3/K4 — per-checkpoint batch outcome counts (inserted/modified/
    * unchanged/deleted, main/src/etl.rs:1296-1301 + the Influx measurement
    * set, main/src/influx.rs). Map-side combine → tiny result. */
  def batchOutcomes(kept: DataFrame): DataFrame =
    kept.groupBy("cp").agg(
      count(lit(1)).as("n_items"),
      sum(when(col("change_kind") === "created", 1L).otherwise(0L)).as("n_created"),
      sum(when(col("change_kind") === "mutated", 1L).otherwise(0L)).as("n_mutated"),
      sum(when(col("deletion"), 1L).otherwise(0L)).as("n_deleted"),
      sum(when(col("version") % FailureMod === FailureRem, 1L).otherwise(0L)).as("n_failed"))

  /** K4 — metrics rollup in long form (metric, value), the batch analog of
    * the FULL Influx measurement set (main/src/influx.rs:11-313): mongo
    * batch outcomes incl. `unchanged` = n − inserted − modified
    * (etl.rs:1296-1301), ingest_error (:106) with the rpc_error (:129) /
    * mongo_write_error (:42) split, rpc_request (:150), create_checkpoint
    * (:62) / checkpoint_error (:83), current/final checkpoint (:190,:211),
    * checkpoints_behind (:170), extraction_latency (:291, from
    * ts_first_seen − ts_sui), and the mode-transition events backfill_init
    * (:232) / pause_livescan (:252) / start_livescan (:271) per the
    * decideMode rule (etl.rs:215-240). */
  def metricsSummary(kept: DataFrame, backfillThreshold: Long = 3L): DataFrame = {
    val failed = col("version") % FailureMod === FailureRem
    val completedCount =
      count(when(col("cp_failed") === 0, 1L)) // per-cp roll-up below
    val perCp = kept.groupBy("cp").agg(
      count(lit(1)).as("n"),
      sum(when(col("change_kind") === "created", 1L).otherwise(0L)).as("n_created"),
      sum(when(col("change_kind") === "mutated", 1L).otherwise(0L)).as("n_mutated"),
      sum(when(col("deletion"), 1L).otherwise(0L)).as("n_deleted"),
      sum(when(!col("deletion"), 1L).otherwise(0L)).as("n_fetched"),
      // error split (influx.rs:129 vs :42): fetch-path poison = rpc_error,
      // write-path (tombstone) poison = mongo_write_error
      sum(when(failed && !col("deletion"), 1L).otherwise(0L)).as("cp_rpc_err"),
      sum(when(failed && col("deletion"), 1L).otherwise(0L)).as("cp_mongo_err"),
      // per-item ingest lag for extraction_latency (influx.rs:291-304)
      sum(col("ts_first_seen") - col("ts_ms")).as("lat_sum"),
      sum(when(failed, 1L).otherwise(0L)).as("cp_failed"))
    val agg = perCp.agg(
      sum(col("n")).as("items_total"),
      sum(col("n_created")).as("inserted"),
      sum(col("n_mutated")).as("modified"),
      sum(col("n_deleted")).as("items_deleted"),
      sum(col("n_fetched")).as("rpc_request"),
      sum(col("cp_rpc_err")).as("rpc_error"),
      sum(col("cp_mongo_err")).as("mongo_write_error"),
      sum(col("cp_failed")).as("ingest_error"),
      count(lit(1)).as("checkpoints_seen"),
      completedCount.as("create_checkpoint"),
      count(when(col("cp_failed") > 0, 1L)).as("checkpoint_error"),
      max(col("cp")).as("current_checkpoint"),
      max(when(col("cp_failed") === 0, col("cp"))).as("final_checkpoint"),
      sum(col("lat_sum")).as("lat_total"))
    // derived scalars (all BIGINT): unchanged = n − inserted − modified
    // (etl.rs:1296-1301); checkpoints_behind = tip − last commit
    // (influx.rs:170); mode-transition events per the decideMode rule
    // (etl.rs:215-240): behind > threshold initializes a backfill and
    // pauses livescan; livescan itself always starts once.
    agg.selectExpr(
      "*",
      "items_total - inserted - modified AS unchanged",
      "current_checkpoint - final_checkpoint AS checkpoints_behind",
      "CAST(floor(lat_total / items_total) AS BIGINT) AS extraction_latency",
      s"CAST(CASE WHEN current_checkpoint - final_checkpoint > $backfillThreshold THEN 1 ELSE 0 END AS BIGINT) AS backfill_init",
      s"CAST(CASE WHEN current_checkpoint - final_checkpoint > $backfillThreshold THEN 1 ELSE 0 END AS BIGINT) AS pause_livescan",
      "CAST(1 AS BIGINT) AS start_livescan"
    ).selectExpr(
      "stack(19, 'items_total', items_total, 'inserted', inserted, " +
        "'modified', modified, 'unchanged', unchanged, " +
        "'items_deleted', items_deleted, " +
        "'rpc_request', rpc_request, 'rpc_error', rpc_error, " +
        "'mongo_write_error', mongo_write_error, 'ingest_error', ingest_error, " +
        "'checkpoints_seen', checkpoints_seen, 'create_checkpoint', create_checkpoint, " +
        "'checkpoint_error', checkpoint_error, 'current_checkpoint', current_checkpoint, " +
        "'final_checkpoint', final_checkpoint, 'checkpoints_behind', checkpoints_behind, " +
        "'extraction_latency', extraction_latency, 'backfill_init', backfill_init, " +
        "'pause_livescan', pause_livescan, 'start_livescan', start_livescan) AS (metric, value)")
  }

  /** U2 — gaps-and-islands: completed checkpoint ids → maximal descending
    * inclusive ranges (make_descending_ranges, main/src/utils.rs:6-26; the
    * reference's single unit test :39-48 is the golden case). Classic
    * `cp − row_number()` island key; one shuffle over the tiny watermark
    * table. */
  def descendingRanges(completed: DataFrame): DataFrame = {
    val w = Window.orderBy(col("_id"))
    completed
      .withColumn("island", col("_id") - row_number().over(w))
      .groupBy("island")
      .agg(max(col("_id")).as("range_end"), min(col("_id")).as("range_start"))
      .select(col("range_end"), col("range_start"))
      .orderBy(col("range_end").desc)
  }

  /** U2b — descending ranges with STOP-MARKER truncation (resume
    * semantics, main/src/etl.rs:616-635; marker field main/src/mongo.rs:
    * 10-17): a checkpoint doc with `stop = true` asserts every older
    * checkpoint is already complete even if not individually recorded.
    * stop_at = the NEWEST stop marker; checkpoints below it are dropped
    * from the island walk and a final pseudo-range (stop_at, 0) is
    * appended so the scanner halts there. Input needs (_id, stop) columns;
    * the scalar stop_at rides in as a broadcast single-row cross join —
    * no driver collect. */
  def descendingRangesWithStop(completed: DataFrame): DataFrame = {
    val stopAgg = completed.agg(
      coalesce(max(when(col("stop"), col("_id"))), lit(0L)).as("stop_at"))
    val kept = completed.crossJoin(broadcast(stopAgg))
      .filter(col("_id") >= col("stop_at"))
    val stopRow = stopAgg.filter(col("stop_at") > 0)
      .select(col("stop_at").as("range_end"), lit(0L).as("range_start"))
    descendingRanges(kept.select("_id"))
      .unionByName(stopRow)
      // the stop pseudo-range sorts last among equal ends (reference pushes
      // it as the final item)
      .orderBy(col("range_end").desc, col("range_start").desc)
  }

  /** U2 at scale — two-phase gaps-and-islands: phase 1 computes islands
    * WITHIN fixed-size chunks of the id space (window partitioned by chunk
    * → fully parallel), phase 2 merges islands that touch chunk boundaries
    * (operates on islands, which are ≤ rows and usually ≪ rows). Identical
    * output to [[descendingRanges]] (property-tested), but no global
    * single-partition window — this is the form to use if the watermark
    * table ever outgrows one task. */
  def descendingRangesScalable(completed: DataFrame, chunkSize: Long = 1 << 20): DataFrame = {
    val chunked = completed.withColumn("chunk", floor(col("_id") / chunkSize))
    val wInChunk = Window.partitionBy("chunk").orderBy("_id")
    val perChunk = chunked
      .withColumn("island", col("_id") - row_number().over(wInChunk))
      .groupBy("chunk", "island")
      .agg(max(col("_id")).as("range_end"), min(col("_id")).as("range_start"))
    // Phase 2: islands spanning a chunk boundary are adjacent in id space
    // (end + 1 == next start). Re-run the island trick over island START
    // ids using a running count — islands are few, but stay partitionable
    // by ordering key if ever needed.
    val wGlobal = Window.orderBy("range_start")
    perChunk
      .withColumn("prev_end", lag(col("range_end"), 1).over(wGlobal))
      .withColumn("new_grp",
        when(col("prev_end").isNull || col("range_start") - col("prev_end") > 1, 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("new_grp")).over(
        wGlobal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("grp")
      .agg(max(col("range_end")).as("range_end"), min(col("range_start")).as("range_start"))
      .select(col("range_end"), col("range_start"))
      .orderBy(col("range_end").desc)
  }

  /** S4 — cursor-walk segments (do_walk, main/src/etl.rs:675-821): walk
    * the checkpoint sequence by cursor, starting a new walk when the gap
    * exceeds the jump threshold (`etl.rs:864-869` jumps when the cursor
    * falls more than ~`1000/density` checkpoints behind). Gaps-and-islands
    * with tolerance: lag + running sum over the tiny watermark table. */
  def walkSegments(completed: DataFrame, jump: Long): DataFrame = {
    val w = Window.orderBy("_id")
    completed
      .withColumn("prev", lag(col("_id"), 1).over(w))
      .withColumn("new_seg",
        when(col("prev").isNull || col("_id") - col("prev") > jump, 1L).otherwise(0L))
      .withColumn("walk_id", sum(col("new_seg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("walk_id")
      .agg(min(col("_id")).as("cp_start"), max(col("_id")).as("cp_end"),
        count(lit(1)).as("n_cps"))
      .orderBy("walk_id")
  }

  /** O4 — the poll-source order flip: first page read descending, then
    * flipped ascending for emission (do_poll, main/src/etl.rs:1082-1087). */
  def latestPageAscending(events: DataFrame, pageSize: Int): DataFrame =
    events.orderBy(col("event_id").desc).limit(pageSize).orderBy(col("event_id"))
}
