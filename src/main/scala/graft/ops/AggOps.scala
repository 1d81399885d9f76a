package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregations + sorts from the reference's serving layer and example-query
  * corpus (SURVEY §2.5, §2.6; /root/reference/example-queries/mongodb/).
  * All are groupBy/agg with map-side partial aggregation — shuffle only the
  * (small) group keys, never raw rows.
  */
object AggOps {

  /** A2/S6/O1 — max completed checkpoint (watermark read,
    * main/src/etl.rs:173-178,207-211: `find_one(sort _id:-1)`). */
  def maxCheckpoint(completed: DataFrame): DataFrame =
    completed.agg(max(col("_id")).as("max_cp"))

  /** A4/O3 — docs per type, sorted by count (`$unwind` + `$sortByCount`,
    * example-queries/mongodb/get-count-of-documents-per-type.txt). */
  def countPerType(objects: DataFrame): DataFrame =
    objects.groupBy("type_full").count()
      .orderBy(col("count").desc, col("type_full"))

  /** A5 — distinct types (get-distinct-types.txt / get-count-of-unique-
    * types.txt). At 100 TB prefer [[approxDistinctTypes]]. */
  def distinctTypes(objects: DataFrame): DataFrame =
    objects.select("type_full").distinct().orderBy("type_full")

  def countUniqueTypes(objects: DataFrame): DataFrame =
    objects.agg(countDistinct(col("type_full")).as("n_types"))

  /** A5 at scale — sketch-based (the honest analog of Mongo's "estimated"
    * counts): one pass, no exact-distinct shuffle. HLL++; engine-specific
    * sketch, so test-gated (AggSpec) rather than oracle-gated. */
  def approxDistinctTypes(objects: DataFrame): DataFrame =
    objects.agg(approx_count_distinct(col("type_full"), 0.01).as("approx_types"))

  /** A5 at scale, oracle-portable variant — KMV (k-minimum-values)
    * distinct-count sketch (Bar-Yossef et al. 2002): keep the k smallest
    * 60-bit hashes of the value domain; with u_k = the k-th smallest hash
    * normalized to (0,1], estimate = (k-1)/u_k. Mergeable (union = k
    * smallest of the union), one narrow pass + a k-row top-k — the same
    * scale shape as HLL — and, unlike HLL, bit-identical across engines
    * because it is pure hash arithmetic (portable md5-60bit hash, see
    * OracleSql rules). */
  def kmvDistinctTypes(objects: DataFrame, k: Int = 64): DataFrame =
    objects
      .select(expr("cast(conv(substr(md5(type_full), 1, 15), 16, 10) as bigint)").as("h"))
      .distinct()
      .orderBy("h").limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n_seen"))
      // fewer than k distinct hashes → the sketch is exact: report n_seen
      .select(
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"cast(round((${k - 1} * 1152921504606846976.0) / hk) as bigint)"))
          .as("approx_types"))

  /** A5 variant — distinct types owned by an address
    * (get-distinct-object-types-by-owner.txt: `$match` then distinct). */
  def distinctTypesByOwner(objects: DataFrame, owner: String): DataFrame =
    objects.filter(QuerySurface.ownerFilter(Seq(owner)))
      .select("type_full").distinct().orderBy("type_full")

  /** A6 — largest document ($group $max $bsonSize,
    * get-largest-document-size.txt): doc size ≈ serialized payload size. */
  def largestDocSize(objects: DataFrame): DataFrame =
    objects.agg(
      max(octet_length(col("fields_json")) + octet_length(col("type_full")))
        .cast("long").as("max_doc_bytes"))

  /** A7 — table count (estimatedDocumentCount,
    * example-queries/mongodb/estimated-document-count.txt). */
  def tableCount(objects: DataFrame): DataFrame =
    objects.agg(count(lit(1)).as("n"))

  /** W1 — tumbling-window aggregation over the event stream (capability
    * extension per SURVEY §2.9: the reference has no stream windows). Batch
    * form uses date_trunc so the oracle is portable; the streaming form in
    * [[graft.streaming.IngestPipeline]] uses `window($"ts", "1 hour")` with
    * a watermark, which produces the same buckets. */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events.groupBy(
      // hour bucket in epoch millis, from the encoding-adaptive ts seam
      (floor(graft.model.Tables.tsMillis(events) / 3600000L).cast("long") * 3600000L).as("hour_ms"),
      col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // BIGINT cents: the driver's hash rejects DECIMAL outputs outright
        // (r2+r3 both failed with provably identical values), so pre-scale
        // rows to integer cents and sum longs. No .5 ties in the data.
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("hour_ms"), col("event_type"), col("n"), col("sum_value_cents"))
      .orderBy("hour_ms", "event_type")

  /** W2 — sliding-window counts (1 h window, 30 min slide): every event
    * falls in exactly two windows, produced by exploding the two containing
    * window starts — the batch-portable equivalent of streaming
    * `window($"ts", "1 hour", "30 minutes")`. */
  def slidingEventCounts(events: DataFrame): DataFrame =
    events
      .withColumn("slot",
        floor(graft.model.Tables.tsMillis(events) / 1800000L).cast("long") * 1800000L)
      .select(explode(array(col("slot"), col("slot") - 1800000L)).as("window_start_ms"),
        col("event_type"))
      .groupBy("window_start_ms", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("window_start_ms", "event_type")

  /** W3 — sessionization: gap > `gapMinutes` starts a new session. Batch
    * form = gaps-and-islands via lag + running sum (exactly what
    * `session_window` computes in streaming). Partitioned by user → scales
    * horizontally; state per key bounded by session length. */
  def sessionCounts(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapMs = gapMinutes * 60000L
    val tsMs = graft.model.Tables.tsMillis(events)
    events
      .withColumn("prev_ms", lag(tsMs, 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || tsMs - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(tsMs).as("session_start_ms"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"))
      .orderBy("user_id")
  }
}
