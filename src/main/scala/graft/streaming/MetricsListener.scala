package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K4 — metrics sink: the Spark-native analog of the reference's 13
  * InfluxDB measurements (main/src/influx.rs:11-313). Instead of hand-timed
  * HTTP writes per pipeline stage, a StreamingQueryListener observes every
  * microbatch and records (metric, value, ts) points; `drain()` hands them
  * to whatever store you attach (file, push gateway, …).
  *
  * ONE exported series: the listener contributes engine-observed points
  * (rows, durations, watermark lag, state size); [[record]] is the ingest
  * hook — point `IngestPipeline.start(metricSink = listener.record)` (and
  * `emitBatchMetrics = true`) at it and the data-derived measurement set
  * plus the mode-transition events land in the same queue, giving the full
  * 13-measurement coverage of the reference from a live query.
  */
object MetricsListener {
  final case class Point(metric: String, value: Double, tsMs: Long)
}

final class MetricsListener extends StreamingQueryListener {
  import MetricsListener.Point

  private val points = new ConcurrentLinkedQueue[Point]()

  private def add(metric: String, value: Double): Unit = {
    points.add(Point(metric, value, System.currentTimeMillis())); ()
  }

  /** External-producer hook: lets the pipeline's metricSink (mode
    * transitions, checkpoints_behind, per-batch measurements) share this
    * listener's exported series. */
  def record(metric: String, value: Double): Unit = add(metric, value)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    add("start_livescan", 1.0) // influx.rs:271

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    add("ingest_rows", p.numInputRows.toDouble) // influx.rs:11-34 analog
    add("batch_duration_ms",
      Option(p.durationMs.get("triggerExecution")).map(_.doubleValue).getOrElse(0.0))
    add("input_rows_per_sec", p.inputRowsPerSecond)
    // dedup/countdown state footprint (the reference meters its RocksDB id
    // store by side effect of compaction stats; ours is first-class)
    if (p.stateOperators.nonEmpty)
      add("state_rows_total", p.stateOperators.map(_.numRowsTotal).sum.toDouble)
    // extraction_latency analog (influx.rs:291-304): how far the event-time
    // watermark trails wall clock at progress time
    Option(p.eventTime.get("watermark")).foreach { wm =>
      try {
        val wmMs = java.time.Instant.parse(wm).toEpochMilli
        val nowMs = java.time.Instant.parse(p.timestamp).toEpochMilli
        add("watermark_lag_ms", (nowMs - wmMs).toDouble)
      } catch { case _: java.time.format.DateTimeParseException => () }
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    // NOT the reference's pause_livescan — that is the backfill pause
    // (influx.rs:252) and fires from the pipeline's transition site via
    // [[record]]; termination is its own engine-native event, error-flagged
    add("ingest_query_terminated", if (event.exception.isDefined) 0.0 else 1.0)

  /** Drain all collected points (test/export hook). */
  def drain(): Seq[Point] = {
    val out = Seq.newBuilder[Point]
    var p = points.poll()
    while (p != null) { out += p; p = points.poll() }
    out.result()
  }
}
