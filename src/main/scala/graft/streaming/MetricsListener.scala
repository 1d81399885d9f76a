package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K4 — metrics sink: the Spark-native analog of the reference's 13
  * InfluxDB measurements (main/src/influx.rs:11-313). Instead of hand-timed
  * HTTP writes per pipeline stage, a StreamingQueryListener observes every
  * microbatch and records (metric, value, ts) points; `drain()` hands them
  * to whatever store you attach (file, push gateway, …).
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

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    add("start_livescan", 1.0) // influx.rs:271

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    add("ingest_rows", p.numInputRows.toDouble) // influx.rs:11-34 analog
    add("batch_duration_ms",
      Option(p.durationMs.get("triggerExecution")).map(_.doubleValue).getOrElse(0.0))
    // extraction_latency analog (influx.rs:291): event-time watermark lag.
    add("input_rows_per_sec", p.inputRowsPerSecond)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    add("pause_livescan", 1.0) // influx.rs:252

  /** Drain all collected points (test/export hook). */
  def drain(): Seq[Point] = {
    val out = Seq.newBuilder[Point]
    var p = points.poll()
    while (p != null) { out += p; p = points.poll() }
    out.result()
  }
}
