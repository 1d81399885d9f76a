package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.IngestPipeline

/** Mode selection (monitor loop, backfillthreshold semantics) and the
  * subscription push stream. */
class ModeAndSubscribeSpec extends SparkSpec {
  import spark.implicits._

  test("mode selector: livescan near tip, backfill past threshold, poll pause") {
    import IngestPipeline._
    assert(decideMode(latestCp = 100, maxCompletedCp = 100) === Livescan)
    assert(decideMode(latestCp = 103, maxCompletedCp = 100) === Livescan) // == threshold
    assert(decideMode(latestCp = 104, maxCompletedCp = 100) === Backfill) // > threshold
    assert(decideMode(latestCp = 90, maxCompletedCp = 100) === Livescan)  // ahead is fine
    assert(Backfill.pausePoll && !Livescan.pausePoll)
  }

  test("backfill pauses the poll route; deferred rows merge on resume (etl.rs:219-240)") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    import graft.model.ObjectsModel
    val tmp = JFiles.createTempDirectory("graft_pause").toString
    val all = (0 until 200).map { i =>
      Ev(i.toLong, 1700000000000000000L + i.toLong * 1000000000L, (i % 7).toLong,
        Seq("signup", "click", "purchase", "view", "error")(i % 5), i * 1.5,
        s"""{"k": ${i % 100}}""")
    }
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val query = IngestPipeline.start(
      spark, stream.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"),
      metricSink = (m, v) => { metrics.add((m, v)); () })
    def storePairs() = IngestPipeline.readStore(spark, s"$tmp/store")
      .select("_id", "version").as[(String, Long)].collect().toSet
    try {
      // contiguous from genesis: livescan, everything merges
      stream.addData(all.slice(0, 50)) // cps 0..4
      query.processAllAvailable()
      assert(!JFiles.exists(JPaths.get(s"$tmp/store/_defer")))

      // downtime hole (events 50..99 lost): batch starts at cp 10 with the
      // store tip at 4 → behind 5 > threshold 3 → backfill pauses poll
      stream.addData(all.slice(100, 150)) // cps 10..14; poll route = cp 12
      query.processAllAvailable()
      val deferredB = ObjectsModel.processed(ObjectsModel.kept(
        ObjectsModel.deriveChanges(all.slice(100, 150).toDF())))
        .filter($"ingested_via" === "poll")
        .select("_id", "version").as[(String, Long)].collect().toSet
      assert(deferredB.nonEmpty)
      assert(JFiles.exists(JPaths.get(s"$tmp/store/_defer")))
      assert(storePairs().intersect(deferredB).isEmpty) // paused, not merged

      // contiguous again: livescan resumes, deferred rows re-enter the MERGE
      stream.addData(all.slice(150, 200)) // cps 15..19
      query.processAllAvailable()
    } finally query.stop()

    assert(!JFiles.exists(JPaths.get(s"$tmp/store/_defer")))
    // the transition metrics fired at the reference's call sites, once per
    // TRANSITION (not once per batch): one backfill episode → one init/
    // pause pair; start_livescan = initial start + the resume
    import scala.jdk.CollectionConverters._
    val fired = metrics.iterator().asScala.toSeq
    assert(fired.count(_._1 == "backfill_init") === 1)
    assert(fired.filter(_._1 == "pause_livescan") === Seq(("pause_livescan", 5.0)))
    assert(fired.count(_._1 == "start_livescan") === 2)
    val delivered = all.slice(0, 50) ++ all.slice(100, 200)
    val expected = ObjectsModel.latestWins(ObjectsModel.processed(ObjectsModel.kept(
      ObjectsModel.deriveChanges(delivered.toDF()))))
      .select("_id", "version").as[(String, Long)].collect().toSet
    assert(storePairs() === expected)
  }

  test("K4 streaming: data-derived measurements and listener points drain as one series") {
    import java.nio.file.{Files => JFiles}
    import graft.model.ObjectsModel
    val tmp = JFiles.createTempDirectory("graft_k4stream").toString
    val events = (0 until 100).map { i =>
      Ev(i.toLong, 1700000000000000000L + i.toLong * 1000000000L, (i % 7).toLong,
        Seq("signup", "click", "purchase", "view", "error")(i % 5), i * 1.5,
        s"""{"k": ${i % 100}}""")
    }
    val listener = new graft.streaming.MetricsListener
    spark.streams.addListener(listener)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = IngestPipeline.start(
      spark, stream.toDF(), s"$tmp/store", s"$tmp/dlq", s"$tmp/ckpt",
      Trigger.ProcessingTime("50 milliseconds"),
      metricSink = listener.record, emitBatchMetrics = true)
    val pts = scala.collection.mutable.ArrayBuffer[graft.streaming.MetricsListener.Point]()
    try {
      // a full pause/resume cycle: contiguous → downtime hole (backfill
      // pauses poll) → contiguous again (resume), so the transition
      // metrics fire alongside the per-batch measurements
      stream.addData(events.slice(0, 30)) // cps 0..2
      query.processAllAvailable()
      stream.addData(events.slice(70, 90)) // hole: behind 4 > threshold → backfill
      query.processAllAvailable()
      stream.addData(events.slice(90, 100)) // contiguous: resume
      query.processAllAvailable()
    } finally query.stop()
    // listener delivery is async: poll until the termination point lands
    val deadline = System.currentTimeMillis() + 30000
    while (!pts.exists(_.metric == "ingest_query_terminated")
        && System.currentTimeMillis() < deadline) {
      pts ++= listener.drain(); Thread.sleep(100)
    }
    spark.streams.removeListener(listener)

    val names = pts.map(_.metric).toSet
    // full data-derived measurement set (per batch, via metricsSummary)
    val dataDerived = Set("items_total", "inserted", "modified", "unchanged",
      "items_deleted", "rpc_request", "rpc_error", "mongo_write_error",
      "ingest_error", "checkpoints_seen", "create_checkpoint",
      "checkpoint_error", "current_checkpoint", "final_checkpoint",
      "extraction_latency")
    assert(dataDerived.subsetOf(names), s"missing: ${dataDerived -- names}")
    // transition-site + engine-observed points share the same series: the
    // backfill episode fires its init/pause pair and the resume, and
    // termination is NOT mislabeled as the reference's backfill pause
    assert(Set("start_livescan", "checkpoints_behind", "backfill_init",
      "pause_livescan", "ingest_rows", "batch_duration_ms",
      "ingest_query_terminated").subsetOf(names), s"missing: transitions")
    assert(pts.count(_.metric == "backfill_init") === 1)
    assert(pts.count(_.metric == "start_livescan") >= 2) // initial + resume
    // per-batch items_total sums to the kept changes actually delivered
    val delivered = events.slice(0, 30) ++ events.slice(70, 100)
    val itemsTotal = pts.filter(_.metric == "items_total").map(_.value).sum
    val keptCount = ObjectsModel.kept(
      ObjectsModel.deriveChanges(delivered.toDF())).count().toDouble
    assert(itemsTotal === keptCount)
  }

  test("subscription pushes only matching type-prefix changes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val events = (0 until 60).map { i =>
      Ev(i.toLong, 1700000000000000000L + i.toLong * 1000000000L, (i % 7).toLong,
        Seq("signup", "click", "purchase", "view", "error")(i % 5), 1.0,
        s"""{"k": $i}""")
    }
    val sub = IngestPipeline.subscribe(
      IngestPipeline.changeStream(stream.toDF()), "0x2::dynamic_field")
    val query = sub.writeStream.format("memory").queryName("sub_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(events)
      query.processAllAvailable()
      val rows = spark.table("sub_out").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[String]("type_full").startsWith("0x2::dynamic_field")))
    } finally query.stop()
  }
}
