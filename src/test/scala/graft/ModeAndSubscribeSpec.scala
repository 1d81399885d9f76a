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
