package graft

import graft.ops.PipelineOps
import graft.sources.CpRangeSource

/** DSv2 checkpoint-range source: must produce exactly the non-completed
  * checkpoints, partition-pruned before any row is emitted, across any
  * worker count. */
class CpRangeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def readSource(start: Long, end: Long, parts: Int,
      ranges: Seq[(Long, Long)]): Set[Long] =
    spark.read.format("cp-range")
      .option("start", start).option("end", end)
      .option("partitions", parts)
      .option("completed", CpRangeSource.formatRanges(ranges))
      .load()
      .as[Long].collect().toSet

  test("emits exactly the non-completed cps (vs anti-join op)") {
    val completed = Seq(0L, 1L, 2L, 5L, 6L, 9L, 10L, 11L, 12L).toDF("_id")
    val ranges = PipelineOps.descendingRanges(completed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = PipelineOps.remainingCheckpoints(spark, 15L, completed)
      .as[Long].collect().toSet
    for (parts <- Seq(1, 3, 8)) {
      assert(readSource(0L, 15L, parts, ranges) === expected,
        s"partition count $parts")
    }
  }

  test("stop-marker ranges halt the scan below stop_at (S2 + U2b resume)") {
    // completed cps 6,9 with a stop marker on 5: the (5, 0) pseudo-range
    // asserts [0, 5] complete, so only 7, 8 and 10..12 remain to scan
    val completed = Seq(
      (1L, false), (2L, false), (5L, true), (6L, false), (9L, false))
      .toDF("_id", "stop")
    val ranges = PipelineOps.descendingRangesWithStop(completed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (parts <- Seq(1, 4)) {
      assert(readSource(0L, 12L, parts, ranges) === Set(7L, 8L, 10L, 11L, 12L),
        s"partition count $parts")
    }
  }

  test("empty skip-list emits the full range; full skip-list emits nothing") {
    assert(readSource(0L, 9L, 4, Nil) === (0L to 9L).toSet)
    assert(readSource(0L, 9L, 4, Seq((9L, 0L))) === Set.empty[Long])
  }

  test("plans one input partition per worker") {
    val df = spark.read.format("cp-range")
      .option("start", 0).option("end", 100).option("partitions", 7).load()
    assert(df.rdd.getNumPartitions === 7)
  }
}
