package graft

import scala.util.Random

import graft.ops.PipelineOps

/** U2 gaps-and-islands vs the reference algorithm
  * (make_descending_ranges, main/src/utils.rs:6-26). The reference's only
  * unit test (utils.rs:39-48) is the golden case. */
class RangesSpec extends SparkSpec {

  /** Reference semantics, reimplemented independently: maximal descending
    * inclusive ranges over a set of ids. */
  private def refRanges(ids: Seq[Long]): Seq[(Long, Long)] = {
    val sorted = ids.distinct.sorted(Ordering[Long].reverse)
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    for (id <- sorted) {
      out.lastOption match {
        case Some((end, start)) if start == id + 1 =>
          out.update(out.size - 1, (end, id))
        case _ => out += ((id, id))
      }
    }
    out.toList
  }

  private def sparkRanges(ids: Seq[Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    val df = ids.toDF("_id").distinct()
    PipelineOps.descendingRanges(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
  }

  test("golden case from the reference unit test") {
    assert(sparkRanges(Seq(3L, 1L, 2L, 7L, 9L, 11L, 10L)) ===
      Seq((11L, 9L), (7L, 7L), (3L, 1L)))
  }

  test("matches reference algorithm on random id sets (seeded property)") {
    val rnd = new Random(42)
    for (_ <- 1 to 15) {
      val ids = Seq.fill(rnd.nextInt(40))(rnd.nextLong(60).max(0L))
      if (ids.nonEmpty) assert(sparkRanges(ids) === refRanges(ids))
    }
  }

  test("two-phase scalable islands equals the single-window form (property)") {
    import spark.implicits._
    val rnd = new Random(11)
    for (_ <- 1 to 10) {
      val ids = Seq.fill(rnd.nextInt(60))(rnd.nextLong(200).max(0L)).distinct
      if (ids.nonEmpty) {
        val df = ids.toDF("_id")
        // tiny chunk size forces many cross-chunk merges
        val scalable = PipelineOps.descendingRangesScalable(df, chunkSize = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(scalable === refRanges(ids))
      }
    }
    // boundary-straddling run: one island across many chunks
    val run = (0L to 40L).toDF("_id")
    assert(PipelineOps.descendingRangesScalable(run, chunkSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((40L, 0L)))
  }

  test("stop marker truncates the island walk (etl.rs:616-635)") {
    import spark.implicits._
    def got(rows: Seq[(Long, Boolean)]): Seq[(Long, Long)] =
      PipelineOps.descendingRangesWithStop(rows.toDF("_id", "stop"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // stop=true on cp 5: cps below 5 drop out; (5, 0) appended last
    assert(got(Seq(1L -> false, 2L -> false, 3L -> false, 5L -> true,
      6L -> false, 9L -> false)) === Seq((9L, 9L), (6L, 5L), (5L, 0L)))
    // no marker → plain descending ranges
    assert(got(Seq(1L -> false, 2L -> false, 5L -> false)) ===
      Seq((5L, 5L), (2L, 1L)))
    // newest marker wins when several exist
    assert(got(Seq(1L -> true, 3L -> false, 4L -> true, 6L -> false)) ===
      Seq((6L, 6L), (4L, 4L), (4L, 0L)))
  }

  test("stop-marker truncation matches reference algorithm on random sets (property)") {
    import spark.implicits._
    // reference semantics reimplemented independently (etl.rs:616-635)
    def refWithStop(rows: Seq[(Long, Boolean)]): Seq[(Long, Long)] = {
      val stopAt = rows.collect { case (id, true) => id }.maxOption.getOrElse(0L)
      if (stopAt > 0)
        refRanges(rows.map(_._1).filter(_ >= stopAt)) :+ ((stopAt, 0L))
      else refRanges(rows.map(_._1))
    }
    val rnd = new Random(7)
    for (_ <- 1 to 20) {
      val rows = Seq.fill(rnd.nextInt(40))(
        (rnd.nextLong(60).max(0L), rnd.nextInt(8) == 0))
        .groupBy(_._1).map { case (id, g) => (id, g.exists(_._2)) }.toSeq
      if (rows.nonEmpty) {
        val got = PipelineOps.descendingRangesWithStop(rows.toDF("_id", "stop"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got === refWithStop(rows), s"rows=$rows")
      }
    }
  }

  test("anti-join skip covers exactly the non-completed ids") {
    import spark.implicits._
    val completed = Seq(0L, 1L, 2L, 5L, 6L, 9L).toDF("_id")
    val remaining = PipelineOps.remainingCheckpoints(spark, 9L, completed)
      .as[Long].collect().toSeq
    assert(remaining === Seq(8L, 7L, 4L, 3L))
  }
}
