package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Dev audit: per-query physical-plan summary — shuffle count, broadcast
  * count, scan read-schemas and pushed filters — for the scale review
  * (SCALE.md). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // materialize so AQE finalizes
      def finalPlan(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val plan = finalPlan(df.queryExecution.executedPlan)
      var shuffles = 0
      var broadcasts = 0
      plan.foreach {
        case _: ShuffleExchangeLike => shuffles += 1
        case _: BroadcastExchangeLike => broadcasts += 1
        case _ =>
      }
      val scans = plan.collect {
        case s if s.nodeName.contains("Scan") =>
          val str = s.simpleStringWithNodeId()
          str.take(120)
      }
      // Bucketed serving variants must plan with zero HASH shuffles — the
      // bucketing must satisfy every join/distinct/window distribution.
      // The only exchange allowed is the range partitioning of the
      // harness-determinism ORDER BY.
      val hashShuffles = plan.collect {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => s
      }
      if (ZeroHashShuffleQueries(name) && hashShuffles.nonEmpty) {
        println(s"AUDIT-FAIL $name: expected zero hash shuffles on the bucketed plan, found ${hashShuffles.size}")
        println(plan.toString)
        failures += name
      }
      println(f"AUDIT $name%-28s shuffles=$shuffles broadcasts=$broadcasts scans=${scans.size}")
    }
    spark.stop()
    if (failures.nonEmpty) {
      println(s"AUDIT FAILED: ${failures.mkString(", ")}")
      sys.exit(1)
    }
  }

  /** Queries served from StoreLayout's bucketed tables: their plans must
    * carry no hash exchange (SCALE.md "zero-exchange serving joins"). */
  val ZeroHashShuffleQueries: Set[String] =
    Set("j1b_bucketed_parent_join", "j2b_bucketed_children", "k1b_bucketed_latest_wins")

  private val failures = scala.collection.mutable.ListBuffer.empty[String]
}
