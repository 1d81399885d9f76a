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
      println(f"AUDIT $name%-28s shuffles=$shuffles broadcasts=$broadcasts scans=${scans.size}")
    }
    spark.stop()
  }
}
