package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: runs the flagship `entry` query (the driver's t1 gate) and
  * prints its row count and physical plan. Optional arg: a query name to
  * explain instead. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some(name) =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.explain("formatted")
        println(s"SMOKE $name rows=" + df.count())
      case None =>
        val df = SparkEntry.entry(spark)
        println("SMOKE entry rows=" + df.count())
        df.show(5, truncate = false)
    }
    spark.stop()
  }
}
