package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling: time named registry queries under the bench's session
  * shape, with optional extra session confs from $SPARK_GRAFT_CONF
  * ("k=v,k=v") — the per-query iteration loop the full Bench is too
  * slow for. Each query is warmed like Bench (SparkEntry.warm runs
  * first) and timed over `count()` (the bench's action), twice, so the
  * second number is the steady-state. */
object DevQueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"warm failed: ${e.getMessage}") }
    args.foreach { name =>
      (1 to 2).foreach { pass =>
        spark.sparkContext.setJobDescription(s"$name pass $pass")
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"QTIME $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        graft.llm.DedupOps.releaseCaches()
      }
    }
    spark.stop()
  }
}
