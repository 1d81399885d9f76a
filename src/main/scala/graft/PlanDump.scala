package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for a list of registry queries
  * into files — the r20 optimization round's plan-capture harness
  * (`plans/r20/<query>_<tag>.txt`). Args: <outDir> <tag> <query>...
  * Runs under the bench's own session shape (local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cpus) so captured plans match what Bench runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // EXEC=1: run the query first (noop-equivalent count) so the dumped
    // plan is the FINAL adaptive plan with codegen stage markers — the
    // pre-execution dump shows the initial AdaptiveSparkPlan, where
    // per-stage codegen collapse has not happened yet
    val exec = sys.env.get("EXEC").contains("1")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // act on THIS queryExecution (df.count() would build a new one
      // and leave this plan un-finalized under AQE)
      if (exec) df.queryExecution.toRdd.foreachPartition(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"PLANDUMP wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
