package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. A failed query
  * leaves a `<name>.error.json` sentinel (name + error class) so the
  * ledger shows an explicit per-query error instead of absence
  * (DriverSurfaceSpec gates this against a deliberately-broken registry). */
object Verify {

  /** Dump every query in `registry` to `outDir/<name>`; returns the failed
    * names. Failures write the sentinel and never abort the loop. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      registry: Map[String, (SparkSession, String) => DataFrame]): List[String] = {
    var failed = List.empty[String]
    registry.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // leave a machine-readable sentinel so the driver ledger shows an
        // explicit per-query `err` (name + error class) instead of absence
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed ::= name
        try Files.writeString(Paths.get(s"$outDir/$name.error.json"),
          s"""{"query":${Jsons.quote(name)},"error_class":${Jsons.quote(e.getClass.getName)}}""")
        catch { case _: Throwable => () }
      }
      finally graft.llm.DedupOps.releaseCaches()
    }
    failed
  }
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (local iteration on a
    // subset; the driver's two-arg invocation dumps everything)
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [name1,name2,...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    dump(spark, sfDir, outDir,
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) })
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Jsons.quote(k)}: ${Jsons.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
