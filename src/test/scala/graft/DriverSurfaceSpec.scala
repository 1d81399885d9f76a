package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-contract degradation guarantees (VERDICT r10 item 2): a
  * deliberately-broken query must cost ONLY itself — the bench line stays
  * parseable with a -1 marker and an "errors" entry, and the verify dump
  * still writes every healthy result plus a machine-readable error
  * sentinel for the broken one. Round 10 lost the whole bench (rc=1) and
  * 56 ledger rows to one broken view; these tests pin the fixed shape. */
class DriverSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => { import s.implicits._; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("deliberately broken view")
  private val registry = Map("g1_good" -> good, "x1_boom" -> boom)

  test("bench degrades per-query: broken query → -1 marker, parseable line") {
    val (results, errors) = Bench.run(spark, sf0001, registry)
    assert(results.map(_._1).sorted === Seq("g1_good", "x1_boom"))
    val byName = results.toMap
    assert(byName("x1_boom") === -1.0)
    assert(byName("g1_good") >= 0.0)
    assert(errors === List("x1_boom"))
    val line = Bench.jsonLine(results, errors, sf0001)
    // the driver parses this with json.loads — it must be valid JSON with
    // the error named and the healthy query timed
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains(""""x1":-1.000"""), line)
    assert(line.contains(""""errors":["x1_boom"]"""), line)
    assert(line.contains(""""metric":"total""""), line)
  }

  test("fatal bench crash still emits one parseable ledger line") {
    val line = Bench.fatalLine("/root/testdata/sf0.1",
      new IllegalStateException("env broke"))
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains(""""value":-1.000"""), line)
    assert(line.contains(""""errors":["__fatal__"]"""), line)
    assert(line.contains(""""fatal":"java.lang.IllegalStateException""""), line)
    assert(line.contains(""""sf":"/root/testdata/sf0.1""""), line)
  }

  test("verify degrades per-query: broken query → error sentinel, healthy dumps survive") {
    val out = java.nio.file.Files.createTempDirectory("graft_dsurf").toString
    val failed = Verify.dump(spark, sf0001, out, registry)
    assert(failed === List("x1_boom"))
    // healthy query dumped readable parquet
    val back = spark.read.parquet(s"$out/g1_good")
    assert(back.count() === 2)
    // broken query left a machine-readable sentinel naming the error class
    val sentinel = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/x1_boom.error.json")))
    assert(sentinel.contains(""""query":"x1_boom""""), sentinel)
    assert(sentinel.contains("IllegalStateException"), sentinel)
  }
}
