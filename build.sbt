ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "huracanspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout (no [info] logger prefix) so
// the driver can parse Bench's single JSON line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Run the test suites as FOUR forked JVM groups in parallel: the three
// streaming suites dominate the suite wall-clock (measured 970 s
// CurationStream split in two + 544 s StreamingSpec of a 2096 s total at
// one JVM), and the process-global seams (DedupOps.releaseCaches, the
// tracked-persist registry, onDiskState memos) make suites unsafe to
// parallelize INSIDE one JVM — separate JVMs give each group its own
// SparkSession and globals, so the suites themselves stay untouched.
// Wall-clock ≈ the largest group (~9-10 min) instead of the sum.
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val groupOf: String => String = {
    case "graft.StreamingSpec"         => "stream"
    case "graft.CurationStreamSpec"    => "curation-core"
    case "graft.CurationMediaRungSpec" => "curation-media"
    case _                             => "rest"
  }
  (Test / definedTests).value.groupBy(t => groupOf(t.name)).map {
    case (name, ts) => Tests.Group(name, ts, Tests.SubProcess(opts))
  }.toSeq
}
// sbt limits forked test groups to 1 by default; allow the four groups
// to run concurrently (4 JVMs × local[4] = 16 cores on the 32-core box).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4), Tags.limitAll(16))
