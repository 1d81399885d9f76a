package graft

/** Closing-protocol regression gate (dev/protocol tool — zero references
  * from the driver surfaces): reads the per-run artifacts a
  * `tools/bench_protocol.sh` loop wrote and FAILS (exit 1) when any
  * QUIET-LAUNCH run has a row beyond 2.5× its committed
  * [[BenchProtocol.mins]] floor (+0.2 s jitter guard, the
  * [[Bench.regressions]] rule). Loaded-launch runs are reported but
  * never gate — their inflation is ambient, and the protocol's multi-run
  * minima absorb them. The r20 failure this exists for: the
  * floor-preserving min() merge cannot surface a regression by
  * construction, so a regressed row ships unless some step FAILS on it.
  *
  * Args: a protocol output dir containing `runN.stderr` (the
  * `[bench full names]` line carries every row, full names — the stdout
  * ledger elides fast rows and shortens ids) and `runN.launchload`
  * (the 1-min loadavg read immediately BEFORE launching that run —
  * launch load, not the artifact's end-of-run load, decides quietness).
  */
object ProtocolGate {
  /** Launch loadavg at or below this is a quiet launch: the machine was
    * idle when the run started, so a row far over its floor is the
    * code's doing, not ambient load. 1.0 on a 32-core box is
    * conservative (the artifact-level noisy threshold is 3.0). */
  val QuietLaunchLoad = 1.0

  def parseFullNames(line: String): Seq[(String, Double)] = {
    val json = line.substring(line.indexOf('{'))
    // the line is machine-written flat JSON ({"queries":{"name":sec,…}});
    // a regex pull keeps this tool dependency-free
    val entry = """"([^"]+)":(-?[0-9.]+)""".r
    entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._1 != "queries").toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val runs = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.matches(".*run\\d+\\.stderr")).sorted
    require(runs.nonEmpty, s"no run*.stderr under $dir")
    var failed = List.empty[String]
    runs.foreach { path =>
      val name = path.replaceAll(".*/(run\\d+)\\.stderr", "$1")
      val launchFile = java.nio.file.Paths.get(path.stripSuffix(".stderr") + ".launchload")
      val launch =
        if (java.nio.file.Files.exists(launchFile))
          new String(java.nio.file.Files.readAllBytes(launchFile)).trim.toDouble
        else -1.0
      val lines = scala.io.Source.fromFile(path).getLines()
        .filter(_.contains("[bench full names]")).toSeq
      if (lines.isEmpty) println(s"$name: no full-names line (crashed run?)")
      else {
        val results = parseFullNames(lines.last)
        val regs = Bench.regressions(results)
        val quiet = launch >= 0 && launch <= QuietLaunchLoad
        val tag = if (quiet) "QUIET" else s"loaded($launch)"
        if (regs.isEmpty) println(s"$name [$tag]: no rows over 2.5x floor")
        else {
          regs.foreach { case (q, v, m) =>
            println(f"$name [$tag]: $q $v%.2f s vs floor $m%.2f (${v / m}%.1fx)")
          }
          if (quiet) failed ::= name
        }
      }
    }
    if (failed.nonEmpty) {
      println(s"PROTOCOL GATE FAILED: quiet-launch regressions in ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("PROTOCOL GATE PASSED")
  }
}
