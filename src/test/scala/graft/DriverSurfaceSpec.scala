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

  // really parse what the driver will json.loads — contains() can't prove
  // well-formedness once env-supplied strings are interpolated in
  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  test("bench degrades per-query: broken query → -1 marker, parseable line") {
    val (results, errors) = Bench.run(spark, sf0001, registry)
    assert(results.map(_._1).sorted === Seq("g1_good", "x1_boom"))
    val byName = results.toMap
    assert(byName("x1_boom") === -1.0)
    assert(byName("g1_good") >= 0.0)
    assert(errors === List("x1_boom"))
    val line = Bench.jsonLine(results, errors, sf0001)
    // the driver parses this with json.loads — it must be valid JSON with
    // the error named and the healthy query accounted for
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains(""""x1":-1.00"""), line)
    assert(line.contains(""""errors":["x1_boom"]"""), line)
    assert(line.contains(""""metric":"total""""), line)
    val node = parse(line)
    // machine-load telemetry rides the artifact (r5/r7/r9/r11 all needed
    // after-the-fact load adjudication of driver-bench inflation)
    assert(node.get("loadavg").isNumber, line)
    assert(node.get("procs").asInt > 0, line)
    assert(node.get("v").asInt === 2, line)
    assert(node.get("noisy").isBoolean, line)
    // the healthy row is either named (≥ floor) or in the fast summary —
    // never silently dropped
    val fastN = node.get("fast").get("n").asInt
    assert((node.get("queries").has("g1") && fastN === 0) ||
      (!node.get("queries").has("g1") && fastN === 1), line)
    // build/serve subtotals: no build rows in this registry → all serve
    assert(node.get("tiers").get("build").asDouble === 0.0, line)
    assert(math.abs(node.get("tiers").get("serve").asDouble
      - node.get("value").asDouble) < 0.002, line)
  }

  test("BenchProtocol.mins re-record never raises a carried floor (merge invariant)") {
    // the r19 advice item: a loaded-window re-record silently RAISED two
    // floors, loosening their 2.5x noisy thresholds. The previous
    // committed record is kept verbatim in prevMins; every carried key's
    // current floor must be <= its previous one (merge-min semantics) —
    // EXCEPT the explicitly documented rebased rows (r20 verdict item 9:
    // the audio family's carried minima described a state the driver
    // could not reproduce; their floors are this round's protocol minima
    // verbatim, raise allowed ONCE and confined to the m5 family).
    val raised = BenchProtocol.prevMins.keySet
      .intersect(BenchProtocol.mins.keySet)
      .diff(BenchProtocol.rebased)
      .filter(q => BenchProtocol.mins(q) > BenchProtocol.prevMins(q) + 1e-9)
    assert(raised.isEmpty,
      s"floors RAISED vs the previous record (merge-min violated): " +
        raised.toSeq.sorted.map(q =>
          s"$q ${BenchProtocol.prevMins(q)} -> ${BenchProtocol.mins(q)}")
          .mkString(", "))
    // the rebase exemption cannot become a loophole: it is confined to
    // the verdict-cited audio family, and every rebased row still exists
    // in the record (a rebase can't drop coverage)
    assert(BenchProtocol.rebased.forall(_.startsWith("m5")),
      s"rebased rows outside the documented m5 family: ${BenchProtocol.rebased}")
    assert(BenchProtocol.rebased.subsetOf(BenchProtocol.mins.keySet))
    // floors are physical times: positive, and at/above the ledger's
    // fast-floor granularity they remain meaningful thresholds
    assert(BenchProtocol.mins.values.forall(_ > 0.0))
  }

  test("noisy flag fires on core-scaled load OR a row beyond 2.5x its protocol min") {
    val results = Seq("g1_good" -> 1.0)
    // load signal: the threshold scales with the core count (32 -> 3.0)
    val quiet = parse(Bench.jsonLine(results, Nil, sf0001, load = 1.0,
      procs = 32, protocolMins = Map.empty))
    val busy = parse(Bench.jsonLine(results, Nil, sf0001,
      load = Bench.noisyLoadThreshold(32) + 0.1, procs = 32,
      protocolMins = Map.empty))
    assert(!quiet.get("noisy").asBoolean)
    assert(busy.get("noisy").asBoolean)
    assert(quiet.get("loadavg").asDouble === 1.0)
    // row signal (the r17 gap: 3-5x outliers under loadavg below the
    // load threshold): a ledger-visible row beyond 2.5x its recorded
    // protocol minimum + 0.2 s flags even on a quiet loadavg reading
    val mins = Map("g1_good" -> 1.0, "t9_tiny" -> 0.05)
    val inflated = parse(Bench.jsonLine(Seq("g1_good" -> 2.71), Nil,
      sf0001, load = 1.0, procs = 32, protocolMins = mins))
    assert(inflated.get("noisy").asBoolean)
    // within 2.5x + 0.2: quiet
    val within = parse(Bench.jsonLine(Seq("g1_good" -> 2.69), Nil,
      sf0001, load = 1.0, procs = 32, protocolMins = mins))
    assert(!within.get("noisy").asBoolean)
    // sub-floor minima never trip (measurement jitter territory), and
    // rows with no recorded minimum (new this round) never trip
    val tiny = parse(Bench.jsonLine(
      Seq("t9_tiny" -> 0.2, "z9_new" -> 50.0), Nil,
      sf0001, load = 1.0, procs = 32, protocolMins = mins))
    assert(!tiny.get("noisy").asBoolean)
    // an errored row (-1 marker) is not a timing — never trips
    val errd = parse(Bench.jsonLine(Seq("g1_good" -> -1.0),
      List("g1_good"), sf0001, load = 1.0, procs = 32,
      protocolMins = mins))
    assert(!errd.get("noisy").asBoolean)
  }

  test("protocol gate lists exactly the rows beyond 2.5x floor and parses the full-names line") {
    // the r20 ask: the closing protocol must FAIL on a quiet-launch
    // regression, not just flag the artifact — Bench.regressions is the
    // list the gate exits nonzero on (tools/bench_protocol.sh →
    // graft.ProtocolGate). Same threshold semantics as the noisy row
    // signal: 2.5x a ledger-visible floor + 0.2 s; errored rows,
    // sub-floor floors and unrecorded rows never gate.
    val mins = Map("g1_good" -> 1.0, "b2_bad" -> 2.0, "t9_tiny" -> 0.05)
    val regs = Bench.regressions(
      Seq("g1_good" -> 2.69, "b2_bad" -> 5.3, "t9_tiny" -> 9.0,
        "z9_new" -> 50.0, "e1_err" -> -1.0), mins)
    assert(regs === Seq(("b2_bad", 5.3, 2.0)))
    // the gate reads the stderr full-names line (the stdout ledger
    // elides fast rows and shortens ids — full coverage lives here)
    val parsed = ProtocolGate.parseFullNames(
      """[bench full names] {"queries":{"g1_good":1.00,"b2_bad":5.30,"e1_err":-1.00}}""")
    assert(parsed === Seq("g1_good" -> 1.0, "b2_bad" -> 5.3, "e1_err" -> -1.0))
    assert(Bench.regressions(parsed, mins) === Seq(("b2_bad", 5.3, 2.0)))
  }

  test("total-level noisy signal catches uniform inflation no row test sees") {
    // the r18 judge's run-4 shape: EVERY covered row inflated ~1.5x by
    // machine-wide load — each row sits under 2.5x·min + 0.2 (no row
    // trip) but the covered total is 1.5x the minima sum (total trip)
    val mins = (1 to 15).map(i => f"q$i%02d_x" -> 1.0).toMap
    val uniform15 = (1 to 15).map(i => f"q$i%02d_x" -> 1.5)
    val inflated = parse(Bench.jsonLine(uniform15, Nil, sf0001,
      load = 1.0, procs = 32, protocolMins = mins))
    assert(inflated.get("noisy").asBoolean)
    // the same registry at 1.2x: inside the quiet-window spread — quiet
    val uniform12 = (1 to 15).map(i => f"q$i%02d_x" -> 1.2)
    val quiet = parse(Bench.jsonLine(uniform12, Nil, sf0001,
      load = 1.0, procs = 32, protocolMins = mins))
    assert(!quiet.get("noisy").asBoolean)
    // below the minima-sum floor the total signal stays silent (a
    // one-row "total" is already owned by the per-row 2.5x test)
    val tinyReg = parse(Bench.jsonLine(Seq("q01_x" -> 2.0), Nil, sf0001,
      load = 1.0, procs = 32, protocolMins = Map("q01_x" -> 1.0)))
    assert(!tinyReg.get("noisy").asBoolean)
    // uncovered rows (no protocol record) inflate neither side of the
    // ratio: a new family's rows cannot manufacture a total trip
    val mixed = parse(Bench.jsonLine(
      uniform12 :+ ("z9_new" -> 50.0), Nil, sf0001,
      load = 1.0, procs = 32, protocolMins = mins))
    assert(!mixed.get("noisy").asBoolean)
  }

  test("v2 ledger elides sub-floor rows into an exact fast summary; errors always print") {
    val results = Seq("a1_x" -> 0.10, "b1_x" -> 0.05, "c1_x" -> 2.0,
      "x1_boom" -> -1.0)
    val node = parse(Bench.jsonLine(results, List("x1_boom"), sf0001))
    val q = node.get("queries")
    assert(q.has("c1") && q.has("x1"), node.toString)
    assert(!q.has("a1") && !q.has("b1"), node.toString)
    assert(node.get("fast").get("n").asInt === 2)
    assert(math.abs(node.get("fast").get("sum").asDouble - 0.15) < 0.002)
    // named rows + fast sum reconstruct the healthy total
    assert(math.abs(q.get("c1").asDouble + node.get("fast").get("sum").asDouble
      - node.get("value").asDouble) < 0.005)
  }

  test("build rows split into the build subtotal; error rows count in neither") {
    val results = Seq("e4_ivf_topk" -> 2.0, "e5_served" -> 3.0, "x1_boom" -> -1.0)
    val line = Bench.jsonLine(results, List("x1_boom"), sf0001,
      buildQueries = Set("e4_ivf_topk"))
    val node = parse(line)
    assert(node.get("tiers").get("build").asDouble === 2.0, line)
    assert(node.get("tiers").get("serve").asDouble === 3.0, line)
    assert(node.get("value").asDouble === 5.0, line)
  }

  test("an env-supplied sf path with JSON metacharacters cannot break the ledger line") {
    val evil = "/tmp/sf\"0.1\\x\n"
    val line = Bench.jsonLine(Seq("g1_good" -> 1.0), Nil, evil)
    assert(parse(line).get("sf").asText === evil, line)
    val fatal = Bench.fatalLine(evil, new IllegalStateException("env broke"))
    assert(parse(fatal).get("sf").asText === evil, fatal)
  }

  test("the REAL registry's ledger line fits the driver's ~2KB tail window with 30+ rows headroom") {
    // rounds 1-5 lost their machine-readable bench to an overflowing line;
    // this pins the budget against the live registry size PLUS 30 future
    // rows, with worst-case 4-digit-second timings (every row above the
    // fast floor, so MaxLedgerRows is what bounds the line)
    val grown = SparkEntry.queries.keySet.toSeq.sorted ++
      (0 until 30).map(i => f"z$i%02d_future_row")
    val results = grown.map(_ -> 1234.567)
    val line = Bench.jsonLine(results, Nil, "/root/testdata/sf0.1")
    val node = parse(line)
    assert(node.get("queries").size === Bench.MaxLedgerRows)
    assert(node.get("fast").get("n").asInt === results.size - Bench.MaxLedgerRows)
    assert(line.length < 1900,
      s"ledger line ${line.length} chars — sbt's trailing [success] eats the rest of 2000")
    // and the all-fast opposite extreme stays tiny and exact
    val allFast = parse(Bench.jsonLine(grown.map(_ -> 0.01), Nil, "/root/testdata/sf0.1"))
    assert(allFast.get("queries").size === 0)
    assert(allFast.get("fast").get("n").asInt === results.size)
  }

  test("mass failure stays inside the tail window: error rows and names are capped, n_errors exact") {
    // the degraded mode the budget exists for: a broken warm view fails
    // the whole registry — v1 would emit every name twice and overflow
    val all = SparkEntry.queries.keySet.toSeq.sorted
    val node = parse(Bench.jsonLine(all.map(_ -> -1.0), all.toList,
      "/root/testdata/sf0.1"))
    assert(node.get("queries").size === Bench.MaxErrorRows)
    assert(node.get("errors").size === Bench.MaxErrorRows)
    assert(node.get("n_errors").asInt === all.size)
    val line = Bench.jsonLine(all.map(_ -> -1.0), all.toList, "/root/testdata/sf0.1")
    assert(line.length < 1900, s"degraded line ${line.length} chars")
  }

  test("combined degraded worst case fits: slow machine AND broken warm view") {
    // the two extremes at once — 4-digit timings on every healthy row
    // PLUS MaxErrorRows+ errors. Each printed error reserves named-row
    // slots, so the caps are a joint budget, not two independent ones.
    val all = SparkEntry.queries.keySet.toSeq.sorted
    val (broken, slow) = all.splitAt(25)
    val results = broken.map(_ -> -1.0) ++ slow.map(_ -> 1234.56)
    val line = Bench.jsonLine(results, broken.toList, "/root/testdata/sf0.1")
    val node = parse(line)
    assert(node.get("errors").size === Bench.MaxErrorRows)
    assert(node.get("n_errors").asInt === broken.size)
    // the -1 markers are EXACTLY the capped error names' short ids — one
    // selection drives both fields (full-name vs short-id sort orders
    // diverge when one short id prefixes another)
    val errShort = (0 until node.get("errors").size)
      .map(i => node.get("errors").get(i).asText.split('_').head).toSet
    val markers = node.get("queries").properties().iterator()
    var nMarkers = 0
    markers.forEachRemaining { e =>
      if (e.getValue.asDouble < 0) { nMarkers += 1
        assert(errShort.contains(e.getKey),
          s"marker ${e.getKey} has no matching errors[] entry") } }
    assert(nMarkers === Bench.MaxErrorRows)
    assert(node.get("queries").size <=
      Bench.MaxErrorRows + (Bench.MaxLedgerRows - 3 * Bench.MaxErrorRows))
    assert(line.length < 1900, s"joint degraded line ${line.length} chars")
  }

  test("fatal bench crash still emits one parseable ledger line") {
    val line = Bench.fatalLine("/root/testdata/sf0.1",
      new IllegalStateException("env broke"))
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains(""""value":-1.000"""), line)
    assert(line.contains(""""errors":["__fatal__"]"""), line)
    assert(line.contains(""""fatal":"java.lang.IllegalStateException""""), line)
    assert(line.contains(""""sf":"/root/testdata/sf0.1""""), line)
    val node = parse(line)
    assert(node.get("loadavg").isNumber, line)
    assert(node.get("procs").asInt > 0, line)
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
