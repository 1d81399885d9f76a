package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — runs every registered query at the given scale factor
  * and prints ONE JSON line. Failed queries are recorded as an explicit
  * error marker (value -1) and named in "errors", never silently timed;
  * a broken warm view degrades the run, never zeroes it (DriverSurfaceSpec
  * gates both behaviors against a deliberately-broken registry). */
object Bench {

  /** Time every query in `registry`; a throwing query yields -1.0 and its
    * name in the error list. Pure over the registry so the degraded-mode
    * contract is testable without a JVM fork. */
  def run(spark: SparkSession, sfDir: String,
      registry: Map[String, (SparkSession, String) => DataFrame])
      : (Seq[(String, Double)], List[String]) = {
    var errors = List.empty[String]
    val results = registry.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            errors ::= name
            false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9 // exclude cleanup below
      graft.llm.DedupOps.releaseCaches() // free per-query tracked persists
      name -> (if (ok) elapsed else -1.0)
    }
    (results, errors)
  }

  /** 1-minute system load average from /proc/loadavg (−1.0 where
    * unreadable): rounds 5/7/9/11 all needed after-the-fact adjudication
    * of driver-bench inflation against ambient machine load — recording
    * the load IN the artifact makes that call a one-line read. */
  def loadAvg(): Double =
    scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble)
      .getOrElse(-1.0)

  /** Locale-pinned decimal formatting: the scala `f` interpolator uses
    * the JVM default locale, so a comma-decimal locale (de_DE, fr_FR…)
    * would render 0.52 as "0,52" and break the one parseable line —
    * the exact failure the degradation contract exists to prevent. */
  private def num(pattern: String, v: Any): String =
    String.format(java.util.Locale.ROOT, pattern, v.asInstanceOf[AnyRef])

  /** `"loadavg":…,"procs":…` — the machine-context fields both line
    * shapes carry (procs = JVM-visible cores, the denominator a load
    * reading is judged against). */
  private def telemetryJson(load: Double, procs: Int): String =
    s""""loadavg":${num("%.2f", load)},"procs":$procs"""

  /** Ledger v2 constants. Healthy rows faster than [[FastFloor]] seconds
    * are summarized into `"fast":{"n":…,"sum":…,"floor":…}` instead of
    * printing their own entry, and at most [[MaxLedgerRows]] row slots
    * print — slowest-first pick, with each printed error row reserving
    * THREE slots (its -1 marker plus its ~25-char quoted full name cost
    * about three named rows), so the combined worst case (slow machine
    * AND broken warm view) fits, not just each extreme alone. This bounds
    * the stdout line for ANY registry size — the v1 line scaled linearly
    * with the registry and sat at ~1.45 KB of its ~1.9 KB budget by 122
    * queries; v2's worst case is ~80 four-digit entries ≈ 1.4 KB with the
    * registry free to grow indefinitely. The stderr full-names line still
    * carries EVERY row, so nothing is lost to logs — only the tail-window
    * artifact elides its fastest (least regression-relevant) rows. */
  val FastFloor = 0.25
  val MaxLedgerRows = 80

  /** Error rows get the same bounding discipline: up to this many -1
    * markers print in `queries` and this many names in `errors`
    * (name-sorted, deterministic), with `"n_errors"` always carrying the
    * true total. Without a cap the DEGRADED mode — the one this line's
    * budget exists to protect — overflows the tail window exactly when a
    * broken warm view fails half the registry (the rounds-1-5 failure
    * shape all over again). */
  val MaxErrorRows = 20

  /** 1-min loadavg above `1.5·procs/16` marks the artifact
    * `"noisy":true` (32 procs → 3.0): per-query times in a noisy
    * artifact are re-measured before being believed (rounds 5/7/9/11/13
    * each needed exactly this adjudication — 13 apparent r13 regressions
    * were all machine load). Scaled to the core count instead of the old
    * fixed 3.5: the r17 driver artifact carried 3-5× per-query outliers
    * at loadavg 2.69 and the fixed threshold stayed silent. */
  def noisyLoadThreshold(procs: Int): Double = 1.5 * procs / 16.0

  /** TOTAL-level noisy signal: the minima-covered rows' summed time
    * beyond this ratio of their summed protocol minima marks the run
    * noisy even when no single row trips the 2.5× test — UNIFORM
    * inflation (every row ~1.5× under machine-wide load) is invisible
    * to any per-row threshold loose enough to tolerate honest jitter
    * (the r18 judge's run 4: 1.49× the minima sum, zero row trips,
    * reported quiet). 1.4 sits above the quiet-window spread the r17/
    * r18 protocols measured (quiet totals repeat within ~1.15×) and
    * below every loaded-window run on record (1.45×+). */
  val TotalNoisyRatio = 1.4

  /** The total signal needs a real denominator: below this summed-minima
    * floor (seconds) it stays silent — a one-row registry's total IS its
    * row, already owned by the 2.5× row test, and a tiny sum makes the
    * ratio jitter-dominated. The full-registry minima sum is ~100 s. */
  val TotalSignalMinSum = 10.0

  /** Whether a run's evidence says "re-measure before believing":
    * ambient load above [[noisyLoadThreshold]], OR any ledger-visible
    * row (protocol minimum ≥ [[FastFloor]]) running beyond 2.5× its
    * recorded [[BenchProtocol.mins]] minimum plus a 0.2 s jitter guard —
    * the second signal is what the r17 artifact needed (t19c at 4.67 s
    * vs a 1.17 s protocol min under loadavg 2.69) — OR the minima-
    * covered rows' total beyond [[TotalNoisyRatio]]× their minima sum
    * (the r19 signal: uniform load inflation that no per-row test can
    * see). A GENUINE regression also trips the row signal by
    * construction: `noisy` means exactly "per-query times here need a
    * quiet-window re-measure"; a real regression persists across quiet
    * reruns (and moves the protocol record), while a load blip does
    * not. Rows without a recorded minimum (new this round) never trip
    * either signal. */
  def noisyOf(load: Double, procs: Int, results: Seq[(String, Double)],
      mins: Map[String, Double] = BenchProtocol.mins): Boolean = {
    // rows with a ledger-visible protocol record AND a healthy timing:
    // the pair-matched (time, min) set both row and total signals read
    val covered = results.flatMap { case (name, v) =>
      if (v < 0) None
      else mins.get(name).filter(_ >= FastFloor).map(m => (v, m))
    }
    val minsSum = covered.map(_._2).sum
    load > noisyLoadThreshold(procs) ||
      regressions(results, mins).nonEmpty ||
      (minsSum >= TotalSignalMinSum &&
        covered.map(_._1).sum > TotalNoisyRatio * minsSum)
  }

  /** The rows a run measured beyond 2.5× their committed protocol floor
    * (+0.2 s jitter guard) — the per-row noisy signal, exposed as a list
    * so the closing protocol can FAIL on a quiet-launch regression
    * instead of only flagging the artifact (the r20 lesson: a floor-
    * preserving min() merge cannot surface a regression by construction,
    * which is exactly how a warm-evidence-only hint shipped 8× slow at
    * the driver). Returns (name, measured, floor). */
  def regressions(results: Seq[(String, Double)],
      mins: Map[String, Double] = BenchProtocol.mins)
      : Seq[(String, Double, Double)] =
    results.flatMap { case (name, v) =>
      if (v < 0) None
      else mins.get(name).filter(_ >= FastFloor)
        .filter(m => v > 2.5 * m + 0.2).map(m => (name, v, m))
    }

  /** The ONE parseable stdout line (format v2). The harness keeps only
    * the LAST ~2000 characters of output, and sbt appends a ~70-char
    * "[success]" line after us — the line must stay well under that
    * budget. Full query names at 74+ queries overflow it (exactly how
    * rounds 1-5 lost their machine-readable bench), so it keys on the
    * short SURVEY §2 ids (the token before the first '_':
    * "d3b_simhash_neardups" → "d3b"), which are unique across the
    * registry (asserted), and v2 additionally elides sub-[[FastFloor]]
    * rows into a "fast" summary and caps named rows at [[MaxLedgerRows]]
    * (see those constants). Carries machine-load telemetry (see
    * [[loadAvg]]), the [[NoisyLoadThreshold]]-derived "noisy" flag, and
    * a build/serve subtotal split: `buildQueries` names the rows that
    * price an inline index BUILD (Lloyd passes, codebook training), so a
    * load spike on one build row reads as exactly that instead of
    * inflating the serving story. */
  /** (name, seconds) entries as a JSON object — shared by the stdout
    * ledger line (short ids) and the stderr full-names line so the two
    * renderings cannot drift. Names are Jsons.quote-escaped like every
    * other interpolated string: today they are code constants, but one
    * odd future registry name must not unparse the ledger. */
  // Per-query values print at 2 decimals: 10 ms resolution is plenty for
  // trending, and the saved character per entry is what keeps the
  // 122-query line inside the driver's tail window (the totals/tiers keep
  // their 3 decimals — three values cost nothing).
  private def queriesJson(entries: Seq[(String, Double)]): String =
    entries.map { case (k, v) => Jsons.quote(k) + ":" + num("%.2f", v) }
      .mkString("{", ",", "}")

  def jsonLine(results: Seq[(String, Double)], errors: List[String],
      sfDir: String,
      buildQueries: Set[String] = SparkEntry.buildQueries,
      load: Double = loadAvg(),
      procs: Int = Runtime.getRuntime.availableProcessors,
      protocolMins: Map[String, Double] = BenchProtocol.mins): String = {
    def fmt(v: Double): String = num("%.3f", v)
    val shortIds = results.map { case (k, v) => k.split('_').head -> v }
    require(shortIds.map(_._1).distinct.size == shortIds.size,
      "short query ids collide; extend the key scheme")
    val healthy = results.filter(_._2 >= 0)
    val total = healthy.map(_._2).sum
    val build = healthy.filter(r => buildQueries.contains(r._1)).map(_._2).sum
    // ONE capped error selection (full names, name-sorted) drives BOTH
    // renderings — the -1 markers in `queries` and the names in `errors`
    // — so the two fields always describe the same subset (full-name and
    // short-id sort orders diverge when one short id prefixes another:
    // "d1" < "d10" but "d10_…" < "d1_…")
    val errNames = errors.sorted.take(MaxErrorRows)
    val errJson = errNames.map(Jsons.quote).mkString("[", ",", "]")
    // v2 row selection: the capped error rows print first; healthy rows
    // print when ≥ FastFloor AND inside the slowest-first budget — the
    // rest fold into the "fast" summary (count + exact sum, so the named
    // rows plus the summary still reconstruct the total)
    val (errAll, healthyRows) = shortIds.partition(_._2 < 0)
    val errKeys = errNames.map(_.split('_').head).toSet
    val errRows = errAll.filter(r => errKeys.contains(r._1)).sortBy(_._1)
    // JOINT budget: each printed error costs a -1 marker AND a ~25-char
    // quoted full name (~3 named-row equivalents at worst-case 4-digit
    // timings) — reserve its slots out of the named-row budget so the
    // combined worst case (slow machine AND broken warm view) still fits
    // the tail window, not just each extreme alone
    val namedCap = math.max(0, MaxLedgerRows - 3 * errRows.size)
    val named = healthyRows.filter(_._2 >= FastFloor)
      .sortBy { case (n, v) => (-v, n) }.take(namedCap)
    val namedKeys = named.map(_._1).toSet
    val elided = healthyRows.filterNot(r => namedKeys.contains(r._1))
    val fastJson = s""""fast":{"n":${elided.size},"sum":${fmt(elided.map(_._2).sum)},"floor":${num("%.2f", FastFloor)}}"""
    val rows = (errRows ++ named).sortBy(_._1)
    val noisy = noisyOf(load, procs, results, protocolMins)
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","v":2,"noisy":$noisy,"tiers":{"build":${fmt(build)},"serve":${fmt(total - build)}},${telemetryJson(load, procs)},"queries":${queriesJson(rows)},$fastJson,"n_errors":${errors.size},"errors":$errJson,"sf":${Jsons.quote(sfDir)}}"""
  }

  /** Emitted when the run dies before per-query timing can even start
    * (session creation, a fatal env break): still one parseable JSON line
    * keyed like the healthy artifact, so a crashed round stays
    * ledger-comparable (error class + sf + machine load recorded) instead
    * of leaving only a raw stack tail. */
  def fatalLine(sfDir: String, e: Throwable): String = {
    val load = loadAvg()
    val procs = Runtime.getRuntime.availableProcessors
    s"""{"metric":"total","value":-1.000,"unit":"sec","v":2,"noisy":${load > noisyLoadThreshold(procs)},${telemetryJson(load, procs)},"queries":{},"n_errors":1,"errors":["__fatal__"],"fatal":${Jsons.quote(e.getClass.getName)},"sf":${Jsons.quote(sfDir)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try mainImpl(sfDir)
    catch {
      case e: Throwable =>
        // the fatal marker is printed BEFORE rethrow: the driver keeps its
        // nonzero rc (honest), but stdout still carries a parseable record
        println(fatalLine(sfDir, e))
        throw e
    }
  }

  private def mainImpl(sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm is best-effort: a single broken view must cost only its own
    // queries their -1 markers, never zero the whole round's bench to rc=1
    try SparkEntry.warm(spark, sfDir)
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] warm FAILED (continuing degraded): ${e.getMessage}")
    }

    val (results, errors) = run(spark, sfDir, SparkEntry.queries)
    System.err.println(s"""[bench full names] {"queries":${queriesJson(results)}}""")
    println(jsonLine(results, errors, sfDir))
    spark.stop()
  }
}
