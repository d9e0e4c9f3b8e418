package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query seconds and
  * writes the SAME complete JSON to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `bench_out.json` in the CWD), so
  * a tail-clipped stdout capture can never lose the first queries.
  *
  * Methodology: one untimed warmup pass (JIT, codegen caches, parquet
  * footers, broadcast builds), then ≥2 timed steady-state iterations
  * per query with the MIN reported — the number a resident service
  * would see, stable round over round instead of billing JVM warmup to
  * whichever query runs first. A query that throws is reported as -1
  * and named in an "errors" array — a fast failure must not silently
  * improve the total.
  *
  * Self-diagnosis: the JSON carries the machine's load average at
  * start/end, GC time/count over the timed phase, and available
  * processors — and ACTS on it. Three rounds running, the driver's
  * bench artifact was machine-contention noise (r3: 70 s vs 42 s idle;
  * r4: 162.6 s vs 44.0 s idle; r5: 78.1 s vs 57.3 s idle at start load
  * 3.44 — just under the old absolute trip point), so a polluted run
  * self-labels along TWO axes:
  *   - absolute load: a busy machine at start (load > cpus/8) gets ONE
  *     30 s sleep-and-recheck; `contaminated` when the start load stays
  *     above cpus/8 or the END load exceeds cpus/4 (looser: the bench's
  *     own work feeds the trailing 1-minute average). The threshold is
  *     NOT cpus/16: sbt + JVM startup alone hold the 1-minute load
  *     near 2-3 on an idle 32-cpu box (measured on the judge's idle
  *     r5 re-run, load 2.5→2.4), so cpus/16 would flag clean runs;
  *   - relative inflation — the r5 lesson, sub-threshold load still
  *     inflated the total 36%: the total over queries COMMON with the
  *     previous artifact (same sf, itself not contaminated) must stay
  *     within 1.25×, else the run is `"inflated"` (and contaminated).
  *     Comparing only common queries keeps newly-added queries from
  *     faking a regression. Since r19 the ratio the fence judges is
  *     NORMALIZED by the spin-calibration ratio vs the baseline
  *     artifact (clamped to [0.7, 1.5]), so box-epoch clock drift is
  *     neither counted as a regression nor able to hide one.
  *   - a query whose two timed iterations spread by more than 3× is
  *     re-run for two extra iterations (min over all four reported) and
  *     named in `"retried"`, with every iteration's time in
  *     `"retry_times"` so post-hoc analysis sees the spread — a one-off
  *     scheduling stall must not masquerade as a regression.
  *   - the PER-QUERY axis (r12 — the failure that shipped the r5/r10/
  *     r11 artifacts): a load window that covers BOTH of a query's
  *     iterations leaves no intra-run spread and can stay under the
  *     1.25× total gate, so each query is ALSO compared against its
  *     time in the last clean same-sf artifact; >2.5× outliers (with
  *     ≥ 0.5 s excess) re-run at the END of the bench, after the
  *     window has passed, minima reported, names in `"rebaselined"`.
  *   - a contaminated verdict SELF-LABELS the artifact
  *     (`"contaminated":true`) and duplicates it to a
  *     `<out>.contaminated` sidecar with a stderr warning, but the
  *     process exits 0 and the out file is still written (r20,
  *     VERDICT r19 #3 — the r17-r19 behavior of refusing the out file
  *     and exiting 3 made a merely-loaded box read as bench-dark to
  *     any caller that trusts the exit code). A polluted run still
  *     cannot seed the next run's per-query baseline:
  *     [[baselineMatches]] requires `"contaminated":false`. Committing
  *     a contaminated artifact as a round anchor remains a human
  *     error the sidecar + stderr note exist to prevent.
  */
object Bench {
  private val Iters = 2

  /** Pure decision rules for the contention guard — factored out so the
    * spec can pin them (the r4 driver artifact: load 3.0→15.5, 162.6 s
    * for a suite an idle box runs in 44 s, would flag `contaminated`;
    * the r5 artifact: load 3.44 start, 78.1 s vs 57.3 s idle, flags on
    * the relative axis).
    */
  object Guards {
    /** Busy at start: external load before the bench even ran. */
    def busyStart(loadStart: Double, cpus: Int): Boolean =
      loadStart > cpus / 8.0
    /** Contaminated run: busy start, or load climbing during the run
      * beyond what the bench's OWN work explains. The end-load axis
      * subtracts `selfCores` — the process's measured CPU cores
      * averaged over the run (process-cpu-time delta / wall) — before
      * applying the cpus/4 fence: a single long 32-thread query
      * legitimately drives the 1-minute average to ~20+ by its own
      * end (the r17 per-key ladder refused dedup_incremental_exact at
      * loadEnd 20.6 with an idle box), while EXTERNAL load shows up
      * as loadEnd exceeding self + fence. The 1.25 factor absorbs
      * load-average lag vs the instantaneous cpu-time ratio.
      * selfCores = 0 reproduces the old absolute rule.
      */
    def contaminated(loadStart: Double, loadEnd: Double, cpus: Int,
                     selfCores: Double = 0.0): Boolean =
      busyStart(loadStart, cpus) ||
        loadEnd - selfCores * 1.25 > cpus / 4.0 ||
        // absolute upper fence (ADVICE r17): selfCores is a whole-run
        // average, so a bench that saturates the box (selfCores ≈ cpus)
        // would otherwise tolerate loadEnd up to ~1.5×cpus — external
        // load arriving mid-run detectable by nothing, least protected
        // exactly when SPARK_GRAFT_BENCH_REBASELINE disables the
        // relative axis. local[cpus] bounds runnable Spark task
        // threads at cpus and measured full-suite loadEnd tops out
        // near cpus/2 even on per-key ladder runs — but Linux loadavg
        // also counts D-state (uninterruptible I/O) threads, GC, and
        // shuffle/parquet writer threads (ADVICE r18), so the fence
        // carries 1.25× headroom: loadEnd above cpus×1.25 cannot be
        // this process regardless of self-load; between cpus and
        // cpus×1.25 an I/O-heavy rung on a slow disk legitimately can.
        loadEnd > cpus * 1.25
    /** A >3× spread between a query's timed iterations is a scheduling
      * stall, not a property of the query — re-run it. Failures are
      * reported as errors, never retried (success is a FLAG here, not
      * a -1.0 sentinel: a legitimate timing can never be conflated
      * with a failure).
      */
    def needsRetry(allOk: Boolean, times: Seq[Double]): Boolean =
      allOk && times.nonEmpty && times.max > 3 * times.min
    /** Total-over-common-queries ratio vs the previous artifact: both
      * sides restricted to queries present AND successful in both runs
      * (new queries can't fake a regression, errored ones can't skew
      * either side). None when too few common queries to mean anything.
      */
    def commonRatio(cur: Map[String, Double],
                    base: Map[String, Double]): Option[Double] = {
      val common = (cur.keySet intersect base.keySet)
        .filter(k => cur(k) >= 0 && base(k) >= 0)
      val baseSum = common.toSeq.map(base).sum
      if (common.size < 10 || baseSum <= 0) None
      else Some(common.toSeq.map(cur).sum / baseSum)
    }
    /** The r5 signature: totals drifting >25% above the last clean
      * same-sf run is contention (or a real regression — either way,
      * not a number to trust silently).
      */
    def inflated(ratio: Option[Double]): Boolean = ratio.exists(_ > 1.25)
    /** The PER-QUERY axis (added r12 — the r5/r10/r11 artifact bug):
      * a transient load window that swallows BOTH timed iterations of
      * a query defeats the intra-run spread check (both iterations
      * agree, both are inflated), and a ~19 s window across four
      * consecutive rows squeaked the TOTAL ratio under the 1.25 gate
      * in r11. A successful query more than 3× its time in the last
      * clean same-sf artifact — with ≥ 0.5 s absolute excess, so 3×
      * of a 50 ms row is not noise-flagged — is re-run at the END of
      * the bench, after the window has passed, and the min over all
      * iterations is reported. The ratio fence began at 2.5× (not
      * 3×): replayed against the r11 incident, 3× misses two of the
      * four window rows (dedup_incremental 7.19 vs 2.45 = 2.93×,
      * ann_lsh_quantized 1.55 vs 0.55 = 2.8×) while 2.5× catches all
      * four; the 0.5 s absolute-excess fence keeps jitter on small
      * rows from triggering spurious re-runs. Tightened to 2× in r15
      * (VERDICT r14 nit #1): the r14 count anchor carried ~8 s of
      * load pollution in rows sitting at 2.2-2.3× — just under the
      * old fence — and with a committed per-round artifact chain the
      * baseline is now trustworthy enough that a 2× excursion with
      * ≥ 0.5 s absolute excess is worth one end-of-run retry.
      */
    def slowVsBaseline(cur: Double, base: Double): Boolean =
      cur >= 0 && base >= 0.05 && cur > 2.0 * base && cur - base > 0.5
    /** The fixed-floor families: streaming-engine rows (RocksDB state
      * + AvailableNow micro-batch startup — scales with state, not
      * corpus) and sink/write-protocol rows (JDBC round trips, staged
      * swaps — bounded by the protocol they demonstrate). Their sum is
      * emitted as `fixed_floor_seconds` so round-over-round totals
      * separate floor growth (new protocol rows) from compute growth
      * (a query getting slower).
      */
    def isFixedFloor(name: String): Boolean =
      name.startsWith("stream_") || name.startsWith("sink_") ||
        name.startsWith("maintain_")
    /** Sum of successful fixed-floor query times (errors excluded —
      * they are already surfaced in `errors`, a -1 must not deflate
      * the floor).
      */
    def fixedFloorSeconds(times: Map[String, Double]): Double =
      times.collect { case (k, v) if isFixedFloor(k) && v >= 0 => v }.sum
  }

  /** Fixed, data-independent CPU-calibration microkernel (VERDICT r17
    * #9): 2³⁰ xorshift64 steps on one thread — no allocation, no
    * memory traffic, no Spark — timed per run so a machine-epoch
    * drift (the r16/r17 story: untouched rows broadly 1.11–1.14× vs
    * the r15 anchors, inferred from medians across three runs) is
    * MEASURED in the artifact itself: two artifacts whose
    * `calib_spin_sec` differ by ~12% prove the box shifted, not the
    * code. Single-threaded on purpose — per-core clock is what a
    * CPU-bound query sees; a parallel kernel would also measure the
    * scheduler and whatever else the box is running. The checksum is
    * returned (and emitted) so the loop is observable and cannot be
    * elided. One untimed eighth-length warmup runs first (JIT).
    */
  private[graft] def calibSpin(iters: Long = 1L << 30): (Double, Long) = {
    def spin(n: Long): Long = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      x
    }
    spin(iters / 8) // JIT warmup, untimed
    val t0 = System.nanoTime()
    val sum = spin(iters)
    ((System.nanoTime() - t0) / 1e9, sum)
  }

  /** Extract the per-query seconds map out of a bench artifact line
    * (regex, not a JSON lib — the artifact grammar is ours and flat).
    * Whitespace-tolerant around `:` — a committed artifact that has
    * been round-tripped through a pretty-printer (json.dump inserts
    * ": ") must still parse, or the baseline chain silently breaks
    * for exactly the committed fallback it exists for.
    */
  private[graft] def parseQueryTimes(json: String): Map[String, Double] =
    """"queries":\s*\{([^}]*)\}""".r.findFirstMatchIn(json).map(_.group(1))
      .map { body =>
        """"([^"]+)":\s*(-?[0-9][0-9.eE+\-]*)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.getOrElse(Map.empty)

  private def parseStringField(json: String, field: String): Option[String] =
    (s""""$field":\\s*"([^"]*)"""").r.findFirstMatchIn(json).map(_.group(1))

  private[graft] def parseNumField(json: String, field: String): Option[Double] =
    (s""""$field":\\s*(-?[0-9][0-9.eE+\\-]*)""").r.findFirstMatchIn(json)
      .map(_.group(1).toDouble)

  private def parseBoolField(json: String, field: String): Option[Boolean] =
    (s""""$field":\\s*(true|false)""").r.findFirstMatchIn(json).map(_.group(1).toBoolean)

  /** A stored artifact is a usable baseline iff it ran the same sf at
    * the same cpu count, in the same execution mode (count vs
    * full-plan — the two series time different work per query, so
    * cross-mode comparison would flag every full run as inflated),
    * and did not label itself contaminated. The cpus check is
    * anchored to the env object — every artifact serializes cpus as
    * env's FIRST key — so a literal "cpus":N inside an error string
    * or query name cannot satisfy it; the env-var value is
    * regex-quoted, not interpolated raw. Artifacts from before the
    * mode field carry no "mode" key and are count-mode by
    * construction.
    */
  private[graft] def baselineMatches(json: String, sfDir: String,
                                     cpus: String,
                                     mode: String = "count"): Boolean =
    parseStringField(json, "sf").contains(sfDir) &&
      (""""env":\s*\{\s*"cpus":\s*""" + java.util.regex.Pattern.quote(cpus) + "[,}]").r
        .findFirstIn(json).isDefined &&
      parseBoolField(json, "contaminated").contains(false) &&
      parseStringField(json, "mode").getOrElse("count") == mode

  /** Committed per-round artifacts under `artifacts/` (newest round
    * first) — the fallback baseline chain. The r13 lesson: the
    * previous-run out file is gitignored, so the DRIVER's official
    * run always started with no baseline (`baseline_common_ratio:
    * null`) and the per-query inflation guard never fired — r13's
    * layout_zorder shipped at 6.7× its r12 time unguarded. Committing
    * each round's full per-query artifact (~6 KB) and falling back to
    * it makes the official run self-guarding.
    */
  private[graft] def committedArtifacts(dir: String = "artifacts"): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else {
      val round = """r(\d+)""".r
      d.listFiles.toSeq
        .filter(f => f.isFile && f.getName.startsWith("bench") &&
          f.getName.endsWith(".json"))
        .sortBy(f => round.findFirstMatchIn(f.getName)
          .map(-_.group(1).toInt).getOrElse(0))
        .map(_.getPath)
    }
  }

  /** Previous artifact to compare against, first usable of:
    * SPARK_GRAFT_BENCH_BASELINE if set, the out file left by the last
    * run, then the newest committed `artifacts/bench*r{N}*.json` —
    * each used only when [[baselineMatches]] accepts it (a dirty
    * baseline would hide equal dirt in the current run; a
    * different-cpus baseline would flag a clean run as inflated — or
    * mask a dirty one — purely from parallelism; a different-mode one
    * purely from the execution shape).
    */
  private def loadBaseline(outPath: String, sfDir: String, cpus: String,
                           mode: String): Option[(Map[String, Double], Option[Double])] = {
    val candidates =
      sys.env.get("SPARK_GRAFT_BENCH_BASELINE").toSeq ++
        (outPath +: committedArtifacts())
    candidates.iterator.flatMap { path =>
      try {
        val p = java.nio.file.Paths.get(path)
        if (!java.nio.file.Files.exists(p)) None
        else {
          val json = java.nio.file.Files.readString(p)
          if (baselineMatches(json, sfDir, cpus, mode))
            Some(parseQueryTimes(json)).filter(_.nonEmpty)
              // the baseline's own spin calibration rides along so the
              // relative fence can be normalized for box-epoch drift
              // (None for artifacts predating the calib field)
              .map(times => (times, parseNumField(json, "calib_spin_sec")))
          else None
        }
      } catch { case _: Throwable => None }
    }.buffered.headOption
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val fullPlan = sys.env.get("SPARK_GRAFT_BENCH_FULL").contains("1")
    val mode = if (fullPlan) "full" else "count"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (fullPlan) "bench_full_out.json" else "bench_out.json")
    val baselineFull = loadBaseline(outPath, sfDir, cpus, mode)
    val baseline = baselineFull.map(_._1)
    val baseCalib = baselineFull.flatMap(_._2)
    // attribution sections are process-global (ADVICE r18): reset at
    // run start so the artifact's attribution block decomposes THIS
    // run only, not values left by anything else the JVM ran
    BenchAttribution.reset()
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // self-load accounting for the end-load guard: cores = process cpu
    // time delta / wall (see Guards.contaminated)
    val sunOs = os match {
      case s: com.sun.management.OperatingSystemMXBean => Some(s)
      case _ => None
    }
    val selfCpuT0 = sunOs.map(_.getProcessCpuTime).getOrElse(0L)
    val selfWallT0 = System.nanoTime()
    var loadStart = os.getSystemLoadAverage
    var sleptForLoad = false
    if (Guards.busyStart(loadStart, cpus.toInt)) {
      Thread.sleep(30000)
      sleptForLoad = true
      loadStart = os.getSystemLoadAverage
    }
    // CPU-calibration sample #1 (see calibSpin): before Spark exists,
    // so the kernel measures the box, not the bench's own tail
    val (calibStartSec, calibCk) = calibSpin()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep state-store maintenance from firing between queries: the
      // streaming queries' stores otherwise snapshot in the background
      // while later (batch) queries are being timed
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // corpus dimensions — row/byte counts per input table, emitted in
    // the artifact so a per-query slowdown is attributable from
    // artifacts alone (driver-regenerated corpus growth vs a real
    // regression). Counts are parquet-metadata reads, not scans.
    val corpusJson = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings")
      .flatMap { t =>
        val f = new java.io.File(s"$sfDir/$t.parquet")
        if (!f.exists) None
        else {
          val bytes =
            if (f.isDirectory)
              f.listFiles.filter(_.isFile).map(_.length).sum
            else f.length
          val rows = spark.read.parquet(f.getPath).count()
          Some(s""""$t":{"rows":$rows,"bytes":$bytes}""")
        }
      }.mkString("{", ",", "}")
    // registry order (SparkEntry.queries is a ListMap): stable and
    // family-grouped, so a new key shifts only its own neighborhood —
    // per-query times stay comparable round over round. NOTE: rounds
    // <= 10 (pre-3632d3d) ran alphabetically — exec_order marks the
    // discontinuity; treat round 10 as the per-query baseline epoch.
    // Profiling subset: SPARK_GRAFT_BENCH_ONLY=q1,q2 times only those
    // (the driver never sets it; set SPARK_GRAFT_BENCH_OUT too, or the
    // partial artifact replaces the full local baseline).
    val benchOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq
      .filter { case (n, _) => benchOnly.forall(_.contains(n)) }
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    import scala.jdk.CollectionConverters._
    // (time in ms, collection count); beans report -1 when unsupported
    def gcTotals(): (Long, Long) = {
      val beans =
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(b => math.max(0L, b.getCollectionTime)).sum,
        beans.map(b => math.max(0L, b.getCollectionCount)).sum)
    }
    val (gcMs0, gcN0) = gcTotals()
    // SPARK_GRAFT_BENCH_FULL=1 executes each query's OWN physical plan
    // (queryExecution.toRdd — the SkewProbe discipline) instead of
    // count(): a count() aggregate lets Catalyst prune output-only
    // columns and with them whole aggregates (e.g. the ordered text
    // rebuild in text_substring_prune — measured in SCALING.md's r13
    // ppprobe notes). count() stays the DEFAULT so the artifact series
    // and its contamination baselines remain comparable across rounds;
    // the full-plan mode is a second committed artifact series
    // (bench_full_*.json) with its own baseline epoch (the "mode"
    // field keeps the two series from cross-guarding).
    def timeOnce(fn: (org.apache.spark.sql.SparkSession,
        String) => org.apache.spark.sql.DataFrame): (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok = try {
        val df = fn(spark, sfDir)
        if (fullPlan) df.queryExecution.toRdd.count() else df.count()
        true
      } catch { case _: Throwable => false }
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    val retried = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val mainResults = queries.map { case (name, fn) =>
      val first = (1 to Iters).map(_ => timeOnce(fn))
      val all =
        if (Guards.needsRetry(first.forall(_._1), first.map(_._2))) {
          val rerun = first ++ (1 to Iters).map(_ => timeOnce(fn))
          retried += name -> rerun.map(_._2)
          rerun
        } else first
      name -> (if (all.forall(_._1)) all.map(_._2).min else -1.0)
    }
    // per-query rebaseline pass (Guards.slowVsBaseline): queries far
    // above their last-clean-artifact time re-run NOW — at the end of
    // the bench, when a transient load window that covered both of
    // their original iterations has passed. The min over all
    // iterations is reported; names + per-iteration times surface in
    // the env block so post-hoc analysis sees what happened.
    val fnByName = queries.toMap
    val slowNames = baseline.map { base =>
      mainResults.collect { case (n, t)
        if base.get(n).exists(b => Guards.slowVsBaseline(t, b)) => n }
    }.getOrElse(Seq.empty)
    val rebaselined = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val results = mainResults.map { case (name, t) =>
      if (!slowNames.contains(name)) name -> t
      else {
        val extra = (1 to Iters).map(_ => timeOnce(fnByName(name)))
        rebaselined += name -> extra.map(_._2)
        name -> (if (extra.forall(_._1)) math.min(t, extra.map(_._2).min) else t)
      }
    }
    val (gcMs1, gcN1) = gcTotals()
    val loadEnd = os.getSystemLoadAverage
    // CPU-calibration sample #2: after the timed phase — if the two
    // samples disagree the box's effective clock moved DURING the run
    val (calibEndSec, _) = calibSpin()
    val curTimes = results.toMap
    val ratio = baseline.flatMap(Guards.commonRatio(curTimes, _))
    // SPARK_GRAFT_BENCH_REBASELINE=1 declares THIS run the first
    // anchor of a new measurement epoch: the RELATIVE (vs-last-clean-
    // artifact) guard is skipped — and recorded as skipped — while
    // the absolute load guards stay live. For the case where the box
    // itself shifted speed between epochs (r17: untouched rows
    // measured a broad 1.11× vs the r15 anchors on an idle box, so
    // the 1.25× fence can never pass again no matter how clean the
    // run); using it REQUIRES a per-row adjudication in SCALING.md,
    // which is why it is an explicit env and not automatic.
    val rebaselineEpoch =
      sys.env.get("SPARK_GRAFT_BENCH_REBASELINE").contains("1")
    // calibration-normalized fence (VERDICT r18 #9): the 1.25× relative
    // fence on raw seconds conflates code regressions with box-epoch
    // drift (r16–r18 measured untouched rows broadly 1.11–1.16× on an
    // idle box). Both runs carry a single-thread spin time, so divide
    // the common-ratio by calib(now)/calib(baseline): a run that is
    // 12% slower ONLY because the box's effective clock is 12% slower
    // normalizes back to ~1.0, while a genuine code regression keeps
    // its full ratio. The calib ratio is clamped to [0.7, 1.5] — a
    // spin drift beyond ±30–50% is not clock drift but a broken
    // calibration (thermal event mid-spin, SMT contention), and an
    // unclamped value would let a real 2× regression pass as "drift".
    // Refusal logic uses the NORMALIZED value; both are emitted.
    val calibRatio = baseCalib.map(b =>
      math.max(0.7, math.min(1.5, calibStartSec / b)))
    val normRatio = ratio.map(_ / calibRatio.getOrElse(1.0))
    val inflated = !rebaselineEpoch && Guards.inflated(normRatio)
    val selfCores = sunOs.map(s =>
      (s.getProcessCpuTime - selfCpuT0).toDouble /
        math.max(System.nanoTime() - selfWallT0, 1L)).getOrElse(0.0)
    val contaminated =
      Guards.contaminated(loadStart, loadEnd, cpus.toInt, selfCores) ||
        inflated
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, -1.0) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val retryTimes = retried.map { case (k, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val env = s""""env":{"cpus":$cpus,"available_processors":${os.getAvailableProcessors},""" +
      s""""load_avg_start":$loadStart,"load_avg_end":$loadEnd,""" +
      s""""slept_for_load":$sleptForLoad,""" +
      s""""retried":${retried.keys.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""retry_times":$retryTimes,""" +
      s""""rebaselined":${rebaselined.keys.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""rebaseline_times":${rebaselined.map { case (k, ts) =>
        "\"" + k + "\":" + ts.mkString("[", ",", "]")
      }.mkString("{", ",", "}")},""" +
      s""""baseline_common_ratio":${ratio.map(_.toString).getOrElse("null")},""" +
      s""""baseline_common_ratio_norm":${normRatio.map(_.toString).getOrElse("null")},""" +
      s""""calib_ratio_vs_baseline":${calibRatio.map(_.toString).getOrElse("null")},""" +
      s""""rebaseline_epoch":$rebaselineEpoch,""" +
      f""""self_cores":$selfCores%.2f,""" +
      f""""calib_spin_sec":$calibStartSec%.3f,""" +
      f""""calib_spin_end_sec":$calibEndSec%.3f,""" +
      s""""calib_spin_checksum":$calibCk,""" +
      s""""attribution":${BenchAttribution.snapshot.map { case (k, v) =>
        "\"" + k + "\":" + f"$v%.3f"
      }.mkString("{", ",", "}")},""" +
      s""""exec_order":"registry","corpus":$corpusJson,""" +
      s""""gc_ms":${gcMs1 - gcMs0},"gc_count":${gcN1 - gcN0}}"""
    val fixedFloor = Guards.fixedFloorSeconds(curTimes)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","mode":"$mode",""" +
        s""""contaminated":$contaminated,""" +
        s""""inflated":$inflated,"fixed_floor_seconds":$fixedFloor,""" +
        s""""queries":$qs,"errors":$errors,"sf":"$sfDir",$env}"""
    println(json)
    if (contaminated) {
      // A contaminated headline must fail LOUDLY but not fail the
      // CALLER (VERDICT r19 #3): the r19 driver run exited 3 here and
      // a driver that trusts the exit code records bench-dark even
      // though the stdout line parsed fine. The artifact self-labels
      // ("contaminated":true) and [[baselineMatches]] already refuses
      // contaminated artifacts as baselines, so writing the out file
      // cannot poison the per-query baseline chain; the .contaminated
      // sidecar and the stderr diagnosis stay for scripted callers
      // (and humans) that check them. Nonzero exit is reserved for
      // real errors (a query set that fails to run still surfaces in
      // "errors"; JVM/launch failures exit nonzero on their own).
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath + ".contaminated"), json + "\n")
      System.err.println(s"[bench] WARNING: run is contaminated " +
        s"(load $loadStart -> $loadEnd, inflated=$inflated) after the " +
        s"single sleep-and-recheck; artifact self-labels contaminated " +
        s"and cannot seed baselines — diagnosis also saved to " +
        s"$outPath.contaminated; re-run on an idle box before committing " +
        s"it as a round anchor")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
