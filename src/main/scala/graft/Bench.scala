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
  * processors — and ACTS on it. Two rounds running, the driver's bench
  * artifact was machine-contention noise (r3: 70 s vs 42 s idle; r4:
  * 162.6 s vs 44.0 s idle), so a polluted run now self-labels:
  *   - a busy machine at start (load > cpus/8) gets ONE 30 s
  *     sleep-and-recheck for transient contention to drain;
  *   - `"contaminated": true` when the start load stays above cpus/8
  *     or the END load exceeds cpus/4 (the r4 signature: load climbing
  *     under an external job mid-run; the looser end threshold leaves
  *     headroom for the bench's own 1-minute load-average footprint);
  *   - a query whose two timed iterations spread by more than 3× is
  *     re-run for two extra iterations (min over all four reported) and
  *     named in `"retried"` — a one-off scheduling stall must not
  *     masquerade as a regression.
  */
object Bench {
  private val Iters = 2

  /** Pure decision rules for the contention guard — factored out so the
    * spec can pin them (the r4 driver artifact: load 3.0→15.5, 162.6 s
    * for a suite an idle box runs in 44 s, would flag `contaminated`).
    */
  object Guards {
    /** Busy at start: external load before the bench even ran. */
    def busyStart(loadStart: Double, cpus: Int): Boolean =
      loadStart > cpus / 8.0
    /** Contaminated run: busy start, or load climbing during the run —
      * the end threshold is looser (cpus/4) because the bench's own
      * work contributes to the trailing 1-minute load average.
      */
    def contaminated(loadStart: Double, loadEnd: Double, cpus: Int): Boolean =
      busyStart(loadStart, cpus) || loadEnd > cpus / 4.0
    /** A >3× spread between a query's timed iterations is a scheduling
      * stall, not a property of the query — re-run it.
      */
    def needsRetry(times: Seq[Double]): Boolean =
      !times.contains(-1.0) && times.max > 3 * times.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    var loadStart = os.getSystemLoadAverage
    var sleptForLoad = false
    if (Guards.busyStart(loadStart, cpus.toInt)) {
      Thread.sleep(30000)
      sleptForLoad = true
      loadStart = os.getSystemLoadAverage
    }
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
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
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
    val retried = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = queries.map { case (name, fn) =>
      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val first = (1 to Iters).map(_ => timeOnce())
      val times =
        if (Guards.needsRetry(first)) {
          retried += name
          first ++ (1 to Iters).map(_ => timeOnce())
        } else first
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val (gcMs1, gcN1) = gcTotals()
    val loadEnd = os.getSystemLoadAverage
    val contaminated = Guards.contaminated(loadStart, loadEnd, cpus.toInt)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, -1.0) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val env = s""""env":{"cpus":$cpus,"available_processors":${os.getAvailableProcessors},""" +
      s""""load_avg_start":$loadStart,"load_avg_end":$loadEnd,""" +
      s""""slept_for_load":$sleptForLoad,""" +
      s""""retried":${retried.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""gc_ms":${gcMs1 - gcMs0},"gc_count":${gcN1 - gcN0}}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","contaminated":$contaminated,""" +
        s""""queries":$qs,"errors":$errors,"sf":"$sfDir",$env}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
