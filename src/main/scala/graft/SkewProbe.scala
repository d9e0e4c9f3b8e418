package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-input-spread probe (diagnostic main, like [[Scratch]]): runs
  * registry queries against a corpus and reports, per query, the
  * wall time and the max/median shuffle-read RECORDS per task — the
  * statistic that separates "correct at 10×" from "survives a hot
  * key at 100×". A hot-key pileup shows as max ≫ median (one task
  * owns the key); a skew-safe plan keeps the ratio bounded even on a
  * zipfian corpus (SCALING.md records the measurements against
  * tools/gen_skew.py's corpus).
  *
  * Usage: runMain graft.SkewProbe <sfDir> <query> [query...]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewProbe <sfDir> <query...>")
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // partition COALESCING off: at probe scale AQE folds small
      // exchanges into one task, which would masquerade as (or mask)
      // hot-key pileup — the probe measures KEY distribution, so
      // partition counts must stay fixed
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reads = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          reads.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // toRdd, not count(): a count() aggregate lets Catalyst prune
      // unused output columns and with them whole windows/projections
      // — the probe must execute the query's OWN physical plan
      fn(spark, sfDir).queryExecution.toRdd.count() // warmup, uncounted
      // the listener bus is async: drain it to a fixpoint BEFORE
      // clearing (late task-end events from the previous execution
      // would otherwise land after the clear and pollute this one)
      // and again AFTER each timed run before reading its metrics
      def settle(): Unit = {
        var last = -1; var size = reads.size
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (size != last && System.nanoTime() < deadline) {
          last = size; Thread.sleep(300); size = reads.size
        }
      }
      // min of 2 timed iterations (the Bench discipline): a single
      // sample bills JIT/GC noise from the previous query to this one.
      // Metrics are captured PER ITERATION (drain → clear → run →
      // drain → snapshot), so max/median reflect exactly one
      // execution, never a mix of two.
      import scala.jdk.CollectionConverters._
      def once(): (Long, Double, Seq[Long]) = {
        settle(); reads.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).queryExecution.toRdd.count()
        val w = (System.nanoTime() - t0) / 1e9
        settle()
        (n, w, reads.asScala.map(_.longValue).toSeq.sorted)
      }
      val (n, w1, xs1) = once()
      val (_, w2, xs2) = once()
      val wall = math.min(w1, w2)
      // report the steady-state (second) iteration's distribution
      val xs = if (xs2.nonEmpty) xs2 else xs1
      val (mx, med) =
        if (xs.isEmpty) (0L, 0L) else (xs.last, xs(xs.size / 2))
      val ratio = if (med > 0) mx.toDouble / med else Double.NaN
      println(f"""{"query":"$name","rows":$n,"wall_sec":$wall%.2f,""" +
        f""""tasks_with_shuffle_read":${xs.size},"max_read_records":$mx,""" +
        f""""median_read_records":$med,"max_over_median":$ratio%.1f}""")
    }
    spark.stop()
  }
}
