package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted-vs-unsalted WALL evidence on the hostile corpus (VERDICT
  * r15 #2/#4): [[SkewProbe]] pins per-task record spread for
  * registered queries; this probe times the PAIRS — each skew-safe
  * operator against the naive form it replaces, plus Spark's own AQE
  * skew-join handling — on the zipfian corpus, so "salting wins at
  * scale" carries measured wall + peak-task numbers instead of spread
  * ratios alone. Three pairs:
  *
  *   - `agg`: plain groupBy(event_type) vs [[graft.ops.Skew.saltedCountSum]]
  *     (85% of rows in one key);
  *   - `join`: events ⋈ per-type dim with broadcast DISABLED (the
  *     regime salting exists for: a dim too big to broadcast — at
  *     probe scale the dim would broadcast, which is itself the
  *     note: broadcasting IS the first defense), run six ways —
  *     plain sort-merge with AQE skew handling OFF; AQE skew-join ON
  *     at probe-scale thresholds over the PURE join; the same conf
  *     with a same-key aggregate downstream (the pitfall: the agg
  *     reuses the join's partitioning, so OptimizeSkewedJoin declines
  *     the split rather than add a shuffle); the downstream-agg form
  *     with `forceOptimizeSkewedJoin`; [[graft.ops.Skew.saltedJoin]];
  *     and [[graft.ops.Skew.saltedJoinSkewed]] (hot-only replication);
  *   - `asof`: [[graft.ops.AsOf.joinAsOf]] vs [[graft.ops.AsOf.joinAsOfSalted]]
  *     on the hot event_type key (5 keys bound the unsalted
  *     parallelism; one holds 85% of the timeline).
  *
  * Methodology = SkewProbe's: min of 2 full-plan executions
  * (`toRdd.count()`), AQE partition coalescing off so task counts
  * reflect key distribution, metrics drained to a fixpoint per
  * iteration; rows are printed so the paired forms can be
  * equality-eyeballed (their exact equality is pinned in
  * OpsSpec/AsOfSpec).
  *
  * Usage: runMain graft.SkewPairs <sfDir>
  */
object SkewPairs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: SkewPairs <sfDir>")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val reads = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          reads.add(m.shuffleReadMetrics.recordsRead)
      }
    })
    def settle(): Unit = {
      var last = -1; var size = reads.size
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (size != last && System.nanoTime() < deadline) {
        last = size; Thread.sleep(300); size = reads.size
      }
    }
    import scala.jdk.CollectionConverters._
    def measure(name: String)(mk: => DataFrame): Unit = {
      mk.queryExecution.toRdd.count() // warmup
      def once(): (Long, Double, Seq[Long]) = {
        settle(); reads.clear()
        val t0 = System.nanoTime()
        val n = mk.queryExecution.toRdd.count()
        val w = (System.nanoTime() - t0) / 1e9
        settle()
        (n, w, reads.asScala.map(_.longValue).toSeq.sorted)
      }
      val (n, w1, xs1) = once()
      val (_, w2, xs2) = once()
      val wall = math.min(w1, w2)
      val xs = if (xs2.nonEmpty) xs2 else xs1
      val (mx, med) = if (xs.isEmpty) (0L, 0L) else (xs.last, xs(xs.size / 2))
      println(f"""{"case":"$name","rows":$n,"wall_sec":$wall%.3f,""" +
        f""""tasks":${xs.size},"max_read_records":$mx,""" +
        f""""median_read_records":$med}""")
    }
    def setConf(kv: (String, String)*): Unit =
      kv.foreach { case (k, v) => spark.conf.set(k, v) }

    val events = graft.io.Sources.table(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(cpus.toInt) // full-width scan parallelism regardless of file layout
      .localCheckpoint() // isolate the probe from scan cost

    // ---- pair 1: hot-key aggregation --------------------------------
    measure("agg_unsalted") {
      events.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.Parity.dsum(col("value")).as("sum_value"))
    }
    measure("agg_salted") {
      graft.ops.Skew.saltedCountSum(events, Seq("event_type"), "value")
    }

    // ---- pair 2: hot-key join (broadcast disabled — the dim-too-big
    // regime; AQE advisory sizes lowered so probe-scale bytes are
    // visible to the skew splitter). The measured plan is the PURE
    // join (project, no same-key agg downstream): a groupBy on the
    // join key reuses the join's partitioning, and OptimizeSkewedJoin
    // declines to split rather than insert an extra shuffle — that
    // pitfall is kept as its own case below. ------------------------
    val dim = events.groupBy("event_type")
      .agg(count(lit(1)).as("type_n")).localCheckpoint()
    def joined(d: DataFrame): DataFrame =
      events.join(d, Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          col("type_n"), col("value"))
    def aggAfter(d: DataFrame): DataFrame =
      events.join(d, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max(col("type_n")).as("type_n"),
          graft.functions.Parity.dsum(col("value")).as("sum_value"))
    val noBcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    setConf(noBcast: _*)
    setConf("spark.sql.adaptive.skewJoin.enabled" -> "false")
    measure("join_smj_skewjoin_off")(joined(dim))
    // probe-scale thresholds: the hot partition is ~MBs here, not the
    // production 256 MB default — factor/threshold/advisory scaled so
    // AQE sees the same relative skew a 100 TB shuffle would show
    setConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m")
    measure("join_smj_aqe_skewjoin")(joined(dim))
    // the pitfall case: identical conf, but a same-key aggregate
    // consumes the join — AQE refuses the split (it would add a
    // shuffle), so the hot key is back on one reducer unless forced
    measure("join_smj_aqe_downstream_agg")(aggAfter(dim))
    setConf("spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    measure("join_smj_aqe_forced_downstream_agg")(aggAfter(dim))
    setConf("spark.sql.adaptive.forceOptimizeSkewedJoin" -> "false")
    measure("join_salted")(
      graft.ops.Skew.saltedJoin(events, dim, Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          col("type_n"), col("value")))
    // the downstream-agg shape AGAIN, salted: the salted join's
    // output is partitioned by (key, salt), so the same-key agg
    // partial-aggregates per salt slice and merges 5 rows — the split
    // AQE refused comes for free from the rewrite
    measure("join_salted_downstream_agg")(
      graft.ops.Skew.saltedJoin(events, dim, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max(col("type_n")).as("type_n"),
          graft.functions.Parity.dsum(col("value")).as("sum_value")))
    measure("join_salted_skewaware")(
      graft.ops.Skew.saltedJoinSkewed(events, dim, Seq("event_type"),
          hotThreshold = 1000000L)
        .select(col("event_id"), col("event_type"),
          col("type_n"), col("value")))
    // restore defaults for the as-of pair (its window exchange is the
    // object of measurement, not join strategy)
    setConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
      "spark.sql.autoBroadcastJoinThreshold" -> "10m",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    // ---- pair 3: hot-key as-of join ---------------------------------
    val left = events.select(col("event_id"), col("event_type"), col("ts"))
    val rates = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rt"))
      .agg(graft.functions.Parity.davg(col("value")).as("rate"))
      .localCheckpoint()
    measure("asof_unsalted") {
      graft.ops.AsOf.joinAsOf(left, rates, Seq("event_type"), "ts", "rt", "rate")
    }
    measure("asof_salted") {
      graft.ops.AsOf.joinAsOfSalted(left, rates, Seq("event_type"), "ts", "rt",
        "rate", buckets = 16)
    }
    spark.stop()
  }
}
