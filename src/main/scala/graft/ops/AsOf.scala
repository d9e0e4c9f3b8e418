package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark lacks as
  * a primitive, composed from built-ins via the distributed
  * union-merge pattern rather than a range join:
  *
  *   union(right tagged 0, left tagged 1)
  *     → window per key ordered by (time, tag)
  *     → running last_value(ignoreNulls) carries the right row forward
  *     → keep left rows.
  *
  * One shuffle on the key, a sort within key partitions, no quadratic
  * (left × right-history) pair blowup — the shape that survives a
  * range-join at 100 TB. [[joinAsOf]]'s parallelism is bounded by key
  * cardinality; [[joinAsOfSalted]] is the skew-mitigated twin for
  * low-cardinality hot keys — it splits each key's timeline into
  * time-range buckets, runs the carry per (key, bucket), and stitches
  * the bucket boundaries with a carry-in relation bounded by
  * |keys| × buckets, so the result is byte-identical while the hot
  * key's volume spreads over `buckets` tasks.
  */
object AsOf {

  /** Attach to each left row the latest right value with
    * rightTime <= leftTime within the same key. Right rows must be
    * unique per (keys, rightTime); ties at equal time take the right
    * row (inclusive <=).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCol: String): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__src", lit(0))
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select((lCols :+ valueCol).toIndexedSeq.map(col): _*)
  }

  /** Skew-mitigated [[joinAsOf]] — same contract, same result, but the
    * per-key running carry is computed per (key, time-bucket) so one
    * hot key's history no longer serializes onto a single task:
    *
    *   1. bucket boundaries are sampled from the union's own time
    *      distribution (approxQuantile — driver-side, `buckets`-bounded;
    *      boundaries affect only PHYSICAL spread, never the answer, so
    *      their approximation error is irrelevant);
    *   2. the within-bucket carry is [[joinAsOf]]'s window, partitioned
    *      by (keys, bucket) — the hot key now spans `buckets` tasks;
    *   3. a left row whose bucket holds no earlier right row takes the
    *      CARRY-IN: the latest non-null right value from any earlier
    *      bucket of its key — computed as one map-side-combined
    *      aggregate (latest right value per key×bucket) windowed over
    *      the bucket axis (≤ |keys| × buckets rows) and joined back
    *      with a bounded broadcast.
    *
    * Equal times always land in one bucket (boundary comparison is
    * strict), so the inclusive `rightTime <= leftTime` tie semantics
    * are preserved exactly; with `buckets = 1` — or a constant time
    * column — this degenerates to [[joinAsOf]] itself. Time columns
    * must cast to timestamp (dates do). The one data-sized shuffle is
    * the window exchange, same as the unsalted form.
    */
  def joinAsOfSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     valueCol: String, buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val lCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__src", lit(0))
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)
    val u = l.unionByName(rAligned)
      .withColumn("__tus",
        unix_micros(col("__t").cast("timestamp")).cast("double"))
    // boundaries strictly between min and max; duplicates collapse so
    // a heavily-tied distribution just yields fewer (still correct)
    // buckets. Micros-as-double is exact to 2^53 — and boundary
    // placement only moves work between tasks anyway.
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else u.stat.approxQuantile("__tus", probs, 0.001).distinct.sorted
    // bucket = #boundaries strictly below t: equal times share a bucket,
    // so an equal-time right row can never land AFTER its left row
    val bCol = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__tus") > lit(b), 1).otherwise(0)
    }
    val bucketed = u.withColumn("__b", bCol).drop("__tus")
    val wIn = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = bucketed
      .withColumn("__c", last(col(valueCol), ignoreNulls = true).over(wIn))
    // latest NON-NULL right value per (key, bucket) — non-null so the
    // cross-bucket carry skips null-valued right rows exactly the way
    // last(ignoreNulls) does inside a bucket. The ordering key is
    // (isNotNull, __t), NOT bare __t: a right row with a NULL time
    // sorts FIRST in the unsalted window (asc = nulls first) and its
    // value carries to every later row — a bare max_by(__t) would
    // IGNORE that row (null ordering keys are skipped), so its value
    // would never relay across bucket boundaries and left rows in
    // later buckets would diverge from joinAsOf. The struct makes it
    // the MINIMUM instead: it wins max_by only when it is the bucket's
    // only right row, exactly matching last(ignoreNulls) under
    // nulls-first order.
    val bucketLast = bucketed
      .filter(col("__src") === 0 && col(valueCol).isNotNull)
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(max_by(col(valueCol),
        struct(col("__t").isNotNull.as("nn"), col("__t").as("t"))).as("__bl"))
    // every (key, bucket) the union touches — buckets without right
    // rows must still RELAY the carry from earlier buckets
    val grid = bucketed.select((keys :+ "__b").map(col): _*).distinct()
    val wAcross = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = grid.join(bucketLast, keys :+ "__b", "left")
      .withColumn("__cin", last(col("__bl"), ignoreNulls = true).over(wAcross))
      .select((keys :+ "__b").map(col) :+ col("__cin"): _*)
    carried.filter(col("__src") === 1)
      .join(Dedup.boundedBroadcast(carryIn), keys :+ "__b", "left")
      .withColumn(valueCol, coalesce(col("__c"), col("__cin")))
      .select((lCols :+ valueCol).toIndexedSeq.map(col): _*)
  }

  /** Nearest-in-time as-of join (pandas merge_asof
    * direction='nearest'): each left row gets the right value whose
    * time is CLOSEST — before or after — within the same key,
    * optionally bounded by `toleranceSeconds`. Same union-merge
    * shape as [[joinAsOf]], run in BOTH directions over one union
    * (two per-key sorts, still one shuffle, never a left × history
    * pair blowup): the backward carry is last(right struct) under
    * ascending time, the forward carry the same under descending
    * time (right rows ordered before left rows at equal time, so
    * both directions are at-or-inclusive); the nearer candidate
    * wins, with an exact tie taken BACKWARD (deterministic, and the
    * convention that an equally-near earlier observation is the one
    * already known at left time). Right rows must be unique per
    * (keys, rightTime).
    */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      valueCol: String,
                      toleranceSeconds: Option[Long] = None): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rt",
            right.schema(rightTime).dataType),
          org.apache.spark.sql.types.StructField("v",
            right.schema(valueCol).dataType)))))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__src", lit(0))
      .withColumn("__r", struct(col(rightTime).as("rt"), col(valueCol).as("v")))
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // exact microsecond arithmetic: a double-seconds comparison has
    // ~4e-7 s epsilon at epoch magnitudes, enough to flip a
    // near-tie's direction; unix_micros is TZ-safe (instant-based)
    val dBack = unix_micros(col("__t").cast("timestamp")) -
      unix_micros(col("__b.rt").cast("timestamp"))
    val dFwd = unix_micros(col("__f.rt").cast("timestamp")) -
      unix_micros(col("__t").cast("timestamp"))
    val within = (d: Column) => toleranceSeconds
      .map(tol => d <= lit(tol * 1000000L)).getOrElse(lit(true))
    val chosen =
      when(col("__b").isNotNull && within(dBack) &&
          (col("__f").isNull || !within(dFwd) || dBack <= dFwd), col("__b.v"))
        .when(col("__f").isNotNull && within(dFwd), col("__f.v"))
    l.unionByName(rAligned)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wBack))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(wFwd))
      .filter(col("__src") === 1)
      .withColumn(valueCol, chosen)
      .select((lCols :+ valueCol).toIndexedSeq.map(col): _*)
  }
}
