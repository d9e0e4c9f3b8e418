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
  * range-join at 100 TB. Parallelism is bounded by key cardinality;
  * salt the key upstream if it is low and hot.
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
