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
}
