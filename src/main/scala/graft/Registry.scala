package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark plan builder plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver runs
  * over the same parquet tables. Keeping both sides in one value keeps
  * `SparkEntry.queries` and `SparkEntry.oracleSql` in lockstep —
  * including identical output column names and ORDER BY, which the
  * hash compare requires.
  */
final case class Q(
    name: String,
    plan: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(plan: (SparkSession, String) => DataFrame): Q =
    Q(name, plan, Some(sql))
  def noOracle(name: String)(plan: (SparkSession, String) => DataFrame): Q =
    Q(name, plan, None)
}
