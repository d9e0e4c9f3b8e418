package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Quality metrics + gate.
  *
  * agg_quality_metrics (reference: src/transform.py:301-315) and the
  * Airflow threshold gate (reference: airflow_dag/weather_etl_dag.py:349-389).
  */
object Quality {

  /** One-row global aggregate over the transformed batch. Spark plans
    * the two distinct counts with a single expand — one pass, no
    * per-column jobs (the reference computes each metric eagerly).
    */
  def qualityMetrics(df: DataFrame, inputCount: Long): DataFrame = {
    val nullCols = df.columns.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L))).reduce(_ + _)
    df.agg(
      count(lit(1)).as("records_after_cleaning"),
      avg(col("quality_score")).as("avg_quality_score"),
      countDistinct(col("city")).as("cities_count"),
      countDistinct(col("country")).as("countries_count"),
      min(col("timestamp")).as("date_range_start"),
      max(col("timestamp")).as("date_range_end"),
      nullCols.as("total_nulls"))
      .withColumn("total_records_processed", lit(inputCount))
      .withColumn("data_retention_rate",
        when(lit(inputCount) > 0,
          col("records_after_cleaning") / lit(inputCount.toDouble)).otherwise(0.0))
  }

  final case class Thresholds(
      minRetention: Double = 0.8, minAvgQuality: Double = 70.0,
      minRecords: Long = 5)

  /** Per-run quality-report artifact (reference:
    * airflow_dag/weather_etl_dag.py:301-346): the ingestion,
    * transformation (a [[qualityMetrics]] row), and loading metrics
    * composed into one JSON document at
    * `<outDir>/report_<yyyyMMdd_HHmmss>.json` with the run date and
    * overall status. Driver-side by design — the report is one small
    * document ABOUT the run, not data; the distributed work happened
    * upstream in the metrics aggregate. Returns the written path.
    */
  def report(outDir: String,
             ingestion: Seq[(String, Any)],
             transformation: Row,
             loading: Seq[(String, Any)],
             runTime: java.time.ZonedDateTime,
             overallStatus: String = "SUCCESS"): java.nio.file.Path = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jval(v: Any): String = v match {
      case null                => "null"
      case None                => "null"
      case Some(x)             => jval(x)
      case b: Boolean          => b.toString
      case n: Byte             => n.toString
      case n: Short            => n.toString
      case n: Int              => n.toString
      case n: Long             => n.toString
      case n: Float            => n.toString
      case n: Double           => n.toString
      case n: java.math.BigDecimal => n.toPlainString
      case r: Row              => jobj(r.schema.fieldNames.toSeq.zip(r.toSeq))
      case m: Seq[_]           => m.map(jval).mkString("[", ",", "]")
      case other               => jstr(other.toString) // strings, timestamps
    }
    def jobj(fields: Seq[(String, Any)]): String =
      fields.map { case (k, v) => jstr(k) + ": " + jval(v) }
        .mkString("{", ", ", "}")
    val rendered =
      "{" + jstr("pipeline_run_date") + ": " +
        jstr(runTime.toOffsetDateTime.toString) +
        ", " + jstr("ingestion") + ": " + jobj(ingestion) +
        ", " + jstr("transformation") + ": " + jval(transformation) +
        ", " + jstr("loading") + ": " + jobj(loading) +
        ", " + jstr("overall_status") + ": " + jstr(overallStatus) + "}"
    val stamp = runTime.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    val path = dir.resolve(s"report_$stamp.json")
    java.nio.file.Files.writeString(path, rendered + "\n")
    path
  }

  /** Quality gate — throws when a threshold is violated, the Spark
    * analogue of failing the DAG run
    * (reference: airflow_dag/weather_etl_dag.py:360-386).
    */
  def gate(metrics: Row, t: Thresholds = Thresholds()): Unit = {
    val retention = metrics.getAs[Double]("data_retention_rate")
    val avgQ = metrics.getAs[Double]("avg_quality_score")
    val n = metrics.getAs[Long]("records_after_cleaning")
    val failures = Seq(
      (retention < t.minRetention) -> f"retention $retention%.3f < ${t.minRetention}",
      (avgQ < t.minAvgQuality) -> f"avg quality $avgQ%.1f < ${t.minAvgQuality}",
      (n < t.minRecords) -> s"records $n < ${t.minRecords}"
    ).collect { case (true, msg) => msg }
    if (failures.nonEmpty)
      throw new IllegalStateException("quality gate failed: " + failures.mkString("; "))
  }
}
