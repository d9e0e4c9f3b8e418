package graft.queries

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.Q

/** Structured Streaming, oracle-verified: the query fn runs a REAL
  * streaming query over the corpus (file source → windowed aggregate →
  * memory sink, Trigger.AvailableNow) and returns its final result,
  * which the driver's DuckDB compare then checks against batch SQL.
  * This is the daily-micro-batch cadence of the reference pipeline
  * (SURVEY §2.6) executed through the streaming engine, not a batch
  * stand-in.
  */
object StreamingQueries {

  private val runId = new AtomicLong(0)

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val all: Seq[Q] = Seq(
    Q("stream_windowed_counts",
      """SELECT date_trunc('day', ts) AS ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      // streaming file sources need a declared schema; the corpus
      // events.ts is TIMESTAMP(NANOS) → long + explicit µs conversion
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val stream = s.readStream.schema(eventsSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val agg = stream
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      val name = s"graft_stream_out_${runId.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
        .select(col("window.start").as("ws"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("ws", "event_type")
    })
}
