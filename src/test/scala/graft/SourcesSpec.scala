package graft

import java.nio.file.Files
import graft.io.Sources

/** JSON-parse source semantics (reference: src/ingest.py:152-169,
  * fixture: tests/conftest.py:122-145).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val apiJson =
    """{"coord":{"lon":-0.1278,"lat":51.5074},
      |"weather":[{"id":803,"main":"Clouds","description":"broken clouds","icon":"04d"}],
      |"main":{"temp":15.5,"feels_like":14.2,"temp_min":13.0,"temp_max":17.0,
      |        "pressure":1013,"humidity":65},
      |"visibility":10000,
      |"wind":{"speed":3.2,"deg":180},
      |"clouds":{"all":40},
      |"dt":1699358400,
      |"sys":{"country":"GB","sunrise":1699340000,"sunset":1699373000},
      |"name":"London"}""".stripMargin.replaceAll("\n", "")

  private val noWindJson = apiJson
    .replace(""""wind":{"speed":3.2,"deg":180},""", "")
    .replace(""""visibility":10000,""", "")

  test("nested API JSON flattens to the 14-column weather schema") {
    val raw = Seq(apiJson).toDF("json")
    val row = Sources.parseWeatherJson(raw, "json").first()
    assert(row.getAs[String]("city") == "London")
    assert(row.getAs[String]("country") == "GB")
    assert(row.getAs[Double]("temperature") == 15.5)
    assert(row.getAs[String]("description") == "broken clouds") // weather[0]
    assert(row.getAs[Double]("visibility") == 10.0)             // m → km
    assert(row.getAs[Int]("wind_direction") == 180)
    assert(row.getAs[java.sql.Timestamp]("timestamp").toInstant.getEpochSecond == 1699358400L)
  }

  test("missing wind/visibility default to 0 (reference .get defaults)") {
    val raw = Seq(noWindJson).toDF("json")
    val row = Sources.parseWeatherJson(raw, "json").first()
    assert(row.getAs[Double]("wind_speed") == 0.0)
    assert(row.getAs[Int]("wind_direction") == 0)
    assert(row.getAs[Double]("visibility") == 0.0)
  }

  test("cities config falls back to the 10-city default on missing file") {
    val cities = Sources.citiesConfig(spark, "/nonexistent/cities.json")
    assert(cities.count() == 10)
    assert(cities.filter($"city" === "London").count() == 1)
  }

  test("corpus events reader normalizes ts to TIMESTAMP whatever the unit") {
    val e = Sources.table(spark, sf, "events")
    assert(e.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(e.selectExpr("max(ts)").first().getTimestamp(0) != null)
  }

  test("batch and streaming events readers agree across µs and ns units") {
    // the same instants stored two ways: TIMESTAMP(MICROS, NTZ) — the
    // current corpus — and nanos-as-int64, which is how Spark surfaces
    // a TIMESTAMP(NANOS) footer under nanosAsLong; both must normalize
    // to identical TIMESTAMP values through Sources.table AND
    // Sources.eventsStream, so a corpus regeneration that flips the
    // unit is a no-op for every query downstream
    import org.apache.spark.sql.functions._
    val microsOfT0 = 1699358400000000L // 2023-11-07T12:00:00 UTC
    val rows = (0L until 5L).map(i =>
      (i, microsOfT0 + i * 61000000L, i % 2, s"e$i", i * 1.5, "{}"))
    val base = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")

    def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
      // a single FILE named events.parquet, like the corpus layout
      val root = Files.createTempDirectory("graft_units").toString
      val stage = s"$root/stage"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.startsWith("part-")).get
      assert(part.renameTo(new java.io.File(s"$root/events.parquet")))
      root
    }
    val usDir = writeEvents(base.withColumn("ts",
        timestamp_micros(col("us")).cast("timestamp_ntz")).drop("us"))
    val nsDir = writeEvents(base.withColumn("ts", col("us") * 1000L).drop("us"))

    def batchVals(dir: String) =
      Sources.table(spark, dir, "events").select("event_id", "ts")
        .orderBy("event_id").collect().toSeq
    assert(batchVals(usDir) == batchVals(nsDir))

    def streamVals(dir: String) = {
      val s = Sources.eventsStream(spark, dir)
      assert(s.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      val name = s"units_${dir.replaceAll("[^a-zA-Z0-9]", "")}"
      val q = s.select("event_id", "ts").writeStream.format("memory")
        .queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).orderBy("event_id").collect().toSeq
    }
    assert(streamVals(usDir) == streamVals(nsDir))
    assert(streamVals(usDir) == batchVals(usDir))
  }
}
