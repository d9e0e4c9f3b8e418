package graft

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

  test("corpus events reader converts nanos to a usable timestamp") {
    val e = Sources.table(spark, sf, "events")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.selectExpr("max(ts)").first().getTimestamp(0) != null)
  }
}
