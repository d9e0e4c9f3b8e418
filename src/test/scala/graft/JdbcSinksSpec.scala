package graft

import java.util.Properties
import graft.io.Sinks

/** JDBC load-strategy round trips against embedded Derby — mirrors the
  * reference's PostgreSQL strategy tests
  * (reference: tests/test_load.py:262-346).
  */
class JdbcSinksSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  private val keys = Seq("city", "country", "ts")
  private val varchar = Some("city VARCHAR(128), country VARCHAR(8)")

  private def readBack(table: String) =
    spark.read.jdbc(url, table, props)

  test("insert appends batches transactionally") {
    val df = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(df, url, "w_insert", "insert", keys, props, varchar)
    Sinks.jdbc(df, url, "w_insert", "insert", keys, props, varchar)
    assert(readBack("w_insert").count() == 2)
  }

  test("replace drops and rewrites the table") {
    val df1 = Seq(("London", "GB", 1L, 15.5), ("Tokyo", "JP", 1L, 22.0))
      .toDF("city", "country", "ts", "temp")
    Sinks.jdbc(df1, url, "w_replace", "insert", keys, props, varchar)
    val df2 = Seq(("Paris", "FR", 2L, 18.0)).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(df2, url, "w_replace", "replace", keys, props, varchar)
    val back = readBack("w_replace").collect()
    assert(back.length == 1)
    assert(back(0).getAs[String]("city") == "Paris")
  }

  test("upsert updates matched keys, inserts new, keeps untouched") {
    val base = Seq(
      ("London", "GB", 1L, 15.5), ("Tokyo", "JP", 1L, 22.3)
    ).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(base, url, "w_upsert", "upsert", keys, props, varchar) // creates
    val updates = Seq(
      ("London", "GB", 1L, 14.0), // matched → update
      ("Paris", "FR", 1L, 18.0)   // new key → insert
    ).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(updates, url, "w_upsert", "upsert", keys, props, varchar)
    val back = readBack("w_upsert")
    assert(back.count() == 3)
    assert(back.filter($"city" === "London").select("temp").as[Double].head() == 14.0)
    assert(back.filter($"city" === "Tokyo").select("temp").as[Double].head() == 22.3)

    // idempotency (reference: tests/test_integration.py:150-210)
    Sinks.jdbc(updates, url, "w_upsert", "upsert", keys, props, varchar)
    assert(readBack("w_upsert").count() == 3)
  }

  test("values round-trip with full fidelity (timestamps, doubles)") {
    val t = java.sql.Timestamp.valueOf("2023-11-07 12:34:56.789")
    val df = Seq(("Berlin", "DE", t, -3.25)).toDF("city", "country", "tstamp", "temp")
    Sinks.jdbc(df, url, "w_types", "replace", Seq("city"), props, varchar)
    val r = readBack("w_types").collect()(0)
    assert(r.getAs[java.sql.Timestamp]("tstamp") == t)
    assert(r.getAs[Double]("temp") == -3.25)
  }

  test("unknown strategy rejected") {
    val df = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    intercept[IllegalArgumentException] {
      Sinks.jdbc(df, url, "w_bogus", "merge-ish", keys, props, varchar)
    }
  }
}
