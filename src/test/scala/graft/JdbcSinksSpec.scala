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

  test("upsert existence probe is wildcard-safe: sibling tables don't mask absence") {
    // "wXupsert2" exists; probing "w_upsert2" must NOT match it via the
    // LIKE '_' wildcard — a false positive here is harmless (extra read),
    // but the symmetric bug (schema-qualified name never matching) sent
    // upsert into Overwrite and dropped rows, so pin both directions
    val sibling = Seq(("Oslo", "NO", 1L, 2.0)).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(sibling, url, "wXupsert2", "insert", keys, props, varchar)
    val base = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    // first upsert: "w_upsert2" does not exist (only wXupsert2 does), so
    // this must take the create path, not try to read a missing table
    Sinks.jdbc(base, url, "w_upsert2", "upsert", keys, props, varchar)
    assert(readBack("w_upsert2").count() == 1)
    // second upsert MUST see the now-existing table and merge, not overwrite
    val more = Seq(("Paris", "FR", 1L, 18.0)).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(more, url, "w_upsert2", "upsert", keys, props, varchar)
    assert(readBack("w_upsert2").count() == 2)
  }

  test("upsert existence probe resolves schema-qualified names") {
    // Derby default schema for unauthenticated connections is APP;
    // an existing APP.w_qual probed as "APP.w_qual" must be FOUND —
    // before the fix the qualified string was passed whole as the
    // table pattern, never matched, and the merge overwrote the table
    val base = Seq(("London", "GB", 1L, 15.5), ("Tokyo", "JP", 1L, 22.3))
      .toDF("city", "country", "ts", "temp")
    Sinks.jdbc(base, url, "w_qual", "insert", keys, props, varchar)
    val updates = Seq(("Paris", "FR", 1L, 18.0)).toDF("city", "country", "ts", "temp")
    Sinks.jdbc(updates, url, "APP.w_qual", "upsert", keys, props, varchar)
    // merge semantics: existing 2 rows survive + 1 new — an Overwrite
    // (the bug) would leave only 1
    assert(readBack("w_qual").count() == 3)
  }

  test("unknown strategy rejected") {
    val df = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    intercept[IllegalArgumentException] {
      Sinks.jdbc(df, url, "w_bogus", "merge-ish", keys, props, varchar)
    }
  }

  test("jdbcWriteBatched: executor-side prepared-statement batches round-trip") {
    // the machinery the PG-native ON CONFLICT path ([[Sinks.pgUpsertSql]],
    // PgDialectSpec) runs on: one prepared statement per partition,
    // rows streamed through addBatch/executeBatch. Derby exercises the
    // connection/bind/batch/commit protocol with a plain INSERT (it
    // has no ON CONFLICT); NULLs bind through schema-derived SQL types.
    val df = Seq(
      (1L, Some("London"), Some(15.5)),
      (2L, Some("Tokyo"), None),
      (3L, None, Some(18.0))
    ).toDF("id", "city", "temp").repartition(3)
    Sinks.jdbc(df.limit(0), url, "w_batched", "replace", keys = Nil, props,
      Some("city VARCHAR(64)"))
    // Spark's JDBC writer creates QUOTED (case-exact) column names —
    // unquoted id would case-fold to ID and miss
    Sinks.jdbcWriteBatched(df, url,
      """INSERT INTO w_batched ("id", "city", "temp") VALUES (?, ?, ?)""",
      props, batchSize = 2)
    val back = readBack("w_batched").collect()
    assert(back.length == 3)
    assert(back.count(_.isNullAt(1)) == 1, "NULL city must bind as NULL")
    assert(back.count(_.isNullAt(2)) == 1, "NULL temp must bind as NULL")
    assert(back.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("jdbcWriteBatched retry contract: an idempotent MERGE replayed twice leaves the table unchanged") {
    // the scaladoc's retry contract made executable: Spark re-runs a
    // partition whose task dies after commit, so the statement must be
    // an upsert. Derby's upsert dialect is MERGE; the batched writer
    // binds one ? per DataFrame column in order, so columns the
    // statement needs twice (key in ON + INSERT, value in UPDATE +
    // INSERT) are simply duplicated in the projection.
    val rows = Seq((1L, 15.5), (2L, 22.0), (3L, 18.0))
    val df = rows.toDF("id", "temp")
      .select($"id", $"temp", $"id".as("id2"), $"temp".as("temp2"))
      .repartition(2)
    Sinks.jdbc(rows.toDF("id", "temp").limit(0), url, "w_merge", "replace",
      keys = Nil, props, None)
    val merge =
      """MERGE INTO w_merge t USING SYSIBM.SYSDUMMY1 s
        |ON t."id" = CAST(? AS BIGINT)
        |WHEN MATCHED THEN UPDATE SET t."temp" = ?
        |WHEN NOT MATCHED THEN INSERT ("id", "temp") VALUES (?, ?)""".stripMargin
    Sinks.jdbcWriteBatched(df, url, merge, props, batchSize = 2)
    val first = readBack("w_merge").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(first == rows.toMap, s"initial merge must insert all rows: $first")
    // the simulated task retry: the whole write replays verbatim
    Sinks.jdbcWriteBatched(df, url, merge, props, batchSize = 2)
    val second = readBack("w_merge").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(second == rows.toMap && readBack("w_merge").count() == 3,
      "replaying the partition must be a no-op for keyed upsert DML")
  }

  test("registry JDBC queries drop their Derby tables (soak-safe)") {
    // each invocation creates a uniquely-named table in the shared
    // in-memory graftio database; without teardown a soak-looped bench
    // (warmup + timed passes per query) grows the DB without bound
    def graftioTables(): Int = {
      val conn = java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:graftio;create=true")
      try {
        val rs = conn.getMetaData.getTables(null, "APP", "%", Array("TABLE"))
        var n = 0
        while (rs.next()) n += 1
        n
      } finally conn.close()
    }
    val qs = SparkEntry.queries
    val before = graftioTables()
    (1 to 3).foreach { _ =>
      assert(qs("sink_jdbc_insert")(spark, sf).count() == 25)
      assert(qs("sink_jdbc_replace")(spark, sf).count() == 5)
    }
    assert(graftioTables() == before,
      "repeated registry invocations must not accumulate Derby tables")
  }
}
