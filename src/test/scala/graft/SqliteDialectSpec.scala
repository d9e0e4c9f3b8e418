package graft

import graft.io.Sinks

/** The SQLite dialect path — the reference's fallback deployment
  * target (reference: src/load.py:441-486, `_load_upsert_sqlite`
  * drives a per-row REPLACE INTO through SQLAlchemy).
  *
  * Same two layers as PgDialectSpec:
  *  1. the generated REPLACE INTO statement is pinned TEXTUALLY
  *     against the reference's statement (same table, same 26-column
  *     list in the same order, positional params instead of
  *     SQLAlchemy's named params);
  *  2. the statement is EXECUTED against a real SQLite database via
  *     the sqlite3 CLI — a literal-substituted pair of conflicting
  *     rows proves REPLACE's delete-then-insert conflict semantics on
  *     the real dialect (row count stays 1, non-key columns take the
  *     second row's values). The Spark JDBC round trip itself stays
  *     on Derby (JdbcSinksSpec): no SQLite JDBC driver ships in the
  *     zero-egress sandbox, so rows are driven through the CLI; the
  *     SQL under test is byte-identical to what
  *     [[Sinks.jdbcWriteBatched]] would prepare.
  *
  * The execution test self-cancels (not fails) where the sqlite3
  * binary is unavailable.
  */
class SqliteDialectSpec extends org.scalatest.funsuite.AnyFunSuite {

  // the reference's column list, verbatim order (src/load.py:453-459)
  private val cols = Seq(
    "city", "country", "timestamp", "date", "hour", "day_of_week",
    "month", "season", "temperature", "feels_like", "humidity",
    "pressure", "description", "wind_speed", "wind_direction",
    "cloudiness", "visibility", "lat", "lon", "temp_category",
    "humidity_category", "wind_category", "comfort_index", "location",
    "coord_string", "quality_score")

  test("generated REPLACE INTO text matches the reference statement") {
    val got = Sinks.sqliteUpsertSql("weather_data", cols)
    val expected =
      "REPLACE INTO weather_data (" + cols.mkString(", ") + ") " +
        "VALUES (" + cols.map(_ => "?").mkString(", ") + ")"
    assert(got == expected)
  }

  test("generator rejects malformed statements") {
    intercept[IllegalArgumentException](Sinks.sqliteUpsertSql("t", Nil))
    intercept[IllegalArgumentException](
      Sinks.sqliteUpsertSql("t", Seq("a", "b", "a")))
  }

  // ---- real-dialect execution -----------------------------------------

  private def sqliteBin: Option[String] =
    (sys.env.get("PATH").toSeq.flatMap(_.split(":")).map(_ + "/sqlite3") ++
      Seq("/usr/bin/sqlite3", "/usr/local/bin/sqlite3"))
      .find(p => new java.io.File(p).canExecute)

  private def sh(cmd: Seq[String]): (Int, String) = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val src = scala.io.Source.fromInputStream(p.getInputStream)
    val out = try src.mkString finally src.close()
    (p.waitFor(), out)
  }

  test("the generated REPLACE executes on a real SQLite: insert then conflict-replace") {
    val bin = sqliteBin
    assume(bin.isDefined, "sqlite3 binary unavailable — dialect execution skipped")
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite")
    val db = dir.resolve("weather.db").toString
    // the reference's schema shape: UNIQUE on (city, country, timestamp)
    // is what REPLACE keys on (schema.sql's weather_data unique key)
    val ddl = "CREATE TABLE weather_data (" + cols.map {
      case c @ ("timestamp" | "date") => s"$c TEXT"
      case c @ ("hour" | "day_of_week" | "month" | "humidity" |
                "pressure" | "cloudiness" | "visibility" |
                "wind_direction") => s"$c INTEGER"
      case c @ ("city" | "country" | "season" | "description" |
                "temp_category" | "humidity_category" | "wind_category" |
                "location" | "coord_string") => s"$c TEXT"
      case c => s"$c REAL"
    }.mkString(", ") + ", UNIQUE (city, country, timestamp))"
    def vals(temp: Double, desc: String): String = cols.map {
      case "city" => "'Berlin'"
      case "country" => "'DE'"
      case "timestamp" => "'2024-01-01 12:00:00'"
      case "date" => "'2024-01-01'"
      case "season" => "'Winter'"
      case "description" => s"'$desc'"
      case "temp_category" => "'Cold'"
      case "humidity_category" => "'Normal'"
      case "wind_category" => "'Calm'"
      case "location" => "'Berlin, DE'"
      case "coord_string" => "'52.52,13.40'"
      case "temperature" => temp.toString
      case "hour" | "day_of_week" | "month" | "humidity" | "pressure" |
           "cloudiness" | "visibility" | "wind_direction" => "7"
      case _ => "1.5"
    }.mkString(", ")
    // the generated statement with literals substituted for the ?s —
    // text otherwise byte-identical to what the JDBC path prepares
    val stmt = Sinks.sqliteUpsertSql("weather_data", cols)
    def substituted(temp: Double, desc: String): String =
      stmt.replace("VALUES (" + cols.map(_ => "?").mkString(", ") + ")",
        "VALUES (" + vals(temp, desc) + ")")
    val script =
      ddl + ";\n" +
        substituted(1.0, "first") + ";\n" +
        substituted(9.0, "second") + ";\n" +
        "SELECT count(*) || '|' || temperature || '|' || description " +
        "FROM weather_data;\n"
    val f = dir.resolve("run.sql")
    java.nio.file.Files.writeString(f, script)
    val (rc, out) = sh(Seq(bin.get, db, s".read $f"))
    assert(rc == 0, s"sqlite3 run failed: $out")
    assert(out.trim == "1|9.0|second",
      s"REPLACE must keep one row with the second row's values, got: '$out'")
  }
}
