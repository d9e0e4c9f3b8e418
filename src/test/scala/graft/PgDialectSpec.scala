package graft

import graft.io.Sinks

/** The PostgreSQL dialect path — the reference's PRIMARY deployment
  * target (reference: src/load.py:110-179 builds a PG engine;
  * :403-427 is its per-row ON CONFLICT upsert).
  *
  * Two layers, matching what the sandbox allows:
  *  1. the generated ON CONFLICT statement is pinned TEXTUALLY against
  *     the reference's statement (same columns, same conflict key,
  *     same DO UPDATE set, positional params instead of SQLAlchemy's
  *     named params);
  *  2. the statement is EXECUTED against an embedded PostgreSQL 15
  *     server (initdb + pg_ctl on a unix socket, run as an
  *     unprivileged user) — PREPARE proves the server parses/plans the
  *     full 26-column text as-is, and a literal-substituted pair of
  *     conflicting rows proves insert-then-update semantics on the
  *     real dialect. The Spark JDBC round trip itself stays on Derby
  *     (JdbcSinksSpec): no PG JDBC driver ships in the zero-egress
  *     sandbox, so rows are driven through psql; the SQL under test is
  *     byte-identical to what [[Sinks.jdbcWriteBatched]] would
  *     prepare.
  *
  * The embedded-server test self-cancels (not fails) where the
  * PostgreSQL binaries are unavailable or the server cannot start.
  */
class PgDialectSpec extends org.scalatest.funsuite.AnyFunSuite {

  // the reference's column lists, verbatim order (src/load.py:389-400)
  private val cols = Seq(
    "city", "country", "timestamp", "date", "hour", "day_of_week",
    "month", "season", "temperature", "feels_like", "humidity",
    "pressure", "description", "wind_speed", "wind_direction",
    "cloudiness", "visibility", "lat", "lon", "temp_category",
    "humidity_category", "wind_category", "comfort_index", "location",
    "coord_string", "quality_score")
  private val keys = Seq("city", "country", "timestamp")
  // the reference's DO UPDATE set (src/load.py:403-414)
  private val updates = Seq(
    "temperature", "feels_like", "humidity", "pressure", "description",
    "wind_speed", "wind_direction", "cloudiness", "visibility",
    "quality_score")

  test("generated ON CONFLICT text matches the reference statement") {
    val got = Sinks.pgUpsertSql("weather_data", cols, keys, updates)
    val expected =
      "INSERT INTO weather_data (" + cols.mkString(", ") + ") " +
        "VALUES (" + cols.map(_ => "?").mkString(", ") + ") " +
        "ON CONFLICT (city, country, timestamp) DO UPDATE SET " +
        "temperature = EXCLUDED.temperature, " +
        "feels_like = EXCLUDED.feels_like, " +
        "humidity = EXCLUDED.humidity, " +
        "pressure = EXCLUDED.pressure, " +
        "description = EXCLUDED.description, " +
        "wind_speed = EXCLUDED.wind_speed, " +
        "wind_direction = EXCLUDED.wind_direction, " +
        "cloudiness = EXCLUDED.cloudiness, " +
        "visibility = EXCLUDED.visibility, " +
        "quality_score = EXCLUDED.quality_score"
    assert(got == expected)
  }

  test("generator rejects malformed statements") {
    intercept[IllegalArgumentException](
      Sinks.pgUpsertSql("t", Seq("a", "b"), Nil, Seq("b")))
    intercept[IllegalArgumentException](
      Sinks.pgUpsertSql("t", Seq("a", "b"), Seq("missing"), Seq("b")))
    intercept[IllegalArgumentException](
      Sinks.pgUpsertSql("t", Seq("a", "b"), Seq("a"), Seq("zzz")))
    intercept[IllegalArgumentException](
      Sinks.pgUpsertSql("t", Seq("a", "b"), Seq("a"), Seq("a")))
  }

  // ---- embedded-server execution --------------------------------------

  private def pgBin(name: String): Option[String] =
    Seq(s"/usr/lib/postgresql/15/bin/$name", s"/usr/local/bin/$name",
      s"/usr/bin/$name").find(p => new java.io.File(p).canExecute)

  /** Run a shell command, return (exit code, combined output). */
  private def sh(cmd: String): (Int, String) = {
    val p = new ProcessBuilder("/bin/sh", "-c", cmd)
      .redirectErrorStream(true).start()
    val src = scala.io.Source.fromInputStream(p.getInputStream)
    val out = try src.mkString finally src.close()
    (p.waitFor(), out)
  }

  test("the generated upsert executes on a real PostgreSQL: insert then conflict-update") {
    val initdb = pgBin("initdb"); val pgctl = pgBin("pg_ctl")
    val psql = pgBin("psql")
    assume(initdb.isDefined && pgctl.isDefined && psql.isDefined,
      "PostgreSQL binaries unavailable — dialect execution skipped")
    val dir = java.nio.file.Files.createTempDirectory("graft_pg").toString
    val port = 54300 + (System.nanoTime() % 97).toInt
    // PG refuses to run as root; the sandbox runs tests as root, so
    // the server runs under `nobody` on a private unix socket
    val asRoot = System.getProperty("user.name") == "root"
    def asPg(cmd: String): (Int, String) =
      if (asRoot) sh("su nobody -s /bin/sh -c \"" + cmd + "\"")
      else sh(cmd)
    sh(s"chown -R nobody $dir 2>/dev/null || true")
    val (initRc, initOut) = asPg(s"${initdb.get} -D $dir/data")
    assume(initRc == 0, s"initdb failed (environment): ${initOut.takeRight(200)}")
    try {
      val (startRc, startOut) = asPg(
        s"${pgctl.get} -D $dir/data -o '-k $dir -p $port -c listen_addresses=' " +
          s"-l $dir/log -w start")
      assume(startRc == 0, s"pg_ctl start failed (environment): ${startOut.takeRight(200)}")
      try {
        // SQL travels via file, never through shell interpolation —
        // the statement carries $n params and quoted literals
        def run(sql: String): (Int, String) = {
          val f = java.nio.file.Files.createTempFile(
            java.nio.file.Paths.get(dir), "q", ".sql")
          java.nio.file.Files.writeString(f, sql)
          sh(s"chmod 644 $f")
          sh(s"${psql.get} -h $dir -p $port -U nobody postgres " +
            s"-v ON_ERROR_STOP=1 -At -f $f")
        }
        val ddl = "CREATE TABLE weather_data (" +
          cols.map {
            case "timestamp" => "timestamp TIMESTAMP"
            case "date" => "date DATE"
            case c @ ("hour" | "day_of_week" | "month" | "humidity" |
                      "pressure" | "cloudiness" | "visibility" |
                      "wind_direction") => s"$c INTEGER"
            case c @ ("city" | "country" | "season" | "description" |
                      "temp_category" | "humidity_category" |
                      "wind_category" | "location" | "coord_string") =>
              s"$c VARCHAR(100)"
            case c => s"$c DOUBLE PRECISION"
          }.mkString(", ") +
          ", CONSTRAINT wd_key UNIQUE (city, country, timestamp))"
        val (ddlRc, ddlOut) = run(ddl)
        assert(ddlRc == 0, s"reference-shaped DDL must apply: $ddlOut")
        val full = Sinks.pgUpsertSql("weather_data", cols, keys, updates)
        // PREPARE the exact generated statement ($n positional form of
        // the JDBC ?s): the server must parse and plan it verbatim
        var k = 0
        val dollar = full.flatMap {
          case '?' => k += 1; s"$$$k"
          case c => c.toString
        }
        val (prepRc, prepOut) = run(s"PREPARE up AS $dollar")
        assert(prepRc == 0,
          s"PostgreSQL must accept the generated 26-column statement: $prepOut")
        // semantics: two conflicting rows through the SAME statement
        // text with literals substituted for the params
        def row(temp: Double, hum: Int): String = {
          val vals = cols.map {
            case "city" => "'London'"
            case "country" => "'GB'"
            case "timestamp" => "TIMESTAMP '2024-01-15 12:00:00'"
            case "date" => "DATE '2024-01-15'"
            case "hour" => "12"
            case "day_of_week" => "1"
            case "month" => "1"
            case "humidity" => hum.toString
            case "pressure" => "1013"
            case "cloudiness" => "40"
            case "visibility" => "10000"
            case "wind_direction" => "180"
            case "temperature" => temp.toString
            case "season" | "description" | "temp_category" |
                 "humidity_category" | "wind_category" | "location" |
                 "coord_string" => "'x'"
            case _ => "1.0"
          }
          full.replace("VALUES (" + cols.map(_ => "?").mkString(", ") + ")",
            "VALUES (" + vals.mkString(", ") + ")")
        }
        assert(run(row(15.5, 70))._1 == 0, "first insert must succeed")
        assert(run(row(14.0, 80))._1 == 0,
          "conflicting insert must update, not fail")
        val (_, cnt) = run("SELECT COUNT(*) FROM weather_data")
        assert(cnt.trim == "1", s"conflict must merge, not append: got $cnt")
        val (_, merged) = run("SELECT temperature, humidity FROM weather_data")
        assert(merged.trim == "14|80",
          s"DO UPDATE must take the EXCLUDED (new) values: got $merged")
      } finally
        asPg(s"${pgctl.get} -D $dir/data -m immediate stop")
    } finally
      sh(s"rm -rf $dir")
  }
}
