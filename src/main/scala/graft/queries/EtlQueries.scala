package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import graft.etl.{Clean, Enrich, Normalize, Validate}
import graft.functions.Parity
import graft.io.Sources.table

/** Reference-surface transform operators (SURVEY.md §2.2–§2.3) bound to
  * the driver corpus per FIXTURES.md §C. Each query mirrors its DuckDB
  * oracle exactly: same column names, same ORDER BY, cross-engine-
  * deterministic expressions (see graft.functions.Parity).
  */
object EtlQueries {

  // Null-injection expressions shared by the fill/drop operators: the
  // corpus has no nulls, so missing values are injected deterministically
  // (value < 50 → null), mirrored verbatim in the oracle SQL.
  private val valueNulled = "CASE WHEN value < 50 THEN NULL ELSE value END"

  val all: Seq[Q] = Seq(

    /** dedup_hour (reference: src/transform.py:85-92): keep-first per
      * (user_id, event_type, hour(ts)), winner pinned by (ts, event_id). */
    Q("dedup_hour",
      s"""SELECT event_id, ts, user_id, event_type, value FROM (
         |  SELECT e.*, row_number() OVER (
         |    PARTITION BY user_id, event_type, date_trunc('hour', ts)
         |    ORDER BY ts, event_id) AS rn
         |  FROM events e) WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, dir) =>
      Clean.dedupFirstPerKeyHour(table(s, dir, "events"),
          Seq("user_id", "event_type"), "ts", Seq("event_id"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    /** fill_const (reference: src/transform.py:108-109). */
    Q("fill_const",
      s"""SELECT event_id, coalesce($valueNulled, 0.0) AS value_filled
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "events").withColumn("value_filled",
        when(col("value") < 50, lit(null).cast("double")).otherwise(col("value")))
      Clean.fillConst(e, Map("value_filled" -> 0.0))
        .select("event_id", "value_filled").orderBy("event_id")
    },

    /** fill_median (reference: src/transform.py:112) — exact median. */
    Q("fill_median",
      s"""SELECT event_id, round(coalesce($valueNulled,
         |  (SELECT median($valueNulled) FROM events)), 4) AS value_filled
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "events").withColumn("value_filled",
        when(col("value") < 50, lit(null).cast("double")).otherwise(col("value")))
      Clean.fillMedianLazy(e, "value_filled")
        .select(col("event_id"), round(col("value_filled"), 4).as("value_filled"))
        .orderBy("event_id")
    },

    /** drop_null_critical (reference: src/transform.py:114-123). */
    Q("drop_null_critical",
      s"""SELECT event_id, ts, event_type FROM (
         |  SELECT event_id, ts, event_type,
         |         $valueNulled AS value_n,
         |         CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS uid_n
         |  FROM events) WHERE value_n IS NOT NULL AND uid_n IS NOT NULL
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "events")
        .withColumn("value_n",
          when(col("value") < 50, lit(null).cast("double")).otherwise(col("value")))
        .withColumn("uid_n",
          when(col("user_id") % 7 === 0, lit(null).cast("long")).otherwise(col("user_id")))
      Clean.dropNullCritical(e, Seq("value_n", "uid_n"))
        .select("event_id", "ts", "event_type").orderBy("event_id")
    },

    /** clean_text (reference: src/transform.py:98-100): Title Case /
      * UPPER / lower. DuckDB lacks initcap → emulated word-wise. */
    Q("clean_text",
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(lower(trim(p_name)), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS name_tc,
        |  upper(p_brand) AS brand_uc,
        |  lower(trim(p_type)) AS type_lc
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      table(s, dir, "part").select(
        col("p_partkey"),
        Clean.titleCase(col("p_name")).as("name_tc"),
        Clean.upperCode(col("p_brand")).as("brand_uc"),
        Clean.lowerText(col("p_type")).as("type_lc"))
        .orderBy("p_partkey")
    },

    /** clip_range (reference: src/transform.py:132-141). */
    Q("clip_range",
      """SELECT event_id,
        |  least(greatest(value, 20.0), 250.0) AS value_clip,
        |  greatest(value, 50.0) AS value_floor
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Normalize.clip(col("value"), 20, 250).as("value_clip"),
        Normalize.clipLower(col("value"), 50).as("value_floor"))
        .orderBy("event_id")
    },

    /** mod_wind_dir (reference: src/transform.py:138) — non-negative
      * wrap via pmod; floor before the int cast (DuckDB CAST rounds,
      * Spark truncates — floor is the shared semantics). */
    Q("mod_wind_dir",
      """SELECT event_id,
        |  ((CAST(floor(value * 10) AS BIGINT) - 1000) % 360 + 360) % 360 AS deg
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Normalize.wrapDegrees(Parity.floorLong(col("value") * 10) - 1000)
          .cast("long").as("deg"))
        .orderBy("event_id")
    },

    /** round_precision (reference: src/transform.py:144-149) — via
      * Parity.roundAt (cross-engine-stable half-up). */
    Q("round_precision",
      s"""SELECT l_orderkey, l_linenumber,
         |  ${Parity.roundAtSql("l_extendedprice * (1.0 - l_discount)", 1)} AS net1,
         |  ${Parity.roundAtSql("l_tax * l_extendedprice", 2)} AS tax2,
         |  ${Parity.roundAtSql("l_quantity / 7", 6)} AS q6
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Parity.roundAt(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1).as("net1"),
        Parity.roundAt(col("l_tax") * col("l_extendedprice"), 2).as("tax2"),
        Parity.roundAt(col("l_quantity") / 7, 6).as("q6"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    /** filter_outliers (reference: src/transform.py:193-210) — one
      * conjunctive predicate, pushed to the parquet scan. */
    Q("filter_outliers",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 45
        |  AND l_extendedprice BETWEEN 1000 AND 90000
        |  AND l_discount <= 0.08 AND l_tax BETWEEN 0 AND 0.06
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(Validate.withinBounds(Seq(
          ("l_quantity", 5, 45), ("l_extendedprice", 1000, 90000))) &&
          col("l_discount") <= 0.08 && col("l_tax").between(0, 0.06))
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
    },

    /** derive_date (reference: src/transform.py:160). */
    Q("derive_date",
      "SELECT event_id, CAST(ts AS DATE) AS d FROM events ORDER BY event_id") { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"), Enrich.deriveDate(col("ts")).as("d"))
        .orderBy("event_id")
    },

    /** derive_hour (reference: src/transform.py:161). */
    Q("derive_hour",
      """SELECT event_id, CAST(extract(hour FROM ts) AS INTEGER) AS h
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"), Enrich.deriveHour(col("ts")).as("h"))
        .orderBy("event_id")
    },

    /** derive_day_name (reference: src/transform.py:162). */
    Q("derive_day_name",
      "SELECT event_id, dayname(ts) AS day_name FROM events ORDER BY event_id") { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"), Enrich.dayName(col("ts")).as("day_name"))
        .orderBy("event_id")
    },

    /** derive_month_name (reference: src/transform.py:163). */
    Q("derive_month_name",
      "SELECT o_orderkey, monthname(o_orderdate) AS month_name FROM orders ORDER BY o_orderkey") { (s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"), Enrich.monthName(col("o_orderdate")).as("month_name"))
        .orderBy("o_orderkey")
    },

    /** derive_season (reference: src/transform.py:218-227). */
    Q("derive_season",
      """SELECT o_orderkey,
        |  CASE WHEN extract(month FROM o_orderdate) IN (12,1,2) THEN 'Winter'
        |       WHEN extract(month FROM o_orderdate) IN (3,4,5) THEN 'Spring'
        |       WHEN extract(month FROM o_orderdate) IN (6,7,8) THEN 'Summer'
        |       ELSE 'Autumn' END AS season
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"), Enrich.season(col("o_orderdate")).as("season"))
        .orderBy("o_orderkey")
    },

    /** cat_temp (reference: src/transform.py:229-242) over the
      * temperature analogue value−100. */
    Q("cat_temp",
      """SELECT event_id,
        |  CASE WHEN value - 100.0 < 0 THEN 'Freezing'
        |       WHEN value - 100.0 < 10 THEN 'Cold'
        |       WHEN value - 100.0 < 20 THEN 'Cool'
        |       WHEN value - 100.0 < 25 THEN 'Mild'
        |       WHEN value - 100.0 < 30 THEN 'Warm'
        |       ELSE 'Hot' END AS temp_category
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Enrich.tempCategory(col("value") - 100.0).as("temp_category"))
        .orderBy("event_id")
    },

    /** cat_humidity (reference: src/transform.py:244-251) over the
      * humidity analogue floor(value) % 101. */
    Q("cat_humidity",
      """SELECT event_id,
        |  CASE WHEN CAST(floor(value) AS BIGINT) % 101 < 30 THEN 'Low'
        |       WHEN CAST(floor(value) AS BIGINT) % 101 < 60 THEN 'Moderate'
        |       ELSE 'High' END AS humidity_category
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Enrich.humidityCategory(Parity.floorLong(col("value")) % 101)
          .as("humidity_category"))
        .orderBy("event_id")
    },

    /** cat_wind (reference: src/transform.py:253-268) over value/5. */
    Q("cat_wind",
      """SELECT event_id,
        |  CASE WHEN value / 5 < 1 THEN 'Calm'
        |       WHEN value / 5 < 6 THEN 'Light'
        |       WHEN value / 5 < 12 THEN 'Gentle'
        |       WHEN value / 5 < 20 THEN 'Moderate'
        |       WHEN value / 5 < 29 THEN 'Fresh'
        |       WHEN value / 5 < 39 THEN 'Strong'
        |       ELSE 'Gale' END AS wind_category
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        Enrich.windCategory(col("value") / 5).as("wind_category"))
        .orderBy("event_id")
    },

    /** comfort_index (reference: src/transform.py:270-282). */
    Q("comfort_index",
      s"""SELECT event_id, ${Parity.roundAtSql(
           // NB: 0.1::DOUBLE — a bare 0.1 literal is DECIMAL in DuckDB
           // (exact 2.8 for 28*0.1) while Spark multiplies doubles;
           // the cast keeps both engines in IEEE double arithmetic.
           """(value - 100.0)
             |  + CASE WHEN CAST(floor(value) AS BIGINT) % 101 > 70
             |         THEN (CAST(floor(value) AS BIGINT) % 101 - 70) * 0.1::DOUBLE ELSE 0.0 END
             |  - CASE WHEN CAST(floor(value) AS BIGINT) % 101 < 30
             |         THEN (30 - CAST(floor(value) AS BIGINT) % 101) * 0.05::DOUBLE ELSE 0.0 END""".stripMargin, 1)} AS comfort_index
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val h = Parity.floorLong(col("value")) % 101
      table(s, dir, "events").select(
        col("event_id"),
        Parity.roundAt(
          Enrich.comfortIndexRaw(col("value") - 100.0, h), 1).as("comfort_index"))
        .orderBy("event_id")
    },

    /** concat_location (reference: src/transform.py:178) — "Name, Region". */
    Q("concat_location",
      """SELECT n_nationkey, n_name || ', ' || r_name AS location
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"),
          Enrich.location(col("n_name"), col("r_name")).as("location"))
        .orderBy("n_nationkey")
    },

    /** concat_coord (reference: src/transform.py:179) — double→string
      * cast concat (shortest-repr parity verified across engines). */
    Q("concat_coord",
      """SELECT c_custkey,
        |  CAST(c_acctbal AS VARCHAR) || ',' || CAST(c_custkey AS VARCHAR) AS coord_string
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(
        col("c_custkey"),
        Enrich.coordString(col("c_acctbal"), col("c_custkey")).as("coord_string"))
        .orderBy("c_custkey")
    },

    /** quality_score (reference: src/transform.py:284-299) — 100 minus
      * penalties, clipped to [0,100]. */
    Q("quality_score",
      """SELECT l_orderkey, l_linenumber, least(greatest(100.0
        |  - CASE WHEN l_discount > 0.05 THEN 5.0 ELSE 0.0 END
        |  - CASE WHEN l_tax = 0.0 THEN 3.0 ELSE 0.0 END
        |  - CASE WHEN l_quantity > 40.0 THEN 5.0 ELSE 0.0 END
        |  - CASE WHEN l_extendedprice > 80000.0 THEN 10.0 ELSE 0.0 END,
        |  0.0), 100.0) AS quality_score
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val raw = lit(100.0) -
        when(col("l_discount") > 0.05, 5.0).otherwise(0.0) -
        when(col("l_tax") === 0.0, 3.0).otherwise(0.0) -
        when(col("l_quantity") > 40.0, 5.0).otherwise(0.0) -
        when(col("l_extendedprice") > 80000.0, 10.0).otherwise(0.0)
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Normalize.clip(raw, 0.0, 100.0).as("quality_score"))
        .orderBy("l_orderkey", "l_linenumber")
    })
}
