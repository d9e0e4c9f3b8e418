package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.etl.Pipeline
import graft.io.Sources.table

/** End-to-end pipeline parity: the reference's FULL 5-stage transform
  * (adapter → dedup → fills → drop → clean → normalize → enrich →
  * validate; reference: src/transform.py:40-69) over the corpus events
  * table, verified ROW-BY-ROW across all 26 output columns against a
  * DuckDB oracle that mirrors every stage as a CTE. This is the
  * strongest single statement of parity: one lazy Spark plan, every
  * intermediate semantic checked cell-by-cell at the end.
  */
object PipelineQueries {

  private val e2eOracle =
    """WITH base AS (
      |  SELECT
      |    ' city' || ' ' || CAST(user_id % 50 AS VARCHAR) AS city,
      |    substring(event_type, 1, 2) AS country,
      |    ts AS "timestamp",
      |    value / 4 - 20 AS temperature,
      |    value / 4 - 22 AS feels_like,
      |    CAST(floor(value) AS INTEGER) % 101 AS humidity,
      |    800 + (CAST(floor(value * 7) AS INTEGER) % 300) AS pressure,
      |    event_type AS description,
      |    CASE WHEN user_id % 13 = 0 THEN NULL
      |         ELSE floor((value / 8) * 100 + 0.5) / 100 END AS wind_speed,
      |    CAST(floor(value * 13) AS INTEGER) % 720 - 360 AS wind_direction,
      |    CAST(floor(value) AS INTEGER) % 120 AS cloudiness,
      |    CASE WHEN value < 50 THEN NULL
      |         ELSE floor((value / 20) * 100 + 0.5) / 100 END AS visibility,
      |    (value % 180.0::DOUBLE) - 90 + 0.1234567::DOUBLE AS lat,
      |    ((value * 2) % 360.0::DOUBLE) - 180 AS lon
      |  FROM events),
      |dedup AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT b.*, row_number() OVER (
      |      PARTITION BY city, country, date_trunc('hour', "timestamp")
      |      ORDER BY "timestamp", temperature, humidity) AS rn
      |    FROM base b) WHERE rn = 1),
      |filled AS (
      |  SELECT city, country, "timestamp", temperature, feels_like, humidity,
      |    pressure, description,
      |    coalesce(wind_speed, 0.0) AS wind_speed,
      |    coalesce(wind_direction, 0) AS wind_direction,
      |    cloudiness,
      |    coalesce(visibility, (SELECT median(visibility) FROM dedup)) AS visibility,
      |    lat, lon
      |  FROM dedup),
      |cleaned AS (
      |  SELECT array_to_string(list_transform(string_split(lower(trim(city)), ' '),
      |      w -> upper(w[1]) || w[2:]), ' ') AS city,
      |    upper(country) AS country, "timestamp", temperature, feels_like,
      |    humidity, pressure, lower(trim(description)) AS description,
      |    wind_speed, wind_direction, cloudiness, visibility, lat, lon
      |  FROM filled
      |  WHERE temperature IS NOT NULL AND humidity IS NOT NULL
      |    AND pressure IS NOT NULL AND lat IS NOT NULL AND lon IS NOT NULL),
      |norm AS (
      |  SELECT city, country, "timestamp",
      |    floor(temperature * 10 + 0.5) / 10 AS temperature,
      |    floor(feels_like * 10 + 0.5) / 10 AS feels_like,
      |    CAST(least(greatest(humidity, 0.0), 100.0) AS INTEGER) AS humidity,
      |    pressure, description,
      |    floor(wind_speed * 10 + 0.5) / 10 AS wind_speed,
      |    ((wind_direction % 360) + 360) % 360 AS wind_direction,
      |    CAST(least(greatest(cloudiness, 0.0), 100.0) AS INTEGER) AS cloudiness,
      |    floor(greatest(visibility, 0.0) * 10 + 0.5) / 10 AS visibility,
      |    floor(lat * 1000000 + 0.5) / 1000000 AS lat,
      |    floor(lon * 1000000 + 0.5) / 1000000 AS lon
      |  FROM cleaned),
      |enr AS (
      |  SELECT n.*,
      |    CAST("timestamp" AS DATE) AS date,
      |    CAST(extract(hour FROM "timestamp") AS INTEGER) AS hour,
      |    dayname("timestamp") AS day_of_week,
      |    monthname("timestamp") AS month,
      |    CASE WHEN extract(month FROM "timestamp") IN (12,1,2) THEN 'Winter'
      |         WHEN extract(month FROM "timestamp") IN (3,4,5) THEN 'Spring'
      |         WHEN extract(month FROM "timestamp") IN (6,7,8) THEN 'Summer'
      |         ELSE 'Autumn' END AS season,
      |    CASE WHEN temperature < 0 THEN 'Freezing'
      |         WHEN temperature < 10 THEN 'Cold'
      |         WHEN temperature < 20 THEN 'Cool'
      |         WHEN temperature < 25 THEN 'Mild'
      |         WHEN temperature < 30 THEN 'Warm'
      |         ELSE 'Hot' END AS temp_category,
      |    CASE WHEN humidity < 30 THEN 'Low'
      |         WHEN humidity < 60 THEN 'Moderate'
      |         ELSE 'High' END AS humidity_category,
      |    CASE WHEN wind_speed < 1 THEN 'Calm'
      |         WHEN wind_speed < 6 THEN 'Light'
      |         WHEN wind_speed < 12 THEN 'Gentle'
      |         WHEN wind_speed < 20 THEN 'Moderate'
      |         WHEN wind_speed < 29 THEN 'Fresh'
      |         WHEN wind_speed < 39 THEN 'Strong'
      |         ELSE 'Gale' END AS wind_category,
      |    floor((temperature
      |      + CASE WHEN humidity > 70 THEN (humidity - 70) * 0.1::DOUBLE ELSE 0.0 END
      |      - CASE WHEN humidity < 30 THEN (30 - humidity) * 0.05::DOUBLE ELSE 0.0 END
      |      ) * 10 + 0.5) / 10 AS comfort_index,
      |    city || ', ' || country AS location,
      |    CAST(lat AS VARCHAR) || ',' || CAST(lon AS VARCHAR) AS coord_string,
      |    least(greatest(100.0
      |      - CASE WHEN wind_speed IS NULL THEN 5.0 ELSE 0.0 END
      |      - CASE WHEN visibility = 0.0 THEN 3.0 ELSE 0.0 END
      |      - CASE WHEN temperature > 45.0 THEN 5.0 ELSE 0.0 END
      |      - CASE WHEN temperature < -30.0 THEN 5.0 ELSE 0.0 END
      |      - CASE WHEN wind_speed > 100.0 THEN 10.0 ELSE 0.0 END,
      |      0.0), 100.0) AS quality_score
      |  FROM norm n)
      |SELECT * FROM enr
      |WHERE temperature BETWEEN -60 AND 60
      |  AND pressure BETWEEN 800 AND 1100
      |  AND wind_speed <= 200
      |  AND lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180
      |ORDER BY city, country, "timestamp", humidity""".stripMargin

  /** The modern pretraining-curation pipeline (FineWeb/RefinedWeb
    * stage order) as ONE lazy Spark plan over `documents`:
    * language-ID filter → quality-score filter → exact dedup →
    * ExactSubstr span removal within the surviving corpus →
    * benchmark decontamination of the PRUNED text. Every stage is an
    * already-verified operator ([[graft.ops.TextOps.langId]],
    * [[graft.ops.TextOps.qualityScore]], [[graft.ops.Dedup.exact]],
    * [[graft.ops.Dedup.substringPrune]],
    * [[graft.ops.Dedup.decontaminateBatch]]); this row is the
    * composition statement — the oracle re-states all five stages as
    * CTEs and the final (doc_id, n_kept, text_pruned) relation must
    * match cell-for-cell. Scale shape is inherited: narrow filters,
    * fingerprint dedup, O(corpus) window fingerprints, broadcast
    * benchmark probe — no stage owns a pair space.
    */
  private val pretrainOracle = {
    val md5_60 = (x: String) => s"('0x' || substring(md5($x),1,15))::BIGINT"
    val stop = "len(list_filter(string_split(text,' '), w -> w IN ('the','a')))"
    val ntok = "len(string_split(text,' '))"
    val tri = "UNNEST(list_transform(range(1, greatest(len(t)-2,0)+1), " +
      "i -> array_to_string(t[i:i+2], ' '))) AS u(g)"
    s"""WITH lf AS (SELECT doc_id, text FROM documents
       |  WHERE CAST($stop AS DOUBLE) / CAST($ntok AS DOUBLE) >= 0.06::DOUBLE),
       |qf AS (SELECT doc_id, text FROM (
       |    SELECT doc_id, text, $ntok::BIGINT AS n_tok, $stop::BIGINT AS n_stop,
       |      length(text)::BIGINT AS nc FROM lf)
       |  WHERE least(greatest(100.0
       |    - CASE WHEN n_tok < 40 THEN 20.0 ELSE 0.0 END
       |    - CASE WHEN CAST(n_stop AS DOUBLE)/CAST(n_tok AS DOUBLE) > 0.25 THEN 15.0 ELSE 0.0 END
       |    - CASE WHEN CAST(nc - (n_tok-1) AS DOUBLE)/CAST(n_tok AS DOUBLE) < 4.0 THEN 10.0 ELSE 0.0 END
       |    - CASE WHEN nc < 200 THEN 5.0 ELSE 0.0 END, 0.0), 100.0) >= 75.0::DOUBLE),
       |dd AS (SELECT doc_id, text FROM (
       |    SELECT doc_id, text, row_number() OVER (
       |      PARTITION BY ${md5_60("lower(trim(text))")} ORDER BY doc_id) AS rn
       |    FROM qf) WHERE rn = 1),
       |tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM dd),
       |wins AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ${md5_60("array_to_string(t[i:i+7], ' ')")} AS wh
       |  FROM tok, UNNEST(range(1, greatest(len(t)-7,0)+1)) AS r(i)),
       |occ AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY wh) AS occ FROM wins),
       |cov AS (SELECT DISTINCT doc_id, CAST(u.c AS INTEGER) AS tp
       |  FROM occ, UNNEST(range(pos, pos + 8)) AS u(c) WHERE occ >= 2),
       |tokp AS (SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS tp,
       |    t[CAST(r.i AS INTEGER)] AS tok
       |  FROM tok, UNNEST(range(1, len(t) + 1)) AS r(i)),
       |keepj AS (SELECT p.doc_id, p.tp, p.tok, c.tp IS NULL AS keep
       |  FROM tokp p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.tp = p.tp),
       |pr AS (SELECT doc_id,
       |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    COALESCE(string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY tp), '') AS text_pruned
       |  FROM keepj GROUP BY doc_id),
       |btok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
       |  FROM documents WHERE doc_id % 97 = 0),
       |bg AS (SELECT DISTINCT doc_id AS bid, g FROM btok, $tri),
       |bsz AS (SELECT bid, COUNT(*) AS nb FROM bg GROUP BY 1),
       |ptok AS (SELECT doc_id, string_split(lower(trim(text_pruned)), ' ') AS t FROM pr),
       |pg AS (SELECT DISTINCT doc_id, g FROM ptok, $tri),
       |pairs AS (SELECT p.doc_id AS cid, b.bid, COUNT(*) AS ni
       |  FROM pg p JOIN bg b USING (g) GROUP BY 1, 2),
       |hits AS (SELECT DISTINCT cid FROM pairs JOIN bsz USING (bid)
       |  WHERE CAST(ni AS DOUBLE) / CAST(nb AS DOUBLE) >= 0.8::DOUBLE)
       |SELECT doc_id, n_kept, text_pruned FROM pr
       |WHERE doc_id NOT IN (SELECT cid FROM hits) ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("pipeline_e2e", e2eOracle) { (s, dir) =>
      val events = table(s, dir, "events")
      Pipeline.transform(Pipeline.weatherFromEvents(events),
          dedupTieBreak = Seq("temperature", "humidity"))
        .orderBy("city", "country", "timestamp", "humidity")
    },

    Q("pipeline_pretrain", pretrainOracle) { (s, dir) =>
      import graft.ops.{Dedup, TextOps}
      val stops = Seq("the", "a")
      val docs = table(s, dir, "documents")
      val lf = docs.filter(TextOps.langId(col("text"), stops).isin("en", "mixed"))
      val qf = lf.filter(TextOps.qualityScore(col("text"), stops) >= 75.0)
      val dd = Dedup.exact(qf, "doc_id", "text")
      // the pruned relation feeds TWO branches of decontaminateBatch
      // (the batch rows and their gram probe): materialize it once or
      // the whole prune rollup (aggregate + covered join over the
      // checkpointed token relation) executes per branch — the r12
      // pipeline_pretrain regression (1.96 → 2.98 s) was exactly this
      // double execution
      val pr = Dedup.substringPrune(dd, "doc_id", "text", windowLen = 8)
        .localCheckpoint()
      val bg = Dedup.benchGrams(
        docs.filter(pmod(col("doc_id"), lit(97)) === 0), "doc_id", "text", 3)
      Dedup.decontaminateBatch(pr, bg, "doc_id", "text_pruned", 3, 0.8)
        .select("doc_id", "n_kept", "text_pruned")
        .orderBy("doc_id")
    })
}
