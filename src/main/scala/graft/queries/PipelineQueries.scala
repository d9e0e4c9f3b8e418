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

  val all: Seq[Q] = Seq(
    Q("pipeline_e2e", e2eOracle) { (s, dir) =>
      val events = table(s, dir, "events")
      Pipeline.transform(Pipeline.weatherFromEvents(events),
          dedupTieBreak = Seq("temperature", "humidity"))
        .orderBy("city", "country", "timestamp", "humidity")
    })
}
