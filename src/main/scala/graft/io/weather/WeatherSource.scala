package graft.io.weather

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas

/** DataSource V2 table for the reference's HTTP-JSON ingest entry
  * point (reference: src/ingest.py:63-120): one GET per configured
  * city against an OpenWeatherMap-shaped endpoint, with bounded
  * retries, exponential backoff and a request timeout, parsed into the
  * canonical 14-column weather schema (reference: src/ingest.py:20-37).
  *
  * Spark-first shape: each city is an [[InputPartition]], so the fetch
  * fan-out IS the task fan-out — on a cluster, 10k cities spread over
  * the executors with no driver-side loop, and a failed city (after
  * retries) yields an empty partition rather than failing the job,
  * mirroring the reference's skip-and-log behavior
  * (reference: src/ingest.py:110-120). The endpoint is an option, so
  * tests serve `file://` fixtures and production serves `https://`.
  *
  * {{{
  * spark.read.format("graft-weather")
  *   .option("cities", "London:GB,Tokyo:JP")
  *   .option("urlTemplate", "https://host/data/2.5/weather?q={city}")
  *   .load()
  * }}}
  *
  * Options: `cities` ("Name:CC" comma list) or `configPath` (JSON file
  * of {city, country_code} objects, reference: config/cities.json) —
  * neither given falls back to the reference's built-in 10 cities;
  * `urlTemplate` with `{city}` (and optional `{country}`) placeholders;
  * `maxRetries` (3), `backoffMs` (1000, doubling per attempt — the
  * reference session's backoff_factor=1, src/ingest.py:63-77),
  * `timeoutMs` (10000, src/ingest.py:102), `failFast` (false);
  * `minRequestIntervalMs` (0 = off — the reference's 1-city/sec
  * courtesy throttle, src/ingest.py:146-147: successive requests to
  * the endpoint from one executor JVM are spaced at least this far
  * apart, see [[WeatherRateLimiter]]).
  */
class WeatherSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-weather"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.weather
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WeatherTable(properties.asScala.toMap
      .map { case (k, v) => k.toLowerCase -> v })
}

final class WeatherTable(options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft-weather"
  override def schema(): StructType = Schemas.weather
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new WeatherScan(options)
    }
}

final class WeatherScan(options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = Schemas.weather
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WeatherMicroBatchStream(options)

  override def planInputPartitions(): Array[InputPartition] =
    WeatherFetch.cities(options)
      .map { case (city, cc) => CityPartition(city, cc): InputPartition }
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    WeatherScan.readerFactory(options)
}

object WeatherScan {
  def readerFactory(options: Map[String, String]): WeatherReaderFactory =
    WeatherReaderFactory(
      urlTemplate = options.getOrElse("urltemplate",
        sys.error("graft-weather requires the urlTemplate option")),
      maxRetries = options.getOrElse("maxretries", "3").toInt,
      backoffMs = options.getOrElse("backoffms", "1000").toLong,
      timeoutMs = options.getOrElse("timeoutms", "10000").toInt,
      failFast = options.getOrElse("failfast", "false").toBoolean,
      minRequestIntervalMs =
        options.getOrElse("minrequestintervalms", "0").toLong,
      skips = scala.util.Try(org.apache.spark.sql.SparkSession.active)
        .toOption.map(s => WeatherMetrics.accumulator(s,
          options.getOrElse("skipmetricname", WeatherMetrics.DefaultName))))
}

/** Executor→driver side channel for per-city fetch failures. A city
  * that fails after retries is SKIPPED, not fatal — the reference logs
  * each one (reference: src/ingest.py:142-145); silently dropping them
  * would make a partial ingest indistinguishable from a complete one.
  * Every skip bumps a named LongAccumulator, which (a) surfaces in the
  * Spark UI per stage and (b) is queryable in code via [[skipCount]]
  * after the scan's action completes. Accumulator semantics apply:
  * at-least-once under task retries — a monitoring signal, not an
  * exactly-once ledger. One accumulator per name, shared by every scan
  * using that name (set `skipMetricName` per read to isolate counts);
  * for a streaming read the count accumulates across micro-batches.
  */
object WeatherMetrics {
  val DefaultName = "graft-weather.skipped_cities"
  // keyed by (applicationId, name), not name alone: a name-only cache
  // would hand back the accumulator of a STOPPED SparkContext after a
  // session restart, and every skip count would silently vanish
  private val accs =
    scala.collection.concurrent.TrieMap.empty[(String, String), org.apache.spark.util.LongAccumulator]
  def accumulator(spark: org.apache.spark.sql.SparkSession,
                  name: String = DefaultName): org.apache.spark.util.LongAccumulator =
    accs.getOrElseUpdate((spark.sparkContext.applicationId, name),
      spark.sparkContext.longAccumulator(name))
  private def activeAppId: Option[String] =
    scala.util.Try(org.apache.spark.sql.SparkSession.active)
      .toOption.map(_.sparkContext.applicationId)
  def skipCount(name: String = DefaultName): Long =
    activeAppId.flatMap(id => accs.get((id, name)))
      .map(_.value.longValue).getOrElse(0L)
  def reset(name: String = DefaultName): Unit =
    activeAppId.flatMap(id => accs.get((id, name))).foreach(_.reset())
}

/** Offset = number of completed polls. */
final case class WeatherOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** The reference's cadence as a streaming source: every trigger is one
  * poll of the API across all configured cities (reference's Airflow
  * schedule, airflow_dag/weather_etl_dag.py:57, turned into
  * `readStream` + a processing-time trigger). A poller cannot refetch
  * the past, so a committed-offset gap after restart collapses to a
  * single fresh fetch per city — at-least-once per trigger window, the
  * strongest guarantee a current-conditions endpoint can give.
  */
final class WeatherMicroBatchStream(options: Map[String, String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val cities = WeatherFetch.cities(options)
  private var polls = 0L
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(polls + 1)

  override def initialOffset(): Offset = WeatherOffset(0L)

  override def latestOffset(): Offset = availableNowTarget match {
    case Some(t) => WeatherOffset(t)
    case None => polls += 1; WeatherOffset(polls)
  }

  // admission-control form (SupportsTriggerAvailableNow extends it):
  // a poll is atomic, so read limits don't subdivide it
  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def deserializeOffset(json: String): Offset = {
    val o = WeatherOffset(json.trim.toLong)
    polls = math.max(polls, o.n) // resume past the committed poll count
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WeatherOffset].n
    val e = end.asInstanceOf[WeatherOffset].n
    if (e <= s) Array.empty
    else cities.map { case (c, cc) => CityPartition(c, cc): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WeatherScan.readerFactory(options)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class CityPartition(city: String, country: String) extends InputPartition

/** Executor-JVM-wide request spacing — the Spark shape of the
  * reference's 1-city/sec courtesy throttle (reference:
  * src/ingest.py:146-147, `time.sleep(1)` between cities). The
  * reference fetches serially so a sleep between iterations IS the
  * rate limit; here each city is a task, so with 32 concurrent
  * partitions per executor an un-throttled scan fires 32 requests in
  * the same instant — exactly what a free-tier API 429s. The limiter
  * hands out reserved start slots per (endpoint template) from one
  * JVM-global ledger: any two HTTP attempts to the same endpoint from
  * this executor — across tasks, cities, and retries — start at least
  * `intervalMs` apart.
  *
  * Scale note: the ledger is per EXECUTOR (Spark has no cheap
  * cluster-wide mutual exclusion, and a driver-coordinated token
  * bucket would put a network round trip in front of every request).
  * Aggregate cluster rate = executors / interval; sizing a truly
  * global budget means sizing the executor count (or fronting the API
  * with a proxy) — stated here rather than pretending a global limit.
  */
object WeatherRateLimiter {
  private val nextFree =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Blocks until this caller's reserved slot arrives; slots are
    * CAS-reserved so concurrent tasks serialize without holding a
    * lock while sleeping. Returns the RESERVED slot time (nanos) —
    * the spacing invariant lives on these reservations (consecutive
    * slots on one key are >= interval apart by construction), so the
    * spec asserts on them rather than on post-sleep wall timestamps,
    * which scheduler jitter can compress below the nominal gap
    * (ADVICE r13).
    */
  def acquire(key: String, intervalMs: Long): Long = {
    if (intervalMs <= 0) return System.nanoTime()
    val slot = nextFree.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong(Long.MinValue))
    var waitNanos = 0L
    var start = 0L
    var reserved = false
    while (!reserved) {
      val now = System.nanoTime()
      val prev = slot.get()
      start = if (prev == Long.MinValue) now else math.max(now, prev)
      if (slot.compareAndSet(prev, start + intervalMs * 1000000L)) {
        waitNanos = start - now
        reserved = true
      }
    }
    if (waitNanos > 0)
      Thread.sleep(waitNanos / 1000000L, (waitNanos % 1000000L).toInt)
    start
  }
}

final case class WeatherReaderFactory(urlTemplate: String, maxRetries: Int,
                                      backoffMs: Long, timeoutMs: Int,
                                      failFast: Boolean,
                                      minRequestIntervalMs: Long = 0L,
                                      skips: Option[org.apache.spark.util.LongAccumulator] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CityPartition]
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      private var consumed = false

      override def next(): Boolean = {
        if (row == null && !consumed) {
          consumed = true
          val url = urlTemplate
            .replace("{city}", p.city.replace(" ", "%20"))
            .replace("{country}", p.country)
          try {
            // the limiter gates each ATTEMPT (retries included): the
            // contract is request spacing at the endpoint, and a
            // retry is another request
            val bytes = WeatherFetch.withRetry(maxRetries, backoffMs)(() => {
              WeatherRateLimiter.acquire(urlTemplate, minRequestIntervalMs)
              WeatherFetch.get(url, timeoutMs)
            })
            row = WeatherFetch.parse(new String(bytes, "UTF-8"))
          } catch {
            // after retries: skip the city, don't fail the job
            // (reference: src/ingest.py:110-120 returns None) — but
            // COUNT it so a partial ingest is visible to the driver
            case e: Exception =>
              if (failFast) throw e
              skips.foreach(_.add(1L))
          }
        }
        row != null
      }
      override def get(): InternalRow = { val r = row; row = null; r }
      override def close(): Unit = ()
    }
  }
}

/** Driver/executor helpers: city-list resolution, HTTP GET with retry,
  * and the JSON → InternalRow parse. Pure functions, unit-testable
  * without a cluster or a webserver.
  */
object WeatherFetch {

  /** Bounded retry with exponential backoff: sleeps backoffMs · 2^k
    * after failed attempt k, rethrows once maxRetries is exhausted
    * (reference: src/ingest.py:63-77, Retry(total=3, backoff_factor=1)).
    */
  def withRetry[T](maxRetries: Int, backoffMs: Long)(f: () => T): T = {
    var attempt = 0
    var last: Exception = null
    while (attempt <= maxRetries) {
      try return f()
      catch {
        case e: Exception =>
          last = e
          if (attempt < maxRetries && backoffMs > 0)
            Thread.sleep(backoffMs << attempt)
          attempt += 1
      }
    }
    throw last
  }

  /** GET with connect+read timeouts; file:// and http(s):// both work
    * (tests serve fixtures from disk).
    */
  def get(url: String, timeoutMs: Int): Array[Byte] = {
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    val in = conn.getInputStream
    try in.readAllBytes() finally in.close()
  }

  /** City list: explicit option, config file, or the reference's
    * 10-city fallback (reference: src/ingest.py:192-213).
    */
  def cities(options: Map[String, String]): Seq[(String, String)] = {
    val opts = options.map { case (k, v) => k.toLowerCase -> v }
    opts.get("cities") match {
      case Some(list) =>
        list.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
          e.split(":") match {
            case Array(c, cc) => (c, cc)
            case Array(c) => (c, "")
          }
        }
      case None =>
        opts.get("configpath") match {
          case Some(path) =>
            val mapper = new ObjectMapper()
            val root = mapper.readTree(new java.io.File(path))
            root.asScala.toSeq.map(n =>
              (n.path("city").asText(), n.path("country_code").asText()))
          case None => fallbackCities
        }
    }
  }

  val fallbackCities: Seq[(String, String)] = Seq(
    "London" -> "GB", "New York" -> "US", "Tokyo" -> "JP",
    "Paris" -> "FR", "Sydney" -> "AU", "Berlin" -> "DE",
    "Moscow" -> "RU", "Beijing" -> "CN", "Mumbai" -> "IN",
    "Cairo" -> "EG")

  /** OpenWeatherMap JSON → 14-col InternalRow; identical field mapping
    * and defaults to [[graft.io.Sources.parseWeatherJson]]
    * (reference: src/ingest.py:152-169): absent wind/clouds/visibility
    * default to 0 and visibility converts m → km, while absent
    * NON-defaulted fields (name, dt, temp, feels_like, humidity,
    * pressure, lat, lon) are null — exactly as from_json yields null
    * for missing struct fields, so a malformed API response parses the
    * same through either path.
    */
  def parse(json: String): InternalRow = {
    val mapper = new ObjectMapper()
    val j = mapper.readTree(json)
    def str(n: JsonNode): Any =
      if (n.isMissingNode || n.isNull) null else UTF8String.fromString(n.asText())
    def dbl(n: JsonNode): Any =
      if (n.isMissingNode || n.isNull) null else n.asDouble()
    def int(n: JsonNode): Any =
      if (n.isMissingNode || n.isNull) null else n.asInt()
    val dt = j.path("dt")
    val weather0 = j.path("weather").path(0)
    new GenericInternalRow(Array[Any](
      str(j.path("name")),
      str(j.path("sys").path("country")),
      if (dt.isMissingNode || dt.isNull) null
      else dt.asLong() * 1000000L, // epoch s → µs (TimestampType)
      dbl(j.path("main").path("temp")),
      dbl(j.path("main").path("feels_like")),
      int(j.path("main").path("humidity")),
      int(j.path("main").path("pressure")),
      str(weather0.path("description")),
      j.path("wind").path("speed").asDouble(0.0),
      j.path("wind").path("deg").asInt(0),
      j.path("clouds").path("all").asInt(0),
      j.path("visibility").asDouble(0.0) / 1000.0,
      dbl(j.path("coord").path("lat")),
      dbl(j.path("coord").path("lon"))))
  }
}
