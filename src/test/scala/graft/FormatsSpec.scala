package graft

import java.nio.file.Files
import graft.etl.{Pipeline, Quality}
import graft.io.{Sinks, Sources}
import graft.model.Schemas

/** Format sinks/sources round-trips + catalog registration + audit
  * sinks (reference: src/transform.py:317-332, src/load.py:80-263,
  * 488-554).
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val weather =
    Pipeline.weatherFromEvents(Sources.table(spark, sf, "events")).limit(100)

  test("csv sink/source round-trip preserves rows under explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/w"
    val df = weather.select("city", "country", "timestamp", "temperature")
    Sinks.csv(df, dir)
    val back = Sources.csv(spark, dir, org.apache.spark.sql.types.StructType(
      Schemas.weather.fields.filter(f =>
        Seq("city", "country", "timestamp", "temperature").contains(f.name))))
    assert(back.count() == df.count())
    // the DECLARED read schema wins for CSV; accept either timestamp
    // flavor so a corpus unit change never breaks the round trip
    assert(Set("timestamp", "timestamp_ntz")(
      back.schema("timestamp").dataType.typeName))
  }

  test("json sink round-trips") {
    val dir = Files.createTempDirectory("graft_json").toString + "/w"
    val df = weather.select("city", "country", "temperature")
    Sinks.json(df, dir)
    assert(spark.read.json(dir).count() == df.count())
  }

  test("parquet sink round-trips with full schema fidelity") {
    val dir = Files.createTempDirectory("graft_parq").toString + "/w"
    Sinks.parquet(weather, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == weather.count())
    // fidelity = the written type reads back EXACTLY, whichever
    // timestamp flavor the pipeline produced from the corpus unit
    assert(back.schema("timestamp").dataType ==
      weather.schema("timestamp").dataType)
    assert(Set("timestamp", "timestamp_ntz")(
      back.schema("timestamp").dataType.typeName))
  }

  test("date-partitioned append prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/w"
    val df = Pipeline.transform(Pipeline.weatherFromEvents(
      Sources.table(spark, sf, "events")))
    Sinks.append(df, dir, partitionCols = Seq("date"))
    val dates = spark.read.parquet(dir).select("date").distinct().count()
    assert(dates > 1)
    val one = spark.read.parquet(dir)
      .filter($"date" === df.select("date").first().getDate(0))
    val scan = one.queryExecution.executedPlan.toString
    assert(!scan.contains("PartitionFilters: []"), "expected partition pruning")
  }

  test("catalog registration (ddl_create analogue) makes the table SQL-visible") {
    val dir = Files.createTempDirectory("graft_ddl").toString + "/w"
    Sinks.parquet(weather, dir)
    Sinks.registerTable(spark, "weather_data_test", dir)
    try {
      assert(spark.sql("SELECT count(*) FROM weather_data_test").first().getLong(0) ==
        weather.count())
    } finally spark.sql("DROP TABLE IF EXISTS weather_data_test")
  }

  test("metrics sink appends one audit row with metrics_json") {
    val dir = Files.createTempDirectory("graft_metrics").toString + "/m"
    val full = Pipeline.transform(Pipeline.weatherFromEvents(
      Sources.table(spark, sf, "events")))
    val metrics = Quality.qualityMetrics(full, 1000L)
    Sinks.appendMetrics(metrics, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1)
    val json = back.select("metrics_json").as[String].head()
    assert(json.contains("records_after_cleaning"))
  }

  test("appendEvolved: add-a-column evolves, narrowing and pruning refuse") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    val v1 = Seq((1L, 15.5), (2L, 22.3)).toDF("id", "temp")
    Sinks.appendEvolved(spark, v1, dir)

    // widened batch: the new column lands, old files read back NULL
    val v2 = Seq((3L, 18.0, "manual")).toDF("id", "temp", "source")
    Sinks.appendEvolved(spark, v2, dir)
    val merged = Sinks.readEvolved(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "source", "temp"))
    assert(merged.count() == 3)
    val bySrc = merged.select("id", "source").as[(Long, Option[String])]
      .collect().toMap
    assert(bySrc(1L).isEmpty && bySrc(2L).isEmpty,
      "pre-evolution rows must surface the new column as NULL")
    assert(bySrc(3L).contains("manual"))

    // a second widening on top of the first is judged against the
    // UNION schema: dropping `source` now is a pruned batch → refused
    val pruned = Seq((4L, 20.0)).toDF("id", "temp")
    val e1 = intercept[IllegalArgumentException](
      Sinks.appendEvolved(spark, pruned, dir))
    assert(e1.getMessage.contains("source"))

    // a type change for an existing column is refused at the write
    val narrowed = Seq((5, 1.0f, "x")).toDF("id", "temp", "source")
    val e2 = intercept[IllegalArgumentException](
      Sinks.appendEvolved(spark, narrowed, dir))
    assert(e2.getMessage.contains("id") || e2.getMessage.contains("temp"))

    // the refused writes left the table untouched
    assert(Sinks.readEvolved(spark, dir).count() == 3)
  }

  test("appendEvolved: partitioned string-date tables keep accepting appends") {
    // partition values round-trip through dir names, so the standing
    // schema reads "2023-11-01" back as DATE even when written from a
    // string column — the superset check must not refuse that
    val dir = Files.createTempDirectory("graft_evolve_part").toString + "/t"
    val v1 = Seq((1L, 15.5, "2023-11-01")).toDF("id", "temp", "date")
    Sinks.appendEvolved(spark, v1, dir, Seq("date"))
    val v2 = Seq((2L, 22.3, "2023-11-02")).toDF("id", "temp", "date")
    Sinks.appendEvolved(spark, v2, dir, Seq("date"))
    assert(Sinks.readEvolved(spark, dir).count() == 2)
    // data-column type changes are still refused
    val bad = Seq((3, 1.0f, "2023-11-03")).toDF("id", "temp", "date")
    intercept[IllegalArgumentException](
      Sinks.appendEvolved(spark, bad, dir, Seq("date")))
    // the declared layout must match the table's REAL directory layout:
    // an unpartitioned append into a date-partitioned table (or a
    // partitioned append into a flat one) would write a conflicting
    // col=value hierarchy that breaks later reads
    intercept[IllegalArgumentException](
      Sinks.appendEvolved(spark, v1, dir, Nil))
    val flat = Files.createTempDirectory("graft_evolve_flat").toString + "/t"
    Sinks.appendEvolved(spark, v1, flat)
    intercept[IllegalArgumentException](
      Sinks.appendEvolved(spark, v2, flat, Seq("date")))
  }

  test("appendEvolved restores a compact-stranded partition before appending") {
    val dir = Files.createTempDirectory("graft_evolve_strand").toString + "/t"
    val v1 = Seq((1L, 15.5, "2023-11-01"), (2L, 20.0, "2023-11-02"))
      .toDF("id", "temp", "date")
    Sinks.appendEvolved(spark, v1, dir, Seq("date"))
    // compactPartitioned's crash window: partition renamed to trash,
    // temp never promoted. A bare mode-append would recreate the dir
    // with only the new rows and the next compaction's recovery would
    // delete the stranded original as superseded — silent data loss.
    val f = new java.io.File(s"$dir/date=2023-11-01")
    assert(f.renameTo(new java.io.File(s"$dir/.date=2023-11-01.graft-compact-old")))
    val v2 = Seq((3L, 30.0, "2023-11-01")).toDF("id", "temp", "date")
    Sinks.appendEvolved(spark, v2, dir, Seq("date"))
    val back = Sinks.readEvolved(spark, dir)
    assert(back.count() == 3, "the stranded partition's rows must survive")
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("avro sink round-trips every supported type, nulls included") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType)))
    val ts = java.sql.Timestamp.valueOf("2023-11-07 12:34:56.123456")
    val ntz = java.time.LocalDateTime.parse("2023-11-07T12:34:56.123456")
    val rows = Seq(
      Row(1L, 7, 2.5, 1.5f, true, "alpha",
        java.sql.Date.valueOf("2023-11-07"), ts, ntz),
      Row(2L, null, null, null, null, null, null, null, null),
      Row(3L, -1, -0.0, 0.0f, false, "", // empty string != null through the union
        java.sql.Date.valueOf("1970-01-01"),
        java.sql.Timestamp.valueOf("1970-01-01 00:00:00.000001"),
        java.time.LocalDateTime.parse("1970-01-01T00:00:00.000001")))
    // 4 partitions over 3 rows: at least one empty partition, so the
    // writer's skip-empty path and the reader's file-per-task path
    // both execute
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = Files.createTempDirectory("graft_avro").toString
    graft.io.Avro.write(df, dir)
    val back = graft.io.Avro.read(spark, dir, schema)
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      schema.fields.map(f => f.name -> f.dataType).toSeq)
    val got = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3)
    assert(got(1L).getTimestamp(7) == ts, "microsecond fidelity")
    assert(got(1L).getDate(6) == java.sql.Date.valueOf("2023-11-07"))
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(7))
    assert(got(3L).getString(5) == "")
    assert(got(3L).getTimestamp(7).getNanos == 1000, "1 micro survives")
    assert(got(1L).getAs[java.time.LocalDateTime](8) == ntz,
      "NTZ wall clock is exact")
  }

  test("avro sink refuses unsupported types and bad field names loudly") {
    import org.apache.spark.sql.types._
    val bin = StructType(Seq(StructField("payload", BinaryType)))
    intercept[IllegalArgumentException](graft.io.Avro.schemaJson(bin))
    val bad = StructType(Seq(StructField("has space", LongType)))
    intercept[IllegalArgumentException](graft.io.Avro.schemaJson(bad))
    // alias keys must name reader-schema fields, and alias values must
    // be Avro identifiers — refused at schema build, not at read time
    val ok = StructType(Seq(StructField("a", LongType)))
    intercept[IllegalArgumentException](
      graft.io.Avro.schemaJson(ok, Map("nope" -> "a")))
    intercept[IllegalArgumentException](
      graft.io.Avro.schemaJson(ok, Map("a" -> "bad name")))
  }

  test("avro evolution: alias rename + added-with-default across file generations") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val v1Schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("val_d", DoubleType),
      StructField("old_ts", TimestampType),
      StructField("old_day", DateType),
      StructField("note", StringType)))
    val preEpoch = java.sql.Timestamp.valueOf("1932-02-29 23:59:59.000001")
    val v1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2.5, preEpoch, java.sql.Date.valueOf("1933-01-02"), "n1"),
        Row(2L, null, null, null, null)), 2), v1Schema)
    val dir = Files.createTempDirectory("graft_avro_evolve").toString
    graft.io.Avro.write(v1, dir)
    // v2: val_d renamed to price_d, added nullable flag — old files
    // resolve the rename through the alias and the addition through
    // the null default; a NEW file written with v2 reads back through
    // the SAME call (mixed generations in one directory)
    val v2Schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price_d", DoubleType),
      StructField("old_ts", TimestampType),
      StructField("old_day", DateType),
      StructField("note", StringType),
      StructField("flag", IntegerType)))
    val v2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(3L, 9.0, null, null, "new", 7)), 1), v2Schema)
    graft.io.Avro.write(v2, dir)
    val back = graft.io.Avro.read(spark, dir, v2Schema,
      aliases = Map("price_d" -> "val_d"))
    val got = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3)
    assert(got(1L).getDouble(1) == 2.5, "alias rename resolved")
    assert(got(1L).getTimestamp(2) == preEpoch, "pre-1970 micros exact")
    assert(got(1L).getDate(3) == java.sql.Date.valueOf("1933-01-02"))
    assert(got(1L).isNullAt(5), "added field defaults to null on v1 files")
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(4), "null union survives")
    assert(got(3L).getDouble(1) == 9.0 && got(3L).getInt(5) == 7,
      "v2-written file reads through the same evolved call")
    // no stage leftovers: every attempt's temp file was committed or
    // cleaned — the speculation-safe protocol never leaves .tmp files
    val leftovers = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
