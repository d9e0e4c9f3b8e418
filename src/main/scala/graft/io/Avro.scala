package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, date_from_unix_date, timestamp_micros}
import org.apache.spark.sql.types._

/** Avro container-file sink/source built directly on the public Avro
  * Java API (`org.apache.avro:avro`, shipped with Spark) — the
  * `spark-avro` connector module is not on this classpath, so the
  * format round trip is implemented at the task level instead:
  *
  *   - '''write''': one Avro object-container file per non-empty input
  *     partition (`part-<pid>-<jobId>.avro` through the Hadoop FileSystem API,
  *     so the same code targets local disk, HDFS, or an object store;
  *     tasks use the JOB's Hadoop configuration — shipped via a
  *     serializable wrapper — so `spark.hadoop.*` object-store
  *     credentials and custom `fs.<scheme>.impl` settings reach the
  *     executors exactly as they reach the driver). Each task ATTEMPT
  *     stages to an attempt-unique temp name and renames into place on
  *     success: two speculative attempts of one partition never hold
  *     the same file open (interleaved writes to a shared container
  *     file would corrupt it), the rename is the commit point, and a
  *     loser whose rename finds the winner's file already landed
  *     treats that as success — idempotent under both sequential retry
  *     and concurrent speculation.
  *   - '''read''': the driver lists only FILE NAMES (bounded by the
  *     writing job's partition count, never row data), then each task
  *     streams one container file through `DataFileStream` — the read
  *     is as distributed as the write was.
  *
  * Temporal fidelity without relying on Avro logical-type conversion
  * machinery: timestamps travel as `timestamp-micros` longs and dates
  * as epoch-day ints (both annotated with the standard Avro
  * `logicalType` for interop with other readers), and the DataFrame
  * side restores them with the codegen'd `timestamp_micros` /
  * `date_from_unix_date` built-ins — exact to the microsecond, no
  * JVM-timezone round trip anywhere.
  *
  * Supported Spark types: long, int, double, float, boolean, string,
  * date, timestamp (nullable or not — nullable fields map to the
  * canonical `["null", T]` union). Anything else is refused loudly at
  * plan time, not corrupted at write time.
  */
object Avro {

  /** Hadoop `Configuration` is not `Serializable`; this wrapper ships
    * the DRIVER's configuration (session conf + `spark.hadoop.*`) to
    * tasks via Hadoop's own wire format, so executor-side FileSystem
    * lookups resolve credentials and scheme impls identically to the
    * driver — a bare `new Configuration()` in a task would silently
    * drop everything configured through Spark.
    */
  private[graft] class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  private[graft] def typeJson(dt: DataType): String = dt match {
    case LongType      => "\"long\""
    case IntegerType   => "\"int\""
    case DoubleType    => "\"double\""
    case FloatType     => "\"float\""
    case BooleanType   => "\"boolean\""
    case StringType    => "\"string\""
    case DateType      => """{"type":"int","logicalType":"date"}"""
    case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
    // Avro's local-timestamp-micros IS Spark's TIMESTAMP_NTZ: wall-clock
    // micros since 1970-01-01T00:00, no zone — encoded/decoded with a
    // fixed UTC offset, so the wire value never depends on JVM or
    // session timezone. (The read-side restoration cast renders in the
    // session zone; every graft entry point pins UTC.)
    case TimestampNTZType =>
      """{"type":"long","logicalType":"local-timestamp-micros"}"""
    case other => throw new IllegalArgumentException(
      s"avro sink: unsupported Spark type $other (supported: long, int, " +
        "double, float, boolean, string, date, timestamp, timestamp_ntz)")
  }

  /** Avro record-schema JSON for a Spark schema. Field names must
    * already be Avro-legal identifiers — refused otherwise rather than
    * silently mangled, so the read-back schema always matches.
    * `aliases` maps a (reader-side) field name to the name it carried
    * in older writer schemas — standard Avro rename resolution — and
    * nullable fields carry `"default": null`, so a reader schema field
    * absent from a file's writer schema resolves to null instead of
    * failing (standard added-column evolution).
    */
  private[graft] def schemaJson(st: StructType,
                                aliases: Map[String, String] = Map.empty): String = {
    aliases.keys.foreach(a => require(st.fieldNames.contains(a),
      s"avro: alias key '$a' is not a field of the schema"))
    val fields = st.fields.map { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"avro sink: field name '${f.name}' is not an Avro identifier")
      val t =
        if (f.nullable) s"""["null",${typeJson(f.dataType)}]"""
        else typeJson(f.dataType)
      val dflt = if (f.nullable) ""","default":null""" else ""
      val al = aliases.get(f.name).map { old =>
        require(old.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"avro: alias '$old' is not an Avro identifier")
        s""","aliases":["$old"]"""
      }.getOrElse("")
      s"""{"name":"${f.name}","type":$t$dflt$al}"""
    }.mkString(",")
    s"""{"type":"record","name":"graft_avro","fields":[$fields]}"""
  }

  /** External Row value → Avro primitive. Temporal values leave as
    * integers; both the legacy (`java.sql.*`) and Java-8
    * (`Instant`/`LocalDate`) external types are accepted so the sink
    * does not depend on `spark.sql.datetime.java8API.enabled`.
    */
  private def toAvro(v: Any): Any = v match {
    case null                  => null
    case s: String             => s
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case i: java.time.Instant  => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: java.time.LocalDateTime =>
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
    case d: java.sql.Date      => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case other                 => other // long/int/double/float/boolean
  }

  /** Avro decoded value → raw external value (strings arrive as
    * `org.apache.avro.util.Utf8`; temporals stay int/long and are
    * restored to Catalyst types by the built-ins in [[read]]).
    */
  private def fromAvro(v: Any): Any = v match {
    case null                => null
    case u: CharSequence     => u.toString
    case other               => other
  }

  /** Raw wire type per field: what the Avro file actually carries. */
  private def rawType(dt: DataType): DataType = dt match {
    case DateType         => IntegerType
    case TimestampType    => LongType
    case TimestampNTZType => LongType
    case other            => other
  }

  /** Write `df` as one Avro container file per non-empty partition
    * under `path`. The schema translation happens ONCE on the driver
    * (schema errors surface before any task runs); each task parses
    * the schema JSON locally and streams its rows straight to the
    * file — no per-row reflection, no driver materialization.
    */
  def write(df: DataFrame, path: String): Unit = {
    val json = schemaJson(df.schema)
    val names = df.schema.fields.map(_.name)
    val confSer = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // job-unique part-name component (Spark's own part-file
    // convention): a task RETRY within this job re-creates the same
    // final name (idempotent), while a SECOND write() call into the
    // same directory appends a new file generation instead of
    // silently overwriting the first — the read side lists *.avro
    // and resolves each file's writer schema independently
    val jobId = java.util.UUID.randomUUID().toString
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val avroSchema = new Schema.Parser().parse(json)
        val tc = TaskContext.get()
        val dest = new Path(path, f"part-${tc.partitionId()}%05d-$jobId.avro")
        // attempt-unique stage name: concurrent speculative attempts
        // never share a file handle; the terminal rename is the commit
        val stage = new Path(path,
          f".part-${tc.partitionId()}%05d-$jobId-attempt-${tc.taskAttemptId()}.avro.tmp")
        val fs = dest.getFileSystem(confSer.value)
        val out = fs.create(stage, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        try {
          try {
            w.create(avroSchema, out)
            rows.foreach { r =>
              val rec = new GenericData.Record(avroSchema)
              var i = 0
              while (i < names.length) {
                rec.put(names(i), toAvro(r.get(i)))
                i += 1
              }
              w.append(rec)
            }
          } finally w.close() // also closes the FS stream
          // commit: rename wins or another attempt already landed the
          // same partition's (identical) output — both are success
          if (!fs.rename(stage, dest)) {
            require(fs.exists(dest),
              s"avro sink: commit rename $stage -> $dest failed")
            fs.delete(stage, false)
          }
        } finally fs.delete(stage, false) // no-op when committed
      }
    }
  }

  /** Read the Avro container files under `path` back into a DataFrame
    * with `schema`. One task per file (the write-side partitioning is
    * the read-side parallelism); temporal columns are restored from
    * their wire integers with codegen'd built-ins.
    *
    * `schema` is the READER schema in the Avro-resolution sense, so
    * standard schema evolution applies per file: a field the file's
    * writer schema lacks resolves to its default (null for nullable
    * fields — added-column evolution), and a field listed in
    * `aliases` (new name → the name older files wrote) resolves
    * through the rename. Files written with the current schema and
    * files written before the evolution read back through ONE call.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           aliases: Map[String, String] = Map.empty): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted.toSeq
    val names = schema.fields.map(_.name)
    val raw = StructType(schema.fields.map(f =>
      f.copy(dataType = rawType(f.dataType))))
    val readerJson = schemaJson(schema, aliases)
    val confSer = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.length, 1))
      .flatMap { fstr =>
        val p = new Path(fstr)
        val in = p.getFileSystem(confSer.value).open(p)
        val readerSchema = new Schema.Parser().parse(readerJson)
        // expected = reader schema; the file header supplies the
        // writer schema — Avro resolution handles default/alias fields
        val rdr = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord](null, readerSchema))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = rdr.hasNext
            if (!h) rdr.close()
            h
          }
          def next(): Row = {
            val rec = rdr.next()
            Row.fromSeq(names.toIndexedSeq.map(n => fromAvro(rec.get(n))))
          }
        }
      }
    spark.createDataFrame(rdd, raw).select(schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case TimestampType => timestamp_micros(col(f.name)).as(f.name)
        case TimestampNTZType =>
          timestamp_micros(col(f.name)).cast(TimestampNTZType).as(f.name)
        case DateType      => date_from_unix_date(col(f.name)).as(f.name)
        case _             => col(f.name)
      }
    }: _*)
  }
}
