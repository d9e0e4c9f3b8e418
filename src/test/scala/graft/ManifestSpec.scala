package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{Manifest, Sinks}
import graft.ops.{Compaction, Layout}

/** Snapshot-isolated reads over the rename-swap write family: readers
  * resolve a COMMITTED manifest (version pointer committed by one
  * rename) instead of listing directories, and the writers retain the
  * swapped-out originals until the next maintenance pass — so a reader
  * pinned to the previous snapshot stays consistent through the swap
  * window where a directory-listing reader observes a vanished
  * partition.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("city", "country", "ts")

  private def temps(dir: String): Map[String, Double] =
    spark.read.parquet(dir).select("city", "temp")
      .as[(String, Double)].collect().toMap
  private def mtemps(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.select("city", "temp").as[(String, Double)].collect().toMap

  test("upsert commits versions; pinned reader survives the swap; vacuumed snapshot refuses loudly") {
    val dir = Files.createTempDirectory("graft_manifest_up").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    val base = Seq(
      ("London", "GB", 1L, 15.5, "2023-11-01"),
      ("Tokyo", "JP", 1L, 22.3, "2023-11-02")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")
    assert(Manifest.latestVersion(spark, dir).contains(1L))
    assert(mtemps(Manifest.read(spark, dir)) ==
      Map("London" -> 15.5, "Tokyo" -> 22.3))

    // v2 merge touches only date=2023-11-02; its old file is retained
    // in the hidden trash sibling
    val batch = Seq(("Tokyo", "JP", 1L, 30.0, "2023-11-02"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, batch, dir, keys, "date")
    assert(Manifest.latestVersion(spark, dir).contains(2L))
    assert(mtemps(Manifest.read(spark, dir)) ==
      Map("London" -> 15.5, "Tokyo" -> 30.0))
    // the PREVIOUS snapshot still resolves — its superseded file is in
    // the retained trash, its untouched file still live
    assert(mtemps(Manifest.readVersion(spark, dir, 1L)) ==
      Map("London" -> 15.5, "Tokyo" -> 22.3),
      "v1 must stay readable after the v2 swap (trash retained)")
    // schema parity: the fallback path re-attaches the partition column
    // with the live side's discovered type
    assert(Manifest.readVersion(spark, dir, 1L).schema ==
      spark.read.parquet(dir).schema)

    // the vanished-dir window: partition renamed to trash, replacement
    // not yet in place. A directory-listing reader loses the partition;
    // the manifest reader resolves it from the trash sibling.
    fs.delete(p(".date=2023-11-02.graft-upsert-old"), true) // drop v1's retained copy
    require(fs.rename(p("date=2023-11-02"), p(".date=2023-11-02.graft-upsert-old")))
    assert(temps(dir) == Map("London" -> 15.5),
      "precondition: the naive reader observes the vanished partition")
    assert(mtemps(Manifest.readVersion(spark, dir, 2L)) ==
      Map("London" -> 15.5, "Tokyo" -> 30.0),
      "the manifest reader must stay consistent mid-swap")
    // v1 was vacuumed above — refused with the version named, never a
    // silently partial table
    val e = intercept[IllegalStateException](
      Manifest.readVersion(spark, dir, 1L).count())
    assert(e.getMessage.contains("v1") && e.getMessage.contains("vacuumed"))

    // repair restores the stranded partition; reads agree again
    Sinks.repairPartitionedUpsert(spark, dir)
    assert(temps(dir) == mtemps(Manifest.read(spark, dir)))
  }

  test("compaction snapshots: pinned reader sees pre-compaction files through the rewrite") {
    val root = Files.createTempDirectory("graft_manifest_comp").toString
    (1 to 100).map(i => (i.toLong, "a")).toDF("id", "date")
      .coalesce(1).write.partitionBy("date").mode("overwrite").parquet(root)
    // first maintenance run: nothing to rewrite, but the manifest read
    // path is established (v1 = the single file)
    assert(Compaction.compactPartitioned(spark, root, targetBytes = 64L << 20).isEmpty)
    assert(Manifest.latestVersion(spark, root).contains(1L))

    (101 to 200).map(i => (i.toLong, "a")).toDF("id", "date")
      .coalesce(1).write.partitionBy("date").mode("append").parquet(root)
    val done = Compaction.compactPartitioned(spark, root,
      targetBytes = 64L << 20, minFiles = 1)
    assert(done.map(_._1) == Seq("date=a"))
    assert(Manifest.latestVersion(spark, root).contains(2L))
    // the latest snapshot is the compacted table; the PINNED v1 reader
    // resolves its one original file inside the retained trash and sees
    // exactly the pre-append, pre-compaction content
    assert(Manifest.read(spark, root).count() == 200)
    val v1 = Manifest.readVersion(spark, root, 1L)
    assert(v1.count() == 100 &&
      v1.select(max(col("id"))).head().getLong(0) == 100L,
      "v1 must be the snapshot at its commit, not the current table")
    // next maintenance pass sweeps the trash: v1 then refuses loudly
    Compaction.repairPartitioned(spark, root)
    intercept[IllegalStateException](Manifest.readVersion(spark, root, 1L).count())
  }

  test("rewriteInPlace: manifest survives the root swap and reads resolve while the root is vanished") {
    val parent = Files.createTempDirectory("graft_manifest_rl").toString
    val dir = s"$parent/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 50L).toDF("id").write.parquet(dir)
    Manifest.commit(spark, dir)
    Layout.rewriteInPlace(spark, dir) { tmp =>
      Layout.writeRangeSorted(spark.read.parquet(dir), tmp, nFiles = 2,
        keyCol = "id")
    }
    // history preserved across the root swap, new version committed
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
    // pinned pre-rewrite reader resolves the old root's files in the
    // retained relayout trash
    assert(Manifest.readVersion(spark, dir, 1L)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 50L))

    // the rewrite family's vanished-ROOT window: target renamed away,
    // replacement not yet renamed in. The naive reader has no path to
    // read; the manifest reader resolves versions AND files from the
    // trash sibling.
    val target = new org.apache.hadoop.fs.Path(dir)
    val trash = new org.apache.hadoop.fs.Path(parent, ".t.graft-relayout-old")
    fs.delete(trash, true) // drop the retained previous version
    require(fs.rename(target, trash))
    assert(!fs.exists(target))
    assert(Manifest.read(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 50L),
      "the manifest reader must resolve through the mid-rewrite window")
    // crash recovery restores, reads agree again
    assert(Layout.restoreIfCrashed(spark, dir))
    assert(Manifest.read(spark, dir).count() == 50L)
  }

  test("vacuum: retained snapshots stay readable, dropped ones refuse, crash state refuses the sweep") {
    val dir = Files.createTempDirectory("graft_manifest_vac").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = Seq(
      ("London", "GB", 1L, 15.5, "2023-11-01"),
      ("Tokyo", "JP", 1L, 22.3, "2023-11-02")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")
    val batch = Seq(("Tokyo", "JP", 1L, 30.0, "2023-11-02"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, batch, dir, keys, "date")
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))

    // crash state fences the sweep: vacuum must not bury a swap the
    // owning writer hasn't repaired
    val marker = new org.apache.hadoop.fs.Path(s"$dir/.graft-upsert-txn")
    fs.create(marker, true).close()
    val eCrash = intercept[IllegalStateException](Manifest.vacuum(spark, dir))
    assert(eCrash.getMessage.contains("crash state"))
    fs.delete(marker, false)

    // retention 2 keeps BOTH snapshots fully readable: v1's superseded
    // file lives in trash and is REFERENCED by the retained v1 manifest,
    // so the sweep must not touch it
    val (d2, del2, kept2) = Manifest.vacuum(spark, dir, retainVersions = 2)
    assert(d2 == 0 && del2 == 0 && kept2 >= 1,
      s"retention-2 vacuum must keep v1's trash file (dropped=$d2, " +
        s"deleted=$del2, kept=$kept2)")
    assert(mtemps(Manifest.readVersion(spark, dir, 1L)) ==
      Map("London" -> 15.5, "Tokyo" -> 22.3),
      "v1 must survive a vacuum that retains it")

    // retention 1 drops v1: its manifest goes, its now-unreferenced
    // trash file is reclaimed, and the pinned reader gets the loud
    // refusal — while the latest read is untouched
    val (d1, del1, _) = Manifest.vacuum(spark, dir, retainVersions = 1)
    assert(d1 == 1 && del1 >= 1)
    val e = intercept[Exception](Manifest.readVersion(spark, dir, 1L).count())
    assert(e.getMessage.contains("v1"))
    assert(mtemps(Manifest.read(spark, dir)) ==
      Map("London" -> 15.5, "Tokyo" -> 30.0),
      "the live table must read identically after vacuum")
    assert(temps(dir) == mtemps(Manifest.read(spark, dir)))
    // idempotent: a second vacuum finds nothing to do
    assert(Manifest.vacuum(spark, dir, retainVersions = 1) == ((0, 0, 0)))
  }

  test("vacuum vs an OPEN pinned reader: retained pin stays exact, dropped pin fails loudly, never partial") {
    // the composition an index-maintenance consumer creates: a snapshot
    // plan (readVersion) constructed BEFORE a vacuum and executed AFTER
    // it — the shape of dedup_incremental_indexed's standing-corpus
    // reader held across a maintenance window. Vacuum cannot see open
    // readers (no lock protocol, single writer assumed); the contract
    // is therefore per-version: a pin on a RETAINED version reads
    // exactly through the sweep, a pin on a DROPPED version must fail
    // loudly at execution (its reclaimed files are missing and
    // ignoreMissingFiles stays false) — silent partial results are the
    // one forbidden outcome.
    val dir = Files.createTempDirectory("graft_manifest_pin").toString + "/t"
    val base = Seq(
      ("London", "GB", 1L, 15.5, "2023-11-01"),
      ("Tokyo", "JP", 1L, 22.3, "2023-11-02")
    ).toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date") // v1
    Sinks.upsertPartitioned(spark,
      Seq(("Tokyo", "JP", 1L, 30.0, "2023-11-02"))
        .toDF("city", "country", "ts", "temp", "date"), dir, keys, "date") // v2
    Sinks.upsertPartitioned(spark,
      Seq(("Tokyo", "JP", 1L, 31.0, "2023-11-02"))
        .toDF("city", "country", "ts", "temp", "date"), dir, keys, "date") // v3

    // (v1's superseded file was already reclaimed by v3's implicit
    // write-time sweep — the window that stays pinnable is the trailing
    // retention, so the open pins are v2 and v3)
    val pinnedDrop = Manifest.readVersion(spark, dir, 2L)
    val pinnedKeep = Manifest.readVersion(spark, dir, 3L)
    val (d, _, _) = Manifest.vacuum(spark, dir, retainVersions = 1)
    assert(d >= 1, s"expected v2 (at least) dropped, got $d")

    // retained open pin: exact through the sweep
    assert(mtemps(pinnedKeep) == Map("London" -> 15.5, "Tokyo" -> 31.0),
      "a retained pinned snapshot must read exactly after vacuum")
    // dropped open pin: either the plan throws (reclaimed file) or —
    // had the sweep happened to keep every file — reads EXACTLY; a
    // partial table fails this match on the Left branch
    (try Left(mtemps(pinnedDrop)) catch { case e: Exception => Right(e) }) match {
      case Left(m) => assert(m == Map("London" -> 15.5, "Tokyo" -> 30.0),
        s"dropped pin returned a PARTIAL table: $m")
      case Right(_) => () // loud failure is the expected outcome
    }
    // and a RE-derived pin on the dropped version refuses by name
    val e = intercept[IllegalStateException](
      Manifest.readVersion(spark, dir, 2L).count())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("all-trash snapshot types partition columns from the committed #ptype header") {
    val dir = Files.createTempDirectory("graft_manifest_pt").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    val base = Seq(("London", "GB", 1L, 15.5, "2023-11-01"))
      .toDF("city", "country", "ts", "temp", "date")
    Sinks.upsertPartitioned(spark, base, dir, keys, "date")
    val discovered = spark.read.parquet(dir).schema
    // EVERY partition mid-swap at once: no live side at all. The
    // committed #ptype header must still type the re-attached
    // partition column exactly as the directory read did (DATE here,
    // where the pre-header fallback silently degraded to string).
    require(fs.rename(p("date=2023-11-01"),
      p(".date=2023-11-01.graft-upsert-old")))
    val snap = Manifest.read(spark, dir)
    assert(snap.schema.fields.find(_.name == "date").get.dataType ==
      discovered.fields.find(_.name == "date").get.dataType,
      s"all-trash resolution must keep the committed partition type; " +
        s"got ${snap.schema.catalogString}")
    assert(mtemps(snap) == Map("London" -> 15.5))
    Sinks.repairPartitionedUpsert(spark, dir)
  }

  test("snapshot reads exclude files appended after the commit") {
    val root = Files.createTempDirectory("graft_manifest_app").toString + "/t"
    (1L to 10L).toDF("id").write.parquet(root)
    Manifest.commit(spark, root)
    (11L to 20L).toDF("id").write.mode("append").parquet(root)
    // the directory reader sees the append; the committed snapshot
    // does not — it is a FILE list, not a directory pointer
    assert(spark.read.parquet(root).count() == 20L)
    assert(Manifest.read(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 10L))
    Manifest.commit(spark, root)
    assert(Manifest.read(spark, root).count() == 20L)
  }
}
