package graft

import java.nio.file.Files
import graft.ops.Compaction

/** Small-file compaction: sizing from the file listing, narrow
  * (shuffle-free) rewrite, content preservation.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges fragmented files toward the byte target, keeping rows") {
    val in = Files.createTempDirectory("compact_in").toString
    val out = Files.createTempDirectory("compact_out").toString
    val df = (1 to 1000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
    df.repartition(40).write.mode("overwrite").parquet(in)
    val (bytes, nIn) = Compaction.fileStats(spark, in)
    assert(nIn == 40 && bytes > 0)

    val nOut = Compaction.compact(spark, in, out, targetBytes = 64L << 20)
    assert(nOut == 1) // 40 tiny files fit one 64 MB target
    val (_, nOutFiles) = Compaction.fileStats(spark, out)
    assert(nOutFiles == 1)
    // every row survived the rewrite
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.select("id").as[Long].collect().sorted.toSeq == (1L to 1000L))
  }

  test("partitioned compaction rewrites only fragmented partitions, in place") {
    val root = Files.createTempDirectory("compact_part").toString
    // date=a: fragmented (20 files); date=b: already compact (1 file)
    (1 to 400).map(i => (i.toLong, "a")).toDF("id", "date")
      .repartition(20).write.partitionBy("date").mode("overwrite").parquet(root)
    (401 to 500).map(i => (i.toLong, "b")).toDF("id", "date")
      .coalesce(1).write.partitionBy("date").mode("append").parquet(root)
    val bBefore = Compaction.fileStats(spark, s"$root/date=b")
    val bNames = new java.io.File(s"$root/date=b").list().sorted.toSeq

    val done = Compaction.compactPartitioned(spark, root, targetBytes = 64L << 20)
    assert(done.map(_._1) == Seq("date=a")) // only the fragmented one
    assert(done.head._2 == 1)
    assert(Compaction.fileStats(spark, s"$root/date=a")._2 == 1)
    // untouched partition: same files, same bytes
    assert(Compaction.fileStats(spark, s"$root/date=b") == bBefore)
    assert(new java.io.File(s"$root/date=b").list().sorted.toSeq == bNames)
    // every row survived; the partition column still reads back
    val back = spark.read.parquet(root)
    assert(back.count() == 500)
    assert(back.filter($"date" === "a").count() == 400)
    assert(back.select("id").as[Long].collect().sorted.toSeq == (1L to 500L))
  }

  test("nested date=/hour= partitions compact per leaf; minFiles boundary holds") {
    val root = Files.createTempDirectory("compact_nested").toString
    // date=a/hour=1: fragmented (8 files) → compacted
    // date=a/hour=2: exactly minFiles (2 files)  → untouched
    // date=b/hour=1: single file                 → untouched
    (1 to 200).map(i => (i.toLong, "a", 1)).toDF("id", "date", "hour")
      .repartition(8).write.partitionBy("date", "hour").mode("overwrite").parquet(root)
    (201 to 240).map(i => (i.toLong, "a", 2)).toDF("id", "date", "hour")
      .repartition(2).write.partitionBy("date", "hour").mode("append").parquet(root)
    (241 to 260).map(i => (i.toLong, "b", 1)).toDF("id", "date", "hour")
      .coalesce(1).write.partitionBy("date", "hour").mode("append").parquet(root)
    val a2Before = Compaction.fileStats(spark, s"$root/date=a/hour=2")
    val a2Names = new java.io.File(s"$root/date=a/hour=2").list().sorted.toSeq
    assert(a2Before._2 == 2)

    val done = Compaction.compactPartitioned(spark, root, targetBytes = 64L << 20)
    // the multi-level leaf was found and rewritten; pre-fix the walk
    // stopped at date=a, saw only directories, and compacted nothing
    assert(done == Seq("date=a/hour=1" -> 1))
    assert(Compaction.fileStats(spark, s"$root/date=a/hour=1")._2 == 1)
    // exactly-minFiles partition untouched, byte-identical
    assert(Compaction.fileStats(spark, s"$root/date=a/hour=2") == a2Before)
    assert(new java.io.File(s"$root/date=a/hour=2").list().sorted.toSeq == a2Names)
    // the swap temp is gone; the trashed originals are RETAINED for
    // snapshot readers (hidden — the live read below never sees them)
    // and swept by the next maintenance pass
    assert(!new java.io.File(s"$root/date=a").list()
      .exists(_.endsWith("graft-compact-tmp")))
    assert(new java.io.File(s"$root/date=a").list()
      .count(_.endsWith("graft-compact-old")) == 1)
    Compaction.repairPartitioned(spark, root)
    assert(!new java.io.File(s"$root/date=a").list()
      .exists(_.contains("graft-compact")))
    // every row survived, both partition columns still read back
    val back = spark.read.parquet(root)
    assert(back.count() == 260)
    assert(back.filter($"date" === "a" && $"hour" === 1).count() == 200)
    assert(back.select("id").as[Long].collect().sorted.toSeq == (1L to 260L))
  }

  test("orphan recovery: a crash between the two swap renames is repaired on the next run") {
    val root = Files.createTempDirectory("compact_crash").toString
    (1 to 400).map(i => (i.toLong, "a")).toDF("id", "date")
      .repartition(20).write.partitionBy("date").mode("overwrite").parquet(root)
    (401 to 500).map(i => (i.toLong, "b")).toDF("id", "date")
      .repartition(10).write.partitionBy("date").mode("append").parquet(root)
    // simulate the worst crash point for date=a: the partition was
    // renamed to trash but the temp was never promoted — the partition
    // directory is ABSENT and all its data sits in the hidden trash
    val dir = new java.io.File(s"$root/date=a")
    assert(dir.renameTo(new java.io.File(s"$root/.date=a.graft-compact-old")))
    // plus a stale partial temp for the same partition
    val tmp = new java.io.File(s"$root/.date=a.graft-compact-tmp")
    assert(tmp.mkdir())
    Files.writeString(tmp.toPath.resolve("part-garbage.parquet"), "partial")
    assert(!dir.exists())

    val done = Compaction.compactPartitioned(spark, root, targetBytes = 64L << 20)
    // recovery restored date=a BEFORE the walk, so the run then saw its
    // 20 fragments and compacted both partitions normally
    assert(done.map(_._1).sorted == Seq("date=a", "date=b"))
    // the trashed originals are RETAINED after the swap (snapshot
    // readers pinned to the previous manifest resolve them there) —
    // hidden, so the live read never sees them as data ...
    assert(new java.io.File(root).list().count(_.endsWith("graft-compact-old")) == 2)
    assert(!new java.io.File(root).list().exists(_.endsWith("graft-compact-tmp")))
    val back = spark.read.parquet(root)
    assert(back.count() == 500)
    assert(back.select("id").as[Long].collect().sorted.toSeq == (1L to 500L))
    // ... and the NEXT maintenance pass sweeps them
    Compaction.repairPartitioned(spark, root)
    assert(!new java.io.File(root).list().exists(_.contains("graft-compact")))
    assert(spark.read.parquet(root).count() == 500)
  }

  test("orphan recovery: post-swap trash leftovers are swept without touching the live partition") {
    val root = Files.createTempDirectory("compact_sweep").toString
    (1 to 100).map(i => (i.toLong, "a")).toDF("id", "date")
      .coalesce(1).write.partitionBy("date").mode("overwrite").parquet(root)
    // a completed swap that crashed before deleting its trash: the
    // partition EXISTS, so the trash must be dropped, not restored
    val trash = new java.io.File(s"$root/.date=a.graft-compact-old")
    assert(trash.mkdir())
    Files.writeString(trash.toPath.resolve("part-old.parquet"), "stale")

    val done = Compaction.compactPartitioned(spark, root, targetBytes = 64L << 20)
    assert(done.isEmpty) // single-file partition: nothing to compact
    assert(!new java.io.File(root).list().exists(_.contains("graft-compact")))
    assert(spark.read.parquet(root).count() == 100)
  }

  test("target sizing: ceil(bytes/target) output files, floor of 1") {
    val in = Files.createTempDirectory("compact_sz_in").toString
    val out = Files.createTempDirectory("compact_sz_out").toString
    (1 to 500).map(i => (i.toLong, "x" * 100)).toDF("id", "pad")
      .repartition(10).write.mode("overwrite").parquet(in)
    val (bytes, _) = Compaction.fileStats(spark, in)
    // target = ~half the data → 2 files (narrow coalesce, no shuffle)
    val nOut = Compaction.compact(spark, in, out, targetBytes = (bytes + 1) / 2)
    assert(nOut == 2)
    assert(Compaction.fileStats(spark, out)._2 == 2)
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, out, targetBytes = 0)
    }
  }
}
