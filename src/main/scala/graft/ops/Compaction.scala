package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance operator every
  * long-lived 100-TB dataset needs: streaming sinks and per-batch
  * appends accumulate thousands of small files, and scan cost is
  * driven by file COUNT (footer reads, task scheduling, open/close)
  * long before it is driven by bytes.
  *
  * Sizing comes from the file-system LISTING (driver metadata — one
  * RPC per directory, never a data scan): target file count =
  * ceil(total bytes / targetBytes). The rewrite uses coalesce, not
  * repartition — compaction is a narrow merge of existing partitions
  * and must not pay a full shuffle of the data it is merging;
  * coalesce's partition imbalance is bounded by the input files'
  * own size skew, which for append-accumulated small files is small.
  */
object Compaction {

  /** Total bytes + file count of the parquet data files under `path`
    * (driver-side listing; `_`-prefixed metadata files excluded).
    */
  def fileStats(spark: SparkSession, path: String): (Long, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    (files.map(_.getLen).sum, files.length)
  }

  /** Rewrite `inPath` → `outPath` with files sized toward
    * `targetBytes`. Returns the chosen output file count.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val (bytes, _) = fileStats(spark, inPath)
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    nOut
  }

  /** Compact and return the result relation (for registry queries that
    * verify the rewrite preserved every row).
    */
  def compactAndRead(spark: SparkSession, inPath: String, outPath: String,
                     targetBytes: Long): DataFrame = {
    compact(spark, inPath, outPath, targetBytes)
    spark.read.parquet(outPath)
  }

  /** Leaf partition directories under `root`: `col=value` directories
    * that contain no further `col=value` subdirectories — the
    * directories that hold data files in a (possibly multi-level,
    * `date=…/hour=…`) Hive layout. Driver-side listing only.
    */
  private def leafPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                                root: Path): Seq[Path] = {
    def isPart(s: org.apache.hadoop.fs.FileStatus): Boolean =
      s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith(".") // hidden ≠ partition (e.g. compact temp/trash)
    def walk(dir: Path): Seq[Path] = {
      val subParts = fs.listStatus(dir).filter(isPart)
      if (subParts.isEmpty) Seq(dir)
      else subParts.toSeq.flatMap(s => walk(s.getPath))
    }
    fs.listStatus(root).filter(isPart).toSeq.flatMap(s => walk(s.getPath))
  }

  private val TmpSuffix = ".graft-compact-tmp"
  private val TrashSuffix = ".graft-compact-old"

  /** Crash recovery for [[compactPartitioned]]: a crash between
    * rename(partition → trash) and rename(tmp → partition) leaves the
    * partition directory ABSENT with its data stranded in the hidden
    * trash sibling — and since leafPartitionDirs only walks existing
    * `col=value` dirs, no later run would ever revisit it. So every
    * run starts by walking ALL directories for orphaned
    * `.<name>.graft-compact-{old,tmp}` siblings: a trash dir whose
    * partition is missing is renamed back into place (the originals
    * are always complete — they were never touched until fully
    * replaced); any remaining tmp/trash leftovers are deleted (tmp is
    * either a partial write with the partition intact, or a completed
    * swap's pre-delete leftover — both safe to drop once the
    * partition dir exists again). Returns the restored partitions.
    */
  private def recoverOrphans(fs: org.apache.hadoop.fs.FileSystem,
                             root: Path): Seq[Path] = {
    def walk(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir).filter(_.isDirectory).toSeq
      val restored = entries
        .filter(_.getPath.getName.endsWith(TrashSuffix))
        .flatMap { s =>
          val name = s.getPath.getName
            .stripPrefix(".").stripSuffix(TrashSuffix)
          val part = new Path(dir, name)
          if (!fs.exists(part)) {
            require(fs.rename(s.getPath, part),
              s"compactPartitioned: orphan recovery ${s.getPath} -> $part failed")
            Some(part)
          } else { fs.delete(s.getPath, true); None }
        }
      entries.filter(_.getPath.getName.endsWith(TmpSuffix))
        .foreach(s => fs.delete(s.getPath, true))
      restored ++ entries
        .filter(s => s.getPath.getName.contains("=") &&
          !s.getPath.getName.startsWith("."))
        .flatMap(s => walk(s.getPath))
    }
    walk(root)
  }

  /** Run ONLY the crash recovery of [[compactPartitioned]] (restore
    * orphaned trash partitions, drop stale temps) without compacting.
    * Any writer that mode-appends into a partitioned table maintained
    * by compaction must call this first: an append into a
    * crash-stranded partition would recreate the directory with only
    * the new rows, and the next compaction's recovery would then
    * delete the stranded originals as superseded.
    */
  def repairPartitioned(spark: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) recoverOrphans(fs, root)
  }

  /** Partitioned-table form — the shape a 100-TB table actually needs:
    * each LEAF partition directory (multi-level `date=…/hour=…` layouts
    * included) is compacted INDEPENDENTLY, so maintenance of a
    * years-deep table is incremental and restartable (one small job per
    * fragmented partition, never a single table-wide rewrite).
    * Partitions with `minFiles` or fewer files are not touched at all —
    * their files stay byte-identical.
    *
    * Durability: the merged output is fully written to a hidden TEMP
    * sibling first, then swapped in with two metadata renames (old →
    * trash, temp → partition) before the old files are deleted — the
    * original bytes exist on disk at every instant, and a crash at any
    * point is repaired by [[recoverOrphans]] on the next run. A
    * localCheckpoint would not give this: checkpoint blocks live on
    * executors, so an executor loss mid-overwrite would leave the
    * partition partially deleted and unrecomputable — lineage
    * truncation is not durability.
    *
    * Readers: a directory-listing reader racing the swap can still
    * observe the partition briefly absent between the two renames —
    * snapshot-consistent reads go through [[graft.io.Manifest]]: each
    * run commits a manifest after its rewrites, and the trashed
    * originals are RETAINED until the next run's recovery sweep, so a
    * reader pinned to the previous snapshot resolves its files (live
    * or trash) at every instant of the swap.
    *
    * Returns (root-relative partition path, output file count) for each
    * partition that was rewritten.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long,
                         minFiles: Int = 2): Seq[(String, Int)] = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(root).toUri
    recoverOrphans(fs, root)
    val done = leafPartitionDirs(fs, root).flatMap { d =>
      val (bytes, nFiles) = fileStats(spark, d.toString)
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (nFiles <= math.max(minFiles, nOut)) None
      else {
        // dot-prefixed siblings are invisible to Spark's file listing,
        // so readers never see the temp or the trashed originals as
        // DATA
        val tmp = new Path(d.getParent, s".${d.getName}$TmpSuffix")
        val trash = new Path(d.getParent, s".${d.getName}$TrashSuffix")
        fs.delete(tmp, true); fs.delete(trash, true)
        spark.read.parquet(d.toString).coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        require(fs.rename(d, trash), s"compactPartitioned: rename $d -> $trash failed")
        require(fs.rename(tmp, d), s"compactPartitioned: rename $tmp -> $d failed")
        // trash RETAINED (swept by the next run's recoverOrphans):
        // a Manifest reader pinned to the pre-compaction snapshot
        // resolves the original files there through and after the swap
        val rel = rootUri.relativize(fs.makeQualified(d).toUri).getPath
          .stripSuffix("/")
        Some(rel -> nOut)
      }
    }
    // record the new file set once per maintenance run (first run also
    // commits even when nothing needed rewriting, so the manifest read
    // path exists for the table from then on)
    if (done.nonEmpty || graft.io.Manifest.latestVersion(spark, path).isEmpty)
      graft.io.Manifest.commit(spark, path)
    done
  }
}
