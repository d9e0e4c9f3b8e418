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

  /** Partitioned-table form — the shape a 100-TB table actually needs:
    * each `col=value` partition directory is compacted INDEPENDENTLY
    * and IN PLACE, so maintenance of a years-deep table is incremental
    * and restartable (one small job per fragmented partition, never a
    * single table-wide rewrite), and partitions already at or under
    * `minFiles` files are not touched at all — their files stay
    * byte-identical.
    *
    * The in-place rewrite reads a partition and overwrites the same
    * directory, so the merged rows cross an EAGER localCheckpoint
    * barrier first: the write must never hold a lineage dependency on
    * the files it is about to delete (the same invariant as the upsert
    * sinks — a cache is not a crash barrier).
    *
    * Returns (partition directory name, output file count) for each
    * partition that was rewritten.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long,
                         minFiles: Int = 2): Seq[(String, Int)] = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    partDirs.toSeq.flatMap { d =>
      val (bytes, nFiles) = fileStats(spark, d.getPath.toString)
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (nFiles <= math.max(minFiles - 1, nOut)) None
      else {
        val merged = spark.read.parquet(d.getPath.toString)
          .coalesce(nOut).localCheckpoint(true)
        merged.write.mode("overwrite").parquet(d.getPath.toString)
        Some(d.getPath.getName -> nOut)
      }
    }
  }
}
