package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index — the production serving shape of
  * [[Similarity.ivfTopK]]: centroid training and bucket assignment are
  * paid ONCE at build time, written to storage, and every later probe
  * touches only its probed buckets. At 100 TB this is the difference
  * between "each ANN query re-clusters the corpus" and "each ANN query
  * reads a few bucket partitions":
  *
  *   - `assignments/` — (vec_id, bucket), laid out range-sorted by
  *     vec_id ([[Layout.writeRangeSorted]]) so a probe-id predicate
  *     file-prunes instead of scanning every assignment;
  *   - `members/` — (vec_id, v, nrm) PARTITIONED BY bucket, so the
  *     candidate fetch is directory-level partition pruning (Spark's
  *     dynamic partition pruning turns the broadcast probed-bucket set
  *     into a partition filter — no collect, no manual pruning);
  *   - `centroids/` — (cid, cv, cnrm), the trained model, broadcast-
  *     sized by construction (needed to bucket out-of-corpus queries;
  *     in-corpus probes already know their bucket from `assignments`).
  *
  * Probe results are byte-identical to [[Similarity.ivfTopK]] on the
  * same corpus/params — same deterministic centroid seed, same
  * sequential-fold cosine — so the two share one DuckDB oracle.
  */
object AnnIndex {

  /** Train + assign + lay out the index under `dir` (one corpus scan
    * for assignment, one range shuffle + one partitioned write).
    */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            nCentroids: Int, dir: String): Unit = {
    require(nCentroids > 0, s"nCentroids must be positive, got $nCentroids")
    val spark = emb.sparkSession
    val all = Similarity.prepared(emb, idCol, vecCol)
    val cent = all.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // an absent seed id would silently produce an empty, useless index
    // (every probe would return 0 rows) — refuse loudly instead, the
    // same precondition contract as pqTopK's codebook seeding. Count
    // DISTINCT ids: duplicate seed ids must not mask a missing one
    require(cent.agg(countDistinct(col("cid"))).head().getLong(0) == nCentroids,
      s"centroid seeding needs vec ids 0..${nCentroids - 1} present in the corpus")
    cent.write.mode("overwrite").parquet(s"$dir/centroids")
    // the corpus-by-centroid assignment aggregate is the dominant build
    // cost — materialize it ONCE (the assignments write) and derive the
    // members layout from the written relation, so the two outputs are
    // also guaranteed consistent with each other
    val asg = Similarity.ivfAssign(emb, idCol, vecCol, nCentroids)
    Layout.writeRangeSorted(asg, s"$dir/assignments", nFiles = 8, keyCol = "vec_id")
    spark.read.parquet(s"$dir/assignments").join(all, "vec_id")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/members")
  }

  /** Append a batch of NEW vectors to an existing index WITHOUT a
    * rebuild — the daily-ingest path ([[DedupIndex.append]]'s
    * incremental-state-beats-recompute contract for the vector side;
    * without it every day of new embeddings forces a full corpus
    * re-cluster + rewrite):
    *
    *  - the batch is assigned against the STORED `centroids/` (the
    *    trained model — broadcast-sized by construction, the corpus is
    *    never re-read), with the exact [[Similarity.ivfAssign]]
    *    arithmetic, so an appended vector lands in the same bucket a
    *    rebuild would give it;
    *  - `assignments/` gains the batch's rows (each appended file
    *    internally vec_id-sorted; file pruning degrades from
    *    range-disjoint to per-file min/max until the next [[build]] —
    *    the established degrade-then-re-layout contract);
    *  - `members/` gains rows in EXACTLY the bucket partitions the
    *    batch lands in (a partitionBy append touches only those
    *    directories — pinned in OpsSpec), so probe-side dynamic
    *    partition pruning keeps working unchanged.
    */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             dir: String): Unit = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val cs = graft.functions.GraftFunctions.cosineSim _
    // mode-append writes would silently recreate directories a crashed
    // relayout left stranded in trash siblings — repair both sub-tables
    // before touching them
    Layout.restoreIfCrashed(spark, s"$dir/assignments")
    Compaction.repairPartitioned(spark, s"$dir/members")
    val all = Similarity.prepared(batch, idCol, vecCol).localCheckpoint(true)
    // duplicate ids within the batch would collapse to one row in the
    // assignment aggregate but fan back out in the asg.join(all)
    // members write — duplicate member rows (a probe returns one
    // neighbor at several ranks, exactly what the retry state machine
    // below exists to prevent) and skewed nPrior/nBatch retry counts.
    // Same countDistinct discipline as build's centroid seeding.
    val nAll = all.count()
    require(all.agg(countDistinct(col("vec_id"))).head().getLong(0) == nAll,
      "append: batch contains duplicate vec_ids — dedupe the batch " +
        "before indexing (duplicate member rows would corrupt probe ranks)")
    // RETRY state machine. A crashed-and-rerun ingest job must neither
    // duplicate rows (probe would return one neighbor at several
    // ranks) nor strand vectors half-indexed. The two writes commit in
    // a fixed order (assignments, then members), each atomically at
    // job level, so the index can be in exactly three states w.r.t.
    // this batch's ids:
    //   - none present        → fresh append (the normal path);
    //   - in both             → the previous attempt COMPLETED: this
    //     is an idempotent no-op retry, return success;
    //   - in assignments only → the previous attempt died between the
    //     writes: RESUME by writing only the members rows, using the
    //     already-committed assignments;
    //   - anything partial    → not a state this protocol produces —
    //     refuse loudly rather than guess.
    val priorAsg = spark.read.parquet(s"$dir/assignments")
      .join(all.select("vec_id"), "vec_id").localCheckpoint(true)
    val nPrior = priorAsg.count()
    if (nPrior > 0) {
      val nBatch = nAll
      require(nPrior == nBatch,
        s"append: $nPrior of $nBatch batch vec_ids are already assigned — " +
          "a mix of new and indexed ids is neither a fresh batch nor a " +
          "retry; split the batch or rebuild the index")
      val buckets = priorAsg.select("bucket").distinct()
        .collect().map(_.getLong(0))
      // membership check pruned to the batch's own buckets — never a
      // full members scan
      val nInMembers = spark.read.parquet(s"$dir/members")
        .withColumn("bucket", col("bucket").cast("long"))
        .filter(col("bucket").isin(buckets.toIndexedSeq: _*))
        .select("vec_id")
        .join(all.select("vec_id"), "vec_id").count()
      if (nInMembers == nBatch) return // completed earlier — idempotent
      require(nInMembers == 0,
        s"append: batch is half-present in members/ ($nInMembers of " +
          s"$nBatch) — not a crash state this protocol produces; " +
          "rebuild the index")
      priorAsg.join(all, "vec_id").select("vec_id", "v", "nrm", "bucket")
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(s"$dir/members")
      return
    }
    val cent = spark.read.parquet(s"$dir/centroids").select("cid", "cv")
    // same aggregate shape as ivfAssign: score map-side against the
    // broadcast centroids, ids-only exchange, max_by winner
    val asg = all.select("vec_id", "v").crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), cs(col("v"), col("cv")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), negate(col("cid"))))
        .as("bucket"))
      // one materialization feeds both writes: the assignment aggregate
      // must not replan per sink, and the members write must never read
      // assignments/ files mid-append
      .localCheckpoint(true)
    asg.sortWithinPartitions("vec_id")
      .write.mode("append").parquet(s"$dir/assignments")
    asg.join(all, "vec_id").select("vec_id", "v", "nrm", "bucket")
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/members")
  }

  /** Restore the index's layout invariants after a run of [[append]]s
    * — the periodic maintenance the append contract defers to:
    * assignments are re-laid-out range-disjoint by vec_id (appended
    * files overlap the original ranges, degrading probe lookups from
    * file-disjoint pruning to per-file min/max), and fragmented
    * members bucket partitions are compacted
    * ([[Compaction.compactPartitioned]], which also brings its
    * crash-recovery discipline). Reads ONLY the index — the corpus is
    * never rescanned, and probe results are unchanged by construction
    * (same rows, better files).
    */
  def relayout(spark: SparkSession, dir: String,
               targetBytes: Long = 128L << 20): Seq[(String, Int)] = {
    Layout.rewriteInPlace(spark, s"$dir/assignments") { tmp =>
      Layout.writeRangeSorted(spark.read.parquet(s"$dir/assignments"),
        tmp, nFiles = 8, keyCol = "vec_id")
    }
    Compaction.compactPartitioned(spark, s"$dir/members", targetBytes,
      minFiles = 1)
  }

  /** Top-k cosine neighbors for the probe rows selected by
    * `probePred` (over vec_id), reading ONLY the index: probe lookup
    * file-prunes the range-sorted assignments, the candidate fetch
    * partition-prunes `members/` to probed buckets. Output schema and
    * values match [[Similarity.ivfTopK]] exactly.
    */
  def probe(spark: SparkSession, indexPath: String, probePred: Column,
            k: Int, maxProbes: Long = 100000L): DataFrame = {
    // self-heal a crashed relayout before reading (driver-side listing
    // checks only; a stranded dir would otherwise fail the read)
    Layout.restoreIfCrashed(spark, s"$indexPath/assignments")
    Compaction.repairPartitioned(spark, s"$indexPath/members")
    graft.functions.GraftFunctions.register(spark)
    val cs = graft.functions.GraftFunctions.cosineSim _
    // partition-column inference reads bucket back as INT; restore the
    // assignment's LONG so the indexed and direct plans agree bit-wise
    val members = spark.read.parquet(s"$indexPath/members")
      .withColumn("bucket", col("bucket").cast("long"))
    val probeAsg = spark.read.parquet(s"$indexPath/assignments")
      .filter(probePred).localCheckpoint(true)
    val nProbes = probeAsg.count()
    require(nProbes <= maxProbes,
      s"probe: probePred selected $nProbes probes (> $maxProbes); " +
        "probes are broadcast, so the predicate must pick a small probe set")
    val cand = members
      .join(broadcast(probeAsg.select("bucket").distinct()), "bucket")
    val probes = cand
      .join(broadcast(probeAsg.select("vec_id")), "vec_id")
      .select(col("vec_id").as("q_id"), col("bucket"), col("v").as("qv"))
    val scored = cand.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cs(col("qv"), col("v")))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /** One built index per (application, cache key) — same memoization
    * contract as DedupIndex.ensureBuilt: the registry query's repeated
    * bench invocations pay the build once and probe thereafter.
    */
  private val built = new ConcurrentHashMap[(String, String), String]()

  def ensureBuilt(spark: SparkSession, cacheKey: String,
                  emb: => DataFrame, idCol: String, vecCol: String,
                  nCentroids: Int): String =
    built.computeIfAbsent((spark.sparkContext.applicationId, cacheKey), _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_index").toString
      build(emb, idCol, vecCol, nCentroids, dir)
      // one index per JVM per key is bounded, but a soak loop of
      // bench JVMs is not — reclaim the files when this JVM exits
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))))
      dir
    })

  /** [[ensureBuilt]] for the build-then-daily-append lifecycle: the
    * memoized state is an index BUILT on `base` with `batch` appended
    * afterwards — the registry's ann_ivf_appended row probes it. With
    * `withRelayout` the appended index is also [[relayout]]ed — the
    * full build → append → maintain lifecycle (ann_ivf_relayout).
    */
  def ensureBuiltAppended(spark: SparkSession, cacheKey: String,
                          base: => DataFrame, batch: => DataFrame,
                          idCol: String, vecCol: String,
                          nCentroids: Int,
                          withRelayout: Boolean = false): String =
    built.computeIfAbsent((spark.sparkContext.applicationId, cacheKey), _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_index_app").toString
      build(base, idCol, vecCol, nCentroids, dir)
      append(batch, idCol, vecCol, dir)
      if (withRelayout) relayout(spark, dir)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))))
      dir
    })
}
