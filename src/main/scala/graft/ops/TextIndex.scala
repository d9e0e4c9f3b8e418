package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional inverted index — the serving shape of "find
  * every document containing these tokens / this phrase" over a
  * standing corpus. At 100 TB the alternative is a full corpus scan
  * with a LIKE per query; the index pays one tokenize+explode at build
  * time and every later search reads ONLY the probed tokens' posting
  * rows:
  *
  *   - `postings` — (token: string, doc_id, pos) one row per token
  *     OCCURRENCE, positions 1-based, laid out range-sorted by token
  *     ([[Layout.writeRangeSorted]]): files hold disjoint token
  *     ranges, so a probe's `token IN (...)` predicate prunes whole
  *     files and row groups by min/max stats and the scan is
  *     posting-list-sized, never corpus-sized.
  *
  * Tokenization is the repo's canonical unit —
  * [[TextOps.normalized]] (lower + trim) then [[TextOps.tokens]]
  * (whitespace split) — so search semantics match the text family's
  * other operators and the DuckDB oracles exactly.
  *
  * Search never touches corpus text: AND-search is a distinct-count
  * over the probed posting lists; phrase search joins each phrase
  * token's postings on the anchored start position (doc_id,
  * pos − offset) — per-token work is that token's posting list, and
  * the joins are equi-joins AQE can split if one token is hot.
  */
object TextIndex {

  /** Tokenize the corpus and lay the postings out range-sorted by
    * token (overwrite). Empty tokens (from repeated separators) are
    * dropped; positions are 1-based so the DuckDB twin
    * (generate_subscripts) states identical values.
    */
  def build(corpus: DataFrame, idCol: String, textCol: String,
            dir: String, nFiles: Int = 32): Unit = {
    val postings = corpus
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextOps.tokens(TextOps.normalized(col(textCol)))))
      .filter(length(col("col")) > 0)
      .select(col("col").as("token"), col("doc_id"),
        (col("pos") + 1).cast("long").as("pos"))
    Layout.writeRangeSorted(postings, dir, nFiles, keyCol = "token")
  }

  /** Documents containing ALL of `tokens` (conjunctive membership):
    * one pruned scan of the probed posting lists, distinct (token,
    * doc) pairs, then a doc-level count filter. Output: doc_id.
    */
  def searchAll(spark: SparkSession, dir: String,
                tokens: Seq[String]): DataFrame = {
    require(tokens.nonEmpty, "searchAll: at least one probe token")
    val toks = tokens.map(_.toLowerCase.trim).distinct
    spark.read.parquet(dir)
      .filter(col("token").isInCollection(toks))
      .select("token", "doc_id").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") === toks.size)
      .select("doc_id")
  }

  /** Documents containing the exact consecutive token sequence
    * `phrase`: each phrase position's postings are anchored to the
    * would-be phrase START (pos − offset) and the anchors equi-joined —
    * a doc matches iff some start position survives every join.
    * Repeated tokens in the phrase fall out naturally (the same
    * posting list joins at two offsets). Output: doc_id.
    */
  def searchPhrase(spark: SparkSession, dir: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "searchPhrase: at least one token")
    val toks = phrase.map(_.toLowerCase.trim)
    val idx = spark.read.parquet(dir)
      .filter(col("token").isInCollection(toks.distinct))
    toks.zipWithIndex.map { case (t, i) =>
      idx.filter(col("token") === t)
        .select(col("doc_id"), (col("pos") - i).as("__start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "__start")))
      .select("doc_id").distinct()
  }

  /** One built index per (application, cache key) — the
    * [[AnnIndex.ensureBuilt]] memoization: registry rows pay the
    * tokenize+layout once and probe thereafter.
    */
  private val built = new ConcurrentHashMap[(String, String), String]()

  def ensureBuilt(spark: SparkSession, cacheKey: String,
                  corpus: => DataFrame, idCol: String,
                  textCol: String): String =
    built.computeIfAbsent((spark.sparkContext.applicationId, cacheKey), _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_text_index").toString
      build(corpus, idCol, textCol, dir)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))))
      dir
    })
}
