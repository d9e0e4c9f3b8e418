package graft

import org.apache.spark.sql.functions._
import graft.etl.{Clean, Pipeline}
import graft.io.{Sinks, Sources}
import graft.ops.{Dedup, Multimodal, Similarity}

/** Empty-input and degenerate-input propagation (reference:
  * tests/test_integration.py:212-232) — every operator must produce an
  * empty/valid result, never throw, when fed nothing.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noEvents =
    Sources.table(spark, sf, "events").filter(lit(false))
  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("full pipeline on empty input yields an empty 26-column frame") {
    val out = Pipeline.transform(Pipeline.weatherFromEvents(noEvents))
    assert(out.count() == 0)
    assert(out.columns.length == 26)
  }

  test("median fill with no non-null values keeps nulls (no crash)") {
    val df = Seq[Option[Double]](None, None).toDF("visibility")
    assert(Clean.fillMedianExact(df, "visibility")
      .filter($"visibility".isNull).count() == 2)
    assert(Clean.fillMedianLazy(df, "visibility")
      .filter($"visibility".isNull).count() == 2)
  }

  test("upsert with an empty update batch is the identity") {
    val base = Seq(("London", 1L, 15.0)).toDF("city", "k", "v")
    val none = base.filter(lit(false))
    assert(Sinks.upsert(base, none, Seq("city", "k")).count() == 1)
  }

  test("upsert into an empty base inserts everything") {
    val base = Seq.empty[(String, Long, Double)].toDF("city", "k", "v")
    val updates = Seq(("London", 1L, 15.0)).toDF("city", "k", "v")
    assert(Sinks.upsert(base, updates, Seq("city", "k")).count() == 1)
  }

  test("dedup family handles empty and single-doc corpora") {
    assert(Dedup.exact(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 0.5).count() == 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text").count() == 0)
    val one = Seq((1L, "just one tiny document here")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(one, "doc_id", "text", 3, 0.5).count() == 0)
    assert(Dedup.minhashLshPairs(one, "doc_id", "text").count() == 0)
  }

  test("docs shorter than the gram width produce no grams, no crash") {
    val short = Seq((1L, "ab"), (2L, "one two")).toDF("doc_id", "text")
    assert(Dedup.gramTable(short, "doc_id", "text", 3).count() == 0)
  }

  test("similarity ops on empty embeddings return empty") {
    assert(Similarity.cosinePairs(noVecs, "vec_id", "embedding", 0.5).count() == 0)
    assert(Similarity.cosineTopK(noVecs, "vec_id", "embedding",
      lit(true), 5).count() == 0)
    assert(Similarity.lshPairs(noVecs, "vec_id", "embedding").count() == 0)
  }

  test("multimodal decode of empty payload reports sentinel first byte") {
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(
      spark, Multimodal.toMediaTable(empty, "doc_id", "text")).collect()
    assert(feats.head.n_bytes == 0)
    assert(feats.head.first_byte == -1)
    assert(feats.head.checksum == 0L)
  }

  test("connected components of an empty edge set is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(ops.Components.connectedComponents(edges, "doc_a", "doc_b").count() == 0)
  }
}
