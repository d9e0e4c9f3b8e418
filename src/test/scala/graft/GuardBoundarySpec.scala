package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Boundary pins for the bounded-collect contracts (VERDICT r15 #8):
  * the `maxProbes` / `maxExactCorpus` requires are the driver-OOM
  * firewall in front of every collect-and-broadcast in the ANN family,
  * so each guarded entry point is exercised AT the boundary (must
  * pass) and ONE PAST it (must refuse, naming itself) — an
  * off-by-one that silently admitted corpus-sized probe sets would
  * otherwise only surface as a production OOM.
  */
class GuardBoundarySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val nProbes =
    emb.filter(col("vec_id") < 10).count() // = 10 on the shipped corpus
  private val probe = col("vec_id") < 10

  private def refuses(tag: String)(f: => Any): Unit = {
    val e = intercept[IllegalArgumentException](f)
    assert(e.getMessage.contains(tag), s"message should name $tag: ${e.getMessage}")
    assert(e.getMessage.contains("probe") || e.getMessage.contains("n²") ||
      e.getMessage.contains("O(n"), e.getMessage)
  }

  test("cosineTopK admits maxProbes and refuses maxProbes+1 probes") {
    assert(Similarity.cosineTopK(emb, "vec_id", "embedding", probe, k = 3,
      maxProbes = nProbes).count() > 0)
    refuses("cosineTopK")(Similarity.cosineTopK(emb, "vec_id", "embedding",
      probe, k = 3, maxProbes = nProbes - 1).count())
  }

  test("ivfTopK admits maxProbes and refuses maxProbes+1 probes") {
    assert(Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 4,
      probePred = probe, k = 3, maxProbes = nProbes).count() > 0)
    refuses("ivfTopK")(Similarity.ivfTopK(emb, "vec_id", "embedding",
      nCentroids = 4, probePred = probe, k = 3,
      maxProbes = nProbes - 1).count())
  }

  test("pqTopK admits maxProbes and refuses maxProbes+1 probes") {
    assert(Similarity.pqTopK(emb, "vec_id", "embedding", probe, k = 3,
      m = 8, ksub = 16, maxProbes = nProbes).count() > 0)
    refuses("pqTopK")(Similarity.pqTopK(emb, "vec_id", "embedding", probe,
      k = 3, m = 8, ksub = 16, maxProbes = nProbes - 1).count())
  }

  test("ivfPqTopK admits maxProbes and refuses maxProbes+1 probes") {
    assert(Similarity.ivfPqTopK(emb, "vec_id", "embedding", nCentroids = 4,
      probePred = probe, k = 3, m = 8, ksub = 16,
      maxProbes = nProbes).count() > 0)
    refuses("ivfPqTopK")(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      nCentroids = 4, probePred = probe, k = 3, m = 8, ksub = 16,
      maxProbes = nProbes - 1).count())
  }

  test("ivfPqResidualTopK admits maxProbes and refuses maxProbes+1 probes") {
    assert(Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
      nCentroids = 4, probePred = probe, k = 3, m = 8, ksub = 16,
      maxProbes = nProbes).count() > 0)
    refuses("ivfPqResidualTopK")(Similarity.ivfPqResidualTopK(emb, "vec_id",
      "embedding", nCentroids = 4, probePred = probe, k = 3, m = 8,
      ksub = 16, maxProbes = nProbes - 1).count())
  }

  test("cosinePairs admits the corpus at the cap and refuses one below") {
    val n = emb.count()
    // at the boundary: n <= maxExactCorpus passes
    assert(Similarity.cosinePairs(emb, "vec_id", "embedding",
      threshold = 0.99, maxExactCorpus = n).count() >= 0)
    refuses("cosinePairs")(Similarity.cosinePairs(emb, "vec_id", "embedding",
      threshold = 0.99, maxExactCorpus = n - 1).count())
  }
}
