package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Numeric parity: every fold is a sequential left fold over doubles
  * (cast from float, exact), starting at 0.0 — bit-identical to the
  * DuckDB oracle's list_reduce. Floats are never multiplied as floats.
  *
  * Scale path: brute-force top-k is the correctness baseline (probe
  * set × corpus, a broadcast-able nested loop); random-hyperplane LSH
  * bounds the pair space for corpus-vs-corpus near-dup search — the
  * candidate join is an equi-join on (band, signature), so the shuffle
  * is (rows × bands), never O(n²).
  */
object Similarity {

  /** Array[Float] column → Array[Double] (exact widening). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Embedding table → (vec_id, v: array<double>, nrm: double). */
  def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force cosine top-k: probe rows (filtered by `probePred`)
    * against the whole corpus. The probe side is small → broadcast it;
    * the big side streams, no shuffle of the corpus.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 probePred: Column, k: Int): DataFrame = {
    val all = prepared(emb, idCol, vecCol)
    val probes = all.filter(probePred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = all.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /** All-pairs cosine near-duplicates above a threshold (correctness
    * baseline; at scale run lshPairs first and verify only candidates).
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val all = prepared(emb, idCol, vecCol)
    val a = all.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = all.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** Deterministic ±1 random-hyperplane weights (seed-fixed, mirrored
    * verbatim into the oracle SQL as list literals).
    */
  def hyperplanes(nPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until dims).map { d =>
        val h = md.digest(s"$j:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Sign-LSH signature bits and banded candidate pairs re-ranked by
    * exact cosine. nPlanes bits split into nBands bands.
    */
  def lshPairs(emb: DataFrame, idCol: String, vecCol: String,
               nPlanes: Int = 16, nBands: Int = 4,
               threshold: Double = 0.35): DataFrame = {
    val dims = 64
    val planes = hyperplanes(nPlanes, dims)
    val all = prepared(emb, idCol, vecCol)
    val bits = planes.zipWithIndex.map { case (w, j) =>
      when(dot(col("v"), typedLit(w)) > 0, 1L).otherwise(0L).as(s"bit$j")
    }
    val withBits = all.select(col("vec_id") +: col("v") +: col("nrm") +: bits: _*)
    val perBand = nPlanes / nBands
    val bandKeys = (0 until nBands).map { bIdx =>
      (0 until perBand).map(i =>
        col(s"bit${bIdx * perBand + i}") * lit(1L << i)).reduce(_ + _).as(s"band$bIdx")
    }
    val withBands = withBits.select(
      col("vec_id") +: col("v") +: col("nrm") +: bandKeys: _*)
    // candidate pairs carry only ids through the band join + distinct;
    // vectors are re-attached afterwards (don't shuffle arrays twice)
    val bands = withBands.select(col("vec_id"),
      posexplode(array((0 until nBands).map(i => col(s"band$i")): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = bands.toDF("vec_a", "band_idx", "band_key")
      .join(bands.toDF("vec_b", "band_idx", "band_key"), Seq("band_idx", "band_key"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val a = all.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = all.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(a, "vec_a").join(b, "vec_b")
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }
}
