package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, Parity}

/** Native SQL function registration + codegen behavior. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim native expression: SQL + Column API, exact values") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 0.0), Array(2.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 3.0)),
      (Array(1.0, 2.0), Array(2.0, 4.0))
    ).toDF("a", "b")
    val viaSql = df.selectExpr("cosine_sim(a, b) AS c").as[Double].collect()
    val viaCol = df.select(GraftFunctions.cosineSim($"a", $"b")).as[Double].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(0) == 1.0)
    assert(viaSql(1) == 0.0)
    assert(math.abs(viaSql(2) - 1.0) < 1e-12) // parallel up to fp
  }

  test("cosine_sim agrees with the interpreted HOF fold on real embeddings") {
    GraftFunctions.register(spark)
    val emb = io.Sources.table(spark, sf, "embeddings")
      .select($"vec_id", graft.ops.Similarity.asDouble($"embedding").as("v"))
      .limit(50)
    val both = emb.crossJoin(emb.select($"v".as("w")))
      .select(
        GraftFunctions.cosineSim($"v", $"w").as("native"),
        (graft.ops.Similarity.dot($"v", $"w") /
          (graft.ops.Similarity.norm($"v") * graft.ops.Similarity.norm($"w"))).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0) // bit-identical
  }

  test("mismatched vector lengths raise on every execution path") {
    GraftFunctions.register(spark)
    def chainHas(t: Throwable, msg: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(e => Option(e.getMessage).exists(_.contains(msg)))
    // codegen path (non-foldable inputs) — the in-place element reads
    // have no bounds check of their own, so the kernel must raise, not
    // read out-of-bounds memory into a garbage cosine
    val df = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
    val eCos = intercept[Throwable](df.selectExpr("cosine_sim(a, b)").collect())
    assert(chainHas(eCos, "lengths differ"))
    val eDot = intercept[Throwable](df.selectExpr("dot_product(a, b)").collect())
    assert(chainHas(eDot, "lengths differ"))
    // interpreted path (constant-folded literals evaluate via eval)
    val eLit = intercept[Throwable](
      spark.sql("SELECT cosine_sim(array(1.0d,2.0d), array(1.0d))").collect())
    assert(chainHas(eLit, "lengths differ"))
  }

  test("GraftExtensions registers its injections without error") {
    // a fresh session with extensions needs a fresh JVM (one context
    // per JVM); what is testable here is that the injection callback
    // registers cleanly and the same builder resolves through the
    // session registry path exercised above
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT cosine_sim(array(1.0d,0.0d), array(3.0d,0.0d))")
      .first().getDouble(0) == 1.0)
  }

  test("parity hash: md5_60 stays in [0, 2^60)") {
    val vals = Seq("a", "b", "spark", "").toDF("s")
      .select(Parity.md5_60($"s").as("h")).as[Long].collect()
    assert(vals.forall(h => h >= 0 && h < (1L << 60)))
    assert(vals.distinct.length == vals.length)
  }
}
