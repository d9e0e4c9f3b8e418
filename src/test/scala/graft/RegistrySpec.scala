package graft

/** Contract smoke: every registered query plans and executes on the
  * smallest corpus, and SQL-expressible ops carry an oracle.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle coverage is complete") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    // sketches are the only intentionally oracle-less queries
    val oracleLess = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(oracleLess == Set("agg_approx"), oracleLess)
  }

  test("approx aggregates stay within their error bounds") {
    val approx = SparkEntry.queries("agg_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("agg_ingest_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, users) =>
      val est = approx(k)._1.toDouble
      assert(math.abs(est - users) / users < 0.1, s"$k: $est vs $users")
    }
  }

  test("every query executes on sf0.001 and the expected ones are non-empty") {
    // ops whose correct result may legitimately be empty at tiny scale
    val mayBeEmpty = Set("ann_lsh", "dedup_embed_cosine_exact_baseline", "dedup_simhash",
      "dedup_minhash", "dedup_ngram_jaccard", "join_anti",
      "set_intersect", "set_except")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
