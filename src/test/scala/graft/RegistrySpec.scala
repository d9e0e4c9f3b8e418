package graft

/** Contract smoke: every registered query plans and executes on the
  * smallest corpus, and SQL-expressible ops carry an oracle.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle coverage is complete") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    // every query currently ships an oracle (none are oracle-less yet)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("every query executes on sf0.001 and the expected ones are non-empty") {
    // ops whose correct result may legitimately be empty at tiny scale
    val mayBeEmpty = Set("ann_lsh", "dedup_embed_cosine", "dedup_simhash",
      "dedup_minhash", "dedup_ngram_jaccard", "join_anti")
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
