package graft

import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right value at or before left time") {
    val left = Seq(
      ("k1", 5L, "e1"), ("k1", 10L, "e2"), ("k1", 20L, "e3"),
      ("k2", 7L, "e4"), ("k2", 1L, "e5")
    ).toDF("key", "t", "tag")
    val right = Seq(
      ("k1", 5L, 1.0), ("k1", 15L, 2.0),
      ("k2", 2L, 9.0)
    ).toDF("key", "rt", "rate")
    val out = AsOf.joinAsOf(left, right, Seq("key"), "t", "rt", "rate")
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("e1") == Some(1.0))   // exact time match (inclusive)
    assert(out("e2") == Some(1.0))   // 10 < 15 → still the t=5 rate
    assert(out("e3") == Some(2.0))   // after 15
    assert(out("e4") == Some(9.0))
    assert(out("e5") == None)        // before any rate → null
  }
}
