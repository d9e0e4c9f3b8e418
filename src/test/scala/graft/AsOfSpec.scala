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

  test("salted as-of equals the unsalted form for every bucket count") {
    // one HOT key (the shape the salted form exists for) plus a cold
    // key, a key with no right rows, equal-time ties (inclusive <=),
    // NULL right values (must not overwrite an earlier carry), and
    // whole time stretches with no right rows (cross-bucket relay)
    val rnd = new scala.util.Random(42)
    val left = (1 to 400).map { i =>
      val k = if (i % 10 == 0) "cold" else if (i % 17 == 0) "bare" else "hot"
      (k, rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("key", "t", "id")
    val right = (1 to 60).map { j =>
      val k = if (j % 6 == 0) "cold" else "hot"
      // distinct times per key (right-uniqueness contract); sparse
      // region above 800 so late buckets relay the carry-in
      val t = if (j % 5 == 0) 800L + j * 3 else (j * 13 % 700).toLong
      val v: Option[Double] = if (j % 7 == 0) None else Some(j.toDouble)
      (k, t, v)
    }.distinct.toDF("key", "rt", "v")
      .dropDuplicates("key", "rt")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val base = rows(AsOf.joinAsOf(left, right, Seq("key"), "t", "rt", "v"))
    for (b <- Seq(1, 3, 16)) {
      val salted = rows(AsOf.joinAsOfSalted(
        left, right, Seq("key"), "t", "rt", "v", buckets = b))
      assert(salted == base, s"buckets=$b diverged from joinAsOf")
    }
    // partitioning invariance: the carry must be a pure function of
    // the values, never of where boundary sampling lands
    val reparted = rows(AsOf.joinAsOfSalted(
      left.repartition(13), right.repartition(7),
      Seq("key"), "t", "rt", "v", buckets = 8))
    assert(reparted == base)
    intercept[IllegalArgumentException](
      AsOf.joinAsOfSalted(left, right, Seq("key"), "t", "rt", "v", 0))
  }

  test("salted as-of carries a NULL-time right row across bucket boundaries") {
    // a right row with rt = NULL sorts FIRST in the unsalted window
    // (asc = nulls first): its value is the baseline every left row
    // inherits until a timed right row overtakes it. The salted form
    // must RELAY that value into later buckets — the ADVICE r15 bug
    // was max_by(v, __t) silently dropping the null-time row from the
    // cross-bucket carry, nulling every left row outside bucket 0.
    val left = (1 to 200).map(i => ("hot", i.toLong * 5, i.toLong))
      .toDF("key", "t", "id")
    val right = Seq(
      ("hot", None, 99.0),         // null time: carries from the start
      ("hot", Some(600L), 42.0)    // overtakes at t >= 600
    ).toDF("key", "rt", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val base = rows(AsOf.joinAsOf(left, right, Seq("key"), "t", "rt", "v"))
    assert(base(1L) == Some(99.0) && base(200L) == Some(42.0))
    for (b <- Seq(2, 8, 16)) {
      val salted = rows(AsOf.joinAsOfSalted(
        left, right, Seq("key"), "t", "rt", "v", buckets = b))
      assert(salted == base, s"buckets=$b diverged on a null-time right row")
    }
  }
}
