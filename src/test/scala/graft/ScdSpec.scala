package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Scd

/** SCD Type-2 merge + point-in-time dimension join (ops/Scd.scala). */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = Date.valueOf("2020-01-01")
  private val d2 = Date.valueOf("2021-06-01")
  private val attrs = Seq("city", "tier")

  /** (key, city, tier) snapshot → all-current dim effective `from`. */
  private def dimOf(rows: Seq[(Long, String, Int)], from: Date): DataFrame =
    rows.toDF("k", "city", "tier")
      .withColumn("valid_from", lit(from))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  private def rowSet(df: DataFrame) =
    df.select("k", "city", "tier", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDate(3), Option(r.getDate(4)).map(_.toString).orNull,
        r.getBoolean(5)))
      .toSet

  test("merge2: unchanged kept, changed close+insert, vanished closed, new inserted") {
    val dim = dimOf(Seq((1L, "oslo", 1), (2L, "lima", 2), (3L, "pune", 3)), d1)
    val snap = Seq(
      (1L, "oslo", 1),  // unchanged
      (2L, "lima", 9),  // tier changed
      (4L, "kiel", 4)   // new key; key 3 vanished
    ).toDF("k", "city", "tier")
    val out = Scd.merge2(dim, snap, "k", attrs, lit(d2))
    assert(rowSet(out) == Set(
      (1L, "oslo", 1, d1, null, true),
      (2L, "lima", 2, d1, "2021-06-01", false),
      (2L, "lima", 9, d2, null, true),
      (3L, "pune", 3, d1, "2021-06-01", false),
      (4L, "kiel", 4, d2, null, true)))
  }

  test("merge2: closed history passes through untouched; re-merging the same snapshot is a no-op") {
    val dim = dimOf(Seq((1L, "oslo", 1), (2L, "lima", 2)), d1)
    val snap = Seq((1L, "oslo", 1), (2L, "lima", 9)).toDF("k", "city", "tier")
    val once = Scd.merge2(dim, snap, "k", attrs, lit(d2)).localCheckpoint(true)
    // same snapshot again at a later date: every key matches its open
    // version, so nothing closes and nothing inserts
    val again = Scd.merge2(once, snap, "k", attrs,
      lit(Date.valueOf("2022-01-01")))
    assert(rowSet(again) == rowSet(once))
    // exactly one open version per key survives any merge
    val open = again.filter(col("is_current")).groupBy("k").count()
      .select("count").as[Long].collect()
    assert(open.forall(_ == 1L))
  }

  test("merge2 compares attributes null-safely") {
    val dim = Seq((1L, null.asInstanceOf[String], 1), (2L, "lima", 2))
      .toDF("k", "city", "tier")
      .withColumn("valid_from", lit(d1))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val snap = Seq(
      (1L, null.asInstanceOf[String], 1), // null == null: unchanged
      (2L, null.asInstanceOf[String], 2)  // value -> null: changed
    ).toDF("k", "city", "tier")
    val out = Scd.merge2(dim, snap, "k", attrs, lit(d2))
    assert(rowSet(out) == Set(
      (1L, null, 1, d1, null, true),
      (2L, "lima", 2, d1, "2021-06-01", false),
      (2L, null, 2, d2, null, true)))
  }

  test("pointInTime: valid_from inclusive, valid_to exclusive, closed keys drop post-close facts") {
    val dim = dimOf(Seq((1L, "oslo", 1), (3L, "pune", 3)), d1)
    val snap = Seq((1L, "oslo", 9)).toDF("k", "city", "tier") // 1 changed, 3 vanished
    val versions = Scd.merge2(dim, snap, "k", attrs, lit(d2))
    val facts = Seq(
      (100L, 1L, Date.valueOf("2020-05-05")), // old version of key 1
      (101L, 1L, d2),                         // boundary: NEW version (>= valid_from)
      (102L, 1L, Date.valueOf("2019-12-31")), // before any version: dropped
      (103L, 3L, Date.valueOf("2020-05-05")), // closed key, pre-close: old version
      (104L, 3L, Date.valueOf("2021-07-01"))  // closed key, post-close: dropped
    ).toDF("fid", "fk", "fd")
    val out = Scd.pointInTime(facts, versions, "fk", "k", col("fd"), attrs)
      .select("fid", "tier").as[(Long, Int)].collect().toMap
    assert(out == Map(100L -> 1, 101L -> 9, 103L -> 3))
  }

  test("pointInTime tolerates factKey and dimKey sharing a name") {
    val dim = dimOf(Seq((1L, "oslo", 1)), d1)
    val facts = Seq((100L, 1L, d2)).toDF("fid", "k", "fd")
    val out = Scd.pointInTime(facts, dim, "k", "k", col("fd"), attrs)
    assert(out.columns.count(_ == "k") == 1)
    assert(out.select("fid", "city").as[(Long, String)].collect().toSeq
      == Seq((100L, "oslo")))
  }

  test("merge2 refuses a snapshot with duplicated keys") {
    val dim = dimOf(Seq((1L, "oslo", 1)), d1)
    // a duplicated key would fan out in the full-outer join and insert
    // TWO open versions — silently breaking the at-most-one-open
    // invariant pointInTime relies on
    val snap = Seq((1L, "oslo", 1), (1L, "bergen", 2)).toDF("k", "city", "tier")
    val e = intercept[IllegalArgumentException](
      Scd.merge2(dim, snap, "k", attrs, lit(d2)).collect())
    assert(e.getMessage.contains("duplicated"))
    // the clean snapshot still merges
    val ok = Seq((1L, "bergen", 2)).toDF("k", "city", "tier")
    assert(Scd.merge2(dim, ok, "k", attrs, lit(d2))
      .filter(col("is_current")).count() == 1)
  }
}
