package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) tables: the co-located-join design for
  * repeated large joins — both sides bucketed on the join key hash at
  * write time, so the join needs NO exchange at read time. This is the
  * Spark answer to "this fact table is joined on l_orderkey every day":
  * pay the shuffle once at load, never again.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    io.Sources.table(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    io.Sources.table(spark, sf, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    try {
      // disable broadcast so the co-location is what avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      val joinExchanges = "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(p).size
      assert(joinExchanges == 0, s"bucketed join should not re-shuffle the key:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
