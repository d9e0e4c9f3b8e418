package graft

import org.apache.spark.sql.SparkSession

/** Dev loop for perf work on individual registered queries: warms up,
  * then times 3 steady-state iterations of each named query at sf0.1;
  * `explain:<name>` prints the formatted physical plan instead.
  *
  * {{{ sbt "runMain graft.Scratch dedup_minhash explain:dedup_minhash" }}}
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.filter(_.startsWith("explain:")).foreach { a =>
      val n = a.stripPrefix("explain:")
      println(s"=== $n ===")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    // BPE trainer cost-curve probe (SCALING.md): bpe:<iter|fast>:<k>
    // times one full training run at k rounds over the sf documents
    args.filter(_.startsWith("bpe:")).foreach { a =>
      val Array(_, trainer, k) = a.split(":")
      val docs = graft.io.Sources.table(spark, dir, "documents")
      val t0 = System.nanoTime()
      val m =
        if (trainer == "fast")
          graft.ops.Corpus.bpeTrainIncremental(docs, "doc_id", "text", k.toInt)
        else graft.ops.Corpus.bpeTrain(docs, "doc_id", "text", k.toInt)
      val n = m.count()
      println(f"[scratch] bpe:$trainer k=$k merges=$n " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val names = args.filterNot(a =>
      a.startsWith("explain:") || a.startsWith("bpe:"))
    names.foreach { n => SparkEntry.queries(n)(spark, dir).count() }
    (1 to 3).foreach { it =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        println(f"[scratch] $n iter$it ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
