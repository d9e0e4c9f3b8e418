package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.{Enrich, Normalize}
import graft.functions.Parity

/** ScalaCheck-generated invariants for normalization/enrichment
  * expressions (SURVEY §5: property-style upgrade of the reference's
  * example tests). Raw Gen with fixed seeds (no scalatest bridge in
  * the dependency set); expressions are evaluated through Spark so the
  * properties hold for the actual Catalyst evaluation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get
  private val seeds = Seq(1L, 42L, 777L, 20260812L)

  private def evalD(values: Seq[Double],
                    f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Double] =
    values.toDF("x").select(f($"x").cast("double")).as[Double].collect().toSeq

  test("clip stays within bounds and is idempotent") {
    seeds.foreach { s =>
      val xs = sample(Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)), s)
      val once = evalD(xs, c => Normalize.clip(c, 0, 100))
      assert(once.forall(v => v >= 0 && v <= 100))
      assert(evalD(once, c => Normalize.clip(c, 0, 100)) == once)
    }
  }

  test("wrapDegrees lands in [0,360) including negatives") {
    seeds.foreach { s =>
      val xs = sample(Gen.listOfN(200, Gen.chooseNum(-100000, 100000)), s)
      val out = xs.toDF("x")
        .select(Normalize.wrapDegrees($"x").cast("int")).as[Int].collect()
      assert(out.forall(v => v >= 0 && v < 360))
    }
  }

  test("roundAt is idempotent and moves values at most half a step") {
    seeds.foreach { s =>
      val xs = sample(Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)), s)
      val r = evalD(xs, c => Parity.roundAt(c, 2))
      assert(xs.zip(r).forall { case (x, y) => math.abs(x - y) <= 0.005 + 1e-9 })
      assert(evalD(r, c => Parity.roundAt(c, 2)) == r)
    }
  }

  test("temp bands are total and monotone in the input") {
    val order = Seq("Freezing", "Cold", "Cool", "Mild", "Warm", "Hot")
    seeds.foreach { s =>
      val xs = sample(Gen.listOfN(200, Gen.chooseNum(-100.0, 100.0)), s)
      val cats = xs.toDF("x").select(Enrich.tempCategory($"x")).as[String].collect()
      assert(cats.forall(order.contains))
      val ranked = xs.zip(cats).sortBy(_._1).map(t => order.indexOf(t._2))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a <= b })
    }
  }

  test("quality score clipped to [0,100] for any inputs incl. nulls") {
    val opt = Gen.option(Gen.chooseNum(-500.0, 500.0))
    seeds.foreach { s =>
      val rows = sample(Gen.listOfN(100, Gen.zip(opt, opt, opt)), s)
      val out = rows.toDF("ws", "vis", "t")
        .select(Enrich.qualityScore($"ws", $"vis", $"t")).as[Double].collect()
      assert(out.forall(v => v >= 0 && v <= 100))
    }
  }

  test("partitioned upsert ≡ reference key-wise merge over random batch sequences") {
    // fold a random sequence of dated batches through the on-disk
    // partition-pruned upsert; the final table must equal a plain
    // driver-side last-writer-wins map over the same sequence
    seeds.take(2).foreach { s =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_prop_upsert").toString + "/t"
      val batches = sample(Gen.listOfN(4, Gen.listOfN(25,
        Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(1, 3),
          Gen.chooseNum(-100.0, 100.0)))), s)
      val ref = scala.collection.mutable.Map.empty[(Long, String), Double]
      batches.zipWithIndex.foreach { case (batch, i) =>
        // make the in-batch winner deterministic: keep the max value
        // per key, matching updatePriority = value
        val rows = batch.map { case (k, d, v) => (k, f"2023-11-$d%02d", v) }
        rows.groupBy(r => (r._1, r._2)).foreach { case (key, group) =>
          ref(key) = group.map(_._3).max
        }
        val df = rows.toDF("k", "date", "v").withColumn("prio", $"v")
        io.Sinks.upsertPartitioned(spark, df.select("k", "v", "prio", "date"),
          dir, Seq("k", "date"), "date", updatePriority = Seq("prio"))
      }
      // partition values round-trip through directory names and come
      // back type-inferred as DATE — normalize for the compare
      val got = spark.read.parquet(dir)
        .select($"k", $"date".cast("string"), $"v")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got == ref.toMap, s"seed $s: disk state diverged from reference")
    }
  }

  test("upsert idempotence property: merging a batch twice = once") {
    seeds.foreach { s =>
      val rows = sample(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 3L),
          Gen.chooseNum(-100.0, 100.0))), s)
      val base = rows.toDF("k1", "k2", "v")
      val updates = rows.take(30).map { case (a, b, v) => (a, b, v + 1) }
        .toDF("k1", "k2", "v")
      val dedupedBase = base.dropDuplicates("k1", "k2").cache()
      val once = io.Sinks.upsert(dedupedBase, updates,
        Seq("k1", "k2"), updatePriority = Seq("v")).cache()
      val twice = io.Sinks.upsert(once, updates, Seq("k1", "k2"),
        updatePriority = Seq("v"))
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(rowsOf(once) == rowsOf(twice))
    }
  }

  test("salted joins equal the plain join over random skewed data") {
    import graft.ops.Skew
    val right = Seq(("hot", 1L), ("a", 2L), ("b", 3L), ("d", 4L)).toDF("k", "w")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").as[(String, Long, Long)].collect().sorted.toSeq
    seeds.foreach { s =>
      // ~2/3 of rows land on "hot"; key "c" never matches, "d" only right
      val rows = sample(Gen.listOfN(300, Gen.zip(
        Gen.oneOf("hot", "hot", "hot", "hot", "a", "b", "c"),
        Gen.chooseNum(0L, 1000L))), s)
      val left = rows.toDF("k", "v").repartition(5)
      val plain = norm(left.join(right, Seq("k")))
      assert(norm(Skew.saltedJoin(left, right, Seq("k"), buckets = 4)) == plain,
        s"seed $s: blanket salting diverged")
      assert(norm(Skew.saltedJoinSkewed(left, right, Seq("k"),
        hotThreshold = 50L, buckets = 4)) == plain,
        s"seed $s: detect-then-salt diverged")
    }
  }

  test("PII redaction order email→IP→num is load-bearing") {
    import graft.ops.TextOps
    def redactVia(texts: Seq[String],
                  order: Seq[(String, String)]): Seq[String] =
      texts.toDF("t").select(order.foldLeft($"t": org.apache.spark.sql.Column) { case (c, (re, tok)) =>
        regexp_replace(c, re, tok)
      }).as[String].collect().toSeq
    val canonical = Seq(TextOps.EmailRe -> "<EMAIL>",
      TextOps.Ipv4Re -> "<IP>", TextOps.LongNumRe -> "<NUM>")
    // (a) digit-run local parts: a 9+-digit run INSIDE an email. The
    // canonical order redacts the whole address; num-first would chew
    // the local part into "<NUM>" whose remnant re-matches EmailRe,
    // leaving a mangled "x<<EMAIL>" — reordering changes output.
    val digitLocalEmail = for {
      a <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
      d <- Gen.chooseNum(100000000L, 999999999999L)
      dom <- Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)
    } yield s"reach me at $a$d@$dom.com ok"
    // (b) IP-shaped fragments inside an email domain: "u@1.2.3.4.org"
    // is a valid EmailRe match; ip-first would stamp "<IP>" into the
    // middle and the email no longer matches.
    val ipDomainEmail = for {
      u <- Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
      o <- Gen.listOfN(4, Gen.chooseNum(1, 255))
    } yield s"ping $u@${o.mkString(".")}.org thanks"
    seeds.foreach { s =>
      val xs = sample(Gen.listOfN(20, digitLocalEmail), s) ++
        sample(Gen.listOfN(20, ipDomainEmail), s)
      val viaOp = xs.toDF("t")
        .select(TextOps.redactPii($"t")).as[String].collect().toSeq
      val viaCanonical = redactVia(xs, canonical)
      assert(viaOp == viaCanonical) // the operator IS the canonical chain
      // every PII fragment is gone and exactly one token was stamped
      assert(viaOp.forall(t => t.contains("<EMAIL>") &&
        !t.contains("<NUM>") && !t.contains("<IP>") && !t.contains("@1") &&
        !"\\d{9,}".r.findFirstIn(t).isDefined))
      // reordering the chain produces a DIFFERENT result on these
      // inputs — the fixed order is semantics, not style
      val numFirst = redactVia(xs, Seq(canonical(2), canonical(0), canonical(1)))
      val ipFirst = redactVia(xs, Seq(canonical(1), canonical(0), canonical(2)))
      val numDiffers = xs.indices.exists(i =>
        xs(i).contains("reach me") && numFirst(i) != viaOp(i))
      val ipDiffers = xs.indices.exists(i =>
        xs(i).contains("ping") && ipFirst(i) != viaOp(i))
      assert(numDiffers, s"seed $s: num-first order was indistinguishable")
      assert(ipDiffers, s"seed $s: ip-first order was indistinguishable")
    }
  }
}
