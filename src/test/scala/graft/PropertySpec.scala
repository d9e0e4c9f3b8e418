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

  test("chunkOverlap equals direct slice semantics for random docs and window params") {
    import graft.ops.Corpus
    seeds.foreach { s =>
      val lens = sample(Gen.listOfN(30, Gen.chooseNum(1, 120)), s)
      val chunk = sample(Gen.chooseNum(2, 40), s)
      val step = sample(Gen.chooseNum(1, chunk), s)
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"t$j").mkString(" "))
      }
      val out = Corpus.chunkOverlap(docs.toDF("doc_id", "text"),
          "doc_id", "text", chunk, step)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getLong(3))))
        .toMap
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val n = toks.length
        val nChunks = if (n <= chunk) 1
          else math.ceil((n - chunk).toDouble / step).toInt + 1
        (0 until nChunks).map { i =>
          val piece = toks.slice(i * step, math.min(i * step + chunk, n))
          (id, i) -> ((piece.mkString(" "), piece.length.toLong))
        }
      }.toMap
      assert(out == expected, s"seed $s chunk=$chunk step=$step")
    }
  }

  test("mixSample equals the reference hash-threshold set exactly") {
    import graft.ops.Corpus
    def md5_60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    seeds.foreach { s =>
      val rows = sample(Gen.listOfN(400,
        Gen.oneOf("a", "b", "c", "d")), s).zipWithIndex
        .map { case (g, i) => (i.toLong, g) }
      val weights = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2) // "d" not in recipe
      val frac = 0.4
      val out = Corpus.mixSample(rows.toDF("doc_id", "grp"),
          "doc_id", "grp", weights, frac, seed = s"seed$s")
        .select("doc_id").as[Long].collect().toSet
      // reference: identical arithmetic in plain Scala
      val counts = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val total = rows.size
      val thresh = counts.map { case (g, n) =>
        val w = weights.toMap.getOrElse(g, 0.0)
        g -> math.floor(math.min(1.0, w * total.toDouble * frac / n.toDouble)
          * 1000000.0).toLong
      }
      val expected = rows.collect { case (id, g)
        if md5_60(s"seed$s:$id") % 1000000L < thresh(g) => id }.toSet
      assert(out == expected, s"seed $s")
      assert(rows.collect { case (id, "d") => id }.toSet.intersect(out).isEmpty)
    }
  }

  test("dedupLines: k above the corpus size is the identity; kept lines grow with k") {
    import graft.ops.Dedup
    seeds.foreach { s =>
      val texts = sample(Gen.listOfN(12, Gen.chooseNum(3, 60)), s).zipWithIndex
        .map { case (n, i) =>
          // small vocab → real cross-doc line collisions
          val words = sample(Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w")), s + i)
          (i.toLong, words.mkString(" "))
        }
      val df = texts.toDF("doc_id", "text")
      def keptByDoc(k: Int): Map[Long, Long] =
        Dedup.dedupLines(df, "doc_id", "text", chunk = 2, k = k)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // k larger than any possible doc count: nothing is boilerplate
      val identity = Dedup.dedupLines(df, "doc_id", "text", chunk = 2, k = 1000)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      texts.foreach { case (id, t) => assert(identity(id) == t, s"seed $s doc $id") }
      // monotone: a looser threshold never keeps fewer lines
      val k2 = keptByDoc(2); val k4 = keptByDoc(4)
      k2.keySet.foreach { id => assert(k2(id) <= k4(id), s"seed $s doc $id") }
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

  test("partitioned upsert equals the plain set-based merge on random batches") {
    import graft.io.Sinks
    // the staged txn-swap write path must be INVISIBLE semantically:
    // whatever it does with stages, markers, and renames, the on-disk
    // table afterwards is exactly upsert(existing, updates)
    Seq(1L, 20260813L).foreach { s =>
      val exRows = sample(Gen.listOfN(60, for {
        k <- Gen.chooseNum(0, 29); d <- Gen.chooseNum(1, 4)
        v <- Gen.chooseNum(-1000.0, 1000.0)
      } yield (k.toLong, s"2024-01-0$d", v)), s)
        .groupBy(_._1).map(_._2.head).toSeq // unique keys (a real table post-upsert)
      val keyDate = exRows.map(r => r._1 -> r._2).toMap
      val upRows = sample(Gen.listOfN(40, for {
        k <- Gen.chooseNum(0, 49)
        v <- Gen.chooseNum(-1000.0, 1000.0)
      } yield (k.toLong, v)), s + 7)
        .zipWithIndex.map { case ((k, v), i) =>
          // the key→partition contract: an existing key keeps its
          // date; a new key's date is a function of the key, so a key
          // repeated in the batch always agrees with itself
          (k, keyDate.getOrElse(k, s"2024-01-0${1 + (k % 4)}"), v, i.toLong)
        }
      val existing = exRows.toDF("k", "d", "v")
        .withColumn("prio", lit(-1L))
      val updates = upRows.toDF("k", "d", "v", "prio")
      val expected = Sinks.upsert(existing, updates, Seq("k"), Seq("prio"))
        .select("k", "d", "v", "prio").as[(Long, String, Double, Long)]
        .collect().toSet
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_upsert_$s").toString + "/t"
      existing.repartition($"d").write.partitionBy("d").parquet(dir)
      Sinks.upsertPartitioned(spark, updates, dir, Seq("k"), "d",
        updatePriority = Seq("prio"))
      val actual = spark.read.parquet(dir)
        .select($"k", $"d".cast("string"), $"v", $"prio")
        .as[(Long, String, Double, Long)].collect().toSet
      assert(actual == expected, s"seed $s: partitioned merge diverged")
    }
  }

  test("NTZ pins: every non-reader unix_timestamp/unix_micros site is session-TZ-safe") {
    // Sources.normalizeTs owns the timestamp unit, so every corpus ts
    // reaches downstream operators as TimestampType (an instant). The
    // sites that fold a timestamp to epoch numbers outside the reader:
    //   1. ops/Sessionize.scala:19-20,34  (gap + duration_s)
    //   2. queries/StreamingQueries.scala:307  (watermark-horizon max)
    //   3. ops/RangeJoin.scala:26-27  (micros; the one NTZ-accepting
    //      site — its cast is value-preserving ONLY under the pinned
    //      UTC session TZ)
    // Pins 1/2: on TimestampType input the fold is the epoch instant —
    // invariant under any session TZ change (epochs chosen to straddle
    // the America/New_York 2024-03-10 spring-forward so a wall-clock
    // reinterpretation could not hide). Pin 3: under UTC, the NTZ path
    // equals the TimestampType path bit for bit.
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    def withTz[T](tz: String)(f: => T): T = {
      spark.conf.set("spark.sql.session.timeZone", tz)
      try f finally spark.conf.set("spark.sql.session.timeZone", tz0)
    }
    val ev = Seq((1L, 1710050400L), (1L, 1710054000L), (1L, 1710061200L),
        (2L, 1710050000L))
      .toDF("k", "es").withColumn("ts", timestamp_seconds($"es"))
    def sessionize() = graft.ops.Sessionize
      .sessionStats(ev, "k", "ts", gapSeconds = 1800)
      .orderBy("k", "session_seq").collect().map(_.toSeq).toSeq
    def horizon() = ev.agg(max(unix_timestamp($"ts"))).head().getLong(0)
    val (sUtc, hUtc) = withTz("UTC")((sessionize(), horizon()))
    Seq("America/New_York", "Asia/Tokyo").foreach { tz =>
      assert(withTz(tz)(sessionize()) == sUtc,
        s"sessionization shifted under session TZ $tz")
      assert(withTz(tz)(horizon()) == hUtc,
        s"watermark horizon shifted under session TZ $tz")
    }
    assert(hUtc == 1710061200L) // the instant itself, not a wall clock
    withTz("UTC") {
      val l = ev.select($"k", $"ts".as("lts"))
      val r = ev.select($"k", $"ts".as("rts"),
        $"ts".cast("timestamp_ntz").as("rtsn"))
      def pairs(tsCol: String) = graft.ops.RangeJoin
        .withinInterval(l, r.select($"k", col(tsCol)), Seq("k"),
          "lts", tsCol, maxDeltaSeconds = 3600)
        .select($"k", $"__lus", $"__rus").collect().map(_.toSeq).toSet
      assert(pairs("rts") == pairs("rtsn"),
        "RangeJoin NTZ path must equal the TimestampType path under UTC")
    }
  }

  test("Rolling.trailingCountSum ≡ the literal RANGE-preceding window on random streams") {
    // the prefix-sum restatement (two O(n) growing frames + probe
    // rows) must equal Spark's direct bounded-preceding frame
    // BIT-for-bit — including timestamp-tie peers (duplicate t per
    // key, the RANGE semantics that a ROWS frame would break) and
    // exact decimal sums. Random keys/times with heavy tie density.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val rng = new scala.util.Random(4242)
    val rows = (0 until 3000).map { i =>
      (i.toLong, rng.nextInt(7).toLong, rng.nextInt(200).toLong * 10L,
        BigDecimal(rng.nextInt(100000)) / 100)
    }
    val df = rows.toDF("id", "k", "t", "v")
    val win = 500L // trailing [t-499, t] — RANGE 499 PRECEDING
    val w = Window.partitionBy($"k").orderBy($"t")
      .rangeBetween(-(win - 1), Window.currentRow)
    val direct = df.select($"id",
        count(lit(1)).over(w).as("n"),
        sum($"v".cast(DecimalType(18, 2))).over(w).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    val got = graft.ops.Rolling
      .trailingCountSum(df, "id", "k", "t", "v", windowSec = win)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDecimal(3))).toMap
    assert(got.keySet == direct.keySet)
    got.foreach { case (id, (n, s)) =>
      assert(n == direct(id)._1, s"count diverged at id=$id")
      assert(s.compareTo(direct(id)._2) == 0, s"sum diverged at id=$id")
    }
  }

  test("incremental summary ≡ direct summary for ANY split of the input") {
    import graft.analytics.Incremental
    // merge must be split-invariant — not just for the registered
    // latest-day cut: fold state(history)+state(batch) for several
    // arbitrary hash splits and require bit-identity with the direct
    // aggregate (exact decimal sums + one IEEE division make this an
    // equality, not a tolerance check)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = Incremental.summaryFromState(
        Incremental.lineitemSummaryState(li))
      .orderBy("ship_date", "l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    Seq(2, 3, 7).foreach { m =>
      val a = li.filter(pmod($"l_orderkey", lit(m)) === 0)
      val b = li.filter(pmod($"l_orderkey", lit(m)) =!= 0)
      val inc = Incremental.summaryFromState(Incremental.mergeStates(
          Incremental.lineitemSummaryState(a),
          Incremental.lineitemSummaryState(b)))
        .orderBy("ship_date", "l_returnflag", "l_linestatus")
        .collect().map(_.toSeq).toSeq
      assert(inc == direct, s"mod-$m split: merged state diverged from direct")
    }
  }

  test("substringPrune ≡ sliding-window reference model on random corpora") {
    // reference model: count every L-window across the corpus, cover
    // the tokens of any window occurring ≥ 2 times, rebuild in order
    def model(docs: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.trim.toLowerCase.split(" ", -1).toSeq }
      val winCounts = scala.collection.mutable.Map.empty[Seq[String], Int].withDefaultValue(0)
      toks.foreach { case (_, ts) =>
        ts.sliding(l).filter(_.size == l).foreach(w => winCounts(w.toList) += 1) }
      toks.map { case (id, ts) =>
        val covered = scala.collection.mutable.Set.empty[Int]
        ts.sliding(l).zipWithIndex.foreach { case (w, i) =>
          if (w.size == l && winCounts(w.toList) >= 2) covered ++= (i until i + l) }
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        id -> ((ts.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
    }
    // tiny vocabulary so duplicated windows actually occur
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val docGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    seeds.foreach { s =>
      val texts = sample(Gen.listOfN(30, docGen), s)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expect = model(docs, 3)
      val got = graft.ops.Dedup.substringPrune(
          docs.toDF("doc_id", "text"), "doc_id", "text", windowLen = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expect, s"seed $s: prune diverged from the reference model")
    }
  }

  test("funnel ≡ greedy per-user reference model on random event streams") {
    val steps = Seq("view", "click", "purchase")
    def model(evs: Seq[(Long, String, Long)], w: Long): Map[Long, Int] =
      evs.groupBy(_._1).flatMap { case (u, es) =>
        val firstOpt = es.filter(_._2 == steps.head).map(_._3)
          .sorted.headOption
        firstOpt.map { t1 =>
          var cur = t1
          var reached = 1
          var stuck = false
          steps.tail.foreach { st =>
            if (!stuck) {
              es.filter(e => e._2 == st && e._3 > cur && e._3 <= cur + w)
                .map(_._3).sorted.headOption match {
                case Some(nx) => cur = nx; reached += 1
                case None => stuck = true
              }
            }
          }
          u -> reached
        }
      }
    val evGen = for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.oneOf(steps ++ Seq("noise"))
      sec <- Gen.choose(0L, 120L)
    } yield (u, t, 1700000000L + sec)
    seeds.foreach { s =>
      val evs = sample(Gen.listOfN(120, evGen), s)
      Seq(10L, 40L).foreach { w =>
        val expect = model(evs, w)
        val got = graft.ops.Funnel.windowed(
            evs.toDF("user_id", "event_type", "es")
              .withColumn("ts", timestamp_seconds($"es")),
            "user_id", "ts", "event_type", steps, windowSec = w)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == expect, s"seed $s window $w: funnel diverged from model")
      }
    }
  }

  test("min_by winners ≡ the row_number window over random colliding corpora") {
    // the r13 de-skew moved both keep-first winner selections from
    // key-partitioned row_number windows to map-side-combined min_by
    // aggregates — this pins the two shapes row-for-row equal on
    // random data built to collide heavily (tiny text alphabet, tight
    // key/hour space), so the faster shape can never drift from the
    // reference keep-first semantics
    import org.apache.spark.sql.expressions.Window
    (1 to 4).foreach { s =>
      val rnd = new scala.util.Random(900 + s)
      // exact dedup: ~40 distinct texts over 300 docs. One NULL-id
      // row per corpus (VERDICT r13 #5): the window's ascending
      // nulls-first order makes it the winner of its text group, and
      // the struct-wrapped min_by ordering must agree — a bare-column
      // min_by would silently exclude it. At most one null id keeps
      // both shapes deterministic (the uniqueness contract).
      val docs = (1L to 300L).map { i =>
        (if (i == 137L) None else Some(i),
          s"t${rnd.nextInt(40)} body", rnd.nextInt(100))
      }.toDF("doc_id", "text", "aux")
      val viaWindow = {
        val w = Window
          .partitionBy(graft.ops.TextOps.fingerprint(col("text")))
          .orderBy(col("doc_id").asc)
        docs.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
      val got = graft.ops.Dedup.exact(docs, "doc_id", "text")
      val gotRows = got.collect().map(_.toSeq).toSet
      assert(gotRows == viaWindow.collect().map(_.toSeq).toSet,
        s"seed $s: exact-dedup winners diverged")
      assert(gotRows.exists(_.head == null),
        s"seed $s: the null-id row must WIN its group (nulls-first), not vanish")
      // dedup_hour: 5 keys × 3 hours × shared ts values force both
      // group collisions and (ts, tieBreak) ordering to matter; ~8%
      // NULL ts (reachable — the reference dedups BEFORE missing-value
      // handling, transform.py:85-123): null ts lands in the null
      // hour-group and must win it under nulls-first ts ordering in
      // BOTH shapes.
      val evs = (1L to 400L).map { i =>
        (i, rnd.nextInt(5).toLong,
          if (rnd.nextInt(12) == 0) None
          else Some(3600L * rnd.nextInt(3) + 60L * rnd.nextInt(4)),
          rnd.nextDouble())
      }.toDF("event_id", "k", "es", "v")
        .withColumn("ts", timestamp_seconds(col("es"))).drop("es")
      val viaWindow2 = {
        val w = Window.partitionBy(col("k"), date_trunc("hour", col("ts")))
          .orderBy(col("ts").asc, col("event_id").asc)
        evs.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
      val got2 = graft.etl.Clean.dedupFirstPerKeyHour(
        evs, Seq("k"), "ts", Seq("event_id"))
      val got2Rows = got2.collect().map(_.toSeq).toSet
      assert(got2Rows == viaWindow2.collect().map(_.toSeq).toSet,
        s"seed $s: dedup_hour winners diverged")
      assert(evs.filter(col("ts").isNull).count() > 0 &&
        got2Rows.exists(_.contains(null)),
        s"seed $s: the null-ts case must actually be exercised")
    }
  }

  test("boundedBroadcast above the row cap: same rows, no forced broadcast hint") {
    // the gram pipelines' hot-set anti join degrades to a plain
    // shuffled join past the cap instead of an 8-GB-broadcast
    // hard-fail — pin that both modes return identical rows and that
    // the over-cap mode carries no broadcast hint into the optimizer
    val rel = (1L to 200L).map(i => (i, i % 23)).toDF("doc_id", "gram")
    val hot = (0L until 7L).toDF("gram")
    def anti(side: org.apache.spark.sql.DataFrame) =
      rel.join(side, Seq("gram"), "left_anti")
    val forced = anti(graft.ops.Dedup.boundedBroadcast(hot))
    val fallback = anti(graft.ops.Dedup.boundedBroadcast(hot, maxRows = 3))
    assert(forced.collect().map(_.toSeq).toSet ==
      fallback.collect().map(_.toSeq).toSet)
    assert(forced.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "under the cap the hint must be present")
    assert(!fallback.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "over the cap no broadcast may be forced (AQE stays free to choose)")
  }

  test("SCD2 invariants hold over random snapshot chains: one open version, disjoint contiguous intervals, immutable history") {
    import graft.ops.Scd
    val attrs = Seq("a", "b")
    val dates = Seq("2020-01-01", "2020-06-01", "2021-02-01", "2021-09-15")
      .map(java.sql.Date.valueOf)
    val snapGen = Gen.listOf(for {
      k <- Gen.chooseNum(0L, 14L)
      a <- Gen.chooseNum(0, 3)
      b <- Gen.oneOf("x", "y", null.asInstanceOf[String])
    } yield (k, a, b)).map(_.distinctBy(_._1))
    seeds.foreach { s =>
      // snapshot 0 seeds the dim; 1..3 merge in date order
      val snaps = (0 to 3).map(i => sample(snapGen, s * 10 + i))
      var dim = snaps.head.toDF("k", "a", "b")
        .withColumn("valid_from", lit(dates.head))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
        .localCheckpoint(true)
      snaps.tail.zip(dates.tail).foreach { case (snap, d) =>
        val closedBefore = dim.filter(!$"is_current")
          .collect().map(_.toSeq).toSet
        dim = Scd.merge2(dim, snap.toDF("k", "a", "b"), "k", attrs, lit(d))
          .localCheckpoint(true)
        // closed rows are immutable: every previously-closed version
        // survives the merge untouched
        val closedAfter = dim.filter(!$"is_current")
          .collect().map(_.toSeq).toSet
        assert(closedBefore.subsetOf(closedAfter))
      }
      val rows = dim
        .select("k", "valid_from", "valid_to", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getDate(1).toString,
          Option(r.getDate(2)).map(_.toString), r.getBoolean(3)))
      rows.groupBy(_._1).foreach { case (k, vs) =>
        // at most one open version per key, and it is the current one
        val open = vs.filter(_._3.isEmpty)
        assert(open.length <= 1, s"key $k has ${open.length} open versions")
        assert(open.forall(_._4) && vs.filterNot(_._3.isEmpty).forall(!_._4))
        // versions never overlap: sorted by valid_from, each closed
        // version ends at or before the next begins (a gap is legal —
        // the key was deleted, then re-inserted later; ISO date strings
        // order lexicographically)
        val sortedVs = vs.sortBy(_._2)
        sortedVs.sliding(2).foreach {
          case Array(prev, next) =>
            assert(prev._3.exists(_ <= next._2),
              s"key $k: version [${prev._2},${prev._3}) overlaps ${next._2}")
          case _ =>
        }
        assert(sortedVs.last._3.isEmpty || !sortedVs.last._4)
      }
    }
  }

  test("zonemap-pruned reads ≡ the plain filtered scan for random intervals") {
    import graft.ops.Layout
    val data = java.nio.file.Files.createTempDirectory("zm_prop").toString
    val zm = java.nio.file.Files.createTempDirectory("zm_prop_idx").toString
    // skewed key space (clusters + gaps) so interval endpoints land
    // inside, between, and beyond file ranges
    val keys = (1 to 400).map(i => (i * i % 5000).toLong).distinct
    Layout.writeRangeSorted(keys.toDF("k").repartition(3), data, 6, "k")
    Layout.writeZonemap(spark, data, "k", zm)
    val boundGen = Gen.chooseNum(-100L, 5200L)
    seeds.foreach { s =>
      val x = sample(boundGen, s)
      val y = sample(boundGen, s + 99)
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      val pruned = Layout.readPruned(spark, data, zm, "k", lit(lo), lit(hi))
        .select("k").as[Long].collect().sorted.toSeq
      val plain = keys.filter(k => k >= lo && k <= hi).sorted
      assert(pruned == plain, s"[$lo,$hi]: pruned read diverged")
    }
  }

  test("resampleHourlyFfill ≡ driver-side reference model on random irregular series") {
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    seeds.foreach { s =>
      val rows = sample(Gen.listOfN(120, Gen.zip(
        Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(0, 72 * 60 - 1), // minute offset inside 3 days
        Gen.chooseNum(0.0, 100.0))), s)
        .zipWithIndex.map { case ((k, m, v), i) =>
          (k, new java.sql.Timestamp(base + m * 60000L), i.toLong, v) }
      val df = rows.toDF("k", "ts", "id", "v").repartition(5)
      val got = graft.ops.Resample
        .resampleHourlyFfill(df, "k", "ts", "id", "v")
        .select($"k", $"slot".cast("long"), $"value", $"filled")
        .as[(String, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2)).toSeq
      // reference: per key, hourly close = max (ts, id) row; grid over
      // [min hour, max hour]; ffill carries the last close forward
      val ref = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val closes = rs.groupBy(r => r._2.getTime / 3600000L * 3600000L)
          .map { case (h, g) => h -> g.maxBy(r => (r._2.getTime, r._3))._4 }
        val hours = closes.keys.min to closes.keys.max by 3600000L
        hours.foldLeft((Seq.empty[(String, Long, Double, Boolean)], 0.0)) {
          case ((acc, prev), h) =>
            val v = closes.getOrElse(h, prev)
            (acc :+ ((k, h / 1000L, v, !closes.contains(h))), v)
        }._1
      }.sortBy(r => (r._1, r._2))
      assert(got == ref, s"seed $s: resample diverged from the reference model")
    }
  }

  test("inverted-index search ≡ corpus-scan membership/adjacency on random corpora") {
    val vocab = Seq("a", "b", "c", "d")
    seeds.take(3).foreach { s =>
      val docs = sample(Gen.listOfN(30,
        Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.take(12))), s)
        .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val dir = java.nio.file.Files.createTempDirectory("graft_tix_prop").toString
      graft.ops.TextIndex.build(docs.toDF("doc_id", "text"), "doc_id", "text", dir)
      def got(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.select("doc_id").as[Long].collect().sorted.toSeq
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      // AND over every 2-token probe
      for (x <- vocab; y <- vocab) {
        val expAnd = docs.collect {
          case (id, _) if toks(id).contains(x) && toks(id).contains(y) => id
        }.sorted
        assert(got(graft.ops.TextIndex.searchAll(spark, dir, Seq(x, y))) == expAnd,
          s"seed $s: AND($x,$y) diverged")
        val expPh = docs.collect {
          case (id, _) if toks(id).sliding(2).exists(_ == Seq(x, y)) => id
        }.sorted
        assert(got(graft.ops.TextIndex.searchPhrase(spark, dir, Seq(x, y))) == expPh,
          s"seed $s: PHRASE($x $y) diverged")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("stableIds ≡ sorted rank for any unique corpus and any partitioning") {
    seeds.foreach { s =>
      val keys = sample(Gen.listOfN(150, Gen.zip(
        Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 10000L))), s)
        .distinct
      val df = keys.toDF("a", "b").repartition(1 + (s % 7).toInt)
      val got = graft.ops.Corpus.stableIds(df, Seq("a", "b"))
        .select($"stable_id", $"a", $"b")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val ref = keys.sorted.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
      assert(got == ref, s"seed $s: ids diverged from sorted rank")
    }
  }

  test("targeted purge ≡ anti join and retention ≡ value filter on random partitioned tables") {
    seeds.take(3).foreach { s =>
      val rows = sample(Gen.listOfN(80, Gen.zip(
        Gen.chooseNum(0L, 20L),                 // user
        Gen.oneOf("p1", "p2", "p3", "p4"),      // partition
        Gen.chooseNum(0.0, 9.0))), s)
        .zipWithIndex.map { case ((u, p, v), i) => (i.toLong, u, p, v) }
      val doomedUsers = sample(Gen.listOfN(4, Gen.chooseNum(0L, 25L)), s + 1).distinct
      val dir = java.nio.file.Files
        .createTempDirectory("graft_purge_prop").toString + "/t"
      rows.toDF("id", "u", "p", "v").write.partitionBy("p").parquet(dir)
      graft.io.Sinks.deleteKeysPartitioned(spark,
        doomedUsers.toDF("u"), dir, Seq("u"), "p")
      def back(): Seq[(Long, Long, String)] = spark.read.parquet(dir)
        .select($"id", $"u", $"p").as[(Long, Long, String)]
        .collect().sortBy(_._1).toSeq
      val afterPurge = rows.collect {
        case (i, u, p, _) if !doomedUsers.contains(u) => (i, u, p)
      }.sortBy(_._1)
      assert(back() == afterPurge, s"seed $s: purge diverged from anti join")
      // retention: drop partitions below a random cutoff
      val cutoff = sample(Gen.oneOf("p2", "p3"), s + 2)
      if (afterPurge.exists(_._3 >= cutoff)) {
        graft.io.Sinks.dropPartitions(spark, dir, "p", v => v >= lit(cutoff))
        val afterRet = afterPurge.filter(_._3 >= cutoff)
        assert(back() == afterRet, s"seed $s: retention diverged from value filter")
      }
    }
  }

  test("joinAsOfNearest ≡ per-row nearest-scan reference model incl. ties and tolerance") {
    val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime
    seeds.foreach { s =>
      // coarse second grid on BOTH sides makes exact ties likely
      val leftRows = sample(Gen.listOfN(60, Gen.zip(
        Gen.oneOf("a", "b", "c"), Gen.chooseNum(0, 500))), s)
        .zipWithIndex.map { case ((k, t), i) =>
          (k, new java.sql.Timestamp(base + t * 1000L), i.toLong) }
      val rightRows = sample(Gen.listOfN(25, Gen.zip(
        Gen.oneOf("a", "b"), Gen.chooseNum(0, 500), Gen.chooseNum(0.0, 9.0))), s + 7)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, rt)
        .map { case (k, t, v) => (k, new java.sql.Timestamp(base + t * 1000L), v) }
      val l = leftRows.toDF("k", "lt", "id").repartition(4)
      val r = rightRows.toDF("k", "rt", "v")
      for (tol <- Seq(None, Some(40L))) {
        val got = graft.ops.AsOf
          .joinAsOfNearest(l, r, Seq("k"), "lt", "rt", "v", tol)
          .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
        leftRows.foreach { case (k, lt, id) =>
          val cands = rightRows.filter(_._1 == k)
            .map { case (_, rt, v) =>
              (math.abs(rt.getTime - lt.getTime), rt.getTime > lt.getTime, v) }
            .filter(c => tol.forall(t => c._1 <= t * 1000L))
          val exp = if (cands.isEmpty) None
            else Some(cands.minBy(c => (c._1, c._2))._3) // tie → backward
          assert(got(id) == exp,
            s"seed $s tol $tol: nearest diverged for id $id")
        }
      }
    }
  }

  test("collocation lift ≡ driver-side exact counts on random corpora") {
    val vocab = Seq("a", "b", "c")
    seeds.foreach { s =>
      val docs = sample(Gen.listOfN(40,
        Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.take(8))), s)
        .map(_.mkString(" "))
      val got = graft.ops.Corpus
        .collocations(docs.toDF("text"), "text", minCount = 2L, k = 100)
        .select($"x", $"y", $"c_xy", $"lift")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val toks = docs.map(_.split(" ").toSeq)
      val uni = toks.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val n = uni.values.sum
      val bi = toks.flatMap(t => t.sliding(2).filter(_.size == 2))
        .groupBy(identity).map { case (p, g) => (p.head, p(1)) -> g.size.toLong }
        .filter(_._2 >= 2L)
      assert(got.keySet == bi.keySet, s"seed $s: pair sets diverged")
      bi.foreach { case (p, c) =>
        val expLift = (c * n).toDouble / (uni(p._1) * uni(p._2)).toDouble
        assert(got(p) == ((c, expLift)), s"seed $s: lift diverged for $p")
      }
    }
  }

  test("KSmallest partial merges commute and bound: any split/order of partials equals the direct sort-take") {
    import graft.functions.{HashedId, KSmallestAggregator}
    val agg = new KSmallestAggregator(5)
    val rowGen = for {
      h <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      id <- Gen.chooseNum(0L, 1000L)
    } yield HashedId(h, id)
    seeds.foreach { s =>
      val rows = sample(Gen.listOfN(60, rowGen), s)
      val direct = rows.sortBy(r => (r.h, r.id)).take(5)
      // arbitrary partition split + arbitrary merge order must agree
      val cut1 = sample(Gen.chooseNum(0, rows.length), s + 1)
      val cut2 = sample(Gen.chooseNum(0, cut1), s + 2)
      val parts = Seq(rows.take(cut2), rows.slice(cut2, cut1), rows.drop(cut1))
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
      assert(parts.forall(_.length <= 5), "partials must stay bounded at k")
      val mergedLR = parts.reduce(agg.merge)
      val mergedRL = parts.reverse.reduce(agg.merge)
      assert(agg.finish(mergedLR).toSeq == direct)
      assert(agg.finish(mergedRL).toSeq == direct,
        "merge order must not change the retained set")
    }
  }
}
