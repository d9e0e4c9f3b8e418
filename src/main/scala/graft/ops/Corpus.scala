package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Parity

/** Corpus-construction operators a pretraining-data pipeline needs
  * beyond cleaning and dedup: reproducible sampling, vocabulary
  * statistics, and sequence packing. All pure Column expressions over
  * one narrow shuffle each — no RNG state, no driver loops.
  */
object Corpus {

  /** Deterministic hash sampling: keep a row iff
    * md5_60(id) mod 100 < pct. Unlike `df.sample` (partition-layout- and
    * seed-dependent RNG), the decision is a pure function of the row
    * key, so the sample is REPRODUCIBLE across engines, re-runs, and
    * repartitioning — the property that matters when a 100-TB corpus
    * snapshot must be re-derivable. The md5_60 digest is uniform enough
    * that pct ≈ the realized rate.
    */
  def hashSample(df: DataFrame, idCol: String, pct: Column): DataFrame =
    df.filter(Parity.md5_60(col(idCol).cast("string")) % 100 < pct)

  /** Contiguous 0..n−1 ids in a deterministic total order — the
    * corpus-construction step that assigns training-example ids —
    * WITHOUT the single-task global window: `row_number() OVER
    * (ORDER BY …)` with no PARTITION BY collapses the whole dataset
    * into ONE task (Spark plans an all-to-one exchange), which at
    * 100 TB is the canonical driver-shaped straggler. Here `orderBy`
    * gives a range-partitioned parallel sort and `zipWithIndex` adds
    * one count job for per-partition offsets — every partition then
    * numbers its rows independently. RDD use is deliberate:
    * per-partition offset assignment is genuine imperative
    * per-partition logic with no Column-expression equivalent.
    *
    * `orderCols` must be a UNIQUE total order or ids within a tie are
    * partition-layout-dependent; `checkUnique` (default on) verifies
    * with one aggregate — callers who own uniqueness upstream can
    * pass false and skip the pass.
    */
  def stableIds(df: DataFrame, orderCols: Seq[String],
                checkUnique: Boolean = true): DataFrame = {
    require(orderCols.nonEmpty, "stableIds: at least one order column")
    if (checkUnique) {
      val dups = df.groupBy(orderCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
      require(dups == 0,
        s"stableIds: ${orderCols.mkString("(", ",", ")")} is not a unique " +
          "total order — ids within a tie would be partition-dependent")
    }
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("stable_id",
        org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Stratified variant: per-stratum percentages expressed as a Column
    * (e.g. a when-chain over a language column) — upsample rare
    * strata, downsample dominant ones, still fully deterministic.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String,
                           pctByStratum: Column): DataFrame =
    hashSample(df, idCol, pctByStratum)

  /** Bounded deterministic per-key sample: the k rows of each key with
    * the smallest seeded hash [[Layout.shuffleKey]] of their id — a
    * uniform k-sample per key (every row's hash rank is exchangeable)
    * that, unlike a reservoir, is a pure function of (seed, ids):
    * reproducible across engines, re-runs, and partitionings; a new
    * seed re-deals every key's sample.
    *
    * Skew shape: the [[graft.functions.KSmallestAggregator]] buffer is
    * bounded at k, and the typed groupByKey aggregate merges partials
    * map-side, so a hot key ships (mappers × k) candidates through the
    * exchange — never its full row set, which is what the equivalent
    * row_number window would drag into one task. The per-key rate cap
    * [[hashSample]] can't give (pct of a hot key is still huge) is
    * exactly what a per-key BOUND is for: capping any one
    * user/domain/site's contribution to a training corpus.
    *
    * Key and id must be integral (cast to long internally); ties are
    * impossible under the (hash, id) total order, so the sample is
    * unique per (seed, k).
    */
  def samplePerKey(df: DataFrame, keyCol: String, idCol: String,
                   seed: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the typed (Long, Long, Long) encoder below would fail a NULL id
    // with an opaque "null value in non-nullable field" executor
    // error, and an ANSI cast of a non-numeric string key throws a
    // CAST_INVALID_INPUT from deep inside the aggregate; state the
    // integral-key contract loudly up front instead — try_cast maps
    // both violations to NULL and limit(1) stops the probe scan at
    // the first one
    val bad = df.select(col(keyCol).try_cast("long").as("__k"),
        col(idCol).try_cast("long").as("__i"))
      .filter(col("__k").isNull || col("__i").isNull).limit(1).count()
    require(bad == 0,
      s"samplePerKey: '$keyCol' and '$idCol' must be non-null and integral " +
        "(castable to long) in every row — a NULL or non-numeric value " +
        "has no hash rank; filter or re-key the input first")
    df.select(col(keyCol).cast("long").as("_1"),
        Layout.shuffleKey(seed, col(idCol)).as("_2"),
        col(idCol).cast("long").as("_3"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.HashedId(t._2, t._3))
      .agg(new graft.functions.KSmallestAggregator(k).toColumn.name("picked"))
      .toDF(keyCol, "picked")
      .select(col(keyCol), explode(col("picked")).as("pick"))
      .select(col(keyCol), col("pick.id").as(idCol),
        col("pick.h").as("sample_hash"))
  }

  /** Target-composition mixture sampling — the DATA-MIXTURE step of
    * corpus assembly (web 60% / books 30% / code 10%-style recipes):
    * given target weights per group and a global budget fraction, the
    * per-group keep RATE is computed from the group's actual count
    * (rate = weight × N × budget / n_group, capped at 1), then applied
    * as deterministic hash sampling. Unlike [[stratifiedHashSample]]
    * (caller-fixed per-stratum rates), the rates here are derived from
    * the corpus so the OUTPUT composition hits the recipe regardless
    * of the input skew. Groups without a weight are excluded — the
    * recipe defines the corpus.
    *
    * Fully deterministic: the rate arithmetic is a fixed sequence of
    * IEEE ops on integer-derived doubles, quantized to a millionth
    * threshold compared against md5_60(seed:id) mod 10^6 — seed
    * re-deals, same seed replays, reproducible across engines and
    * partitionings. One count aggregate + one broadcast join + a
    * narrow filter; nothing corpus-sized shuffles.
    */
  def mixSample(docs: DataFrame, idCol: String, groupCol: String,
                weights: Seq[(String, Double)], budgetFrac: Double,
                seed: String): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetFrac must be in (0, 1]: $budgetFrac")
    require(weights.nonEmpty, "mixSample: empty weights")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // the total is the per-group counts' sum — never a second corpus scan
    val total = counts.agg(sum(col("__n")).as("__total"))
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val thresholds = counts.crossJoin(broadcast(total))
      .withColumn("__rate", least(lit(1.0),
        wCol * col("__total").cast("double") * budgetFrac /
          col("__n").cast("double")))
      .withColumn("__thresh", floor(col("__rate") * 1000000.0).cast("long"))
      .select(col(groupCol), col("__thresh"))
    docs.join(broadcast(thresholds), Seq(groupCol))
      .filter(Parity.md5_60(
          concat_ws(":", lit(seed), col(idCol).cast("string"))) % 1000000L
        < col("__thresh"))
      .drop("__thresh")
  }

  /** Sliding-window chunking with overlap — context-window prep for
    * retrieval/embedding pipelines: chunks of `chunkTokens` tokens
    * starting every `stepTokens` (overlap = chunk − step), the final
    * chunk absorbing the tail. Deterministic, positional, and purely
    * columnar (bound token array → transform/slice → posexplode): one
    * narrow map, output rows ≈ n_tokens / step per doc. Returns
    * (doc_id, chunk_idx, chunk, n_tokens).
    */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int, stepTokens: Int): DataFrame = {
    require(chunkTokens > 0 && stepTokens > 0 && stepTokens <= chunkTokens,
      s"chunkOverlap: need 0 < step <= chunk, got step=$stepTokens chunk=$chunkTokens")
    val n = size(col("__toks"))
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - chunkTokens).cast("double") / stepTokens)
        .cast("int") + 1)
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        posexplode(TextOps.tokenWindows(col("__toks"), nChunks,
          stepTokens, chunkTokens))
          .as(Seq("chunk_idx", "chunk")))
      .withColumn("n_tokens", size(split(col("chunk"), " ")).cast("long"))
  }

  /** Top-k vocabulary: token frequencies over the normalized corpus,
    * ties broken lexicographically (deterministic). Explode + count is
    * one shuffle on the token; the global top-k plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextOps.tokens(TextOps.normalized(col(textCol))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Collocation mining: adjacent token pairs scored by LIFT —
    * p(xy) / (p(x)·p(y)) computed as (c_xy·N) / (c_x·c_y) — the
    * corpus-analysis statistic behind multi-word-expression detection
    * and tokenizer-merge candidates. Lift instead of PMI by design:
    * the log is the one step whose last bits differ across libm
    * implementations, while a division of two EXACT integer products
    * (each < 2^53, so exactly representable) is IEEE-identical in any
    * engine — the statistic stays hash-comparable. Shape: one
    * tokenize pass feeds both the bigram and unigram counts (both
    * map-side combinable); unigram totals are vocabulary-sized, so
    * the two scoring joins broadcast. Output: pairs with count ≥
    * `minCount`, top `k` by (lift desc, x, y).
    */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(
      TextOps.tokens(TextOps.normalized(col(textCol))).as("t"))
    val uni = toks.select(explode(col("t")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c"))).head().getLong(0)
    // size-1 docs first: sequence(0, -1) DESCENDS in Spark (it does
    // not return empty), which would fabricate t[-1] pairs
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS x, t[i + 1] AS y))"))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("x") =!= "" && col("y") =!= "")
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    bi
      .join(broadcast(uni.withColumnRenamed("tok", "x")
        .withColumnRenamed("c", "c_x")), Seq("x"))
      .join(broadcast(uni.withColumnRenamed("tok", "y")
        .withColumnRenamed("c", "c_y")), Seq("y"))
      .select(col("x"), col("y"), col("c_xy"),
        ((col("c_xy") * lit(total)).cast("double") /
          (col("c_x") * col("c_y")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /** Token-length histogram: docs bucketed by `n_tok div width`. The
    * corpus-composition statistic every pretraining run wants
    * (sequence-length planning, truncation-rate estimates): one narrow
    * map + one shuffle on the bucket id, with map-side partial
    * aggregation — at 100 TB the output is ~max_len/width rows
    * regardless of corpus size.
    */
  def tokenLenHistogram(docs: DataFrame, textCol: String,
                        bucketWidth: Int): DataFrame =
    docs.select(TextOps.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("bucket", expr(s"n_tok div $bucketWidth"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))

  /** Domain-blocklist filtering — the C4/RefinedWeb-style source
    * filter: drop any doc containing a URL whose host is blocklisted.
    * For a config-sized blocklist the membership test is a pure
    * codegen'd Column (arrays_overlap against a literal array): no
    * join, no shuffle, one narrow map over the corpus. A
    * million-domain blocklist would swap in explode → broadcast semi
    * join → anti join by id under the same contract.
    *
    * NULL text extracts NULL (not empty) domains, and
    * `!arrays_overlap(NULL, …)` is NULL — which a filter drops. A
    * scrub filter must never delete rows it did not match, so the
    * domain array is coalesced to empty: NULL-text docs pass through.
    */
  def filterByDomainBlocklist(docs: DataFrame, textCol: String,
                              blocklist: Seq[String]): DataFrame =
    docs.filter(!arrays_overlap(
      coalesce(TextOps.domains(col(textCol)), array()),
      typedLit(blocklist)))

  /** Bigram repetition ratio — the Gopher/MassiveText-style repetition
    * signal: max bigram frequency over total bigrams per doc. High
    * ratios mark boilerplate/spam (the failure mode length and
    * stopword heuristics miss). Shape: explode bigrams → two hash
    * aggregates keyed by doc — both shuffles carry (id, 8-byte-ish
    * gram) pairs with map-side partial aggregation; docs under 2
    * tokens have no bigrams and drop out (nothing to measure).
    */
  def repetitionRatio(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(Dedup.ngramsOfTokens(col("__toks"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("max_rep"))
      .withColumn("rep_ratio",
        col("max_rep").cast("double") / col("n_bigrams").cast("double"))

  /** Per-document top-k TF-IDF terms — the corpus-wide lexical
    * relevance signal retrieval and quality pipelines compute.
    * Log-free idf (N/df instead of ln(N/df)) keeps every arithmetic
    * step a single IEEE op on integer-derived doubles — bit-identical
    * across engines (ln() is libm-dependent in its last ulp) — and
    * ranking is (score DESC, token ASC), fully deterministic.
    * Shape: two hash aggregates (tf keyed by (doc, token), df keyed by
    * token), a window for doc length over the already-aggregated tf
    * relation, and one broadcast 1-row N — every shuffle carries
    * (id, token, count) rows, never documents.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("n_tok",
        sum(col("cnt")).over(Window.partitionBy(col("doc_id"))))
    val dfx = toks.distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val scored = tf.join(dfx, "token").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (col("cnt").cast("double") / col("n_tok").cast("double")) *
          (col("nd").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "token", "tfidf")
  }

  /** Deterministic train/val/test assignment: split by
    * md5_60(seed:id) mod 100 against CUMULATIVE percentage cuts
    * (e.g. ("train",90),("val",95),("test",100)) — the same
    * pure-function-of-the-key discipline as [[hashSample]], so the
    * split is disjoint, exhaustive, reproducible on any partitioning
    * and any engine, and re-derivable forever from (seed, id). A new
    * seed re-deals membership without moving the ratios.
    */
  def assignSplits(df: DataFrame, idCol: String, seed: String,
                   cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100,
      s"cuts must be cumulative percentages ending at 100, got $cuts")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
      cuts.map(_._2).distinct == cuts.map(_._2) && cuts.head._2 > 0,
      s"cuts must be strictly increasing positive percentages, got $cuts")
    // NULL-propagating concat (NOT concat_ws, which would hash the bare
    // seed): a NULL id yields a NULL hash, every `when` is false, and
    // the `otherwise` lands it in the LAST split — the identical rule a
    // SQL CASE's ELSE applies, so both engines agree on NULL ids
    val h = Parity.md5_60(
      concat(lit(seed), lit(":"), col(idCol).cast("string"))) % 100
    val split =
      if (cuts.size == 1) lit(cuts.head._1)
      else cuts.init.tail.foldLeft(
        when(h < cuts.head._2, cuts.head._1)) {
        case (acc, (name, cut)) => acc.when(h < cut, name)
      }.otherwise(cuts.last._1)
    df.withColumn("split", split)
  }

  /** Corpus-level adjacent-token-pair counts, top-k — one merge step
    * of BPE training (the most frequent pair is the next merge).
    * posexplode keeps each doc's token order; lead() pairs neighbors
    * inside a per-doc window (partitions bounded by doc length, never
    * corpus-sized); the pair count is a map-side-combined aggregate
    * whose post-combine exchange is vocabulary²-bounded in theory and
    * observed-pairs-bounded in practice; the final top-k is a
    * TakeOrderedAndProject, never a global sort.
    */
  def bigramPairsTopK(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextOps.tokens(TextOps.normalized(col(textCol)))))
      .toDF("doc_id", "pos", "l_tok")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("r_tok", lead(col("l_tok"), 1).over(w))
      .filter(col("r_tok").isNotNull)
      .groupBy("l_tok", "r_tok").agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("l_tok").asc, col("r_tok").asc)
      .limit(k)
  }

  /** Iterative BPE merge training — `rounds` deterministic merge
    * steps, the training loop [[bigramPairsTopK]] is one step of:
    * each round counts adjacent token pairs across the corpus
    * (distributed aggregate, map-side combined), elects the top pair
    * by (count DESC, l_tok, r_tok) — a 1-row driver collect, the only
    * driver-side state — and REWRITES the working corpus with that
    * pair merged greedily left-to-right (classic BPE order), so round
    * r+1 counts pairs over merged tokens. The corpus stays distributed
    * throughout; per-round cost is one pair aggregate + one codegen'd
    * string rewrite.
    *
    * The merge is a LITERAL string rewrite with both engines' exact
    * semantics: the working text is space-doubled (every token owns
    * its delimiters, so adjacent occurrences of the pair never share
    * a boundary space), the pair pattern replaced left-to-right
    * non-overlapping — precisely BPE's greedy order ("a a a" merges
    * once) — and whitespace re-normalized. The merged token joins
    * its parts with `sep` ('+', absent from the corpus vocabulary),
    * so later rounds can elect pairs involving merged tokens.
    * Returns one row per round: (round, l_tok, r_tok, n_pairs) —
    * the merge table a tokenizer trainer persists.
    */
  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
               rounds: Int, sep: String = "+"): DataFrame = {
    require(rounds >= 1, s"bpeTrain: rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // multi-space runs collapse BEFORE round 1 (not only in the
    // per-round rewrite): every BPE path — train, incremental train,
    // apply, and both oracles' t0 — tokenizes the same whitespace-
    // normal form, so a doubled-space doc can never make round-1
    // elect a pair involving the empty token that later rounds (and
    // encode) would not see
    var cur = docs.select(
      regexp_replace(TextOps.normalized(col(textCol)), " +", " ").as("txt"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val ts = col("ts")
      val pairIdx = when(size(ts) < 2, array().cast("array<int>"))
        .otherwise(sequence(lit(1), size(ts) - 1))
      val top = cur.select(TextOps.tokens(col("txt")).as("ts"))
        .select(explode(transform(pairIdx, i =>
          struct(element_at(ts, i).as("l"), element_at(ts, i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l_tok"), col("p.r").as("r_tok"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("l_tok").asc, col("r_tok").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rt, n))
        val doubled = concat(lit(" "),
          org.apache.spark.sql.functions.replace(
            col("txt"), lit(" "), lit("  ")), lit(" "))
        val merged = org.apache.spark.sql.functions.replace(
          doubled, lit(s" $l  $rt "), lit(s" $l$sep$rt "))
        cur = cur.select(trim(regexp_replace(merged, " +", " ")).as("txt"))
        // the working corpus accumulates one nested replace per round —
        // an UNBOUNDED analysis/codegen plan at tokenizer-scale k.
        // Truncate lineage every few rounds (same pattern as the
        // Components pointer-jumping loop); eager localCheckpoint
        // costs one extra materialization per 4 rounds, bounded and
        // executor-resident.
        // stripStats: a checkpoint CARRIES the estimated stats of its
        // child, and a loop that re-checkpoints its own output
        // compounds them round over round (see Components.stripStats)
        if (r % 4 == 0) cur = Components.stripStats(cur.localCheckpoint(true))
        r += 1
      }
    }
    merges.toSeq.toDF("round", "l_tok", "r_tok", "n_pairs")
  }

  /** BPE ENCODE — apply a LEARNED merge table to the corpus (the
    * tokenize-with-vocab step every training-data pipeline runs after
    * [[bpeTrain]]; reference analogue: the transform stage applying
    * learned categorizers, src/transform.py:164-169).
    *
    * Works from the merge TABLE, not string rewrites: each doc's token
    * array is scanned once per merge rule, adjacent (l, r) collapsing
    * to l+sep+r greedily left-to-right ("a a a" merges once) — BPE's
    * canonical order, byte-identical to the space-doubled literal
    * rewrite [[bpeTrain]] uses while electing. Rank-sequential apply
    * is exact here because a merge's constituents only ever come from
    * strictly earlier rounds (train elects over the already-merged
    * corpus), and merging two neighbors can create adjacencies only
    * WITH the new token, never between two old ones — so no later
    * merge can re-enable an earlier one.
    *
    * Scale: the merge table is driver-held and broadcast inside the
    * function closure (a tokenizer vocabulary is ≤100k rows — model
    * metadata, not data); the corpus is touched in ONE distributed
    * pass, per-doc cost O(len · merges) with zero driver round trips —
    * unlike training's one aggregate+collect per round. The scan loop
    * is a deterministic per-row function with no built-in equivalent
    * (iterative array rewriting), hence a Scala UDF rather than
    * mapPartitions: it stays inside the row pipeline and prunes to
    * exactly (id, tokens).
    */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)],
               sep: String = "+"): DataFrame = {
    val encode = udf { toks: Seq[String] =>
      var cur = toks
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == l && cur(i + 1) == r) {
            out += (l + sep + r); i += 2
          } else { out += cur(i); i += 1 }
        }
        cur = out.toSeq
      }
      cur
    }
    docs.select(col(idCol).as("doc_id"),
        // same whitespace-normal form as [[bpeTrain]]'s t0 — encode
        // must tokenize exactly what train counted (a doubled space
        // would otherwise leave empty tokens that block adjacency
        // here but not in training's collapsed rewrite)
        TextOps.tokens(regexp_replace(
          TextOps.normalized(col(textCol)), " +", " ")).as("__raw"))
      .withColumn("__enc", encode(col("__raw")))
      .select(col("doc_id"), col("__enc").as("toks"),
        size(col("__raw")).cast("long").as("n_raw"),
        size(col("__enc")).cast("long").as("n_enc"))
  }

  /** Pair-table BPE training — the SAME merge table as [[bpeTrain]],
    * built the way a tokenizer-scale (k = 50 000) trainer must be:
    *
    *  - the corpus is tokenized ONCE into executor-resident token
    *    arrays (eager localCheckpoint — round r never re-derives
    *    rounds 1..r-1's rewrites, so plan depth is O(1) per round,
    *    not O(r));
    *  - the corpus-wide pair-count table is built ONCE and then
    *    maintained INCREMENTALLY: each round's single distributed
    *    pass merges the elected pair greedily left-to-right per doc
    *    (the scan [[bpeApply]] proves) and emits that doc's exact
    *    pair-count DELTA (new-minus-old pair multiset — empty for
    *    the untouched majority), which folds into the standing table
    *    with one small full-outer join. No per-round full recount,
    *    no per-round full-corpus string rewrite.
    *
    * Per-round cost: one corpus map (cheap for non-matching docs — a
    * token scan, no allocation), one delta aggregate sized by the
    * AFFECTED docs only, one pair-table join (vocabulary²-bounded,
    * observed-pairs-sized in practice), and the 1-row election
    * collect that any sequential BPE trainer pays. [[bpeTrain]]'s
    * per-round cost is a full pair recount (corpus-sized exchange
    * every round) — at k=50 equal-ish, at tokenizer k the recount is
    * the difference between O(k·corpus) exchange bytes and
    * O(corpus + k·affected).
    *
    * Election ties and exhaustion match [[bpeTrain]] exactly
    * (count DESC, l_tok, r_tok; stop when no pair remains), so the
    * returned merge table is identical — pinned in OpsSpec.
    *
    * `checkpointEvery` truncates the pair table's join lineage: at the
    * default 1 every round materializes the (small) updated table, so
    * the election is a single-stage scan — measured 3-4× faster per
    * round than depth-8 lineage at spec scale, because the election
    * otherwise re-executes every un-truncated full-outer join. Raise
    * it only if the OBSERVED pair table is large enough that a
    * per-round materialization outweighs re-running the join chain.
    */
  def bpeTrainIncremental(docs: DataFrame, idCol: String, textCol: String,
                          rounds: Int, sep: String = "+",
                          checkpointEvery: Int = 1): DataFrame = {
    require(rounds >= 1,
      s"bpeTrainIncremental: rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var corpus = docs.select(TextOps.tokens(regexp_replace(
        TextOps.normalized(col(textCol)), " +", " ")).as("ts"))
      .localCheckpoint(true)
    def pairCount(df: DataFrame): DataFrame = {
      val ts = col("ts")
      val pairIdx = when(size(ts) < 2, array().cast("array<int>"))
        .otherwise(sequence(lit(1), size(ts) - 1))
      df.select(explode(transform(pairIdx, i =>
          struct(element_at(ts, i).as("l"), element_at(ts, i + 1).as("r"))))
          .as("p"))
        .groupBy(col("p.l").as("l_tok"), col("p.r").as("r_tok"))
        .agg(count(lit(1)).as("n_pairs"))
    }
    var pairs = pairCount(corpus).localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairs.orderBy(col("n_pairs").desc, col("l_tok").asc,
        col("r_tok").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rt, n))
        // one pass: merge the elected pair per doc AND emit the doc's
        // exact pair-count delta (multiset difference — bulletproof
        // against chained/overlapping occurrences, O(len) per doc)
        val mergeOne = udf { toks: Seq[String] =>
          var hit = false
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == rt) {
              out += (l + sep + rt); hit = true; i += 2
            } else { out += toks(i); i += 1 }
          }
          if (!hit) (toks, Seq.empty[(String, String, Long)])
          else {
            val d = scala.collection.mutable.HashMap
              .empty[(String, String), Long]
            var j = 0
            while (j + 1 < out.length) {
              val k = (out(j), out(j + 1)); d(k) = d.getOrElse(k, 0L) + 1; j += 1
            }
            j = 0
            while (j + 1 < toks.length) {
              val k = (toks(j), toks(j + 1)); d(k) = d.getOrElse(k, 0L) - 1; j += 1
            }
            (out.toSeq, d.iterator.collect {
              case ((dl, dr), dn) if dn != 0L => (dl, dr, dn)
            }.toSeq)
          }
        }
        val step = corpus.select(mergeOne(col("ts")).as("m"))
          .select(col("m._1").as("ts"), col("m._2").as("deltas"))
          .localCheckpoint(true)
        val delta = step.select(explode(col("deltas")).as("d"))
          .groupBy(col("d._1").as("l_tok"), col("d._2").as("r_tok"))
          .agg(sum(col("d._3")).as("dn"))
        pairs = pairs.join(delta, Seq("l_tok", "r_tok"), "full_outer")
          .select(col("l_tok"), col("r_tok"),
            (coalesce(col("n_pairs"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n_pairs"))
          .filter(col("n_pairs") > 0)
        corpus = step.select(col("ts"))
        // the pair table's lineage grows one full-outer join per
        // round (the corpus is already truncated by the per-step
        // checkpoint); un-truncated, the next ELECTION re-executes
        // the whole join chain — see the scaladoc on checkpointEvery
        if (r % checkpointEvery == 0)
          pairs = Components.stripStats(pairs.localCheckpoint(true))
        r += 1
      }
    }
    merges.toSeq.toDF("round", "l_tok", "r_tok", "n_pairs")
  }

  /** Unigram language-model quality score — the model-based filter
    * (KenLM-perplexity stand-in) of a pretraining pipeline, log-free
    * so the score is a pure rational of corpus counts:
    *   lm_score(doc) = Σ_t count(t) / (n_tokens(doc) · N)
    * — the mean corpus relative frequency of the doc's tokens, i.e.
    * the unigram probability mass the doc sits on, without the log
    * whose libm rounding would drift between engines. Rare-word and
    * garbled docs score near 1/N; common-word prose scores orders of
    * magnitude higher — threshold downstream like any quality score.
    *
    * Scale: the model is a VOCABULARY-sized aggregate, tiny next to
    * the corpus; tokens cross the model join's exchange as 60-bit
    * hashes, never text; the normalizer N arrives by broadcasting a
    * one-row aggregate, not a collect. The model relation is exactly
    * the shape a standing persisted table would take (the DedupIndex
    * pattern) when the corpus outlives one run.
    */
  def unigramLmScores(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("token"))
      .select(col("doc_id"), Parity.md5_60(col("token")).as("h"))
    val model = toks.groupBy("h").agg(count(lit(1)).as("cnt"))
    val total = model.agg(sum(col("cnt")).as("n_total"))
    toks.join(model, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("s"))
      .crossJoin(broadcast(total))
      // each factor cast to double BEFORE the multiply: the BIGINT
      // product n_tokens·N overflows for a long doc over a ~10^13-token
      // corpus (ANSI mode would kill the job); the double product is
      // rounded identically by both engines, keeping oracle parity
      .select(col("doc_id"), col("n_tokens"),
        (col("s").cast("double") /
          (col("n_tokens").cast("double") * col("n_total").cast("double")))
          .as("lm_score"))
  }

  /** Greedy sequence packing — concatenate-and-chop: docs are laid out
    * in a deterministic order (id) per group (language), and each doc
    * is assigned to the context-window bin its STARTING token offset
    * falls in (bin = start_offset div budget). This is the standard
    * pretraining packing approximation, reproducible at any
    * parallelism.
    *
    * Scale: a naive `Window.partitionBy(group).orderBy(id)` running
    * sum sorts EVERY doc of a group in ONE task — the dominant
    * language of a 100-TB corpus becomes a single-executor sort.
    * Instead the prefix sum is distributed in two passes over
    * bounded shards (shard = id div shardSize, monotone in the layout
    * order so shard boundaries respect it):
    *   1. per-(group, shard) token subtotals — a plain aggregate;
    *   2. exclusive running offsets across the few subtotal rows
    *      (a window over ~groups × shards/group rows, trivially small
    *      relative to the corpus), joined back so each shard's local
    *      running sum — a window whose partitions are capped at
    *      shardSize rows — starts from its global offset.
    * Same deterministic layout, no unbounded sort partition anywhere.
    */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, budgetTokens: Int,
                 shardSize: Long = 1 << 20): DataFrame =
    packGreedyCounts(docs.select(col(idCol), col(groupCol),
        TextOps.tokenCount(col(textCol)).as("n_tok")),
      idCol, groupCol, "n_tok", budgetTokens, shardSize)

  /** [[packGreedy]] over PRECOMPUTED per-doc counts (idCol, groupCol,
    * nCol) — the form a tokenizer-aware pipeline needs: packing
    * budgets are consumed in ENCODED tokens (what the model context
    * window holds), not whitespace tokens, so the count column comes
    * from the tokenizer encode pass ([[bpeApply]]'s n_enc), not from
    * the text. Same sharded two-pass prefix sum.
    */
  def packGreedyCounts(counts: DataFrame, idCol: String, groupCol: String,
                       nCol: String, budgetTokens: Int,
                       shardSize: Long = 1 << 20): DataFrame = {
    // the shard must be monotone in the (group, id) layout order, which
    // `id div shardSize` only is for integral ids. A string id would
    // cast to NULL (inner-joining every row away, silently returning
    // empty) or — for string-numerics — shard by lexicographic order
    // while the local window sorts numerically, producing wrong bins.
    // Fail loudly instead.
    import org.apache.spark.sql.types._
    val idType = counts.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"packGreedy: idCol '$idCol' must be an integral type (got $idType); " +
        "the shard key `id div shardSize` is only layout-order-monotone " +
        "for integral ids")
    val toks = counts.select(col(idCol), col(groupCol),
        col(nCol).cast("long").as("n_tok"))
      .withColumn("__shard", expr(s"cast(`$idCol` as bigint) div ${shardSize}L"))
    val subtotals = toks.groupBy(col(groupCol), col("__shard"))
      .agg(sum(col("n_tok")).as("__sub"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals.withColumn("__off",
      coalesce(sum(col("__sub")).over(wOff), lit(0L)))
      .select(col(groupCol), col("__shard"), col("__off"))
    val wLocal = Window.partitionBy(col(groupCol), col("__shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .join(broadcast(offsets), Seq(groupCol, "__shard"))
      .withColumn("cum", col("__off") + sum(col("n_tok")).over(wLocal))
      .withColumn("bin", expr(s"(cum - n_tok) div $budgetTokens"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
  }
}
