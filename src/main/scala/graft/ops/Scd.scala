package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance and the
  * point-in-time dimension join it exists to serve.
  *
  * The reference's load path overwrites dimension rows by key
  * (src/load.py:371-486 — upsert keeps only the latest version); a
  * training-data warehouse needs the OPPOSITE contract: every
  * attribute version is kept with its validity interval so features
  * joined to facts are the values that were true AT FACT TIME —
  * joining today's attributes onto last year's training examples
  * leaks the future into the label window.
  *
  * Dimension schema contract: `key, attrs..., valid_from DATE,
  * valid_to DATE (null = open), is_current BOOLEAN`, at most one open
  * version per key. Keys must be non-null on both sides (the merge
  * joins on plain equality; a null key would silently fall out of
  * both branches).
  *
  * Scale shape: [[merge2]] is ONE full-outer equi-join between the
  * CURRENT slice and the snapshot on the key (shuffle on the key,
  * AQE-splittable, no window), emitting at most two rows per key via
  * a bounded Generate. Closed history passes through untouched — on a
  * real table partitioned by `is_current` the merge rewrites only the
  * current partition and history is never read, so the per-run cost
  * is O(|current| + |snapshot|) regardless of how many years of
  * versions have accumulated.
  */
object Scd {

  private val MetaCols = Seq("valid_from", "valid_to", "is_current")

  /** Merge a full attribute snapshot into a versioned dimension:
    *   - key in both, attributes equal (null-safe)  → current row kept;
    *   - key in both, any attribute differs → current version closed
    *     (`valid_to = effective`, `is_current = false`) AND a new open
    *     version inserted at `effective`;
    *   - key only in the dimension → closed (the key left the source);
    *   - key only in the snapshot → new open version inserted.
    * Rows already closed (`is_current = false`) pass through as-is.
    */
  def merge2(dim: DataFrame, snapshot: DataFrame, key: String,
             attrs: Seq[String], effective: Column): DataFrame = {
    require(attrs.nonEmpty, "SCD2 merge needs at least one tracked attribute")
    val expected = (key +: attrs) ++ MetaCols
    require(expected.forall(dim.columns.contains),
      s"dimension is missing ${expected.filterNot(dim.columns.contains).mkString(", ")}")

    // a duplicated snapshot key would fan out in the full-outer join
    // and insert SEVERAL open versions for it — silently breaking the
    // at-most-one-open-version invariant pointInTime depends on (every
    // fact row for that key then duplicates downstream). One aggregate
    // on the (small) snapshot; refuse loudly like Corpus.stableIds.
    val dupKeys = snapshot.groupBy(col(key))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0,
      s"SCD2 merge: snapshot has duplicated '$key' values — a duplicate " +
        "would insert multiple open versions per key; dedupe the snapshot " +
        "with a deterministic winner first")

    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val c = current.select(
      col(key).as("__ck") +:
        (attrs.map(a => col(a).as(s"__c_$a")) :+ col("valid_from").as("__c_vf")): _*)
    val s = snapshot.select(
      col(key).as("__sk") +: attrs.map(a => col(a).as(s"__s_$a")): _*)
    val j = c.join(s, col("__ck") === col("__sk"), "full_outer")

    val inC = col("__ck").isNotNull
    val inS = col("__sk").isNotNull
    // null-safe per attribute: a null attribute value is "unchanged"
    // against null, changed against anything else
    val same = attrs.map(a => col(s"__c_$a") <=> col(s"__s_$a")).reduce(_ && _)

    val validToType = dim.schema("valid_to").dataType
    def version(k: Column, vals: Seq[Column], vf: Column, vt: Column,
                cur: Column): Column =
      struct(
        (k.as(key) +: vals.zip(attrs).map { case (v, a) => v.as(a) }) ++
          Seq(vf.as("valid_from"), vt.cast(validToType).as("valid_to"),
            cur.as("is_current")): _*)

    val cVals = attrs.map(a => col(s"__c_$a"))
    val sVals = attrs.map(a => col(s"__s_$a"))
    // at most 2 of the 3 cases fire per key; when() without otherwise
    // yields null and the array filter drops it — one pass, bounded fanout
    val fromCurrent =
      when(inC && inS && same,
        version(col("__ck"), cVals, col("__c_vf"), lit(null), lit(true)))
        .when(inC && (!inS || !same),
          version(col("__ck"), cVals, col("__c_vf"), effective, lit(false)))
    val inserted =
      when(inS && (!inC || !same),
        version(col("__sk"), sVals, effective, lit(null), lit(true)))

    val merged = j
      .select(explode(filter(array(fromCurrent, inserted),
        v => v.isNotNull)).as("__v"))
      .select(col("__v.*"))
    history.select(expected.map(col): _*).unionByName(merged)
  }

  /** Point-in-time-correct dimension join: each fact row gets the
    * dimension version whose `[valid_from, valid_to)` interval covers
    * the fact's date — the as-of contract that keeps post-hoc
    * attribute changes out of historical training examples. Facts
    * whose key has no version covering their date are dropped (inner
    * join); open versions (`valid_to` null) cover everything from
    * `valid_from` on.
    *
    * One equi-join on the key with the interval predicate as a
    * residual: per-key version counts are small by construction (one
    * per attribute change), so the residual never degenerates into a
    * range-join blowup the way event×event interval joins can —
    * contrast [[RangeJoin]], which buckets when BOTH sides are large.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, factKey: String,
                  dimKey: String, factDate: Column,
                  dimCols: Seq[String]): DataFrame = {
    // internal rename so factKey == dimKey cannot make the final drop
    // ambiguous (drop-by-name removes BOTH same-named columns)
    val d = dim.select(
      col(dimKey).as("__dim_key") +: (dimCols.map(col) ++
        Seq(col("valid_from").as("__vf"), col("valid_to").as("__vt"))): _*)
    facts.join(d,
      facts(factKey) === col("__dim_key") &&
        factDate >= col("__vf") &&
        (col("__vt").isNull || factDate < col("__vt")))
      .drop("__dim_key", "__vf", "__vt")
  }
}
