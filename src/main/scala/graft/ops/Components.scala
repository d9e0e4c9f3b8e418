package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * that turns pairwise matches into dedup GROUPS (keep one
  * representative per component).
  *
  * Iterative minimum-label propagation: every node repeatedly adopts
  * the smallest label among itself and its neighbors until fixpoint.
  * Each iteration is one distributed join + aggregate; the driver only
  * checks the converged flag (a count), so iterations = O(component
  * diameter) — near-dup clusters are shallow (pairs/triples), so this
  * terminates in 2-3 rounds in practice and is capped by `maxIters`.
  */
object Components {

  /** edges: (src, dst) undirected pairs. Returns (node, component)
    * where component = min node id reachable. Deterministic.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 20): DataFrame = {
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct().cache()
    var labels = und.select(col("u").as("node"))
      .distinct().withColumn("label", col("node")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = und
        .join(labels, und("v") === labels("node"))
        .groupBy(und("u").as("node"))
        .agg(min(col("label")).as("nmin"))
      // carry the changed flag inside the same job — one cached
      // materialization per iteration instead of a second join+count
      val next = labels.join(neighborMin, "node")
        .select(col("node"),
          least(col("label"), col("nmin")).as("label"),
          (col("nmin") < col("label")).as("__changed"))
        .cache()
      val changed = next.filter(col("__changed")).limit(1).count()
      labels.unpersist()
      labels = next.drop("__changed")
      converged = changed == 0
      i += 1
    }
    und.unpersist()
    labels.withColumnRenamed("label", "component")
  }
}
