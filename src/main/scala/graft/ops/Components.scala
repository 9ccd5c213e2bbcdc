package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the canonical
  * finisher of a near-dup pipeline: pairwise matches → clusters → one
  * survivor per cluster. Min-label propagation: every node repeatedly
  * adopts the smallest label among itself and its neighbors until no
  * label changes; converges in O(graph diameter) rounds (near-dup
  * clusters are tiny and dense, so a handful).
  *
  * Scale notes: each round is one join + one aggregation — all
  * hash-partitioned by node id, no global structure. The per-round
  * `localCheckpoint` is load-bearing: an iterative DataFrame loop
  * otherwise accumulates lineage and replans/recomputes the whole
  * history every round (at 100 TB, round k would re-run rounds 1..k-1).
  * Label size stays one long per node; the driver only ever sees the
  * one-row convergence count.
  */
object Components {

  /** `pairs` must have two long columns (d1, d2), one row per undirected
    * edge. Returns (id, component) where component = the minimum node id
    * reachable from `id`. Nodes with no edges are absent (they are their
    * own component by definition — callers union them in if needed). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val d1 = pairs.columns(0)
    val d2 = pairs.columns(1)
    // symmetric neighbor list: min-labels must flow both directions
    val edges = pairs.select(col(d1).as("a"), col(d2).as("b"))
      .union(pairs.select(col(d2).as("a"), col(d1).as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("bcomp")).as("nmin"))
      // carry the previous label through the round so convergence is a
      // filter+count on `next` itself — not a third full-labels join
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint()
      val changed = next.filter(col("comp") =!= col("prev")).count()
      // bound executor storage at two label snapshots (old + new) — the
      // weak-ref ContextCleaner path would otherwise keep one per round
      labels.unpersist()
      labels = next.drop("prev")
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
  }
}
