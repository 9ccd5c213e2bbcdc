package graft

import graft.ops.Components
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, stars, and disjoint clusters all collapse to their minimum") {
    // chain 1-2-3 (diameter > 1 forces multiple propagation rounds),
    // star onto 30, disjoint pair
    val comp = cc(Seq((1L, 2L), (2L, 3L), (10L, 30L), (20L, 30L), (40L, 41L)))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       10L -> 10L, 30L -> 10L, 20L -> 10L,
                       40L -> 40L, 41L -> 40L))
  }

  test("a long path converges (label must travel the full diameter)") {
    val comp = cc((1L until 12L).map(i => (i, i + 1)))
    assert(comp.values.toSet == Set(1L))
    assert(comp.size == 12)
  }

  test("random graphs match a reference union-find (property over 12 seeds)") {
    // The sum-invariant convergence is the part a wrong proof would break
    // silently (stopping one round early on SOME graph shape), so pin it
    // against an independent union-find on deterministic pseudo-random
    // graphs — mixed sparse/dense, with self-loops and duplicate edges.
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to the true minimum root
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val n = 8 + rnd.nextInt(25)
      val nEdges = 1 + rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = unionFind(n, edges)
      val got = cc(edges)
      // cc() omits edge-less nodes; compare only nodes that appear in
      // edges. min-root merging makes the union-find root the class
      // minimum, and a present node's class holds only present nodes.
      val present = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val want = present.map(id => id -> expected(id)).toMap
      assert(got == want, s"seed $seed: n=$n edges=$edges")
    }
  }

  test("a diameter-59 path converges within the default bound — in O(log n) rounds, not O(diameter)") {
    // r8 verdict item 5: plain neighbor-min needs ~59 rounds here and
    // blew the maxIters=50 default; the fused pointer-doubling candidate
    // makes distance-to-minimum roughly double per round. maxIters = 12
    // (≈ 2·log₂60) pins the logarithmic behavior itself, not just
    // "eventually converges".
    val path = (1L until 60L).map(i => (i, i + 1))
    val comp = Components.connectedComponents(path.toDF("d1", "d2"),
      maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 60 && comp.values.toSet == Set(1L))
  }

  test("an insufficient maxIters fails loudly, never returns partial labels") {
    // the documented failure contract: a run that cannot converge inside
    // the bound throws (a silent partial labeling would split clusters
    // downstream — worse than crashing)
    val path = (1L until 60L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(path.toDF("d1", "d2"), maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("an empty pair set yields an empty frame (no NPE on the null sum)") {
    // the no-near-dups case every clean corpus hits: sum() over zero rows
    // is NULL and must read as converged-at-zero, not crash
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Components.connectedComponents(empty).count() == 0)
  }

  test("a pure self-loop graph converges in one round (no double-counted labels)") {
    // input self-loops already sit in the symmetric list; the synthesized
    // self-edges must not duplicate them, or the initial label sum
    // double-counts and burns a propagation round on a converged graph
    assert(cc(Seq((3L, 3L), (7L, 7L))) == Map(3L -> 3L, 7L -> 7L))
  }

  test("dedupNearCanonical keeps exactly one doc per dup cluster") {
    val docs = Tables.documents(s, TestSpark.Sf0001)
    val pairs = graft.ops.TextOps.minhashPairs(docs, 0.5)
      .select(col("d1"), col("d2"))
    val out = TrainingPipeline.dedupNearCanonical(docs, 0.5)
    val comps = Components.connectedComponents(pairs)
    val clusters = comps.select(col("comp")).distinct().count()
    val clustered = comps.count()
    assert(out.count() == docs.count() - clustered + clusters)
    // canonical is never larger than the conservative pairwise result's
    // removal set... and both keep every cluster minimum
    val mins = comps.filter(col("id") === col("comp"))
      .select(col("id").as("doc_id"))
    assert(mins.join(out, Seq("doc_id"), "left_anti").count() == 0)
  }
}
