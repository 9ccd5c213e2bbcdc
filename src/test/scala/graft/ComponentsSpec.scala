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
