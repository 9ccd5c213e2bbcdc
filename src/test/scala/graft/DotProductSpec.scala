package graft

import graft.expr.DotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd dot product must stay bit-identical to the HOF fold it
  * replaced — that equivalence is what keeps the cosine oracles green.
  */
class DotProductSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  test("matches the aggregate(zip_with) fold bit-for-bit on fixture pairs") {
    val e = Tables.embeddings(s, TestSpark.Sf0001)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    val mismatches = e.join(broadcast(probes))
      .select(DotProduct.dot(col("pe"), col("embedding")).as("fast"),
              hofDot(col("pe"), col("embedding")).as("hof"))
      // null-SAFE inequality: =!= would hide a NULL-vs-value divergence
      .filter(!(col("fast") <=> col("hof")))
      .count()
    assert(mismatches == 0)
  }

  test("nulls and length mismatches propagate null like the HOF fold") {
    import s.implicits._
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),       // 11.0
      (None, Some(Seq(1f))),                        // null input
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])), // 0.0
      (Some(Seq(1f, 2f)), Some(Seq(3f)))            // length mismatch → null
    ).toDF("a", "b")
    val out = df.select(DotProduct.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
    assert(out(3).isNullAt(0))
    // null ELEMENT also propagates (the HOF's null-poisoned fold)
    val withNullElem = Seq((Seq[java.lang.Float](1f, null), Seq[java.lang.Float](2f, 3f)))
      .toDF("a", "b")
      .select(DotProduct.dot(col("a").cast("array<float>"),
                             col("b").cast("array<float>")))
      .collect()
    assert(withNullElem(0).isNullAt(0))
  }
}
