package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the second-wave pipeline operators, beyond the DuckDB
  * hash-match the driver already runs: structural guarantees the oracle
  * can't see (band guarantee, score bounds, top-k shape).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private def q(name: String) =
    PipelineOps.queries(name)(s, TestSpark.Sf0001)

  test("q_dedup_simhash pairs are ordered, deduped, and within Hamming 3") {
    val rows = q("q_dedup_simhash")
      .select("d1", "d2", "hamming").as[(Long, Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect()
    assert(rows.nonEmpty, "fixture's near-dup docs should collide")
    assert(rows.forall { case (d1, d2, h) => d1 < d2 && h >= 0 && h <= 3 })
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("q_quality_score stays in [0,1] with ratios in range") {
    val rows = q("q_quality_score").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val dr = r.getAs[Double]("distinct_ratio")
      val sr = r.getAs[Double]("stop_ratio")
      val qv = r.getAs[Double]("quality")
      assert(dr >= 0 && dr <= 1); assert(sr >= 0 && sr <= 1)
      assert(qv >= 0 && qv <= 1)
    }
  }

  test("q_ann_ivf returns exactly 5 ranked neighbors per probe") {
    val rows = q("q_ann_ivf").collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.keySet == Set(10L, 11L, 12L, 13L, 14L))
    byProbe.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val cos = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_lang_id confusion matrix accounts for every document") {
    val total = q("q_lang_id").agg(sum("n_docs")).head.getLong(0)
    val docs = Tables.documents(s, TestSpark.Sf0001).count()
    assert(total == docs, "every doc shares at least one profile word")
  }

  test("q_multimodal_meta magic bytes are the payload's first 4 bytes") {
    val rows = q("q_multimodal_meta")
      .join(Tables.documents(s, TestSpark.Sf0001), "doc_id")
      .select("magic_hex", "text").collect()
    rows.foreach { r =>
      val expect = r.getAs[String]("text").getBytes("UTF-8").take(4)
        .map(b => f"$b%02X").mkString
      assert(r.getAs[String]("magic_hex") == expect)
    }
  }

  test("short documents yield empty shingle sets instead of ANSI crashes") {
    import s.implicits._
    // regression class: the old HOF formulations indexed past the array
    // end (throws under Spark 4 ANSI) or ran sequence() backwards on
    // short docs; WordShingles must give empty sets below k
    val docs = Seq((1L, "solo"), (2L, "two words"), (3L, "a b c d")).toDF("doc_id", "text")
    val bi = docs.select(col("doc_id"),
        graft.expr.WordShingles.of(col("text"), 2).as("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bi(1L).isEmpty)
    assert(bi(2L) == Seq("two words"))
    assert(bi(3L) == Seq("a b", "b c", "c d"))
    val sh = docs.select(col("doc_id"),
      graft.ops.TextOps.shingles(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty && sh(3L) == Seq("a b c", "b c d"))
  }

  test("q_doc_fingerprint: identical texts get identical fingerprints") {
    val out = q("q_doc_fingerprint")
    val joined = out.join(
        Tables.documents(s, TestSpark.Sf0001).select(
          col("doc_id"), md5(col("text")).as("th")), "doc_id")
      .groupBy("th")
      .agg(countDistinct(col("fp_xor"), col("fp_min"), col("n_fp")).as("v"))
    assert(joined.filter(col("v") > 1).count() == 0)
  }
}
