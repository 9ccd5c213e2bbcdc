package graft

import graft.expr.WordShingles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd shingler must produce the exact strings of the HOF
  * formulation it replaced — h60 runs on these strings, so any drift
  * breaks the ngram oracle.
  */
class WordShinglesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("3-shingles match the transform/concat_ws form on fixture text") {
    val docs = Tables.documents(s, TestSpark.Sf0001)
    val words = split(col("text"), " ")
    val hof = transform(
      sequence(lit(1), size(words) - 2),
      i => concat_ws(" ", element_at(words, i), element_at(words, i + 1),
                     element_at(words, i + 2)))
    // fixture docs all have >= 3 words, so the HOF form is safe here
    val mismatches = docs
      .select(WordShingles.of(col("text"), 3).as("fast"), hof.as("hof"))
      .filter(!(col("fast") <=> col("hof"))).count() // null-safe inequality
    assert(mismatches == 0)
  }

  test("edge shapes: empty text, multi-space runs, k=1") {
    import s.implicits._
    val df = Seq("", "a  b", "x y z").toDF("t")
    val out = df.select(WordShingles.of(col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty)               // "" → one empty word → < 2 words
    assert(out(1) == Seq("a ", " b"))    // empty middle word preserved
    assert(out(2) == Seq("x y", "y z"))
    val uni = df.select(WordShingles.of(col("t"), 1).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(uni(2) == Seq("x", "y", "z"))
  }
}
