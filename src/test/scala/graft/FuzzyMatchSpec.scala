package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** [[TextOps.fuzzyMatchDeletes]] — the corpus-scale fuzzy match (r19):
  * delete-neighborhood blocking must return EXACTLY the contract key's
  * rows (the block changes, the match set must not), on the fixture and
  * on a crafted skew corpus where every word shares the first character
  * (the shape that broke (first-char × length) blocking at the sf10
  * decade). */
class FuzzyMatchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("fuzzyMatchDeletes ≡ q_fuzzy_match on the fixture") {
    val contract = TextOps.queries("q_fuzzy_match")(s, TestSpark.Sf0001)
    val deletes = TextOps.fuzzyMatchDeletes(
      Tables.documents(s, TestSpark.Sf0001))
    assert(rows(deletes) == rows(contract))
    assert(deletes.columns.toSeq == contract.columns.toSeq)
  }

  test("fuzzyMatchDeletes ≡ q_fuzzy_match shape on a hot-initial corpus") {
    import s.implicits._
    // every word starts with 'x' — one first-char block; the delete
    // blocking must not care
    val docs = Seq(
      (1L, "xalpha xbeta xgamma xalpha"),
      (2L, "xalphA xbeta xgammaa xdelta"),
      (3L, "xbet xbeta xgamm")).toDF("doc_id", "text")
    val words = docs.selectExpr("explode(split(text, ' ')) AS word")
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent quadratic reference over the same probe rule
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val probes = words.keySet.map(w => w.dropRight(1)).filter(_.length >= 3)
    val expected = (for {
      p <- probes; (w, n) <- words if lev(p, w) <= 1
    } yield Seq[Any](p, w, lev(p, w).toLong, n)).toSet
    assert(rows(TextOps.fuzzyMatchDeletes(docs)) == expected)
  }
}
