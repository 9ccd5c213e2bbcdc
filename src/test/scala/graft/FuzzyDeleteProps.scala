package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The delete-neighborhood blocking guarantee behind
  * [[graft.ops.TextOps.fuzzyMatchDeletes]] (r19): two strings within
  * Levenshtein distance 1 ALWAYS share a key in
  * `{identity} ∪ {single-character deletions}` — so the blocked join
  * loses no candidate the exact quadratic scan would have found. Fuzzed
  * at the string level with an independent DP edit distance; the
  * DataFrame-level row-equality with the contract key is pinned in
  * FuzzyMatchSpec.
  */
object FuzzyDeleteProps extends Properties("FuzzyDelete") {

  private def deleteKeys(s: String): Set[String] =
    Set(s) ++ s.indices.map(i => s.take(i) + s.drop(i + 1))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcxyzäλ".toList)).map(_.mkString))

  // one random edit applied to a word: substitution, insertion, deletion
  private val editedPair: Gen[(String, String)] = for {
    w <- word
    kind <- Gen.chooseNum(0, 2)
    pos <- Gen.chooseNum(0, math.max(0, w.length - 1))
    ch <- Gen.oneOf("abcxyzäλ".toList)
  } yield kind match {
    case 0 => (w, w.updated(pos, ch))                      // substitution
    case 1 => (w, w.take(pos) + ch + w.drop(pos))          // insertion
    case _ => (w, if (w.length <= 1) w
                  else w.take(pos) + w.drop(pos + 1))      // deletion
  }

  property("distance <= 1 pairs always share a delete key") =
    forAll(editedPair) { case (a, b) =>
      lev(a, b) > 1 || (deleteKeys(a) intersect deleteKeys(b)).nonEmpty
    }

  property("identical strings share the identity key; distance-2 pairs " +
           "may be blocked apart but the exact filter decides, never " +
           "the block (no false positives claimed)") =
    forAll(word) { w =>
      (deleteKeys(w) intersect deleteKeys(w)).nonEmpty
    }

  property("delete-key count is len+1 minus duplicate collapses " +
           "(linear in string length, the scale bound)") =
    forAll(word) { w =>
      val k = deleteKeys(w)
      k.size <= w.length + 1 && k.size >= 1
    }
}
