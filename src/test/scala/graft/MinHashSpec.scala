package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinHash ε-bound + goldens (SURVEY §5.2 item 3, ADVICE r2 item 2).
  *
  * The estimator: with 64 independent permutations, the fraction of agreeing
  * signature slots estimates Jaccard with std-err sqrt(J(1-J)/64) ≤ 0.0625;
  * the assertions allow 4σ ≈ 0.25 absolute — loose enough to never flake on
  * a fixed seed family, tight enough to catch a broken permutation family
  * (which drives agreement to ~0 or ~1 regardless of J).
  */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Build a documents-shaped DF and compute 64-slot signatures via the
    * SAME (a*h+b) mod p family q_dedup_minhash uses (shared code path:
    * TextOps.signatureFrame). */
  private def signatures(docs: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    TextOps.signatureFrame(TextOps.shingleHashes(df))
      .collect()
      .map(r => r.getLong(0) -> (1 to 64).map(r.getLong(_)).toSeq)
      .toMap
  }

  private def words(n: Int, offset: Int = 0): String =
    (offset until offset + n).map(i => s"w$i").mkString(" ")

  private def exactJaccard(a: String, b: String): Double = {
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("identical docs agree on every slot") {
    val sigs = signatures(Seq((1L, words(50)), (2L, words(50))))
    assert(sigs(1L) == sigs(2L))
  }

  test("disjoint docs agree on (almost) no slot") {
    val sigs = signatures(Seq((1L, words(50)), (2L, words(50, 1000))))
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree <= 4, s"disjoint docs agreed on $agree/64 slots")
  }

  test("estimate within 4-sigma of exact Jaccard across overlap levels") {
    val a = words(60)
    for (shift <- Seq(10, 25, 45)) {
      val b = words(60, shift) // overlap shrinks as shift grows
      val j = exactJaccard(a, b)
      val sigs = signatures(Seq((1L, a), (2L, b)))
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - j) <= 0.25,
        s"shift=$shift exact=$j est=$est — outside ε-bound")
    }
  }

  test("q_dedup_minhash golden: seeded near-dups surface, output is sane") {
    val df = TextOps.queries("q_dedup_minhash")(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty, "dup-heavy fixture must yield at least one pair")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered d1 < d2")
      val jac = r.getDouble(2)
      assert(jac >= 0.5 && jac <= 1.0, s"jaccard $jac outside [0.5, 1]")
    }
    // deterministic across runs (fixed hash family, no RNG)
    val again = TextOps.queries("q_dedup_minhash")(spark, TestSpark.Sf0001).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("q_dedup_recall == sequential brute-force Jaccard truth per threshold") {
    // Independent recomputation: collect the corpus, shingle in plain
    // Scala, score EVERY pair exactly — then check the key's n_true
    // against it, that found ⊆ true, and the closed-form recall/p_band.
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty)
    val jac = for {
      i <- sets.indices; k <- (i + 1) until sets.length
      inter = sets(i)._2.intersect(sets(k)._2).size
      if inter > 0
    } yield r4(inter.toDouble /
        (sets(i)._2.size + sets(k)._2.size - inter))
    val rows = SparkEntry.queries("q_dedup_recall")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      Seq(0.2, 0.3, 0.5, 0.7, 0.9))
    rows.foreach { r =>
      val t = r.getAs[Double]("threshold")
      assert(r.getAs[Long]("n_true") == jac.count(_ >= t).toLong,
        s"t=$t n_true")
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_true"),
        "the exact-confirm design makes found ⊆ true")
      assert(r.getAs[Double]("recall") == r4(
        r.getAs[Long]("n_found").toDouble / r.getAs[Long]("n_true")))
      assert(r.getAs[Double]("p_band") ==
        r4(1.0 - math.pow(1.0 - math.pow(t, 4), 16)), s"t=$t p_band")
    }
    // recall is monotone in threshold (bands only get more reliable as
    // true similarity rises)
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(recalls.sliding(2).forall(p => p.head <= p.last),
      s"recall not monotone: $recalls")
  }
}
