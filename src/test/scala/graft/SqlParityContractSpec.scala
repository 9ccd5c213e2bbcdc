package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-parity analog of SurveyContractSpec: SqlParityKeys must
  * partition the full §2.B key set. A key in none of the three sets (a new
  * operator landed without a twin or exemption) or in two (stale registry)
  * fails here mechanically.
  */
class SqlParityContractSpec extends AnyFunSuite {

  test("handTwins / dialectTwins / oracleReuse / exempt partition SparkEntry.queries exactly") {
    val all = SparkEntry.queries.keySet
    val sets = Seq(
      "handTwins" -> SqlParityKeys.handTwins,
      "dialectTwins" -> SqlParityKeys.dialectTwins,
      "oracleReuse" -> SqlParityKeys.oracleReuse,
      "exempt" -> SqlParityKeys.exempt.keySet)

    for (Seq((na, a), (nb, b)) <- sets.combinations(2))
      assert((a intersect b).isEmpty,
        s"in both $na and $nb: ${(a intersect b).toSeq.sorted.mkString(", ")}")

    val union = sets.map(_._2).reduce(_ ++ _)
    assert(union == all,
      s"keys with no twin and no exemption: ${(all -- union).toSeq.sorted.mkString(", ")}; " +
      s"registry keys not in SparkEntry.queries: ${(union -- all).toSeq.sorted.mkString(", ")}")
  }

  test("every oracleReuse key actually has oracle SQL to reuse") {
    val missing = SqlParityKeys.oracleReuse -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"oracleReuse without oracle SQL: ${missing.toSeq.sorted}")
  }
}
