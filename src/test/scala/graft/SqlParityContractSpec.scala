package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-parity analog of SurveyContractSpec: SqlParityKeys must
  * partition the full §2.B key set. A key in none of the three sets (a new
  * operator landed without a twin or exemption) or in two (stale registry)
  * fails here mechanically.
  */
class SqlParityContractSpec extends AnyFunSuite {

  test("handTwins / oracleReuse / exempt partition SparkEntry.queries exactly") {
    val all = SparkEntry.queries.keySet
    val h = SqlParityKeys.handTwins
    val r = SqlParityKeys.oracleReuse
    val e = SqlParityKeys.exempt.keySet

    assert((h intersect r).isEmpty, s"in both handTwins and oracleReuse: ${(h intersect r).toSeq.sorted}")
    assert((h intersect e).isEmpty, s"in both handTwins and exempt: ${(h intersect e).toSeq.sorted}")
    assert((r intersect e).isEmpty, s"in both oracleReuse and exempt: ${(r intersect e).toSeq.sorted}")

    val union = h ++ r ++ e
    assert(union == all,
      s"keys with no twin and no exemption: ${(all -- union).toSeq.sorted.mkString(", ")}; " +
      s"registry keys not in SparkEntry.queries: ${(union -- all).toSeq.sorted.mkString(", ")}")
  }

  test("every oracleReuse key actually has oracle SQL to reuse") {
    val missing = SqlParityKeys.oracleReuse -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"oracleReuse without oracle SQL: ${missing.toSeq.sorted}")
  }
}
