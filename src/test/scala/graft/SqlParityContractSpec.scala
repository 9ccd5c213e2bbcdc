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

  test("canary: the recursion exemptions stay earned — Spark still refuses both closure forms") {
    // r10 verdict item 6: the two `exempt` entries are pinned to concrete
    // Spark 4.1 gaps. This test ATTEMPTS both blocked constructs and
    // INVERTS on success: the day a Spark upgrade runs either one, the
    // exemption is stale, this fails loudly, and the SQL twin for
    // q_connected_components / q_dedup_cluster_rep gets written.
    val spark = TestSpark.spark
    def attempt(sql: String): Option[String] =
      try { spark.sql(sql).collect(); None }
      catch { case e: Throwable => Some(e.toString) }

    // gap 1: cycle-safe closure needs recursive UNION (distinct)
    val unionDistinct = attempt("""
      WITH RECURSIVE r(id) AS (
        SELECT 1 UNION SELECT id + 1 FROM r WHERE id < 3)
      SELECT * FROM r""")
    assert(unionDistinct.isDefined,
      "Spark now runs UNION-distinct recursive CTEs — the " +
      "q_connected_components/q_dedup_cluster_rep exemptions are STALE: " +
      "write the fixpoint SQL twins and retire both exempt entries")
    assert(unionDistinct.get.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"),
      s"recursion refused for a NEW reason — re-probe and update the " +
      s"exemption text: ${unionDistinct.get.take(300)}")

    // gap 2: bounded min-label propagation needs an aggregate over the
    // recursive reference
    val aggOverRec = attempt("""
      WITH RECURSIVE r(id) AS (
        SELECT 1 UNION ALL SELECT min(id) + 1 FROM r WHERE id < 3)
      SELECT * FROM r""")
    assert(aggOverRec.isDefined,
      "Spark now allows aggregates over the recursive reference — the " +
      "min-label-propagation twin is writable: retire the exemptions")
    assert(aggOverRec.get.contains("INVALID_RECURSIVE_REFERENCE"),
      s"recursion refused for a NEW reason — re-probe and update the " +
      s"exemption text: ${aggOverRec.get.take(300)}")
  }
}
