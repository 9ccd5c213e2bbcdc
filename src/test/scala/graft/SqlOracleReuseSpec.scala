package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical half of the SQL-parity gate: for every key in
  * [[SqlParityKeys.oracleReuse]], the DuckDB oracle SQL string from
  * `SparkEntry.oracleSql` is run VERBATIM through `spark.sql` over the
  * fixture views and compared against the DSL result — same column names,
  * same multiset of rows. These keys' oracle SQL sits in the
  * ANSI-intersection of the two dialects, so the parity twin costs zero
  * duplicated SQL text and can never drift from the oracle.
  *
  * Rows compare as sorted multisets (not zipped): the driver's own gate
  * sorts rows before hashing, so cross-engine row order is explicitly not
  * part of the oracle contract (most DSL keys still end in a total ORDER
  * BY for the three-scale hash-repeatability recorded in SURVEY §7.4).
  */
class SqlOracleReuseSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = TestSpark.extensionsSession()
    SqlParityHarness.registerFixtureViews(s)
    s
  }

  override def afterAll(): Unit = {
    TestSpark.restoreSharedSession()
    super.afterAll()
  }

  SqlParityKeys.oracleReuse.toSeq.sorted.foreach { key =>
    test(s"$key: oracle SQL is its own Spark twin") {
      SqlParityHarness.assertSameResult(key,
        SparkEntry.queries(key)(spark, TestSpark.Sf0001),
        spark.sql(SparkEntry.oracleSql(key)), ordered = false)
    }
  }
}
