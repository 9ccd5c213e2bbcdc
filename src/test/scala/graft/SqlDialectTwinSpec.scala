package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Data-driven half of the hand-twin parity gate: one test per
  * [[SqlDialectTwins]] entry, asserting the Spark-dialect rewrite of the
  * DuckDB oracle equals the DSL result row-for-row on the same session
  * (same discipline as SqlParitySpec.assertParity; the spec body IS the
  * registry, so coverage cannot drift from the key list).
  */
class SqlDialectTwinSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = TestSpark.extensionsSession()
    SqlParityHarness.registerFixtureViews(s)
    s
  }

  override def afterAll(): Unit = {
    TestSpark.restoreSharedSession()
    super.afterAll()
  }

  SqlDialectTwins.twins.toSeq.sortBy(_._1).foreach { case (key, sql) =>
    test(s"$key: Spark-dialect twin == DSL") {
      SqlParityHarness.assertSameResult(key,
        SparkEntry.queries(key)(spark, TestSpark.Sf0001),
        spark.sql(sql), ordered = false)
    }
  }
}
