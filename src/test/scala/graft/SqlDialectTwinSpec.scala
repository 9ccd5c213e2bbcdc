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
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      Tables.table(s, TestSpark.Sf0001, t).createOrReplaceTempView(t)
    Tables.events(s, TestSpark.Sf0001).createOrReplaceTempView("events")
    s
  }

  override def afterAll(): Unit = {
    TestSpark.restoreSharedSession()
    super.afterAll()
  }

  SqlDialectTwins.twins.toSeq.sortBy(_._1).foreach { case (key, sql) =>
    test(s"$key: Spark-dialect twin == DSL") {
      val dsl = SparkEntry.queries(key)(spark, TestSpark.Sf0001)
      val viaSql = spark.sql(sql)
      assert(dsl.columns.toSeq == viaSql.columns.toSeq,
        s"$key column names: DSL ${dsl.columns.toSeq} vs SQL ${viaSql.columns.toSeq}")
      val a = dsl.collect().toSeq
      val b = viaSql.collect().toSeq
      assert(a.size == b.size, s"$key row counts: DSL ${a.size} vs SQL ${b.size}")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"$key row $i: DSL $ra vs SQL $rb")
      }
    }
  }
}
