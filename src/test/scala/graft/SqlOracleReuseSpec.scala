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
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      Tables.table(s, TestSpark.Sf0001, t).createOrReplaceTempView(t)
    // shared encoding-normalizing reader, so SQL sees the same `ts` the
    // DSL does (Tables.events handles nanos-long and micros-NTZ fixtures)
    Tables.events(s, TestSpark.Sf0001).createOrReplaceTempView("events")
    s
  }

  override def afterAll(): Unit = {
    TestSpark.restoreSharedSession()
    super.afterAll()
  }

  SqlParityKeys.oracleReuse.toSeq.sorted.foreach { key =>
    test(s"$key: oracle SQL is its own Spark twin") {
      val dsl = SparkEntry.queries(key)(spark, TestSpark.Sf0001)
      val viaSql = spark.sql(SparkEntry.oracleSql(key))
      assert(dsl.columns.toSeq == viaSql.columns.toSeq,
        s"$key column names: DSL ${dsl.columns.toSeq} vs SQL ${viaSql.columns.toSeq}")
      val a = dsl.collect().toSeq.sortBy(_.toString)
      val b = viaSql.collect().toSeq.sortBy(_.toString)
      assert(a.size == b.size, s"$key row counts: DSL ${a.size} vs SQL ${b.size}")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"$key sorted row $i: DSL $ra vs SQL $rb")
      }
    }
  }
}
