package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.Assertions.{assert, fail}

/** The ONE parity-compare discipline shared by all three SQL-twin suites
  * (SqlParitySpec / SqlOracleReuseSpec / SqlDialectTwinSpec) — previously
  * three hand-copies that had already diverged on row-order handling.
  *
  *  - `ordered = true`: exact row-order zip — for hand twins whose SQL
  *    carries a deliberately TOTAL order.
  *  - `ordered = false`: sorted-multiset compare — for oracle-derived
  *    twins, where cross-engine row order is explicitly not part of the
  *    contract (the driver gate sorts rows before hashing) and ORDER BY
  *    keys can tie (e.g. (l_orderkey, l_linenumber) is not unique on the
  *    lineitem fixture, so zipping tied rows across two physical plans
  *    would flake on a correct twin).
  */
object SqlParityHarness {

  val FixtureTables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Register every fixture table as a temp view; events goes through the
    * shared encoding-normalizing reader so SQL sees the same `ts` the DSL
    * does (Tables.events handles nanos-long, NTZ, and LTZ fixtures). */
  def registerFixtureViews(s: SparkSession): Unit = {
    FixtureTables.foreach(t =>
      Tables.table(s, TestSpark.Sf0001, t).createOrReplaceTempView(t))
    Tables.events(s, TestSpark.Sf0001).createOrReplaceTempView("events")
  }

  def assertSameResult(key: String, dsl: DataFrame, viaSql: DataFrame,
                       ordered: Boolean): Unit = {
    assert(dsl.columns.toSeq == viaSql.columns.toSeq,
      s"$key column names: DSL ${dsl.columns.toSeq} vs SQL ${viaSql.columns.toSeq}")
    val a0 = dsl.collect().toSeq
    val b0 = viaSql.collect().toSeq
    assert(a0.size == b0.size, s"$key row counts: DSL ${a0.size} vs SQL ${b0.size}")
    if (ordered) {
      a0.zip(b0).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"$key row $i: DSL $ra vs SQL $rb")
      }
    } else {
      // true multiset compare: key→count maps on both sides, so two
      // distinct rows whose toString collide can never misalign inside a
      // sort-tie group. Rows are keyed by a NORMALIZED field sequence,
      // not Row identity: Row.hashCode on an Array[Byte] field is the
      // array's identity hash (inconsistent with Row.equals' value
      // compare), so raw groupBy(identity) would split equal binary rows
      // into separate groups and report a false mismatch.
      def norm(r: org.apache.spark.sql.Row): Seq[Any] = r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x              => x
      }
      val ca = a0.groupBy(norm).view.mapValues(_.size).toMap
      val cb = b0.groupBy(norm).view.mapValues(_.size).toMap
      val onlyA = ca.collect { case (r, n) if cb.getOrElse(r, 0) != n =>
        s"$r (DSL×$n vs SQL×${cb.getOrElse(r, 0)})" }
      val onlyB = cb.collect { case (r, n) if !ca.contains(r) =>
        s"$r (DSL×0 vs SQL×$n)" }
      val diffs = (onlyA ++ onlyB).take(5)
      assert(diffs.isEmpty,
        s"$key multiset mismatch (${onlyA.size + onlyB.size} differing rows), first: ${diffs.mkString("; ")}")
    }
  }
}
