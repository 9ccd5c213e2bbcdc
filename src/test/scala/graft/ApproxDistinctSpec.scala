package graft

import graft.ops.Aggregates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Un-weakens q_agg_approx_distinct (round-1 verdict item 4): the HLL++
  * sketch has no DuckDB oracle, so assert each per-group estimate lands
  * within a generous multiple of the configured rsd of the exact count.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  test("approx_count_distinct within 5×rsd of exact per event_type") {
    val spark = TestSpark.spark
    val approx = Aggregates.queries("q_agg_approx_distinct")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, TestSpark.Sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      val tol = math.max(5 * 0.02 * ex, 2.0) // 5×rsd, floor of ±2 for tiny groups
      assert(math.abs(ap - ex) <= tol,
        s"$k: approx $ap vs exact $ex exceeds ±$tol")
    }
  }
}
