package graft

import graft.expr.{GoTs, GoTimestampFormat}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Go `.999` timestamp verb (reference `main.go:179`,
  * `"2006-01-02T15:04:05.999Z"`): millisecond precision, trailing fraction
  * zeros trimmed, the dot dropped when the fraction is zero.
  */
class GoTimestampFormatSpec extends AnyFunSuite {

  private val base = 1704067200000000L // 2024-01-01T00:00:00Z

  test("zero fraction drops the dot entirely") {
    assert(GoTs.formatMicros(base).toString == "2024-01-01T00:00:00Z")
  }
  test(".120 trims to .12, .100 to .1, .123 stays") {
    assert(GoTs.formatMicros(base + 120000L).toString == "2024-01-01T00:00:00.12Z")
    assert(GoTs.formatMicros(base + 100000L).toString == "2024-01-01T00:00:00.1Z")
    assert(GoTs.formatMicros(base + 123000L).toString == "2024-01-01T00:00:00.123Z")
  }
  test("sub-millisecond micros truncate like Go's millisecond verb") {
    assert(GoTs.formatMicros(base + 999L).toString == "2024-01-01T00:00:00Z")
    assert(GoTs.formatMicros(base + 1999L).toString == "2024-01-01T00:00:00.001Z")
  }
  test("pre-epoch timestamps format correctly (floorDiv/floorMod)") {
    assert(GoTs.formatMicros(-1000000L).toString == "1969-12-31T23:59:59Z")
  }

  test("expression path (interpreted + codegen) agrees with the helper") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(base, base + 120000L, base + 123000L, base + 999L)
      .toDF("us")
      .select(GraftShim.column(GoTimestampFormat(
        GraftShim.expression(timestamp_micros(col("us"))))).as("s"))
    assert(df.as[String].collect().toSeq == Seq(
      "2024-01-01T00:00:00Z", "2024-01-01T00:00:00.12Z",
      "2024-01-01T00:00:00.123Z", "2024-01-01T00:00:00Z"))
  }
}
