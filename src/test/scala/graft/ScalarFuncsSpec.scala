package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the scalar-function pack that the DuckDB hash-match
  * asserts only incidentally — pinned here so a fixture change fails in
  * the suite instead of flipping the driver gate with no local signal.
  */
class ScalarFuncsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("q_json_funcs fixture invariant: typed parse == string-cast parse on every row") {
    // k_struct comes from an IntegerType from_json; it matches the
    // oracle's CAST(json_extract_string(...) AS INT) only while props.k
    // is a bare (unquoted, integral) JSON literal. Pin both the
    // equivalence and the raw shape.
    val out = SparkEntry.queries("q_json_funcs")(s, TestSpark.Sf0001)
    assert(out.filter(!col("k_struct").eqNullSafe(col("k_int"))).count() == 0,
      "typed from_json diverged from the string-cast path")
    // terminator anchor [,}]: an unanchored pattern would still match the
    // integer PREFIX of a drifted float/exponent k (12.5 → "12") and
    // defeat the guard
    val nonBare = Tables.events(s, TestSpark.Sf0001)
      .filter(!col("props").rlike("\"k\": [0-9]+[,}]")).count()
    assert(nonBare == 0,
      "events.props carries a non-bare-integer k — the typed-parse " +
      "oracle equivalence no longer holds")
  }
}
