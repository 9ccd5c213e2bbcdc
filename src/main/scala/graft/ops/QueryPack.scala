package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One pack per SURVEY.md §2.B category. `queries` are the engine
  * implementations; `oracles` the equivalent DuckDB SQL (omit a key for
  * no-oracle ops — the driver then records a weaker rows-only check).
  *
  * Determinism rules (SURVEY.md §5.2): every oracle-matched query ends in a
  * total-order ORDER BY; double aggregates are computed over exact
  * DECIMAL(18,2) casts (fixture money columns are all 2-decimal) and only
  * converted back to double after a `round(_, 4)`, so Spark's and DuckDB's
  * addition order cannot diverge the hash.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Exact decimal view of a 2-decimal double column (hash-stable sums). */
  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal view of an arbitrary-precision double column: both
    * engines round identically to 10 decimals, then sum exactly — the sum
    * order can no longer diverge the hash. */
  protected def dec10(c: Column): Column = c.cast(DecimalType(28, 10))

  /** Final float output: exact decimal → rounded double, both engines agree. */
  protected def outd(c: Column): Column = round(c.cast("double"), 4)
}
