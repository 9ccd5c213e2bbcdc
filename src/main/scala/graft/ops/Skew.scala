package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for fact⋈fact joins whose key distribution is hot
  * (SCALE.md "joins"). AQE's skew-join split handles most cases at
  * runtime; explicit salting is the deterministic fallback when a single
  * key is so hot that even split partitions overwhelm executors, or when
  * AQE is unavailable (streaming joins).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `factor` ways: the big side
    * gets a deterministic per-row salt, the small side is replicated once
    * per salt value, and the join key becomes (key, salt) — a hot key's
    * rows spread over `factor` shuffle partitions instead of one.
    * Result equals `big.join(small, Seq(key), "inner")` exactly; cost is
    * `factor`× the small side (keep it the dimension/smaller input).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not already have a _salt column (it would be clobbered)")
    // salt from a hash of the whole big row (monotonically_increasing_id
    // would break determinism across reruns): any column set works, the
    // spread only needs to be roughly uniform
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted sum+count by `key`: phase 1 aggregates by
    * (key, salt) so a hot key's rows spread over `factor` reducers; phase
    * 2 merges the ≤`factor` partials per key. Exact for any mergeable
    * aggregate — here sum+count, from which avg also falls out; pass a
    * DECIMAL-cast `value` when the sum must be reassociation-stable.
    * min/max salt identically; count-distinct instead needs the two-level
    * expand (distinct first, then count). Result ≡
    * `df.groupBy(key).agg(sum(value), count(*))` — contract-pinned by
    * `q_agg_salted`'s oracle, which runs the direct form.
    */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
                     factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(factor.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pn")).as("n"))
  }

  /** Top-`n` hottest values of `key` with their row counts — the probe a
    * pipeline runs before deciding to salt. One partial-aggregated pass. */
  def hotKeys(df: DataFrame, key: String, n: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(n)
}
