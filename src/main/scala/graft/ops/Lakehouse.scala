package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse maintenance patterns (SURVEY.md §2.B "Lakehouse"): the two
  * table-maintenance shapes every warehouse-on-parquet user runs — SCD-1
  * upsert (merge a change set into a base table) and SCD-2 history build
  * (turn an event log into validity intervals). Both are pure DataFrame
  * algebra — no table format required — which is exactly how an engine
  * without a transactional format expresses MERGE.
  *
  * Scale notes (100 TB lens):
  *  - q_upsert is ONE full outer join on the merge key (hash/SMJ,
  *    AQE-splittable) + a coalesce projection; no iteration, no driver
  *    state. With the base bucketed on the key (SkewAndBucketSpec's
  *    layout) the join is shuffle-free on the base side — the change set
  *    is typically ≪ the base and shuffles cheaply or broadcasts.
  *  - q_scd2 is one shuffle by the entity key + a partition-local ordered
  *    window (`lead`) — the per-entity history never crosses executors.
  */
object Lakehouse extends QueryPack {

  /** One drift-audit output row for column `c`, built from the
    * standardized stat names (`rows_a/rows_b`, `nn_{a,b}_c` = non-null
    * counts, `d_{a,b}_c` = exact distinct counts). SINGLE SOURCE for the
    * output shape — q_snapshot_drift (single-scan conditional form) and
    * [[graft.sources.SnapshotLake.audit]] (two-snapshot form) must stay
    * column-for-column identical or the spec-pinned equivalence between
    * them breaks. */
  private[graft] def driftRow(c: String) =
    struct(lit(c).as("col_name"),
      col("rows_a"), col("rows_b"),
      (col("rows_a") - col(s"nn_a_$c")).as("nulls_a"),
      (col("rows_b") - col(s"nn_b_$c")).as("nulls_b"),
      col(s"d_a_$c").as("distinct_a"), col(s"d_b_$c").as("distinct_b"),
      (col(s"d_b_$c") - col(s"d_a_$c")).as("distinct_delta"),
      round((col("rows_b") - col(s"nn_b_$c")).cast("double") /
              col("rows_b") -
            (col("rows_a") - col(s"nn_a_$c")).cast("double") /
              col("rows_a"), 4).as("null_rate_delta"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD-1 upsert (MERGE shape): base = negative-balance customers,
    // change set = per-customer P-order totals. Key in both → UPDATE
    // (balance + delta), change-only → INSERT, base-only → KEEP — the
    // three MERGE branches as one full outer join + coalesce, with an
    // action column proving which branch each row took.
    "q_upsert" -> { (s, d) =>
      val base = Tables.customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"),
                dec(col("c_acctbal")).as("balance"))
      val changes = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("delta"))
      base.join(changes, Seq("custkey"), "full")
        .select(col("custkey"),
                outd(coalesce(col("balance"), dec(lit(0))) +
                     coalesce(col("delta"), dec(lit(0)))).as("new_balance"),
                when(col("balance").isNull, "insert")
                  .when(col("delta").isNull, "keep")
                  .otherwise("update").as("action"))
        .orderBy(col("custkey"))
    },

    // SCD-2 history build: each user's purchase log becomes validity
    // intervals — valid_from = the event ts, valid_to = the next event's
    // ts (null = current row), is_current flag. One shuffle by user, one
    // partition-local lead() over (ts, event_id) — a total order, so both
    // engines pick identical successors.
    "q_scd2" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"),
                col("ts").as("valid_from"),
                lead(col("ts"), 1).over(w).as("valid_to"),
                lead(col("ts"), 1).over(w).isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },

    // Z-order clustering summary — the space-filling-curve layout step
    // behind multi-dimensional data skipping (Delta/Iceberg OPTIMIZE
    // ZORDER BY): interleave the bits of two 8-bit dimension buckets into
    // a 16-bit z-value, tile the curve into 16 ranges, and report each
    // tile's per-dimension envelope. The invariant that MAKES skipping
    // work falls out of the math — a 4096-wide z-range fixes the top 2
    // bits of BOTH dimensions, so every tile confines x and y to 64-wide
    // bands (asserted in AnalyticsSpec) — i.e. a file written per z-range
    // can be pruned by min/max stats on EITHER column. The layout pass at
    // 100 TB is `repartitionByRange(zvalue)` + write; this key computes
    // the same z arithmetic (pure narrow bit math, one tiny agg) in both
    // engines.
    "q_zorder" -> { (s, d) =>
      val x = pmod(col("l_partkey"), lit(256L))
      val y = pmod(col("l_suppkey"), lit(256L))
      val z = (0 until 8).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
      Tables.lineitem(s, d)
        .select(x.as("x"), y.as("y"), z.as("z"))
        .groupBy(floor(col("z") / lit(4096)).cast("int").as("z_tile"))
        .agg(count(lit(1)).as("n"),
             min(col("x")).as("min_x"), max(col("x")).as("max_x"),
             min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("z_tile"))
    },

    // Incremental materialized-view maintenance (the refresh pattern
    // behind every daily-rollup table): yesterday's materialized per-flag
    // aggregate (rows shipped BEFORE the cutoff) merges with an aggregate
    // over only the NEW partition (rows at/after the cutoff) via a full
    // outer join on the group key — counts and exact-decimal sums are
    // mergeable, so merged state ≡ a full recompute, which is exactly
    // what the oracle runs against the whole table. Both branch scans
    // carry a pushed l_shipdate bound (LakehouseSpec pins it): at 100 TB
    // the refresh reads ONE day's partition plus a |groups|-row state
    // frame, never the history. delta_n rides along as the audit column
    // (how much of each group came from the new partition).
    // Snapshot data-quality drift audit (the check a lake runs between
    // two snapshot ids before promoting one): per-column row count, null
    // count, and exact distinct count for snapshot A vs snapshot B, plus
    // the deltas a drift monitor alerts on (distinct growth, null-rate
    // movement). The fixture snapshots are cumulative-append views of
    // `events` (A = rows before the cutoff, B = everything — what
    // consecutive appends look like), which lets the WHOLE audit run as
    // ONE scan with conditional aggregation: count(CASE WHEN old THEN c
    // END) / count(DISTINCT CASE WHEN old THEN c END) compute both
    // snapshots' stats per column in a single pass (Spark plans the
    // multi-distinct via one Expand — still one file scan). The same
    // audit over a real [[graft.sources.SnapshotLake]] pair — where the
    // snapshots are disjoint file sets, nulls included — is
    // SnapshotLake.audit (LakeSinkSpec pins it against this shape). At
    // 100 TB: one pass over the newer snapshot, map-side-combinable;
    // distinct counts swap to approx_count_distinct when exactness isn't
    // contractual (documented, not done here — the oracle needs exact).
    "q_snapshot_drift" -> { (s, d) =>
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      val old = col("ts") < cutoff
      val cols = Seq("user_id", "event_type", "value")
      val aggs = Seq(
        count(when(old, lit(1))).as("rows_a"),
        count(lit(1)).as("rows_b")) ++
        cols.flatMap { c =>
          Seq(count(when(old, col(c))).as(s"nn_a_$c"),
            count(col(c)).as(s"nn_b_$c"),
            countDistinct(when(old, col(c))).as(s"d_a_$c"),
            countDistinct(col(c)).as(s"d_b_$c"))
        }
      val stats = Tables.events(s, d).agg(aggs.head, aggs.tail: _*)
      stats.select(explode(array(cols.map(driftRow): _*)).as("r"))
        .select(col("r.*")).orderBy(col("col_name"))
    },

    "q_agg_incremental" -> { (s, d) =>
      val cutoff = lit("2001-06-01 00:00:00").cast("timestamp")
      def agg(df: DataFrame, n: String, r: String): DataFrame =
        df.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as(n), sum(dec(col("l_extendedprice"))).as(r))
      val state = agg(Tables.lineitem(s, d).filter(col("l_shipdate") < cutoff),
        "n0", "rev0")
      val delta = agg(Tables.lineitem(s, d).filter(col("l_shipdate") >= cutoff),
        "n1", "rev1")
      state.join(delta, Seq("l_returnflag"), "full")
        .select(col("l_returnflag"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n"),
          outd(coalesce(col("rev0"), lit(0).cast("decimal(18,2)")) +
               coalesce(col("rev1"), lit(0).cast("decimal(18,2)"))).as("revenue"),
          coalesce(col("n1"), lit(0L)).as("delta_n"))
        .orderBy(col("l_returnflag"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_upsert" -> """
      WITH base AS (
        SELECT c_custkey AS custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS balance
        FROM customer WHERE c_acctbal < 0
      ), changes AS (
        SELECT o_custkey AS custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
        FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
      )
      SELECT coalesce(b.custkey, c.custkey) AS custkey,
        round(CAST(coalesce(b.balance, 0) + coalesce(c.delta, 0) AS DOUBLE), 4)
          AS new_balance,
        CASE WHEN b.custkey IS NULL THEN 'insert'
             WHEN c.custkey IS NULL THEN 'keep'
             ELSE 'update' END AS action
      FROM base b FULL JOIN changes c ON b.custkey = c.custkey
      ORDER BY custkey""",

    "q_scd2" -> """
      SELECT user_id, event_id, value,
        CAST(ts AS TIMESTAMP) AS valid_from,
        CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS valid_to,
        lead(ts, 1) OVER w IS NULL AS is_current
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, valid_from, event_id""",

    "q_zorder" -> ("""
      WITH b AS (
        SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
      zed AS (
        SELECT x, y, """ +
        (0 until 8).map(i =>
          s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ") + """ AS z
        FROM b)
      SELECT CAST(floor(z / 4096) AS INT) AS z_tile, count(*) AS n,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM zed GROUP BY 1 ORDER BY z_tile"""),

    // Portable (DuckDB ∩ Spark): conditional aggregation + UNION ALL
    // pivot, same text both engines. Its own Spark twin via
    // SqlOracleReuseSpec.
    "q_snapshot_drift" -> {
      val cut = "TIMESTAMP '2024-01-16 00:00:00'"
      val cols = Seq("user_id", "event_type", "value")
      val measures = cols.map { c =>
        s"""count(CASE WHEN ts < $cut THEN $c END) AS nn_a_$c,
           |    count($c) AS nn_b_$c,
           |    count(DISTINCT CASE WHEN ts < $cut THEN $c END) AS d_a_$c,
           |    count(DISTINCT $c) AS d_b_$c""".stripMargin
      }.mkString(",\n    ")
      val branches = cols.map { c =>
        s"""SELECT '$c' AS col_name, rows_a, rows_b,
           |    rows_a - nn_a_$c AS nulls_a, rows_b - nn_b_$c AS nulls_b,
           |    d_a_$c AS distinct_a, d_b_$c AS distinct_b,
           |    d_b_$c - d_a_$c AS distinct_delta,
           |    round(CAST(rows_b - nn_b_$c AS DOUBLE) / rows_b -
           |          CAST(rows_a - nn_a_$c AS DOUBLE) / rows_a, 4)
           |      AS null_rate_delta
           |  FROM s""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""
      WITH s AS (
        SELECT
          count(CASE WHEN ts < $cut THEN 1 END) AS rows_a,
          count(*) AS rows_b,
          $measures
        FROM events)
      SELECT * FROM (
        $branches)
      ORDER BY col_name"""
    },

    // Portable (DuckDB ∩ Spark): the oracle recomputes the view from the
    // FULL table — equality IS the incremental-maintenance correctness
    // claim. Its own Spark twin via SqlOracleReuseSpec.
    "q_agg_incremental" -> """
      WITH full_agg AS (
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        FROM lineitem GROUP BY l_returnflag),
      delta AS (
        SELECT l_returnflag, count(*) AS delta_n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
        GROUP BY l_returnflag)
      SELECT f.l_returnflag, f.n,
             round(CAST(f.rev AS DOUBLE), 4) AS revenue,
             coalesce(d.delta_n, 0) AS delta_n
      FROM full_agg f LEFT JOIN delta d ON f.l_returnflag = d.l_returnflag
      ORDER BY f.l_returnflag"""
  )
}
