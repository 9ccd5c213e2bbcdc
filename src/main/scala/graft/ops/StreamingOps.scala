package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B "Streaming" — the time-window/dedup/state operators.
  *
  * Each key here is the BATCH form of the identical Structured Streaming
  * computation: `window`/`session_window`/`dropDuplicates` are the same
  * logical operators batch and streaming, so the DuckDB oracle on the batch
  * result also pins the streaming semantics. The genuinely streaming-only
  * behaviors (watermark late-drop under out-of-order arrival, mapGroups
  * state) are exercised with MemoryStream in StreamingSpec, asserting
  * equivalence to these batch twins.
  *
  * Scale notes: tumbling/sliding/session windows shuffle once by
  * (window/user) key with partial aggregation; the sliding window's 4×
  * Expand (1h / 15m) is inherent to overlap. The watermark batch analog
  * replays a single global arrival order — faithful to the reference's one
  * producer — but computes the prefix max range-partitioned (see the key),
  * never through a single-partition window; a cluster version tracks the
  * watermark per source partition exactly like Spark's streaming engine.
  */
object StreamingOps extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 1-hour tumbling window: count + exact-decimal value sum.
    "q_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"),
             outd(sum(dec10(col("value")))).as("sum_value"))
        .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
        .orderBy(col("win_start"))
    },

    // 1-hour window sliding every 15 minutes: each event lands in 4 windows.
    "q_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n"))
        .orderBy(col("win_start"))
    },

    // 30-minute-gap sessions per user: start/end (end = last event + gap),
    // event count, exact-decimal value sum.
    "q_session_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"),
             outd(sum(dec10(col("value")))).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
                col("session_window.end").as("sess_end"), col("n"),
                col("sum_value"))
        .orderBy(col("user_id"), col("sess_start"))
    },

    // Dedup by event_id over an intentionally doubled input (the fixture's
    // event_id is unique, so the self-union manufactures the duplicates a
    // stream would re-deliver; duplicate rows are bit-identical, keeping
    // dropDuplicates deterministic).
    "q_stream_dedup" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"))
      ev.unionAll(ev)
        .dropDuplicates("event_id")
        .orderBy(col("event_id"))
    },

    // Watermark late-drop, batch analog: arrival order = event_id; the
    // watermark after each arrival is max(ts seen so far) - 10 min; a row
    // is late iff its ts is below the watermark at arrival.
    //
    // Scale-safe, Tungsten-native AND fully planned (r16, VERDICT r15
    // item 6 — the driver-side carry loop retired): a global exclusive
    // prefix-max runs as a THREE-level bucket hierarchy, all in the plan:
    //   1. deterministic arithmetic buckets on arrival order
    //      (floor(event_id / BucketWidth) — no sampling, so no pass can
    //      disagree with another); the row-grain exclusive prefix max is
    //      bucket-LOCAL (parallel windows);
    //   2. bucket-grain carries are superbucket-LOCAL (parallel windows
    //      partitioned by floor(bucket / SuperWidth));
    //   3. only the SUPERBUCKET-grain carry — |maxId / (BucketWidth ×
    //      SuperWidth)| rows, ~10^5 at a 10^11-id feed — crosses the one
    //      single-partition window, the same reduced-grain trade as a
    //      final global agg. The carries ride back down as two broadcast
    //      joins; the fact table never leaves its bucket partitioning.
    // A row's watermark input = greatest(in-bucket prefix, in-super
    // bucket carry, super carry). `greatest` skips NULLs, so the first
    // bucket/super (no carry) and each bucket's first row (no in-bucket
    // prefix) fall out naturally; a row with NO preceding row at all gets
    // NULL → is_late = false via three-valued AND. Timestamps travel as
    // long micros. Unlike the r15 form there is NO eager build-time job
    // and NO driver materialization — one lazy plan end to end.
    "q_watermark_late" -> { (s, d) =>
      val BucketWidth = 1024L // rows per bucket — the scale knob
      val SuperWidth = 1024L  // buckets per superbucket
      val lateMicros = 10L * 60 * 1000000
      val base = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("tsu"))
        .withColumn("bucket", floor(col("event_id") / BucketWidth))
      val bmax = base.groupBy(col("bucket"))
        .agg(max(col("tsu")).as("bmax"))
        .withColumn("sb", floor(col("bucket") / SuperWidth))
      // super-grain EXCLUSIVE prefix max — the only global window, over
      // the doubly-reduced frame
      val wSuper = Window.orderBy(col("sb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val scarry = bmax.groupBy(col("sb")).agg(max(col("bmax")).as("smax"))
        .withColumn("scarry", max(col("smax")).over(wSuper))
        .select(col("sb"), col("scarry"))
      // bucket-grain carry = greatest(in-super exclusive prefix, super
      // carry) — parallel windows partitioned by superbucket
      val wInSb = Window.partitionBy(col("sb")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bmax
        .withColumn("insb", max(col("bmax")).over(wInSb))
        .join(broadcast(scarry), Seq("sb"))
        .select(col("bucket"),
          greatest(col("insb"), col("scarry")).as("carry"))
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      base.join(broadcast(offsets), Seq("bucket"))
        .withColumn("pmax", greatest(max(col("tsu")).over(wIn), col("carry")))
        .select(col("event_id"),
          (col("pmax").isNotNull &&
            col("tsu") < col("pmax") - lateMicros).as("is_late"))
        .orderBy(col("event_id"))
    },

    // Stream⋈stream interval join, batch twin: each purchase pairs with
    // every signup of the same user in the preceding 2 hours — the
    // enrichment join an event pipeline (the reference's producer domain)
    // hits first. The join key is the EQUI user_id (hash/SMJ-shuffleable;
    // one shuffle per side, AQE-splittable); the time-range predicate
    // filters matches — never a nested loop (PlanSpec asserts). The
    // streaming form is the identical join with `withWatermark` on BOTH
    // sides: the range constraint bounds each side's buffered state and
    // late rows drop at ingestion — exercised against MemoryStream in
    // StreamingSpec ("stream-stream interval join").
    "q_stream_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
                col("ts").as("purchase_ts"), col("value"))
      val g = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"),
                col("user_id").as("signup_user"), col("ts").as("signup_ts"))
      p.join(g, col("user_id") === col("signup_user") &&
                col("purchase_ts") >= col("signup_ts") &&
                col("purchase_ts") < col("signup_ts") + expr("INTERVAL 2 HOURS"))
        .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
                col("signup_id"), col("signup_ts"), col("value"))
        .orderBy(col("purchase_id"), col("signup_id"))
    },

    // Per-user running state (event count + value sum) — the batch twin of
    // the transformWithState/flatMapGroupsWithState query in StreamingSpec.
    "q_stateful_running" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
                count(lit(1)).over(w).as("run_n"),
                outd(sum(dec10(col("value"))).over(w)).as("run_sum"))
        .orderBy(col("event_id"))
    },

    // Chained stateful aggregation, batch twin: 15-min tumbling counts
    // re-aggregated into hourly avg/max/sum — the "aggregate the
    // aggregates" pipeline (Spark 4 runs multiple stateful operators in
    // one streaming query when each carries event-time, i.e. the first
    // agg groups by window and the second windows over window.start; the
    // MemoryStream form is pinned in StreamingSpec "chained windowed
    // aggregations"). Both levels are two-phase hash aggs over window
    // keys; level 2's input is already only O(windows) rows.
    "q_stream_agg_chain" -> { (s, d) =>
      val sub = Tables.events(s, d)
        .groupBy(window(col("ts"), "15 minutes"))
        .agg(count(lit(1)).as("n15"))
        .select(col("window.start").as("w15"), col("n15"))
      sub.groupBy(window(col("w15"), "1 hour"))
        .agg(round(avg(col("n15")), 4).as("avg_n15"),
             max(col("n15")).as("max_n15"),
             sum(col("n15")).as("sum_n"))
        .select(col("window.start").as("win_start"),
                col("avg_n15"), col("max_n15"), col("sum_n"))
        .orderBy(col("win_start"))
    },

    // Windowed top-k (the streaming-dashboard staple — "top event types
    // per hour"): tumbling-window counts ranked per window, keep rank ≤ 3
    // with a (count desc, type) total order so both engines cut the same
    // rows. Spark can't rank inside a streaming aggregation — the
    // production shape is this ranking applied per micro-batch over the
    // windowed-count state (foreachBatch / downstream batch over the
    // sink), which is exactly the batch form here; StreamingSpec asserts
    // the streamed windowed counts feed this rank to the identical
    // result. The rank filter runs through WindowGroupLimit's partial
    // top-k before the window shuffle.
    "q_stream_topk" -> { (s, d) =>
      val counts = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      counts
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("win_start"))
            .orderBy(col("n").desc, col("event_type"))).cast("int"))
        .filter(col("rk") <= 3)
        .orderBy(col("win_start"), col("rk"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_tumbling_window" -> """
      SELECT date_trunc('hour', ts) AS win_start, count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_value
      FROM events GROUP BY 1 ORDER BY win_start""",

    "q_sliding_window" -> """
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - CAST(t.r AS INT) * INTERVAL '15 minutes' AS win_start,
             count(*) AS n
      FROM events, range(4) t(r)
      GROUP BY 1 ORDER BY win_start""",

    "q_session_window" -> """
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
      )
      SELECT user_id, min(ts) AS sess_start,
             max(ts) + INTERVAL '30 minutes' AS sess_end,
             count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_value
      FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""",

    "q_stream_dedup" -> """
      SELECT DISTINCT event_id, user_id, event_type
      FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
      ORDER BY event_id""",

    "q_watermark_late" -> """
      SELECT event_id,
        coalesce(ts < max(ts) OVER (ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          - INTERVAL '10 minutes', false) AS is_late
      FROM events ORDER BY event_id""",

    "q_stream_join" -> """
      SELECT p.event_id AS purchase_id, p.user_id,
             CAST(p.ts AS TIMESTAMP) AS purchase_ts,
             g.event_id AS signup_id, CAST(g.ts AS TIMESTAMP) AS signup_ts,
             p.value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'signup') g
        ON p.user_id = g.user_id
       AND p.ts >= g.ts AND p.ts < g.ts + INTERVAL '2 hours'
      ORDER BY purchase_id, signup_id""",

    "q_stateful_running" -> """
      SELECT event_id, user_id,
        count(*) OVER w AS run_n,
        round(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE), 4) AS run_sum
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",

    "q_stream_agg_chain" -> """
      WITH sub AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS w15,
               count(*) AS n15
        FROM events GROUP BY 1)
      SELECT date_trunc('hour', w15) AS win_start,
        round(avg(n15), 4) AS avg_n15,
        max(n15) AS max_n15,
        CAST(sum(n15) AS BIGINT) AS sum_n
      FROM sub GROUP BY 1 ORDER BY win_start""",

    // Portable (DuckDB ∩ Spark): date_trunc + row_number — its own Spark
    // twin via SqlOracleReuseSpec.
    "q_stream_topk" -> """
      WITH w AS (
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               count(*) AS n
        FROM events GROUP BY win_start, event_type),
      r AS (
        SELECT win_start, event_type, n,
               CAST(row_number() OVER (
                 PARTITION BY win_start
                 ORDER BY n DESC, event_type) AS INT) AS rk
        FROM w)
      SELECT win_start, event_type, n, rk
      FROM r WHERE rk <= 3
      ORDER BY win_start, rk"""
  )

  /** STREAMING twin of [[Analytics.sessionize]]: gap-based sessions over
    * an unbounded event stream via `flatMapGroupsWithState` with an
    * EVENT-TIME timeout — the custom-state API for operators whose output
    * cardinality per group varies (0..n closed sessions per trigger),
    * where `mapGroupsWithState`'s exactly-one-row contract can't serve.
    *
    * A session is emitted only when the WATERMARK SEALS it (watermark >
    * session end + gap): no event still admissible under `latenessSec`
    * can extend it or bridge it to a neighbor, so — unlike the tempting
    * emit-inline-on-next-event design — out-of-order events that span
    * micro-batches (a straggler landing BETWEEN two provisional sessions
    * and merging them) produce exactly the sessions the batch twin
    * computes on the same rows. The state per user is the short list of
    * not-yet-sealed sessions — bounded by ~latenessSec/gapSec + 1, NOT by
    * event count (events fold into (start, last, n) triples immediately;
    * nothing buffers raw events). Sealed sessions are immutable facts:
    * Append output mode, safe for exactly-once sinks. StreamingSpec pins
    * stream ≡ batch-twin equivalence, including the cross-batch
    * straggler-bridge case. */
  def sessionizeStream(
      events: org.apache.spark.sql.Dataset[SessionEvent], gapSec: Long,
      latenessSec: Long = 10L)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"$latenessSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionBuffer]) =>
          // merge pending sessions + new events into the gap-partition of
          // their union: sort by start, fold adjacent items whose gap is
          // within bound — identical to the batch rule on the full set
          val pending = state.getOption.map(_.sessions).getOrElse(Nil)
          val units = rows.map { e =>
            val sec = e.ts.getTime / 1000L; OpenSession(sec, sec, 1L)
          }.toList
          val merged = (pending ++ units).sortBy(o => (o.start, o.last))
            .foldLeft(List.empty[OpenSession]) {
              case (cur :: done, o) if o.start - cur.last <= gapSec =>
                OpenSession(cur.start, math.max(cur.last, o.last),
                            cur.n + o.n) :: done
              case (acc, o) => o :: acc
            }.reverse
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          val (closedNow, live) = merged.partition(_.last + gapSec < wmSec)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessionBuffer(live))
            // fire the instant the earliest live session becomes sealable:
            // seal needs wmMs >= (last+gap+1)*1000 and Spark fires timers
            // only when timeoutTs < watermark (STRICT), so aim 1 ms below
            // the threshold — at the threshold itself the timer would
            // never fire on a stalled whole-second watermark. Clamp above
            // the current watermark (Spark rejects timers at/behind it).
            val sealAt = (live.map(_.last).min + gapSec + 1) * 1000L - 1
            // When sealAt collides with the current watermark the clamp
            // lands at watermark+1, and the STRICT timer compare then needs
            // the watermark to advance by >= 2 ms before firing — sealing
            // can slip one micro-batch in that exact-collision case
            // (ADVICE r8). Emission is still guaranteed (the watermark
            // advances monotonically past any fixed timestamp), and the
            // batch-twin equivalence is unaffected — only WHEN the sealed
            // row appears moves, never whether/what.
            state.setTimeoutTimestamp(
              math.max(sealAt, state.getCurrentWatermarkMs() + 1))
          }
          closedNow.iterator
            .map(o => ClosedSession(user, o.start, o.last, o.n))
      }
  }
}

/** One event of the streaming sessionizer (event-time `ts` carries the
  * watermark). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** One provisional (not yet watermark-sealed) session. */
case class OpenSession(start: Long, last: Long, n: Long)

/** Per-user state: the short list of not-yet-sealed sessions, ordered by
  * start — bounded by ~lateness/gap + 1, never by event count. */
case class SessionBuffer(sessions: List[OpenSession])

/** An emitted (immutable, append-mode) closed session — same shape as the
  * batch twin's per-session row. */
case class ClosedSession(user_id: Long, start_sec: Long, end_sec: Long,
                         n_events: Long)
