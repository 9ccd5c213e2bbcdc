package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.queue.{BatchIdLedger, EventQueue, InMemorySink, StreamingQueueSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Real Structured-Streaming coverage for the two no-oracle streaming keys
  * (SURVEY §2.B: q_watermark_late, q_stateful_running) plus the streaming
  * dedup path and the foreachBatch → EventQueue sink (SURVEY §3.2 item 2).
  * MemoryStream + processAllAvailable keeps every scenario deterministic.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops late rows from append-mode windowed counts") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)](spark)
    val agg = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")).count()
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:00:00"), "a"), (ts("2024-01-01 00:05:00"), "b"))
      q.processAllAvailable()
      // advance watermark past the first window, then send a LATE row into it
      input.addData((ts("2024-01-01 01:00:00"), "c"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:02:00"), "late")) // behind watermark → dropped
      q.processAllAvailable()
      input.addData((ts("2024-01-01 02:00:00"), "d")) // finalize hour-1 window
      q.processAllAvailable()
      val counts = spark.table("wm_out")
        .select(col("window.start").cast("string"), col("count")).as[(String, Long)]
        .collect().toMap
      assert(counts("2024-01-01 00:00:00") == 2L,
        s"late row was counted: $counts") // NOT 3 — the late row is dropped
      assert(counts("2024-01-01 01:00:00") == 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long)](spark)
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:01:00"), 1L),
                    (ts("2024-01-01 00:02:00"), 2L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:03:00"), 2L), (ts("2024-01-01 00:04:00"), 3L))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session_window closes a session only after the gap + watermark pass") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long)](spark)
    val sessions = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .count()
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // two events 5 min apart → one session; then a 30-min jump both
      // exceeds the gap and advances the watermark enough to emit it
      input.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:05:00"), 1L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "session emitted too early")
      input.addData((ts("2024-01-01 00:45:00"), 1L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 02:00:00"), 1L)) // close + flush session 2
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select(col("session_window.start").cast("string"),
                col("session_window.end").cast("string"), col("count"))
        .as[(String, String, Long)].collect().sortBy(_._1)
      // session 1: [00:00, 00:05+10min) with 2 events — gap extends the
      // end past the LAST event, exactly Spark's session semantics
      assert(rows.head == (("2024-01-01 00:00:00", "2024-01-01 00:15:00", 2L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join pairs in-window rows and drops late rows") {
    // The streaming form of q_stream_join: purchases⋈signups inner join on
    // user_id with a time-range predicate, BOTH sides watermarked — the
    // range constraint is what lets Spark bound each side's buffered state.
    import spark.implicits._
    val purchases = MemoryStream[(Timestamp, Long, Long)](spark)
    val signups = MemoryStream[(Timestamp, Long, Long)](spark)
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    val g = signups.toDF().toDF("g_ts", "g_user", "signup_id")
      .withWatermark("g_ts", "10 minutes")
    val joined = p.join(g,
      col("p_user") === col("g_user") &&
      col("p_ts") >= col("g_ts") &&
      col("p_ts") < col("g_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("signup_id"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      def pairs(): Set[(Long, Long)] =
        spark.table("sj_out").as[(Long, Long)].collect().toSet
      // u1: signup 00:00 → purchase 00:10 matches; purchase 00:50 is
      // outside the 30-min window. u2: signup 00:45 → purchase 01:00
      // matches. A u1 purchase with no signup in range pairs with nothing.
      signups.addData((ts("2024-01-01 00:00:00"), 1L, 500L),
                      (ts("2024-01-01 00:45:00"), 2L, 501L))
      purchases.addData((ts("2024-01-01 00:10:00"), 1L, 100L),
                        (ts("2024-01-01 00:50:00"), 1L, 101L),
                        (ts("2024-01-01 01:00:00"), 2L, 102L))
      q.processAllAvailable()
      assert(pairs() == Set((100L, 500L), (102L, 501L)), s"got ${pairs()}")
      // advance both watermarks to ~01:50, then send a LATE signup at
      // 00:05 — in-range for the already-seen purchase 00:10, but behind
      // the watermark → dropped, no new pair may appear
      purchases.addData((ts("2024-01-01 02:00:00"), 9L, 199L))
      signups.addData((ts("2024-01-01 02:00:00"), 9L, 599L))
      q.processAllAvailable()
      signups.addData((ts("2024-01-01 00:05:00"), 1L, 502L))
      q.processAllAvailable()
      purchases.addData((ts("2024-01-01 02:30:00"), 8L, 198L)) // flush
      q.processAllAvailable()
      assert(!pairs().contains((100L, 502L)),
        "late signup joined despite being behind the watermark")
      assert(pairs().filter(_._2 == 502L).isEmpty &&
             pairs().size >= 2, s"got ${pairs()}")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits null-matched rows after the window closes") {
    // Outer variant of the interval join: a purchase with no signup in
    // range must still surface — with a null signup — but only once the
    // watermark proves no matching signup can still arrive (state
    // eviction is what triggers the null emission, so this pins the
    // eviction path, not just the match path).
    import spark.implicits._
    val purchases = MemoryStream[(Timestamp, Long, Long)](spark)
    val signups = MemoryStream[(Timestamp, Long, Long)](spark)
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "5 minutes")
    val g = signups.toDF().toDF("g_ts", "g_user", "signup_id")
      .withWatermark("g_ts", "5 minutes")
    val joined = p.join(g,
      col("p_user") === col("g_user") &&
      col("p_ts") >= col("g_ts") &&
      col("p_ts") < col("g_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("purchase_id"), col("signup_id"))
    val q = joined.writeStream.format("memory").queryName("sjo_out")
      .outputMode("append").start()
    try {
      def rows(): Set[(Long, Option[Long])] =
        spark.table("sjo_out").as[(Long, Option[Long])].collect().toSet
      // u1 purchase matches its signup; u3 purchase has NO signup
      signups.addData((ts("2024-01-01 00:00:00"), 1L, 500L))
      purchases.addData((ts("2024-01-01 00:10:00"), 1L, 100L),
                        (ts("2024-01-01 00:15:00"), 3L, 101L))
      q.processAllAvailable()
      assert(rows().contains((100L, Some(500L))), s"got ${rows()}")
      assert(!rows().exists(_._1 == 101L),
        "unmatched row emitted before its window could be ruled out")
      // advance both watermarks far past 00:15 + 30min so the u3 purchase
      // can no longer match any future signup → null row must emit
      purchases.addData((ts("2024-01-01 02:00:00"), 9L, 199L))
      signups.addData((ts("2024-01-01 02:00:00"), 9L, 599L))
      q.processAllAvailable()
      purchases.addData((ts("2024-01-01 03:00:00"), 9L, 198L))
      signups.addData((ts("2024-01-01 03:00:00"), 9L, 598L))
      q.processAllAvailable()
      assert(rows().contains((101L, None)),
        s"evicted unmatched purchase never emitted its null row: ${rows()}")
    } finally q.stop()
  }

  test("chained windowed aggregations emit finalized hours (multi-stateful)") {
    // The streaming form of q_stream_agg_chain: 15-min tumbling counts
    // re-aggregated into hourly stats — TWO stateful aggregations in one
    // append-mode query (Spark 4 multi-stateful support). The second agg
    // must window over window_time(window) so the event-time column (and
    // the watermark) propagates through level 1.
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long)](spark)
    val sub = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes")).agg(count(lit(1)).as("n15"))
    val hourly = sub
      .groupBy(window(window_time(col("window")), "1 hour"))
      .agg(round(avg(col("n15")), 4).as("avg_n15"),
           max(col("n15")).as("max_n15"), sum(col("n15")).as("sum_n"))
      .select(col("window.start").cast("string").as("win_start"),
              col("avg_n15"), col("max_n15"), col("sum_n"))
    val q = hourly.writeStream.format("memory").queryName("chain_out")
      .outputMode("append").start()
    try {
      // hour 0: 15-min window counts [1, 2, 1, 3]
      input.addData(
        (ts("2024-01-01 00:01:00"), 1L),
        (ts("2024-01-01 00:16:00"), 2L), (ts("2024-01-01 00:17:00"), 3L),
        (ts("2024-01-01 00:31:00"), 4L),
        (ts("2024-01-01 00:46:00"), 5L), (ts("2024-01-01 00:47:00"), 6L),
        (ts("2024-01-01 00:48:00"), 7L))
      q.processAllAvailable()
      // sentinels: first closes level-1's hour-0 windows, the next lets
      // level 2 see a watermark past 01:00 and emit the finalized hour
      for (h <- Seq("02", "03", "04")) {
        input.addData((ts(s"2024-01-01 $h:00:00"), 90L + h.toLong))
        q.processAllAvailable()
      }
      val rows = spark.table("chain_out")
        .as[(String, Double, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(rows.contains("2024-01-01 00:00:00"),
        s"hour-0 window never finalized: $rows")
      assert(rows("2024-01-01 00:00:00") == ((1.75, 3L, 7L)),
        s"wrong hour-0 stats: ${rows("2024-01-01 00:00:00")}")
    } finally q.stop()
  }

  test("mapGroupsWithState running per-user count matches batch equivalent") {
    import spark.implicits._
    val input = MemoryStream[(String, Double)](spark)
    val running = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
    val q = running.toDF("user", "n").writeStream.format("memory")
      .queryName("state_out").outputMode("update").start()
    try {
      input.addData(("u1", 1.0), ("u1", 2.0), ("u2", 3.0))
      q.processAllAvailable()
      input.addData(("u1", 4.0), ("u3", 5.0))
      q.processAllAvailable()
      // last update per user == total events seen for that user
      val last = spark.table("state_out").groupBy("user").agg(max("n").as("n"))
        .as[(String, Long)].collect().toMap
      assert(last == Map("u1" -> 3L, "u2" -> 1L, "u3" -> 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer: inline + timeout closes match the batch twin") {
    import spark.implicits._
    import graft.ops.{ClosedSession, SessionEvent, StreamingOps}
    val gap = 100L
    // base offset: a row at event-time 0 sits exactly AT the initial
    // watermark and is dropped as late — start the clock well past it
    val base = 10000L
    val epoch = (sec: Long) => new Timestamp((base + sec) * 1000L)
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingOps.sessionizeStream(input.toDS(), gap)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // u1: one 3-event session then a far jump (inline close);
      // u2: a single event, closed only by TIMEOUT (the watermark from
      // u1's later traffic passes u2's last + gap with no new u2 rows)
      input.addData(SessionEvent(1, epoch(0)), SessionEvent(1, epoch(10)),
                    SessionEvent(1, epoch(20)), SessionEvent(2, epoch(5)))
      q.processAllAvailable()
      input.addData(SessionEvent(1, epoch(1000)))
      q.processAllAvailable()
      // watermark advances on batch COMPLETION: one more micro-batch so
      // the event-time timer (u2: 5+100+1 < 1000-10) actually fires
      input.addData(SessionEvent(1, epoch(1010)))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[ClosedSession].collect().toSet
      assert(got == Set(ClosedSession(1, base, base + 20, 3),
                        ClosedSession(2, base + 5, base + 5, 1)),
        s"got $got")
      // the streaming closes equal the batch twin's sessions restricted
      // to the stream's close rule: the watermark in effect during the
      // last processed batch (1000 − 10) passed end + gap (sealing is
      // the ONLY emission path — inline closes are deferred so
      // stragglers can still bridge)
      val rows = Seq((1L, 0L, base, 1.0), (1L, 1L, base + 10, 1.0),
                     (1L, 2L, base + 20, 1.0), (2L, 3L, base + 5, 1.0),
                     (1L, 4L, base + 1000, 1.0), (1L, 5L, base + 1010, 1.0))
        .toDF("user_id", "event_id", "sec", "value")
      val batch = graft.ops.Analytics.sessionize(rows, gap)
      val batchClosed = batch
        .filter(col("end_sec") + gap < lit(base + 990L))
        .select(col("user_id"), col("start_sec"), col("end_sec"),
                col("n_events"))
        .as[ClosedSession].collect().toSet
      assert(got == batchClosed, s"stream $got vs batch $batchClosed")
    } finally q.stop()
  }

  test("sessionizer: a cross-batch straggler bridges two provisional sessions before sealing") {
    import spark.implicits._
    import graft.ops.{ClosedSession, SessionEvent, StreamingOps}
    // gap 100, lateness 300: events 200 and 320 form TWO provisional
    // sessions in batch 1; the in-lateness straggler 280 arrives a batch
    // later and must merge them into ONE — the case an
    // emit-inline-on-next-event design gets wrong
    val (gap, late, base) = (100L, 300L, 10000L)
    val epoch = (sec: Long) => new Timestamp((base + sec) * 1000L)
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingOps.sessionizeStream(input.toDS(), gap, late)
      .writeStream.format("memory").queryName("sess_bridge_out")
      .outputMode("append").start()
    try {
      input.addData(SessionEvent(3, epoch(200)), SessionEvent(3, epoch(320)))
      q.processAllAvailable() // watermark after: 320 - 300 = 20
      input.addData(SessionEvent(3, epoch(280)), SessionEvent(3, epoch(1000)))
      q.processAllAvailable() // 280 >= 20: admitted, bridges; wm after: 700
      input.addData(SessionEvent(3, epoch(1100)))
      q.processAllAvailable() // wm 700 seals (200..320); (1000,1100) live
      val got = spark.table("sess_bridge_out").as[ClosedSession]
        .collect().toSet
      assert(got == Set(ClosedSession(3, base + 200, base + 320, 3)),
        s"got $got")
      // batch twin on the same 5 rows, restricted to the sealing rule at
      // the final in-effect watermark (1100 - 300)
      val rows = Seq((3L, 0L, base + 200, 1.0), (3L, 1L, base + 320, 1.0),
                     (3L, 2L, base + 280, 1.0), (3L, 3L, base + 1000, 1.0),
                     (3L, 4L, base + 1100, 1.0))
        .toDF("user_id", "event_id", "sec", "value")
      val batchClosed = graft.ops.Analytics.sessionize(rows, gap)
        .filter(col("end_sec") + gap < lit(base + 800L))
        .select(col("user_id"), col("start_sec"), col("end_sec"),
                col("n_events"))
        .as[ClosedSession].collect().toSet
      assert(got == batchClosed, s"stream $got vs batch $batchClosed")
    } finally q.stop()
  }

  test("sessionizer: kill/restart recovers unsealed sessions — a post-restart straggler still bridges them") {
    // r8 verdict item 3, mirroring the StreamingQueueSink kill/restart
    // shape: one MemoryStream + one checkpoint dir across two query
    // incarnations. Incarnation 1 leaves ONLY unsealed sessions in the
    // state store (nothing emitted), is stopped mid-stream, and
    // incarnation 2 must (a) recover those provisional sessions, (b) let
    // an in-lateness straggler bridge two of them — proof the recovered
    // state is the real session buffer, not a recomputation — and (c)
    // fire the recovered u8 timer. Final sealed set == batch twin on all
    // rows under the final in-effect watermark.
    import spark.implicits._
    import graft.ops.{ClosedSession, SessionEvent, StreamingOps}
    val (gap, late, base) = (100L, 300L, 10000L)
    val epoch = (sec: Long) => new Timestamp((base + sec) * 1000L)
    val ckpt = java.nio.file.Files
      .createTempDirectory("sess_recover_ckpt").toString
    val input = MemoryStream[SessionEvent](spark)
    // memory sink can't recover from a checkpoint — collect through
    // foreachBatch (the recoverable sink the queue-sink scenarios use);
    // the Set dedups the at-least-once replay of a recovered batch
    val sealedOut = java.util.concurrent.ConcurrentHashMap
      .newKeySet[ClosedSession]()
    def start() = StreamingOps.sessionizeStream(input.toDS(), gap, late)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[ClosedSession],
                       _: Long) => b.collect().foreach(sealedOut.add) }
      .start()

    // incarnation 1: two provisional u7 sessions (200 | 320, gap 120 >
    // 100) + a lone u8 — watermark ends at 320-300=20, so NOTHING seals
    val q1 = start()
    try {
      input.addData(SessionEvent(7, epoch(200)), SessionEvent(7, epoch(320)),
                    SessionEvent(8, epoch(250)))
      q1.processAllAvailable()
      assert(sealedOut.isEmpty,
        "a session sealed before the kill — the scenario needs unsealed state")
    } finally q1.stop() // kill mid-stream with 3 unsealed sessions in state

    // incarnation 2: straggler 280 (>= recovered wm 20: admissible) must
    // merge the RECOVERED provisionals; 1000 then 1100 push the watermark
    // to 800, sealing the bridged (200..320) and the u8 timer — while
    // (1000,1100) stays live in state
    val q2 = start()
    try {
      input.addData(SessionEvent(7, epoch(280)), SessionEvent(7, epoch(1000)))
      q2.processAllAvailable()
      input.addData(SessionEvent(7, epoch(1100)))
      q2.processAllAvailable()
      val got = {
        import scala.jdk.CollectionConverters._
        sealedOut.asScala.toSet
      }
      val rows = Seq((7L, 0L, base + 200, 1.0), (7L, 1L, base + 320, 1.0),
                     (8L, 2L, base + 250, 1.0), (7L, 3L, base + 280, 1.0),
                     (7L, 4L, base + 1000, 1.0), (7L, 5L, base + 1100, 1.0))
        .toDF("user_id", "event_id", "sec", "value")
      val batchClosed = graft.ops.Analytics.sessionize(rows, gap)
        .filter(col("end_sec") + gap < lit(base + 800L))
        .select(col("user_id"), col("start_sec"), col("end_sec"),
                col("n_events"))
        .as[ClosedSession].collect().toSet
      assert(got == Set(ClosedSession(7, base + 200, base + 320, 3),
                        ClosedSession(8, base + 250, base + 250, 1)),
        s"got $got")
      assert(got == batchClosed, s"stream $got vs batch $batchClosed")
    } finally q2.stop()
  }

  test("foreachBatch feeds the EventQueue facade with exactly-once counts") {
    import spark.implicits._
    val sink = new InMemorySink
    val queue = EventQueue.withOriginAndMaxSize("s", "app", 512, sink).get
    val input = MemoryStream[String](spark)
    val q = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        // client-library sink: micro-batch lands on the driver, rows feed
        // the façade; a cluster-scale deployment would partition by
        // producer and run one queue per partition (SURVEY §3.2)
        batch.collect().foreach(name => queue.enqueue(Map("event" -> name)).get)
      }
      .start()
    try {
      input.addData((1 to 30).map(i => s"ev$i"): _*)
      q.processAllAvailable()
      queue.flush().get
      val delivered = sink.records().map(_._1.count(_ == '{')).sum
      assert(delivered == 30, s"delivered $delivered of 30")
      assert(sink.records().size > 1, "512-byte threshold should split batches")
    } finally q.stop()
  }

  /** Kill/restart scenarios for [[StreamingQueueSink]] (round-3 verdict
    * item 6). Both use one MemoryStream + one checkpoint dir across two
    * query incarnations — exactly Spark's recovery path, where the replayed
    * micro-batch arrives with the SAME batchId.
    */
  private def countEvents(sink: InMemorySink): Map[String, Int] =
    "\"event\":\"(\\w+)\"".r.findAllMatchIn(sink.records().map(_._1).mkString)
      .map(_.group(1)).toSeq.groupBy(identity).view.mapValues(_.size).toMap

  test("exactly-once sink: crash AFTER delivery replays the batch as a no-op") {
    import spark.implicits._
    val sink = new InMemorySink
    // threshold >> payload → whole batch delivers in the single flush,
    // closing even the mid-batch-flush replay window (see Scaladoc); the
    // writer builds a FRESH queue per attempt over this shared sink
    val ckpt = Files.createTempDirectory("eq_ckpt").toString
    val ledger = new BatchIdLedger(s"$ckpt/queue-ledger")
    val deliver = StreamingQueueSink.writer[String](
      () => EventQueue.withOpts("s", "", 1 << 20, "", "", sink).get, ledger)(
      s => Map("event" -> s))
    val input = MemoryStream[String](spark)
    @volatile var crashOnce = true
    def start() = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[String], id: Long) =>
        deliver(b, id)
        // dies after the sink delivered + ledger committed but BEFORE Spark
        // commits the offset — the replay-causing crash point
        if (crashOnce) { crashOnce = false; throw new RuntimeException("boom") }
      }.start()

    val q1 = start()
    input.addData("a", "b", "c")
    intercept[Exception](q1.processAllAvailable())
    assert(countEvents(sink) == Map("a" -> 1, "b" -> 1, "c" -> 1))

    val q2 = start() // recovery: Spark re-runs the uncommitted batchId
    try {
      input.addData("d", "e")
      q2.processAllAvailable() // writer flushes its per-attempt queue itself
      assert(countEvents(sink) ==
        Map("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 1, "e" -> 1),
        "replayed batch duplicated or lost records")
    } finally q2.stop()
  }

  test("driver-local writer refuses an over-bound batch without delivering or committing") {
    // r13 verdict "What's wrong" item 3 made loud: the driver-collect
    // writer is the reference-client model — past maxDriverRows it must
    // fail the query BEFORE delivering anything (the bounded
    // limit(max+1) probe caps what reaches the driver, the ledger stays
    // uncommitted) and point at partitionedWriter.
    import spark.implicits._
    val sink = new InMemorySink
    val ckpt = Files.createTempDirectory("eq_bound_ckpt").toString
    val ledger = new BatchIdLedger(s"$ckpt/queue-ledger")
    val deliver = StreamingQueueSink.writer[String](
      () => EventQueue.withOpts("s", "", 300, "", "", sink).get, ledger,
      maxDriverRows = 3)(s => Map("event" -> s))
    val input = MemoryStream[String](spark)
    val q = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(deliver).start()
    input.addData((1 to 10).map(i => s"big$i"): _*)
    val e = intercept[Exception](q.processAllAvailable())
    assert(e.getMessage.contains("partitionedWriter") ||
      Option(e.getCause).exists(_.getMessage.contains("partitionedWriter")),
      s"refusal must point at the cluster-scale writer: ${e.getMessage}")
    assert(countEvents(sink).isEmpty, "over-bound batch partially delivered")
    assert(!ledger.committed(0L), "refused batch must stay uncommitted")
    q.stop()
  }

  test("exactly-once sink: mid-batch flush failure never double-delivers the trigger item") {
    // The code-review regression (round 5): with a threshold smaller than
    // the batch payload, a failed mid-batch flush leaves the pre-insert
    // trigger item seeded in the queue; a writer REUSING that queue on
    // replay would enqueue the full batch on top and deliver the trigger
    // twice. The fresh-queue-per-attempt writer must deliver every event
    // exactly once here (the failed putRecord wrote nothing).
    import spark.implicits._
    val sink = new InMemorySink
    sink.failNext = true // first mid-batch flush of attempt 1 fails
    val ckpt = Files.createTempDirectory("eq_ckpt").toString
    val ledger = new BatchIdLedger(s"$ckpt/queue-ledger")
    val deliver = StreamingQueueSink.writer[String](
      () => EventQueue.withOpts("s", "", 300, "", "", sink).get, ledger)(
      s => Map("event" -> s))
    val input = MemoryStream[String](spark)
    def start() = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(deliver).start()

    val q1 = start()
    input.addData((1 to 12).map(i => s"ev$i"): _*)
    intercept[Exception](q1.processAllAvailable()) // SendFailed kills query
    assert(countEvents(sink).isEmpty, "failed flush should deliver nothing")

    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(countEvents(sink) == (1 to 12).map(i => s"ev$i" -> 1).toMap,
        "leftover trigger item double-delivered on replay")
    } finally q2.stop()
  }

  test("partitioned exactly-once sink: executor-side queues, replay is a no-op") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq_sink").toString
    val ckpt = Files.createTempDirectory("pq_ckpt").toString
    val ledger = new BatchIdLedger(s"$ckpt/queue-ledger")
    // one LocalSink shard per (batch, partition) — built ON the executor
    // from the two ids alone (nothing driver-only in the closure); the
    // batch id in the path is load-bearing: a fresh façade restarts its
    // record sequence, so a shared shard would overwrite earlier batches
    val deliver = StreamingQueueSink.partitionedWriter[String](ledger,
      (bid, pid) => EventQueue.withOpts("s", "", 1 << 20, "", "",
        new graft.queue.LocalSink(s"$dir/b$bid-p$pid")).get)(
      s => Map("event" -> s))
    def delivered(): Map[String, Int] =
      "\"event\":\"(\\w+)\"".r.findAllMatchIn(
        new java.io.File(dir).listFiles().toSeq.flatMap(p =>
          Option(p.listFiles()).toSeq.flatten)
          .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8"))
          .mkString)
        .map(_.group(1)).toSeq.groupBy(identity).view.mapValues(_.size).toMap

    val input = MemoryStream[String](spark)
    @volatile var crashOnce = true
    def start() = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[String], id: Long) =>
        deliver(b.repartition(2), id)
        if (crashOnce) { crashOnce = false; throw new RuntimeException("boom") }
      }.start()

    val q1 = start()
    input.addData((1 to 20).map(i => s"ev$i"): _*)
    intercept[Exception](q1.processAllAvailable())
    assert(delivered() == (1 to 20).map(i => s"ev$i" -> 1).toMap)
    // both partition shards actually delivered (parallelism is real)
    assert(new java.io.File(dir).listFiles().count(
      p => Option(p.listFiles()).exists(_.nonEmpty)) == 2,
      "expected two non-empty per-partition shards")

    val q2 = start() // recovery replays the uncommitted batchId → skipped
    try {
      input.addData("ev21")
      q2.processAllAvailable()
      assert(delivered() == (1 to 21).map(i => s"ev$i" -> 1).toMap,
        "replayed batch duplicated or lost records")
    } finally q2.stop()
  }

  test("exactly-once sink: crash BEFORE delivery loses nothing on restart") {
    import spark.implicits._
    val sink = new InMemorySink
    val ckpt = Files.createTempDirectory("eq_ckpt").toString
    val ledger = new BatchIdLedger(s"$ckpt/queue-ledger")
    val deliver = StreamingQueueSink.writer[String](
      () => EventQueue.withOpts("s", "", 1 << 20, "", "", sink).get, ledger)(
      s => Map("event" -> s))
    val input = MemoryStream[String](spark)
    @volatile var crashOnce = true
    def start() = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[String], id: Long) =>
        if (crashOnce) { crashOnce = false; throw new RuntimeException("boom") }
        deliver(b, id)
      }.start()

    val q1 = start()
    input.addData("x", "y")
    intercept[Exception](q1.processAllAvailable())
    assert(countEvents(sink).isEmpty, "crash happened before any delivery")

    val q2 = start()
    try {
      q2.processAllAvailable() // replay delivers the batch exactly once
      assert(countEvents(sink) == Map("x" -> 1, "y" -> 1))
    } finally q2.stop()
  }

  test("streaming PSI drift monitor: V2 stream → snapshot lake → psiOf == batch q_psi") {
    // r13 verdict item 7: the r13 drift key runs INCREMENTALLY — the V2
    // micro-batch source feeds SnapshotLake.streamWriter (exactly-once,
    // one atomic snapshot per batch), and the PSI readout recomputes over
    // the accumulated lake after each increment. The claim: after any
    // prefix of batches the monitor equals the batch q_psi over the same
    // rows — drift monitoring is a pure function of the lake state.
    import graft.sources.SnapshotLake
    val fmt = "graft.sources.v2.EventsV2Provider"
    val srcDir = Files.createTempDirectory("psi-v2-src").toFile
    srcDir.deleteOnExit()
    val table = Files.createTempDirectory("psi-lake").toString
    val ckpt = Files.createTempDirectory("psi-ckpt").toString
    def drop(name: String, rows: Seq[(Long, Double)]): Unit = {
      val tmp = Files.createTempFile("psi-drop", ".json")
      Files.write(tmp, rows.map { case (id, v) =>
        s"""{"event_id":$id,"event_type":"e","value":$v}"""
      }.mkString("", "\n", "\n").getBytes)
      Files.move(tmp, new java.io.File(srcDir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val rnd = new scala.util.Random(42)
    val batch1 = (0L until 40L).map(i => i -> (rnd.nextInt(1000) / 10.0))
    val batch2 = (40L until 90L).map(i => i -> (rnd.nextInt(400) / 10.0 + 60.0))
    drop("b1.json", batch1)
    val writer = SnapshotLake.streamWriter[org.apache.spark.sql.Row](table)
    val q = spark.readStream.format(fmt).load(srcDir.getAbsolutePath)
      .select(col("event_id"), col("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        writer(b, id)
      }.start()
    import spark.implicits._
    def psiOfLake() = graft.ops.EvalOps.psiOf(
      SnapshotLake.readLatest(spark, table)
        .select(col("value"), (col("event_id") % 2).as("half")))
      .collect().map(_.toSeq).toSeq
    def psiOfBatch(rows: Seq[(Long, Double)]) = graft.ops.EvalOps.psiOf(
      rows.toDF("event_id", "value")
        .select(col("value"), (col("event_id") % 2).as("half")))
      .collect().map(_.toSeq).toSeq
    try {
      q.processAllAvailable()
      assert(psiOfLake() == psiOfBatch(batch1),
        "monitor diverged from batch after the first increment")
      // second increment shifts the distribution — PSI must move and
      // still equal the batch recomputation over ALL rows
      drop("b2.json", batch2)
      q.processAllAvailable()
      val lake2 = psiOfLake()
      assert(lake2 == psiOfBatch(batch1 ++ batch2),
        "monitor diverged from batch after the second increment")
      // the lake accumulated exactly once per batch: 2 snapshots, 90 rows
      assert(SnapshotLake.snapshots(spark, table).size == 2)
      assert(SnapshotLake.readLatest(spark, table).count() == 90L)
    } finally q.stop()
  }

  test("q_stream_topk: streamed windowed counts + the same rank == batch top-k") {
    // The production shape the contract key documents: streaming emits
    // SEALED per-(window, type) counts in append mode; the rank ≤ 3 cut
    // runs downstream over the sink (streaming can't rank inside an agg).
    // Equality against the batch form on identical rows is the claim.
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.{Window => W}
    val input = MemoryStream[(Timestamp, String)](spark)
    val counts = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName("topk_counts")
      .outputMode("append").start()
    val data = Seq(
      ("2024-01-01 00:05:00", "click"), ("2024-01-01 00:06:00", "click"),
      ("2024-01-01 00:07:00", "view"), ("2024-01-01 00:10:00", "view"),
      ("2024-01-01 00:12:00", "view"), ("2024-01-01 00:20:00", "buy"),
      ("2024-01-01 00:25:00", "err"), ("2024-01-01 01:10:00", "view"),
      ("2024-01-01 01:12:00", "click")).map { case (t, e) => (ts(t), e) }
    def top3(df: DataFrame) = df
      .withColumn("rk", row_number().over(
        W.partitionBy(col("win_start"))
          .orderBy(col("n").desc, col("event_type"))).cast("int"))
      .filter(col("rk") <= 3).orderBy(col("win_start"), col("rk"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      // sentinel far past hour 1 seals both real hours; its own window
      // stays unsealed and must NOT appear in the append output
      input.addData((ts("2024-01-01 03:00:00"), "sentinel"))
      q.processAllAvailable()
      val streamed = top3(spark.table("topk_counts"))
      val batch = top3(data.toDF("ts", "event_type")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"),
                col("n")))
      assert(streamed == batch,
        s"streamed top-k diverged:\n$streamed\nvs batch:\n$batch")
      assert(streamed.exists(_._4 == 3) && streamed.forall(_._4 <= 3),
        s"rank cut wrong: $streamed")
    } finally q.stop()
  }
}
