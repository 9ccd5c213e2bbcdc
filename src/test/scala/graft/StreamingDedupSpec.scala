package graft

import java.sql.Timestamp
import graft.ops.{DedupStream, DedupVerdict, StreamDoc, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[DedupStream.dedupNearStream]] — the streaming LSH near-dup op (r10
  * verdict item 1). Three pins:
  *
  *  1. stream ≡ batch on the REAL documents fixture: the per-doc verdicts
  *     of the chunked MemoryStream feed equal the
  *     [[TextOps.minhashPairs]] reduction dup_of(d) = min{d1 | (d1, d)
  *     pair at the same threshold} — same shingle family, same banding,
  *     same HALF_UP-4 Jaccard, so equality is exact, not approximate;
  *  2. watermark TTL: an expired resident neither anchors new arrivals
  *     nor survives in state, while an in-TTL resident still matches —
  *     the state bound that makes the op runnable on an unbounded feed;
  *  3. kill/restart (mirroring the sessionizer scenario): bucket
  *     residency recovered from the checkpoint still flags an
  *     incarnation-2 near-copy of an incarnation-1 doc.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  /** transformWithState requires the RocksDB state store; scope the conf
    * to each scenario so the shared session's other suites keep the
    * default provider. */
  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("stream verdicts == batch minhashPairs reduction on the documents fixture") { withRocksDb {
    import spark.implicits._
    val docsDf = Tables.documents(spark, TestSpark.Sf0001)
    val docs = docsDf.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    // batch expectation: dup_of(d) = min{d1 | (d1, d) confirmed pair};
    // docs with no pair (incl. <3-word docs, which never get a signature)
    // expect null
    val pairs = TextOps.minhashPairs(docsDf, 0.5)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect()
    val expected: Map[Long, Option[Long]] = docs.map { case (id, _) =>
      val anchors = pairs.collect { case (d1, d2) if d2 == id => d1 }
      id -> (if (anchors.isEmpty) None else Some(anchors.min))
    }.toMap

    // feed in doc_id order (the monotonic-ingest case the op's ordering
    // contract targets), chopped into 3 micro-batches so residency
    // crosses batch boundaries; huge TTL = no evictions
    val input = MemoryStream[StreamDoc](spark)
    val out = DedupStream.dedupNearStream(input.toDS(), 0.5,
      ttlSec = 1000000L)
    val q = out.writeStream.format("memory").queryName("dedup_stream_out")
      .outputMode("append").start()
    try {
      val feed = docs.map { case (id, text) => StreamDoc(id, sec(10000 + id), text) }
      feed.grouped((feed.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val got = spark.table("dedup_stream_out").as[DedupVerdict]
        .collect().map(v => v.doc_id -> v.dup_of).toMap
      assert(got.size == docs.length,
        s"${got.size} verdicts for ${docs.length} docs")
      val diffs = expected.collect {
        case (id, e) if got.get(id) != Some(e) => s"doc $id: stream ${got.get(id)} vs batch $e"
      }
      assert(diffs.isEmpty, s"${diffs.size} mismatches, first: ${diffs.take(5).mkString("; ")}")
    } finally q.stop()
  }}

  test("watermark TTL evicts residents: expired docs stop anchoring, in-TTL docs still match") { withRocksDb {
    import spark.implicits._
    val textA = "alpha beta gamma delta epsilon zeta"
    val textB = "one two three four five six seven"
    val input = MemoryStream[StreamDoc](spark)
    val out = DedupStream.dedupNearStream(input.toDS(), 0.5,
      ttlSec = 100L, latenessSec = 0L)
    val q = out.writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      input.addData(StreamDoc(1, sec(1000), textA))
      q.processAllAvailable()
      // advances the watermark to 11000 — far past doc 1's TTL horizon
      input.addData(StreamDoc(2, sec(11000), textB))
      q.processAllAvailable()
      // doc 3 = copy of the EXPIRED doc 1 → novel; doc 4 = copy of the
      // in-TTL doc 2 → dup; doc 5 = 2 words → no shingles → novel;
      // doc 6 = null text → one-verdict-per-doc still holds
      input.addData(StreamDoc(3, sec(11050), textA),
                    StreamDoc(4, sec(11060), textB),
                    StreamDoc(5, sec(11070), "two words"),
                    StreamDoc(6, sec(11080), null))
      q.processAllAvailable()
      val got = spark.table("dedup_ttl_out").as[DedupVerdict]
        .collect().map(v => v.doc_id -> v.dup_of).toMap
      assert(got == Map(1L -> None, 2L -> None, 3L -> None,
                        4L -> Some(2L), 5L -> None, 6L -> None), s"got $got")
    } finally q.stop()
  }}

  test("out-of-order arrival: a late-but-admissible doc is judged against ARRIVAL order") { withRocksDb {
    // the ordering contract's other half: with an out-of-order feed the
    // rule is "earlier ARRIVAL anchors", not "smaller id anchors" — a
    // straggler with a SMALLER id than an already-resident doc is the
    // dup, and its dup_of can point at the larger id. Pinning this keeps
    // the monotonic-feed equivalence test honest about what it relies on.
    import spark.implicits._
    val text = "consistent shingle text for the arrival order pin"
    val input = MemoryStream[StreamDoc](spark)
    val out = DedupStream.dedupNearStream(input.toDS(), 0.5,
      ttlSec = 1000000L, latenessSec = 3600L)
    val q = out.writeStream.format("memory").queryName("dedup_ooo_out")
      .outputMode("append").start()
    try {
      input.addData(StreamDoc(10, sec(5000), text))
      q.processAllAvailable()
      // doc 9 arrives later with an earlier ts (inside lateness): it is
      // the duplicate, anchored to the resident doc 10
      input.addData(StreamDoc(9, sec(4990), text))
      q.processAllAvailable()
      val got = spark.table("dedup_ooo_out").as[DedupVerdict]
        .collect().map(v => v.doc_id -> v.dup_of).toMap
      assert(got == Map(10L -> None, 9L -> Some(10L)), s"got $got")
    } finally q.stop()
  }}

  test("kill/restart recovers bucket residency — an incarnation-2 near-copy is still flagged") { withRocksDb {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs"
    val ckpt = java.nio.file.Files
      .createTempDirectory("dedup_recover_ckpt").toString
    val input = MemoryStream[StreamDoc](spark)
    // memory sink can't recover from a checkpoint — collect through
    // foreachBatch; the Set dedups at-least-once replay
    val verdicts = java.util.concurrent.ConcurrentHashMap
      .newKeySet[DedupVerdict]()
    def start() = DedupStream
      .dedupNearStream(input.toDS(), 0.5, ttlSec = 1000000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[DedupVerdict],
                       _: Long) => b.collect().foreach(verdicts.add) }
      .start()

    val q1 = start()
    try {
      input.addData(StreamDoc(1, sec(1000), textA),
                    StreamDoc(2, sec(1001), textB))
      q1.processAllAvailable()
    } finally q1.stop() // kill with both docs resident in bucket state

    val q2 = start()
    try {
      input.addData(StreamDoc(3, sec(1002), textA), // near-copy of doc 1
                    StreamDoc(4, sec(1003), "completely different words here now"))
      q2.processAllAvailable()
      val got = {
        import scala.jdk.CollectionConverters._
        verdicts.asScala.toSet
      }
      assert(got == Set(DedupVerdict(1, None), DedupVerdict(2, None),
                        DedupVerdict(3, Some(1L)), DedupVerdict(4, None)),
        s"got $got")
    } finally q2.stop()
  }}
}
