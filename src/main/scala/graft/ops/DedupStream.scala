package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING twin of [[TextOps.minhashPairs]]-based near-dup dedup: an
  * unbounded corpus feed where each arriving document is judged against
  * everything already ingested — the op a continuous crawl ingest (the
  * reference's producer domain, `main.go:197-231`: an endless event feed
  * batched toward a sink) actually runs, where the batch q_dedup_minhash /
  * q_dedup_incremental forms would mean re-scanning the whole corpus per
  * snapshot.
  *
  * Same LSH family as the batch op — word 3-shingles → 60-bit md5 digests
  * → 64-perm MinHash → 16 bands of 4 rows — so the streaming verdicts are
  * provably the batch verdicts (StreamingDedupSpec pins stream ≡ the
  * [[TextOps.minhashPairs]] reduction on the same feed):
  *
  *   dup_of(d) = min{ d' arrived earlier : d' and d share a band bucket
  *                    AND exact Jaccard(shingles) rounded to 4 ≥ threshold }
  *   (null when no such d' — every doc emits exactly one verdict)
  *
  * Pipeline (per-row prep is codegen'd HOFs / expressions, no UDFs):
  *
  *  1. STATELESS per-row signature: `array_distinct`+`array_sort` over
  *     [[graft.expr.Md5Prefix60]]-digested [[graft.expr.WordShingles]],
  *     then 64 `array_min(transform(...))` universal-hash slots — the
  *     per-row formulation of [[TextOps.signatureFrame]] (min over a set
  *     needs no distinct, so no shuffle where the batch form aggregates).
  *  2. Band explode: 16 rows per doc keyed (band, v0..v3), each carrying
  *     the doc's sorted shingle-hash set (the Jaccard-confirm payload).
  *  3. PER-BUCKET [[BucketProcessor]] via `transformWithState` (Append,
  *     event-time): state = docs currently resident in this bucket (id,
  *     event-time, shingle set). A new doc scans residents for confirmed
  *     matches — same exact-Jaccard + HALF_UP-4 rounding as the batch
  *     confirm — emits its per-band verdict, and joins the residency.
  *     The watermark TTL is the state bound: residents older than
  *     `ttlSec` below the watermark are evicted (on read AND by an
  *     event-time timer that clears abandoned buckets), so state is
  *     O(docs-in-TTL-window × 16 × |shingles|), never corpus-sized.
  *     The `eventTimeColumnName` overload re-stamps the verdict's `ts`
  *     as event time — the Spark-4 contract that makes chaining a second
  *     stateful operator downstream legal (the fMGWS formulation fails
  *     the global-watermark correctness check here).
  *  4. PER-DOC combine [[CombineProcessor]] (Append, TimeMode.None): the
  *     16 band verdicts of a doc always land in the SAME micro-batch
  *     (stage 3 emits them in the batch the doc arrives), so this stage
  *     min-merges them and emits the single (doc_id, dup_of) row
  *     immediately — state only carries across batches in the impossible
  *     partial-fan-out case, and is removed on emit.
  *  5. Docs under 3 words have no shingles hence no signature (the batch
  *     form drops them before pairing); they bypass the stateful path via
  *     a stateless union branch and emit dup_of = null directly.
  *
  * Ordering semantics: "arrived earlier" is resident-in-state ∪ earlier
  * row of the same micro-batch, with same-batch rows processed in doc_id
  * order — so a feed that is doc_id-ordered across batches (the natural
  * monotonic-ingest case) gets EXACTLY the batch rule min-smaller-id,
  * regardless of how the feed is chopped into micro-batches.
  *
  * Kill/restart: bucket residency lives in the state store, so an
  * incarnation-2 doc still matches an incarnation-1 resident
  * (StreamingDedupSpec pins it, mirroring the sessionizer scenario).
  *
  * Deployment note: `transformWithState` requires the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — set it on the session that
  * runs the query; this op deliberately does not mutate the caller's conf.
  *
  * 100 TB lens: the shuffle per doc is 16 × (5-long key + the shingle-hash
  * set) — bounded by text length, never by corpus size; all cross-doc work
  * happens inside band buckets exactly like the batch LSH, and the TTL
  * knob (how far back a crawl dedups) is what bounds both state and the
  * per-bucket residency a hot bucket can accumulate. The boilerplate-text
  * hot-bucket pathology has the same shape as batch (SCALE.md): residents
  * of one bucket are scanned linearly per arrival, so a production ingest
  * pairs this with the same content-prefix pre-filter the incremental
  * exact dedup uses.
  */
object DedupStream {
  import TextOps.{NumPerms, NumBands, PermP, permA, permB}

  /** Per-row MinHash signature slots m0..m63 over a sorted-distinct
    * shingle-hash array column (same family as
    * [[TextOps.signatureFrame]], evaluated per row instead of per
    * group). */
  private def sigSlot(sh: Column, j: Int): Column =
    array_min(transform(sh, h =>
      (lit(permA(j)) * (h % lit(1L << 32)) + lit(permB(j))) % lit(PermP)))

  /** Stateless prep: doc → (doc_id, ts, sh[], m0..m63). Null text gets an
    * EMPTY shingle set (not a null one): a null `sh` would fail both the
    * size>0 and size==0 branch filters and silently drop the doc,
    * breaking the one-verdict-per-doc contract — routed to the
    * shingleless branch instead, like any other unshingleable doc. */
  private[graft] def prepared(docs: Dataset[StreamDoc]): DataFrame = {
    val sh = coalesce(array_sort(array_distinct(
      transform(TextOps.shingles(col("text")),
        s => graft.expr.Md5Prefix60.h60(s)))), lit(Array.empty[Long]))
    val sigCols = (0 until NumPerms).map(j => sigSlot(col("sh"), j).as(s"m$j"))
    docs.toDF()
      .withColumn("sh", sh)
      .select(Seq(col("doc_id"), col("ts"), col("sh")) ++ sigCols: _*)
  }

  /** Exact Jaccard over two sorted-distinct hash arrays, HALF_UP-rounded
    * to 4 decimals — bit-identical to the batch confirm's
    * `round(n_inter / (n1 + n2 - n_inter), 4)`. */
  private[graft] def jaccard4(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0
    else BigDecimal(inter.toDouble / union)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** The streaming near-dup dedup. `ttlSec` is how far (in event time)
    * behind the watermark a document stays matchable; `latenessSec` the
    * out-of-order admission bound. Output is Append-safe: one immutable
    * verdict per document. */
  def dedupNearStream(docs: Dataset[StreamDoc], threshold: Double,
                      ttlSec: Long, latenessSec: Long = 10L)
      : Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prep = prepared(docs.withWatermark("ts", s"$latenessSec seconds"))

    // ≥3-word docs: band-explode (16 rows/doc, each carrying the shingle
    // set) → per-bucket residency match → per-doc combine
    val bandCols = (0 until NumBands).map { b =>
      struct(lit(b).as("band") +:
        (0 until 4).map(r => col(s"m${4 * b + r}").as(s"v$r")): _*)
    }
    val banded = prep.filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("ts"), col("sh"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("ts"), col("sh"),
        col("bk.band").as("band"), col("bk.v0").as("v0"),
        col("bk.v1").as("v1"), col("bk.v2").as("v2"), col("bk.v3").as("v3"))
      .as[BandRow]

    val perBand = banded
      .groupByKey(r => BandKey(r.band, r.v0, r.v1, r.v2, r.v3))
      .transformWithState(new BucketProcessor(threshold, ttlSec),
        "ts", OutputMode.Append)

    val combined = perBand
      .groupByKey(_.doc_id)
      .transformWithState(new CombineProcessor(NumBands),
        TimeMode.None(), OutputMode.Append)

    // <3-word docs: no shingles, no signature (the batch form drops them
    // before pairing) — stateless unique-by-construction verdict
    val shingleless = prep.filter(size(col("sh")) === 0)
      .select(col("doc_id")).as[Long]
      .map(id => DedupVerdict(id, None))

    combined.unionAll(shingleless)
  }
}

/** Stage-3 processor: one LSH bucket's residency. Emits a per-band
  * verdict for every arriving doc; evicts residents `ttlSec` behind the
  * watermark (on read, plus an event-time timer so an abandoned bucket
  * frees its state without waiting for the next arrival). */
private[graft] class BucketProcessor(threshold: Double, ttlSec: Long)
    extends StatefulProcessor[BandKey, BandRow, BandVerdict] {
  @transient private var residents: ListState[BucketDoc] = _
  private def ttlMs = ttlSec * 1000L

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    residents = getHandle.getListState[BucketDoc]("residents",
      Encoders.product[BucketDoc], TTLConfig.NONE)

  /** Replace the one pending eviction timer with `at` (materialize the
    * listing first — deleting while the state-store iterator is live is
    * undefined). */
  private def rearm(at: Long): Unit = {
    getHandle.listTimers().toList.foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer(at)
  }

  override def handleInputRows(key: BandKey, rows: Iterator[BandRow],
                               timers: TimerValues): Iterator[BandVerdict] = {
    val wm = timers.getCurrentWatermarkInMs()
    // TTL-filter BEFORE matching: a resident the timer would have evicted
    // must not anchor an arrival of the same batch
    var live = residents.get().filter(_.tsMs >= wm - ttlMs).toList
    val verdicts = rows.toSeq.sortBy(_.doc_id).map { r =>
      val matches = live.iterator
        .filter(d => d.doc_id != r.doc_id &&
          DedupStream.jaccard4(d.sh, r.sh) >= threshold)
        .map(_.doc_id)
      val dup = if (matches.isEmpty) None else Some(matches.min)
      live = BucketDoc(r.doc_id, r.ts.getTime, r.sh) :: live
      BandVerdict(r.doc_id, r.ts, dup)
    }
    residents.put(live.toArray)
    rearm(math.max(live.map(_.tsMs).min + ttlMs, wm + 1))
    verdicts.iterator
  }

  override def handleExpiredTimer(key: BandKey, timers: TimerValues,
                                  info: ExpiredTimerInfo)
      : Iterator[BandVerdict] = {
    val kept = residents.get()
      .filter(_.tsMs >= timers.getCurrentWatermarkInMs() - ttlMs).toArray
    if (kept.isEmpty) residents.clear()
    else {
      residents.put(kept)
      getHandle.registerTimer(math.max(kept.map(_.tsMs).min + ttlMs,
        timers.getCurrentWatermarkInMs() + 1))
    }
    Iterator.empty
  }
}

/** Stage-4 processor: min-merge the `nBands` per-band verdicts of a doc
  * into its single (doc_id, dup_of) row. All fan-out rows arrive in one
  * micro-batch, so state is normally created and removed within a batch;
  * the carry path exists only as a safety net. */
private[graft] class CombineProcessor(nBands: Int)
    extends StatefulProcessor[Long, BandVerdict, DedupVerdict] {
  @transient private var partial: ValueState[CombineState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    partial = getHandle.getValueState[CombineState]("partial",
      Encoders.product[CombineState], TTLConfig.NONE)

  override def handleInputRows(id: Long, rows: Iterator[BandVerdict],
                               timers: TimerValues): Iterator[DedupVerdict] = {
    val prev = if (partial.exists()) partial.get() else CombineState(0, None)
    var seen = prev.seen
    var best = prev.best
    rows.foreach { v =>
      seen += 1
      best = (best, v.dup_of) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b)             => a.orElse(b)
      }
    }
    if (seen >= nBands) {
      partial.clear()
      Iterator.single(DedupVerdict(id, best))
    } else {
      partial.update(CombineState(seen, best))
      Iterator.empty
    }
  }
}

/** One document of the streaming near-dup feed (event-time `ts` carries
  * the watermark that drives state TTL). */
case class StreamDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** The per-document verdict: `dup_of` = earliest already-ingested
  * near-duplicate, or None if this doc is novel. */
case class DedupVerdict(doc_id: Long, dup_of: Option[Long])

/** One exploded LSH band row: bucket key (band, v0..v3) + the doc's
  * sorted-distinct shingle-hash set for the exact-Jaccard confirm. */
private[graft] case class BandRow(doc_id: Long, ts: java.sql.Timestamp,
                                  sh: Array[Long], band: Int, v0: Long,
                                  v1: Long, v2: Long, v3: Long)

/** LSH bucket identity — 4 signature slots + the band index. */
private[graft] case class BandKey(band: Int, v0: Long, v1: Long, v2: Long,
                                  v3: Long)

/** Per-band verdict for one doc (stage-3 output, stage-4 input; `ts` is
  * the re-stamped event-time column that legalizes the chain). */
private[graft] case class BandVerdict(doc_id: Long, ts: java.sql.Timestamp,
                                      dup_of: Option[Long])

/** One bucket resident: id + event-time (for TTL) + shingle set. */
private[graft] case class BucketDoc(doc_id: Long, tsMs: Long,
                                    sh: Array[Long])

/** Stage-4 state: bands seen so far + running min dup (only ever carried
  * across batches in the defensive partial-fan-out case). */
private[graft] case class CombineState(seen: Int, best: Option[Long])
