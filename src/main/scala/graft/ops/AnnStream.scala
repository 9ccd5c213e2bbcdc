package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING similarity serving — the ANN twin of
  * [[DedupStream.dedupNearStream]] (r15, VERDICT r14 item 9): an unbounded
  * vector feed where each arriving vector gets its cosine top-k among the
  * vectors already ingested and still inside the TTL window, ROUTED by the
  * persisted IVF index of [[AnnIndex]] — the centroids trained and
  * committed by `AnnIndex.build` decide which inverted list a vector
  * joins and which `nProbe` lists a probe scans, exactly like the batch
  * `AnnIndex.topK`, but against live streaming state instead of the lake.
  *
  * Pipeline:
  *  1. STATELESS route fan-out: per arriving vector, rank the broadcast
  *     centroid array by cosine (same spherical geometry as the index —
  *     scale-invariant to the mean centroids) and emit `nProbe` RouteRows;
  *     the top-1 row is the OWNER row (the list the vector files under —
  *     single residency, so no candidate is ever seen twice across
  *     probed lists).
  *  2. PER-LIST [[AnnBucketProcessor]] via `transformWithState` (Append,
  *     event-time): state = this list's resident vectors inside the TTL.
  *     Every arriving row scans residents for its per-list top-k
  *     (HALF_UP-4 cosine, ties to the smaller vec_id — the batch
  *     `AnnIndex.topK` order); owner rows then join the residency.
  *     Same-batch rows process in vec_id order, so a monotonic feed gets
  *     exactly the batch rule "neighbors = earlier ids", regardless of
  *     micro-batch chopping. Watermark TTL bounds state (eviction on
  *     read + an event-time timer for abandoned lists) — state is
  *     O(vectors-in-TTL), never corpus-sized.
  *  3. PER-VECTOR [[AnnCombineProcessor]] (Append, TimeMode.None): the
  *     `nProbe` per-list candidate sets of a vector land in the same
  *     micro-batch; merge, global top-k, emit (vec_id, rn, neighbor_id,
  *     cos) rows.
  *
  * 100 TB lens: per-vector shuffle = nProbe × (vector + norm) — bounded
  * by dimensionality, never corpus size; all cross-vector work happens
  * inside one inverted list, the same read-amplification bound
  * (nProbe/nLists) as the batch index; the TTL knob bounds both state and
  * the residents a hot list can accumulate. Requires the RocksDB state
  * store like every transformWithState op in this repo. */
object AnnStream {

  private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** HALF_UP 4-decimal cosine — bit-identical to the batch
    * `round(dot / (nrm1 * nrm2), 4)` ranking key. */
  private[graft] def cos4(a: Array[Double], an: Double,
                          b: Array[Double], bn: Double): Double =
    BigDecimal(dot(a, b) / (an * bn))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The streaming ANN top-k. `indexRoot` must hold a built
    * [[AnnIndex]] (its centroids table routes the stream); `ttlSec` is
    * how far (event time) behind the watermark a vector stays servable.
    *
    * `pinDir` (r16, VERDICT r15 item 4): pass the query's CHECKPOINT
    * directory to pin the centroid snapshot the stream routes by. First
    * start resolves the latest centroids snapshot and records its id in
    * `<pinDir>/graft-ann-centroids.pin`; every restart re-reads the
    * PINNED snapshot via time travel, so an `AnnIndex.rebuild` landing
    * mid-stream cannot silently re-route a running query — the bucket
    * residency in the state store was filed under the OLD centroids, and
    * serving new routes against old residents would break the
    * single-residency invariant (a neighbor could be missed or seen
    * twice). Adopting a rebuilt index is an explicit operation: new
    * checkpoint (or delete the pin), fresh state. Without `pinDir` the
    * stream snapshots whatever is latest at build time (the pre-r16
    * behavior — fine for tests and one-shot queries, but a restart after
    * a rebuild re-routes silently). */
  def annTopKStream(vectors: Dataset[StreamVec], indexRoot: String,
                    nProbe: Int, k: Int, ttlSec: Long,
                    latenessSec: Long = 10L,
                    pinDir: Option[String] = None): Dataset[AnnHit] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centsTable = s"$indexRoot/centroids"
    val centsDf = pinDir match {
      case None => graft.sources.SnapshotLake.readLatest(spark, centsTable)
      case Some(dir) =>
        val pin = java.nio.file.Paths.get(dir, "graft-ann-centroids.pin")
        val id =
          if (java.nio.file.Files.exists(pin))
            java.nio.file.Files.readString(pin).trim.toLong
          else {
            val latest = graft.sources.SnapshotLake
              .latest(spark, centsTable)
              .getOrElse(throw new IllegalArgumentException(
                s"no built index at $indexRoot"))
            java.nio.file.Files.createDirectories(pin.getParent)
            // tmp + ATOMIC_MOVE: a crash mid-write must not leave a
            // truncated pin that a restart would parse as a bad id
            val tmp = pin.resolveSibling(pin.getFileName.toString + ".tmp")
            java.nio.file.Files.writeString(tmp, latest.toString)
            java.nio.file.Files.move(tmp, pin,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            latest
          }
        graft.sources.SnapshotLake.readAt(spark, centsTable, id)
    }
    val cents: Array[(Int, Array[Double], Double)] =
      centsDf
        .collect()
        .map(r => (r.getAs[Int]("cid"),
          r.getAs[scala.collection.Seq[Double]]("carr").toArray))
        .sortBy(_._1)
        .map { case (cid, arr) => (cid, arr, math.sqrt(dot(arr, arr))) }
    require(nProbe >= 1 && nProbe <= cents.length && k >= 1,
      s"need 1 <= nProbe <= ${cents.length} and k >= 1")
    val routed = vectors.flatMap { v =>
      val nrm = math.sqrt(dot(v.vec, v.vec))
      // (-cos, cid) sort = cosine DESC, ties to the smaller cid — the
      // same order the index's clist uses
      val ranked = cents.map { case (cid, c, cn) =>
        (-(dot(v.vec, c) / (nrm * cn)), cid)
      }.sorted.take(nProbe)
      ranked.zipWithIndex.map { case ((_, cid), i) =>
        RouteRow(cid, v.vec_id, v.ts, v.vec, nrm, owner = i == 0)
      }
    }
    val perList = routed.withWatermark("ts", s"$latenessSec seconds")
      .groupByKey(_.cid)
      .transformWithState(new AnnBucketProcessor(k, ttlSec),
        "ts", OutputMode.Append)
    perList.groupByKey(_.vec_id)
      .transformWithState(new AnnCombineProcessor(nProbe, k),
        TimeMode.None(), OutputMode.Append)
  }
}

/** Stage-2 processor: one inverted list's live residency. Emits the
  * per-list candidate top-k for every arriving row; owner rows join the
  * residency; residents `ttlSec` behind the watermark evict (on read,
  * plus an event-time timer so an abandoned list frees its state). */
private[graft] class AnnBucketProcessor(k: Int, ttlSec: Long)
    extends StatefulProcessor[Int, RouteRow, ListCands] {
  @transient private var residents: ListState[ResidentVec] = _
  private def ttlMs = ttlSec * 1000L

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    residents = getHandle.getListState[ResidentVec]("residents",
      Encoders.product[ResidentVec], TTLConfig.NONE)

  private def rearm(at: Long): Unit = {
    getHandle.listTimers().toList.foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer(at)
  }

  override def handleInputRows(key: Int, rows: Iterator[RouteRow],
                               timers: TimerValues): Iterator[ListCands] = {
    val wm = timers.getCurrentWatermarkInMs()
    var live = residents.get().filter(_.tsMs >= wm - ttlMs).toList
    val out = rows.toSeq.sortBy(_.vec_id).map { r =>
      val hits = live.iterator
        .filter(_.vec_id != r.vec_id)
        .map(d => CandHit(d.vec_id, AnnStream.cos4(r.vec, r.nrm, d.vec, d.nrm)))
        .toArray
        .sortBy(h => (-h.cos, h.neighbor_id))
        .take(k)
      if (r.owner)
        live = ResidentVec(r.vec_id, r.ts.getTime, r.vec, r.nrm) :: live
      ListCands(r.vec_id, r.ts, hits)
    }
    // ListState refuses an empty put — an all-expired residency clears
    if (live.isEmpty) residents.clear()
    else {
      residents.put(live.toArray)
      rearm(math.max(live.map(_.tsMs).min + ttlMs, wm + 1))
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Int, timers: TimerValues,
                                  info: ExpiredTimerInfo)
      : Iterator[ListCands] = {
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

/** Stage-3 processor: merge a vector's `nProbe` per-list candidate sets
  * into its global top-k. Single-residency routing means no neighbor
  * appears in two lists, so the merge is a plain concat + re-rank. */
private[graft] class AnnCombineProcessor(nProbe: Int, k: Int)
    extends StatefulProcessor[Long, ListCands, AnnHit] {
  @transient private var partial: ValueState[AnnCombineState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    partial = getHandle.getValueState[AnnCombineState]("partial",
      Encoders.product[AnnCombineState], TTLConfig.NONE)

  override def handleInputRows(id: Long, rows: Iterator[ListCands],
                               timers: TimerValues): Iterator[AnnHit] = {
    val prev =
      if (partial.exists()) partial.get()
      else AnnCombineState(0, Array.empty[CandHit])
    var seen = prev.seen
    var hits = prev.hits
    rows.foreach { r => seen += 1; hits = hits ++ r.hits }
    if (seen >= nProbe) {
      partial.clear()
      hits.sortBy(h => (-h.cos, h.neighbor_id)).take(k).zipWithIndex
        .iterator.map { case (h, i) =>
          AnnHit(id, i + 1, h.neighbor_id, h.cos)
        }
    } else {
      partial.update(AnnCombineState(seen, hits))
      Iterator.empty
    }
  }
}

/** One vector of the streaming ANN feed (event-time `ts` drives the TTL
  * watermark). */
case class StreamVec(vec_id: Long, ts: java.sql.Timestamp, vec: Array[Double])

/** One emitted neighbor: `rn` is the 1-based rank among the vector's
  * served top-k (cosine DESC, ties to the smaller neighbor id). */
case class AnnHit(vec_id: Long, rn: Int, neighbor_id: Long, cos: Double)

private[graft] case class RouteRow(cid: Int, vec_id: Long,
                                   ts: java.sql.Timestamp,
                                   vec: Array[Double], nrm: Double,
                                   owner: Boolean)
private[graft] case class CandHit(neighbor_id: Long, cos: Double)
private[graft] case class ListCands(vec_id: Long, ts: java.sql.Timestamp,
                                    hits: Array[CandHit])
private[graft] case class ResidentVec(vec_id: Long, tsMs: Long,
                                      vec: Array[Double], nrm: Double)
private[graft] case class AnnCombineState(seen: Int, hits: Array[CandHit])
