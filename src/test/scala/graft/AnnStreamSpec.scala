package graft

import java.sql.Timestamp
import graft.ops.{AnnIndex, AnnStream, AnnHit, StreamVec}
import graft.sources.SnapshotLake
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[AnnStream.annTopKStream]] — streaming similarity serving routed by
  * the persisted IVF index (r15, VERDICT r14 item 9). Pins:
  *
  *  1. stream ≡ batch on the REAL embeddings fixture across micro-batches:
  *     each arriving vector's served top-k equals the batch earlier-id
  *     rule (candidates = already-arrived vectors whose OWNER list is
  *     among the probe's nProbe nearest lists of the SAME persisted
  *     centroids, ranked by HALF_UP-4 cosine, ties to the smaller id);
  *  2. watermark TTL: an expired vector neither serves as a neighbor nor
  *     survives in list state, while an in-TTL one still serves.
  */
class AnnStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val NLists = 16

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

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

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("stream top-k == batch earlier-id rule routed by the persisted index") { withRocksDb {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val root = tmpDir("ann_stream_idx")
    AnnIndex.build(emb, root, NLists)
    val nProbe = 4
    val k = 5

    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray)
      .sortBy(_._1)
    val cents = SnapshotLake.readLatest(spark, s"$root/centroids")
      .collect()
      .map(r => r.getAs[Int]("cid") ->
        r.getAs[scala.collection.Seq[Double]]("carr").toArray)
      .sortBy(_._1)

    // batch expectation, recomputed independently: probe lists and owner
    // list from the SAME persisted centroids (cosine desc, ties smaller
    // cid), candidates = earlier-id vectors filed in a probed list
    def rankedLists(v: Array[Double]): Seq[Int] = {
      val nrm = math.sqrt(dot(v, v))
      cents.map { case (cid, c) =>
        (-(dot(v, c) / (nrm * math.sqrt(dot(c, c)))), cid)
      }.sorted.map(_._2).toSeq
    }
    val owner = vecs.map { case (id, v) => id -> rankedLists(v).head }.toMap
    val expected: Map[(Long, Int), (Long, Double)] = vecs.flatMap {
      case (id, v) =>
        val probed = rankedLists(v).take(nProbe).toSet
        val nrm = math.sqrt(dot(v, v))
        vecs.filter { case (uid, _) => uid < id && probed(owner(uid)) }
          .map { case (uid, u) =>
            (uid, r4(dot(v, u) / (nrm * math.sqrt(dot(u, u)))))
          }
          .sortBy { case (uid, c) => (-c, uid) }
          .take(k).zipWithIndex
          .map { case ((uid, c), i) => (id, i + 1) -> (uid, c) }
    }.toMap

    val input = MemoryStream[StreamVec](spark)
    val out = AnnStream.annTopKStream(input.toDS(), root, nProbe, k,
      ttlSec = 1000000L)
    val q = out.writeStream.format("memory").queryName("ann_stream_out")
      .outputMode("append").start()
    try {
      val feed = vecs.map { case (id, v) => StreamVec(id, sec(10000 + id), v) }
      feed.grouped((feed.length + 3) / 4).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val got = spark.table("ann_stream_out").as[AnnHit].collect()
        .map(h => (h.vec_id, h.rn) -> (h.neighbor_id, h.cos)).toMap
      assert(got.size == expected.size,
        s"${got.size} served hits vs ${expected.size} expected")
      val diffs = expected.collect {
        case (key, e) if got.get(key) != Some(e) =>
          s"$key: stream ${got.get(key)} vs batch $e"
      }
      assert(diffs.isEmpty, s"${diffs.size} diffs, first: ${diffs.take(3)}")
    } finally q.stop()
  }}

  test("kill/restart recovers list residency — an incarnation-2 probe still finds incarnation-1 vectors") { withRocksDb {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val root = tmpDir("ann_stream_recover_idx")
    AnnIndex.build(emb, root, NLists)
    val v = emb.filter(col("vec_id") === 0L).collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
    val ckpt = java.nio.file.Files
      .createTempDirectory("ann_recover_ckpt").toString
    val input = MemoryStream[StreamVec](spark)
    // memory sink can't recover from a checkpoint — collect through
    // foreachBatch; the Set dedups at-least-once replay
    val hits = java.util.concurrent.ConcurrentHashMap.newKeySet[AnnHit]()
    def start() = AnnStream
      .annTopKStream(input.toDS(), root, nProbe = 2, k = 5,
        ttlSec = 1000000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AnnHit],
                       _: Long) => b.collect().foreach(hits.add) }
      .start()

    val q1 = start()
    try {
      input.addData(StreamVec(1L, sec(1000), v))
      q1.processAllAvailable()
    } finally q1.stop() // kill with vec 1 resident in list state

    val q2 = start()
    try {
      input.addData(StreamVec(2L, sec(1001), v)) // identical direction
      q2.processAllAvailable()
      val got = {
        import scala.jdk.CollectionConverters._
        hits.asScala.toSet
      }
      assert(got == Set(AnnHit(2L, 1, 1L, 1.0)),
        s"recovered residency must serve vec 1 to vec 2: $got")
    } finally q2.stop()
  }}

  test("pinDir pins the centroid snapshot across restart — a mid-stream rebuild cannot re-route (r16)") { withRocksDb {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val root = tmpDir("ann_stream_pin_idx")
    AnnIndex.build(emb, root, NLists)
    val pinnedId = SnapshotLake.latest(spark, s"$root/centroids").get
    val v = emb.filter(col("vec_id") === 0L).collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
    val ckpt = java.nio.file.Files
      .createTempDirectory("ann_pin_ckpt").toString
    val input = MemoryStream[StreamVec](spark)
    val hits = java.util.concurrent.ConcurrentHashMap.newKeySet[AnnHit]()
    def start() = AnnStream
      .annTopKStream(input.toDS(), root, nProbe = 2, k = 5,
        ttlSec = 1000000L, pinDir = Some(ckpt))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AnnHit],
                       _: Long) => b.collect().foreach(hits.add) }
      .start()

    val q1 = start()
    try {
      input.addData(StreamVec(1L, sec(1000), v))
      q1.processAllAvailable()
    } finally q1.stop() // vec 1 resident under the PINNED routing

    // a rebuild lands mid-stream: drifted appends + retrain move the
    // centroids (latest != pinned), exactly the event the pin defends
    // against
    val drifted = emb.filter(col("vec_id") >= 250)
      .select((col("vec_id") + 1000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
             "CASE WHEN pmod(hash(7, i), 2) = 0 THEN x ELSE -x END)")
          .as("embedding"))
    AnnIndex.append(spark, drifted, root)
    assert(AnnIndex.rebuild(spark, root, NLists).isDefined)
    val oldCents = SnapshotLake.readAt(spark, s"$root/centroids", pinnedId)
      .collect().map(r => r.getAs[Int]("cid") ->
        r.getAs[scala.collection.Seq[Double]]("carr").toSeq).toMap
    val newCents = SnapshotLake.readLatest(spark, s"$root/centroids")
      .collect().map(r => r.getAs[Int]("cid") ->
        r.getAs[scala.collection.Seq[Double]]("carr").toSeq).toMap
    assert(oldCents != newCents,
      "rebuild must move the centroids for this pin test to mean anything")

    val q2 = start() // restart: must route by the PINNED snapshot
    try {
      input.addData(StreamVec(2L, sec(1001), v)) // identical direction
      q2.processAllAvailable()
      val got = {
        import scala.jdk.CollectionConverters._
        hits.asScala.toSet
      }
      assert(got == Set(AnnHit(2L, 1, 1L, 1.0)),
        s"pinned routing must still serve vec 1 to vec 2: $got")
      val pin = java.nio.file.Paths.get(ckpt, "graft-ann-centroids.pin")
      assert(java.nio.file.Files.readString(pin).trim.toLong == pinnedId,
        "restart must not advance the pinned snapshot id")
    } finally q2.stop()
  }}

  test("watermark TTL: expired vectors stop serving; in-TTL ones still do") { withRocksDb {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val root = tmpDir("ann_stream_ttl")
    AnnIndex.build(emb, root, NLists)
    // three IDENTICAL vectors (cos = 1.0, same owner list), spaced so the
    // first expires before the third arrives
    val v = emb.filter(col("vec_id") === 0L).collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
    val input = MemoryStream[StreamVec](spark)
    val out = AnnStream.annTopKStream(input.toDS(), root, nProbe = 2, k = 5,
      ttlSec = 100L, latenessSec = 10L)
    val q = out.writeStream.format("memory").queryName("ann_ttl_out")
      .outputMode("append").start()
    try {
      input.addData(StreamVec(1L, sec(100), v))
      q.processAllAvailable() // watermark after: 90s
      input.addData(StreamVec(2L, sec(400), v))
      q.processAllAvailable() // vec 1 still in TTL at wm 90 → serves
      input.addData(StreamVec(3L, sec(400), v))
      q.processAllAvailable() // wm 390: vec 1 (ts 100 < 290) expired
      val got = spark.table("ann_ttl_out").as[AnnHit].collect()
        .groupBy(_.vec_id)
        .map { case (id, hs) => id -> hs.map(_.neighbor_id).toSet }
      assert(!got.contains(1L), "first vector had nothing to match")
      assert(got(2L) == Set(1L), s"vec 2 must see in-TTL vec 1: $got")
      assert(got(3L) == Set(2L),
        s"vec 3 must see vec 2 but NOT the expired vec 1: $got")
    } finally q.stop()
  }}
}
