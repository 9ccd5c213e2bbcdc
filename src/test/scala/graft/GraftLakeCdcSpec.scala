package graft

import graft.sources.{GraftLakeCdc, SnapshotLake}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graftlake change feed + materialized-view maintenance (r17,
  * VERDICT r16 item 6): mutations stream as `_change_type`-tagged rows
  * keyed off the manifest dir-diff — where the append-only tail refuses
  * — and a lake-to-lake keyed view stays row-equal to the source
  * through append / DELETE / UPDATE / MERGE / compaction, kill/restart
  * included. */
class GraftLakeCdcSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("change feed tags dir-diff rows with type and commit version") {
    import s.implicits._
    val t = tmpDir("cdc-feed")
    SnapshotLake.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    SnapshotLake.commit(Seq((3L, "c")).toDF("k", "v"), t, append = true)
    SnapshotLake.delete(s, t, col("k") === 1L) // rewrites dir1: 2 stays
    val q = s.readStream.format("graftlake").option("changeFeed", "true")
      .load(t)
      .writeStream.format("memory").queryName("cdc_feed")
      .option("checkpointLocation", tmpDir("cdc-feed-cp")).start()
    try {
      q.processAllAvailable()
      val got = s.table("cdc_feed").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      assert(got == Set(
        (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
        (3L, "c", "insert", 2L),
        // the DELETE rewrote dir1: its rows emit as deletes, the
        // surviving row re-emits as an insert at the same version
        (1L, "a", "delete", 3L), (2L, "b", "delete", 3L),
        (2L, "b", "insert", 3L)),
        s"unexpected feed: $got")
      // a live UPDATE streams as delete+insert pairs
      SnapshotLake.update(s, t, col("k") === 3L,
        Map("v" -> lit("C")))
      q.processAllAvailable()
      val v4 = s.table("cdc_feed").collect()
        .filter(_.getLong(3) == 4L)
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(v4 == Set((3L, "c", "delete"), (3L, "C", "insert")))
    } finally q.stop()
  }

  test("materialized view stays row-equal through mutations, restart included") {
    import s.implicits._
    val src = tmpDir("cdc-src"); val dst = tmpDir("cdc-dst")
    val cp = tmpDir("cdc-cp")
    SnapshotLake.commit(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v"), src)
    val q1 = GraftLakeCdc.materialize(s, src, dst, Seq("k"), cp)
    try {
      q1.processAllAvailable()
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        rows(SnapshotLake.readLatest(s, src)))
      // mutate while live: append, delete, merge (update+insert)
      SnapshotLake.commit(Seq((4L, "d")).toDF("k", "v"), src,
        append = true)
      SnapshotLake.delete(s, src, col("k") === 2L)
      SnapshotLake.merge(s, src, Seq((3L, "C"), (9L, "i")).toDF("k", "v"),
        Seq("k"))
      q1.processAllAvailable()
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        rows(SnapshotLake.readLatest(s, src)))
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        Set(Seq[Any](1L, "a"), Seq[Any](3L, "C"), Seq[Any](4L, "d"),
          Seq[Any](9L, "i")))
    } finally q1.stop()
    // mutations while the view is DOWN, then restart from the checkpoint
    SnapshotLake.update(s, src, col("k") === 1L, Map("v" -> lit("A")))
    SnapshotLake.commit(Seq((10L, "j")).toDF("k", "v"), src, append = true)
    val q2 = GraftLakeCdc.materialize(s, src, dst, Seq("k"), cp)
    try {
      q2.processAllAvailable()
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        rows(SnapshotLake.readLatest(s, src)))
    } finally q2.stop()
  }

  test("a key inserted then updated INSIDE one batch lands at its final value") {
    import s.implicits._
    val src = tmpDir("cdc-order"); val dst = tmpDir("cdc-order-dst")
    // three snapshots BEFORE the view starts: one batch spans them all
    SnapshotLake.commit(Seq((1L, "v1")).toDF("k", "v"), src)
    SnapshotLake.update(s, src, col("k") === 1L, Map("v" -> lit("v2")))
    SnapshotLake.update(s, src, col("k") === 1L, Map("v" -> lit("v3")))
    val q = GraftLakeCdc.materialize(s, src, dst, Seq("k"),
      tmpDir("cdc-order-cp"))
    try {
      q.processAllAvailable()
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        Set(Seq[Any](1L, "v3")),
        "per-version apply order must land the final value")
    } finally q.stop()
  }

  test("compaction nets to zero for the keyed view") {
    import s.implicits._
    val src = tmpDir("cdc-compact"); val dst = tmpDir("cdc-compact-dst")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), src)
    SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), src, append = true)
    val q = GraftLakeCdc.materialize(s, src, dst, Seq("k"),
      tmpDir("cdc-compact-cp"))
    try {
      q.processAllAvailable()
      val dstSnapBefore = SnapshotLake.latest(s, dst).get
      assert(SnapshotLake.compact(s, src).isDefined)
      q.processAllAvailable()
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        rows(SnapshotLake.readLatest(s, src)),
        "compaction must be value-neutral downstream")
      // r18: value-neutral versions apply ZERO mutations — no dst commit
      assert(SnapshotLake.latest(s, dst).contains(dstSnapBefore),
        "a compaction version must not commit anything to the MV")
    } finally q.stop()
  }

  test("pruned MV: a wide table moves only the requested columns (r18)") {
    import s.implicits._
    val src = tmpDir("cdc-wide"); val dst = tmpDir("cdc-wide-dst")
    SnapshotLake.commit(Seq(
      (1L, "a", 1.0, "pad1", "pad2", "pad3"),
      (2L, "b", 2.0, "pad1", "pad2", "pad3"))
      .toDF("k", "v", "score", "w1", "w2", "w3"), src)
    // the SOURCE schema itself prunes (feedColumns) — the projection
    // lands inside each batch plan, so the parquet scan reads only the
    // requested width (a post-wrap select could not reach it)
    val rawFeed = s.readStream.format("graftlake")
      .option("changeFeed", "true").option("feedColumns", "k,v").load(src)
    assert(rawFeed.schema.fieldNames.toSeq ==
      Seq("k", "v", "_change_type", "_commit_version"))
    // unknown feed columns refuse at query definition
    val exCols = intercept[Exception] {
      s.readStream.format("graftlake").option("changeFeed", "true")
        .option("feedColumns", "k,nope").load(src)
    }
    assert(exCols.getMessage.contains("nope"))
    val q = GraftLakeCdc.materialize(s, src, dst, Seq("k"),
      tmpDir("cdc-wide-cp"), columns = Seq("v"))
    try {
      q.processAllAvailable()
      // the MV carries ONLY keys ++ requested columns
      assert(SnapshotLake.readLatest(s, dst).columns.toSeq == Seq("k", "v"))
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
      // mutations keep flowing at the pruned width
      SnapshotLake.update(s, src, col("k") === 2L, Map("v" -> lit("B")))
      SnapshotLake.delete(s, src, col("k") === 1L)
      q.processAllAvailable()
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        Set(Seq[Any](2L, "B")))
    } finally q.stop()
  }

  test("the plain append-only tail still refuses mutations, pointing at changeFeed") {
    import s.implicits._
    val t = tmpDir("cdc-refuse")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), t)
    val q = s.readStream.format("graftlake").load(t)
      .writeStream.format("memory").queryName("cdc_refuse")
      .option("checkpointLocation", tmpDir("cdc-refuse-cp")).start()
    try {
      q.processAllAvailable()
      SnapshotLake.delete(s, t, col("k") === 1L)
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(ex.getMessage.contains("changeFeed"),
        s"refusal must advertise the change feed: ${ex.getMessage}")
    } finally q.stop()
  }
}
