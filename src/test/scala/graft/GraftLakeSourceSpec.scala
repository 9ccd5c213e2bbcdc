package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** `spark.readStream.format("graftlake")` — tailing the snapshot history
  * as a micro-batch stream (r16, the CDC symmetry of the write path).
  * Offsets are committed snapshot ids; each micro-batch is exactly the
  * readIncremental delta. Pins:
  *  1. live tail: snapshots committed while the stream runs arrive as
  *     increments, the whole table replays as the initial backfill;
  *  2. checkpointed restart resumes at the consumed snapshot — no
  *     re-emission, no gaps (even for snapshots committed while down);
  *  3. `startingSnapshotId` skips history; `maxSnapshotsPerTrigger`
  *     paces a backlog across bounded micro-batches;
  *  4. non-append histories fail LOUDLY (a compact in the tailed range
  *     must not re-emit rewritten rows as inserts);
  *  5. batches align to the query-start schema (a mid-stream addColumn
  *     append neither reshapes nor breaks a running query).
  */
class GraftLakeSourceSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("backfill + live tail: committed snapshots arrive as increments") {
    import s.implicits._
    val table = tmpDir("gls-tail")
    SnapshotLake.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table)
    val q = s.readStream.format("graftlake").load(table)
      .writeStream.format("memory").queryName("gls_tail")
      .option("checkpointLocation", tmpDir("gls-tail-cp")).start()
    try {
      q.processAllAvailable()
      assert(rows(s.table("gls_tail")) ==
        Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")), "initial backfill")
      SnapshotLake.commit(Seq((3L, "c")).toDF("k", "v"), table)
      q.processAllAvailable()
      assert(rows(s.table("gls_tail")) ==
        Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c")),
        "live increment")
    } finally q.stop()
  }

  test("restart resumes at the consumed snapshot: no re-emission, no gaps") {
    import s.implicits._
    // lake-to-lake: graftlake SOURCE tailing one table into the graftlake
    // SINK writing another, restarted from the same checkpoint — the
    // memory sink cannot recover a checkpoint, and this is the actual
    // deployment shape (CDC tail → downstream snapshot table)
    val src = tmpDir("gls-restart-src")
    val dst = tmpDir("gls-restart-dst")
    val cp = tmpDir("gls-restart-cp")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), src)
    def start() = s.readStream.format("graftlake").load(src)
      .writeStream.format("graftlake")
      .option("checkpointLocation", cp).start(dst)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(rows(SnapshotLake.readLatest(s, dst)) == Set(Seq[Any](1L, "a")))
    // a snapshot lands while the stream is DOWN
    SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), src)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly-once end to end: the down-time snapshot arrives once,
      // the consumed one does not replay
      assert(rows(SnapshotLake.readLatest(s, dst)) ==
        Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")),
        "restart must neither replay nor skip")
    } finally q2.stop()
  }

  test("startingSnapshotId skips history; maxSnapshotsPerTrigger paces a backlog") {
    import s.implicits._
    val table = tmpDir("gls-pace")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), table)
    SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), table)
    SnapshotLake.commit(Seq((3L, "c")).toDF("k", "v"), table)
    SnapshotLake.commit(Seq((4L, "d")).toDF("k", "v"), table)
    val q = s.readStream.format("graftlake")
      .option("startingSnapshotId", "1")
      .option("maxSnapshotsPerTrigger", "1").load(table)
      .writeStream.format("memory").queryName("gls_pace")
      .option("checkpointLocation", tmpDir("gls-pace-cp")).start()
    try {
      q.processAllAvailable()
      assert(rows(s.table("gls_pace")) ==
        Set(Seq[Any](2L, "b"), Seq[Any](3L, "c"), Seq[Any](4L, "d")),
        "history before startingSnapshotId must not replay")
      // one snapshot per trigger: the 3-snapshot backlog took >= 3 batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3,
        s"backlog must drain across bounded micro-batches, saw $batches")
    } finally q.stop()
  }

  test("startingSnapshotId=latest-at-start skips all history (r17)") {
    import s.implicits._
    val table = tmpDir("gls-latest")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), table)
    SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), table)
    val q = s.readStream.format("graftlake")
      .option("startingSnapshotId", "latest-at-start").load(table)
      .writeStream.format("memory").queryName("gls_latest")
      .option("checkpointLocation", tmpDir("gls-latest-cp")).start()
    try {
      q.processAllAvailable()
      assert(rows(s.table("gls_latest")).isEmpty,
        "latest-at-start must emit nothing for pre-existing history")
      // only snapshots committed AFTER query start flow
      SnapshotLake.commit(Seq((3L, "c")).toDF("k", "v"), table,
        append = true)
      q.processAllAvailable()
      assert(rows(s.table("gls_latest")) == Set(Seq[Any](3L, "c")))
    } finally q.stop()
  }

  test("a compact in the tailed range fails loudly instead of re-emitting") {
    import s.implicits._
    val table = tmpDir("gls-compact")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), table)
    val q = s.readStream.format("graftlake").load(table)
      .writeStream.format("memory").queryName("gls_compact")
      .option("checkpointLocation", tmpDir("gls-compact-cp")).start()
    try {
      q.processAllAvailable()
      SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), table)
      assert(SnapshotLake.compact(s, table).isDefined)
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("APPEND-ONLY") ||
        Option(e.getCause).exists(_.getMessage.contains("APPEND-ONLY")),
        s"must name the append-only contract: ${e.getMessage}")
    } finally q.stop()
  }

  test("batches align to the query-start schema across a mid-stream ALTER") {
    import s.implicits._
    val table = tmpDir("gls-schema")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), table)
    val q = s.readStream.format("graftlake").load(table)
      .writeStream.format("memory").queryName("gls_schema")
      .option("checkpointLocation", tmpDir("gls-schema-cp")).start()
    try {
      q.processAllAvailable()
      // ALTER + an append CARRYING the new column, mid-stream
      SnapshotLake.addColumn(s, table, "score", "double")
      SnapshotLake.commit(Seq((2L, "b", 0.5)).toDF("k", "v", "score"), table)
      q.processAllAvailable()
      val got = s.table("gls_schema")
      assert(got.schema.fieldNames.toSeq == Seq("k", "v"),
        "a running query keeps its start schema")
      assert(rows(got) == Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
    } finally q.stop()
  }
}
