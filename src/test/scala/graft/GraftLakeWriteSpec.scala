package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `df.write.format("graftlake")` / `writeStream.format("graftlake")` —
  * the write half of the SQL-reachable SnapshotLake surface (r16). Pins:
  *  1. every batch save mode against the manifest protocol: append
  *     stacks snapshots, overwrite is an ATOMIC full replace with old
  *     snapshots still time-travelable, errorifexists keys off committed
  *     snapshots (an orphaned writer dir does not count), ignore is a
  *     recorded no-op;
  *  2. write → read round-trip through BOTH readers (format and object
  *     API), byte-for-byte;
  *  3. streaming: each micro-batch is one atomic snapshot, a restart
  *     from the same checkpoint replays the in-flight batch as a
  *     recorded NO-OP (exactly-once, no side ledger), and non-append
  *     output modes are refused at start.
  */
class GraftLakeWriteSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("append mode stacks snapshots; round-trips through both readers") {
    import s.implicits._
    val table = tmpDir("glw-append")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graftlake").mode("append").save(table)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graftlake").mode("append").save(table)
    assert(SnapshotLake.snapshots(s, table) == Seq(1L, 2L))
    val expect = Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c"))
    assert(rows(s.read.format("graftlake").load(table)) == expect)
    assert(rows(SnapshotLake.readLatest(s, table)) == expect)
  }

  test("overwrite is an atomic full replace; old snapshots stay travelable") {
    import s.implicits._
    val table = tmpDir("glw-over")
    Seq((1L, "a")).toDF("k", "v")
      .write.format("graftlake").mode("append").save(table)
    Seq((9L, "z")).toDF("k", "v")
      .write.format("graftlake").mode("overwrite").save(table)
    assert(rows(s.read.format("graftlake").load(table)) ==
      Set(Seq[Any](9L, "z")))
    // the pre-overwrite snapshot is byte-stable history, not gone
    assert(rows(s.read.format("graftlake").option("snapshotId", "1")
      .load(table)) == Set(Seq[Any](1L, "a")))
  }

  test("errorifexists keys off COMMITTED snapshots; ignore is a no-op") {
    import s.implicits._
    val table = tmpDir("glw-eie")
    // an orphaned (uncommitted) writer dir must NOT count as "exists"
    SnapshotLake.writeData(Seq((0L, "torn")).toDF("k", "v"), table, 1000000L)
    Seq((1L, "a")).toDF("k", "v")
      .write.format("graftlake").mode("errorifexists").save(table)
    assert(rows(s.read.format("graftlake").load(table)) ==
      Set(Seq[Any](1L, "a")))
    val e = intercept[IllegalStateException] {
      Seq((2L, "b")).toDF("k", "v")
        .write.format("graftlake").mode("errorifexists").save(table)
    }
    assert(e.getMessage.contains("errorifexists"))
    Seq((2L, "b")).toDF("k", "v")
      .write.format("graftlake").mode("ignore").save(table)
    assert(rows(s.read.format("graftlake").load(table)) ==
      Set(Seq[Any](1L, "a")), "ignore must not write")
    assert(SnapshotLake.snapshots(s, table) == Seq(1L))
  }

  test("streaming sink: one atomic snapshot per micro-batch, exactly-once restart") {
    import s.implicits._
    val table = tmpDir("glw-stream")
    val cp = tmpDir("glw-stream-cp")
    val input = MemoryStream[(Long, String)](s)
    def start() = input.toDF().toDF("k", "v")
      .writeStream.format("graftlake")
      .option("checkpointLocation", cp).start(table)
    val q1 = start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
      input.addData((3L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(rows(SnapshotLake.readLatest(s, table)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c")))
    // each non-empty micro-batch committed as its own snapshot
    val nAfterFirst = SnapshotLake.snapshots(s, table).size
    assert(nAfterFirst >= 2)
    // restart from the same checkpoint: the replayed batch is a recorded
    // no-op (same batchId → same dedupKey), new data still lands
    val q2 = start()
    try {
      input.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(SnapshotLake.readLatest(s, table)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c"),
          Seq[Any](4L, "d")),
      "restart must neither duplicate nor drop")
    // downstream can tail the stream's snapshots incrementally
    val snaps = SnapshotLake.snapshots(s, table)
    assert(rows(SnapshotLake.readIncremental(s, table,
      snaps(nAfterFirst - 1), snaps.last)) == Set(Seq[Any](4L, "d")))
  }

  test("streaming into a bucket-laid-out table preserves the layout " +
       "(r19): batches route + tag, restart exactly-once, the join " +
       "after N micro-batches is exchange-free") {
    import s.implicits._
    val table = tmpDir("glw-bstream")
    val dim = tmpDir("glw-bdim")
    val cp = tmpDir("glw-bstream-cp")
    // establish the layout, then stream into it
    SnapshotLake.commitBucketed(
      Seq((1L, "seed")).toDF("k", "v"), table, Seq("k"), 4)
    SnapshotLake.commitBucketed(
      (1L to 40L).map(k => (k, s"d$k")).toDF("k", "v"), dim, Seq("k"), 4)
    val input = MemoryStream[(Long, String)](s)
    def start() = input.toDF().toDF("k", "v")
      .writeStream.format("graftlake")
      .option("checkpointLocation", cp).start(table)
    val q1 = start()
    try {
      input.addData((2L, "b"), (3L, "c"))
      q1.processAllAvailable()
      input.addData((4L, "d"))
      q1.processAllAvailable()
    } finally q1.stop()
    // kill/restart: the replayed batch is a no-op, new data lands routed
    val q2 = start()
    try {
      input.addData((5L, "e"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(SnapshotLake.readLatest(s, table)) ==
      (1L to 5L).map(k => Seq[Any](k,
        Map(1L -> "seed", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")(k)))
        .toSet)
    // the layout line survived every micro-batch commit
    assert(SnapshotLake.manifestBucket(s, table,
      SnapshotLake.latest(s, table).get).contains((4, Seq("k"), Seq())))
    // every streamed file carries a valid, exact bucket tag
    SnapshotLake.manifestDirs(s, table, SnapshotLake.latest(s, table).get)
      .foreach { dir =>
        new java.io.File(dir).listFiles()
          .filter(f => f.isFile && !f.getName.startsWith("_")
            && !f.getName.startsWith(".")).foreach { f =>
            val bid = org.apache.spark.sql.execution.datasources
              .BucketingUtils.getBucketId(f.getName).getOrElse(
                fail(s"untagged streamed file: ${f.getName}"))
            val bad = s.read.parquet(f.getAbsolutePath)
              .filter(pmod(hash(col("k")), lit(4)) =!= bid).count()
            assert(bad == 0, s"${f.getName}: $bad rows off-bucket")
          }
      }
    // the CDC→MV co-location payoff: after N micro-batches the SQL join
    // against a same-layout dim is exchange-free
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.sql(s"SELECT a.k, a.v, b.v AS dv FROM graftlake.`$table` " +
        s"a JOIN graftlake.`$dim` b ON a.k = b.k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange (hash|range|single)".r.findAllIn(plan).isEmpty,
        s"post-stream bucketed join must be exchange-free:\n$plan")
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("non-append output modes and partition columns are refused at start") {
    import s.implicits._
    val table = tmpDir("glw-refuse")
    val cp = tmpDir("glw-refuse-cp")
    val input = MemoryStream[(Long, String)](s)
    val agg = input.toDF().toDF("k", "v").groupBy("v").count()
    val e = intercept[Exception] {
      agg.writeStream.format("graftlake").outputMode("complete")
        .option("checkpointLocation", cp).start(table)
    }
    assert(e.getMessage.contains("append"),
      s"refusal must name the supported mode: ${e.getMessage}")
  }
}
