package graft

import graft.sources.{LakeSink, SnapshotLake}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LakeSinkSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("writes hive-style dt= directories and round-trips rows") {
    val dir = tmpDir("lake")
    val events = Tables.events(s, TestSpark.Sf0001)
    LakeSink.writeByDay(events, "ts", dir)
    val dts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("dt=")).sorted
    assert(dts.nonEmpty && dts.forall(_.matches("dt=\\d{4}-\\d{2}-\\d{2}")))
    assert(LakeSink.read(s, dir).count() == events.count())
  }

  test("files per partition directory bounded by writersPerDay") {
    val dir = tmpDir("lake-files")
    LakeSink.writeByDay(Tables.events(s, TestSpark.Sf0001), "ts", dir,
      writersPerDay = 4)
    val perDir = new java.io.File(dir).listFiles().filter(_.getName.startsWith("dt="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perDir.nonEmpty)
    perDir.foreach { case (dt, n) =>
      assert(n >= 1 && n <= 4,
        s"$dt has $n files; salted repartition-before-write broken")
    }
  }

  // ---- SnapshotLake: manifest-commit protocol (r10 verdict item 3) ----

  test("snapshot commit is atomic: a crashed half-write is invisible to every read path") {
    import s.implicits._
    val table = tmpDir("snap-atomic")
    val id1 = SnapshotLake.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table)
    assert(id1 == 1L)
    // simulate a writer that crashed between data-write and manifest
    // rename: data files exist under data/, no manifest appeared
    SnapshotLake.writeData(Seq((99L, "torn")).toDF("k", "v"), table, 1000000L)
    assert(SnapshotLake.latest(s, table).contains(1L))
    assert(SnapshotLake.readLatest(s, table).count() == 2L)
    assert(SnapshotLake.readAt(s, table, 1L)
      .as[(Long, String)].collect().sorted.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("time-travel read of snapshot N-1 is byte-stable while N lands; ids are monotonic") {
    import s.implicits._
    val table = tmpDir("snap-travel")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), table)
    val before = SnapshotLake.readAt(s, table, 1L)
      .as[(Long, String)].collect().sorted.toSeq
    // N lands (append) while the N-1 handle stays open
    val id2 = SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), table,
      append = true)
    assert(id2 == 2L)
    assert(SnapshotLake.readAt(s, table, 1L)
      .as[(Long, String)].collect().sorted.toSeq == before)
    assert(SnapshotLake.readAt(s, table, 2L).count() == 2L)
    // atomic full-replace: N+1 overwrite shows ONLY the new data — and
    // N-1/N stay readable
    val id3 = SnapshotLake.commit(Seq((9L, "z")).toDF("k", "v"), table,
      append = false)
    assert(id3 == 3L)
    assert(SnapshotLake.readAt(s, table, 3L)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(SnapshotLake.readAt(s, table, 1L)
      .as[(Long, String)].collect().sorted.toSeq == before)
    assert(SnapshotLake.snapshots(s, table) == Seq(1L, 2L, 3L))
  }

  test("losing the id CAS race retries onto the next id instead of clobbering") {
    import s.implicits._
    val table = tmpDir("snap-race")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), table)
    // occupy id 2 out from under the next committer (the "concurrent
    // winner" whose rename landed first)
    assert(SnapshotLake.tryCommitManifest(s, table, 2L, Seq.empty))
    // the loser's view: same id now refuses — no clobber, no exception
    assert(!SnapshotLake.tryCommitManifest(s, table, 2L, Seq("some/dir")))
    val id = SnapshotLake.commit(Seq((3L, "c")).toDF("k", "v"), table)
    assert(id == 3L, s"committer should have allocated past the taken id, got $id")
    // the squatter's empty snapshot 2 is intact; 3 appended onto it
    assert(SnapshotLake.readAt(s, table, 3L)
      .as[(Long, String)].collect().toSeq == Seq((3L, "c")))
  }

  test("a dt filter prunes the scan to matching partitions") {
    val dir = tmpDir("lake-prune")
    LakeSink.writeByDay(Tables.events(s, TestSpark.Sf0001), "ts", dir)
    // partition-column inference types dt as DATE on read
    val firstDt = LakeSink.read(s, dir)
      .agg(min(col("dt").cast("string"))).head.getString(0)
    val df = LakeSink.read(s, dir).filter(col("dt") === lit(firstDt))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
           plan.contains("dt"), s"no partition filter in:\n$plan")
  }
}
