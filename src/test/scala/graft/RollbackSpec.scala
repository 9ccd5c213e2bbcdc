package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ROLLBACK (r19): restore the head to an earlier snapshot as a NEW
  * commit — values ≡ readAt(target), history (including the bad head)
  * stays byte-stable and time-travelable, bucket layouts and evolution
  * directives restore with the target, races lose loudly (None), and
  * the SQL procedure twins the object API. */
class RollbackSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(n: Int, from: Int = 1): DataFrame = {
    import s.implicits._
    (from until from + n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("rollback restores values as a new commit; the bad head and all " +
       "history stay readable; appends land on the restored state") {
    val t = tmpDir("rb")
    SnapshotLake.commit(frame(10), t)
    val good = SnapshotLake.latest(s, t).get
    SnapshotLake.commit(frame(5, 100), t) // the "bad" append
    val bad = SnapshotLake.latest(s, t).get
    val badRows = rows(SnapshotLake.readAt(s, t, bad))
    val r = SnapshotLake.rollback(s, t, good)
    assert(r.contains(bad + 1))
    assert(rows(s.read.format("graftlake").load(t)) ==
      rows(SnapshotLake.readAt(s, t, good)))
    assert(s.read.format("graftlake").load(t).count() == 10)
    // the bad head is still inspectable, byte-stable
    assert(rows(SnapshotLake.readAt(s, t, bad)) == badRows)
    assert(SnapshotLake.snapshots(s, t) == Seq(good, bad, bad + 1))
    // a post-rollback append stacks on the RESTORED state
    SnapshotLake.commit(frame(3, 500), t)
    assert(s.read.format("graftlake").load(t).count() == 13)
    assert(s.read.format("graftlake").load(t)
      .filter(col("k") >= 100L && col("k") < 500L).isEmpty)
  }

  test("no-op, unknown and expired targets; lost race commits nothing") {
    val t = tmpDir("rb-edge")
    SnapshotLake.commit(frame(5), t)
    val head = SnapshotLake.latest(s, t).get
    // rollback to the current head: recorded no-op
    assert(SnapshotLake.rollback(s, t, head).contains(head))
    assert(SnapshotLake.latest(s, t).contains(head))
    // unknown snapshot refuses
    intercept[IllegalArgumentException](
      SnapshotLake.rollback(s, t, 999L))
    // expired snapshot refuses
    SnapshotLake.commit(frame(5, 50), t)
    SnapshotLake.commit(frame(5, 60), t)
    SnapshotLake.expire(s, t, keepLast = 2)
    intercept[IllegalArgumentException](
      SnapshotLake.rollback(s, t, head))
    // a stale base (concurrent commit landed) loses the CAS: None,
    // state untouched
    val cur = SnapshotLake.latest(s, t).get
    assert(SnapshotLake.rollbackFrom(s, t, cur - 1, cur).isEmpty)
    assert(SnapshotLake.latest(s, t).contains(cur))
  }

  test("bucketed table: rollback past a mutation restores the layout " +
       "line, per-file routing and the exchange-free self-join") {
    import s.implicits._
    val t = tmpDir("rb-bkt")
    SnapshotLake.commitBucketed(frame(200), t, Seq("k"), 4)
    val good = SnapshotLake.latest(s, t).get
    assert(SnapshotLake.delete(s, t, col("k") <= 50L).isDefined)
    assert(s.read.format("graftlake").load(t).count() == 150)
    assert(SnapshotLake.rollback(s, t, good).isDefined)
    val head = SnapshotLake.latest(s, t).get
    assert(SnapshotLake.manifestBucket(s, t, head)
      .contains((4, Seq("k"), Seq())),
      "rollback must restore the #bucket line with the dirs")
    assert(s.read.format("graftlake").load(t).count() == 200)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.sql(
        s"SELECT a.k FROM graftlake.`$t` a JOIN graftlake.`$t` b " +
        "ON a.k = b.k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange hash"),
        s"post-rollback bucketed self-join must stay co-located:\n$plan")
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("evolution directives restore with the target; CALL rollback ≡ " +
       "the object API") {
    val t = tmpDir("rb-ev")
    SnapshotLake.commit(frame(5), t)
    val pre = SnapshotLake.latest(s, t).get
    SnapshotLake.addColumn(s, t, "extra", "INT")
    assert(s.read.format("graftlake").load(t).columns.contains("extra"))
    // SQL procedure does the restore
    val out = s.sql(
      s"CALL graftlake.system.rollback('$t', $pre)").collect()(0)
    assert(out.getLong(0) == SnapshotLake.latest(s, t).get)
    assert(out.getLong(1) == pre)
    assert(!s.read.format("graftlake").load(t).columns.contains("extra"),
      "rollback before the ALTER must drop the directive")
    // the evolved snapshot remains time-travelable with the column
    assert(SnapshotLake.readAt(s, t, pre + 1).columns.contains("extra"))
  }
}
