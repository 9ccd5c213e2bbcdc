package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata tables (r19): `graftlake.`/t`.snapshots/.files/.tags/.stats`
  * — manifest-computed views planned as LocalTableScan (zero data I/O),
  * ordinary DataFrames (filterable, joinable). Pins each view's content
  * against the object API, the zero-scan plan, and resolution
  * precedence (a real table wins over a view suffix). */
class MetaTablesSpec extends AnyFunSuite {
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

  private def isLocal(df: DataFrame): Boolean = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  test("snapshots view: one row per commit, is_current marks the " +
       "pinned head, tags array reflects named refs; LocalTableScan") {
    val t = tmpDir("mt-snap")
    SnapshotLake.commit(frame(10), t)
    SnapshotLake.commit(frame(5, 100), t)
    val head = SnapshotLake.latest(s, t).get
    SnapshotLake.tag(s, t, "rel", head)
    val q = s.sql(s"SELECT * FROM graftlake.`$t`.snapshots ORDER BY " +
      "snapshot_id")
    assert(isLocal(q))
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      SnapshotLake.snapshots(s, t).sorted)
    assert(rows.count(_.getBoolean(4)) == 1)
    assert(rows.find(_.getBoolean(4)).get.getLong(0) == head)
    assert(rows.find(_.getLong(0) == head).get.getSeq[String](5) ==
      Seq("rel"))
    // n_dirs grows with the append
    assert(rows.last.getInt(2) == rows.head.getInt(2) + 1)
  }

  test("files view: every live data file with size and bucket tag " +
       "(null for plain tables); content matches the filesystem") {
    val t = tmpDir("mt-files")
    SnapshotLake.commitBucketed(frame(100), t, Seq("k"), 4)
    val q = s.sql(s"SELECT * FROM graftlake.`$t`.files")
    assert(isLocal(q))
    val rows = q.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0L))
    assert(rows.forall(!_.isNullAt(3)), "bucketed files carry bucket_id")
    assert(rows.map(_.getInt(3)).toSet.subsetOf((0 until 4).toSet))
    val fsFiles = SnapshotLake.manifestDirs(s, t,
      SnapshotLake.latest(s, t).get).flatMap(d =>
        new java.io.File(d).listFiles().toSeq
          .filter(f => f.isFile && !f.getName.startsWith("_")
            && !f.getName.startsWith(".")).map(_.getName)).toSet
    assert(rows.map(_.getString(1)).toSet == fsFiles)
    // plain table: bucket_id is NULL
    val p = tmpDir("mt-files-p")
    SnapshotLake.commit(frame(10), p)
    assert(s.sql(s"SELECT * FROM graftlake.`$p`.files").collect()
      .forall(_.isNullAt(3)))
  }

  test("tags view tracks tag/dropTag; stats view serves per-dir column " +
       "stats as a queryable frame") {
    val t = tmpDir("mt-tags")
    SnapshotLake.commit(frame(50), t)
    val id = SnapshotLake.latest(s, t).get
    SnapshotLake.tag(s, t, "a", id)
    SnapshotLake.tag(s, t, "b", id)
    val tags = s.sql(s"SELECT * FROM graftlake.`$t`.tags")
    assert(isLocal(tags))
    assert(tags.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", id), ("b", id)))
    SnapshotLake.dropTag(s, t, "a")
    assert(s.sql(s"SELECT * FROM graftlake.`$t`.tags").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
    // stats: the k column's envelope is the committed range, queryable
    val st = s.sql(s"SELECT * FROM graftlake.`$t`.stats " +
      "WHERE column = 'k'")
    assert(isLocal(st))
    val r = st.collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 50L && r(0).getLong(3) == 0L)
    assert(r(0).getString(4) == "1" && r(0).getString(5) == "50")
  }

  test("branches view lists live forks with fork point, head and root") {
    val t = tmpDir("mt-br")
    SnapshotLake.commit(frame(20), t)
    val fork = SnapshotLake.branch(s, t, "wip")
    SnapshotLake.commit(frame(5, 100), SnapshotLake.branchRoot(t, "wip"))
    val q = s.sql(s"SELECT * FROM graftlake.`$t`.branches")
    assert(isLocal(q))
    val r = q.collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "wip")
    assert(r(0).getLong(1) == fork)
    assert(r(0).getLong(2) == 2L)
    assert(r(0).getString(3) == SnapshotLake.branchRoot(t, "wip"))
    SnapshotLake.dropBranch(s, t, "wip")
    assert(s.sql(s"SELECT * FROM graftlake.`$t`.branches").collect()
      .isEmpty)
  }

  test("resolution: a REAL table whose path ends in a view name wins; " +
       "unknown suffixes and viewless parents stay NoSuchTable") {
    val parent = tmpDir("mt-prec")
    SnapshotLake.commit(frame(5), parent)
    // tableExists must NOT see the view (r19 review finding), so SQL
    // can CREATE a genuine table at the view path — which then shadows
    s.sql(s"CREATE TABLE graftlake.`$parent/files` (z BIGINT)")
    assert(s.sql(s"SELECT * FROM graftlake.`$parent`.files").columns
      .toSeq == Seq("z"),
      "a CREATEd table at a view path must win resolution")
    s.sql(s"DROP TABLE graftlake.`$parent/files`")
    // a genuine table AT <parent>/snapshots shadows the view
    SnapshotLake.commit(frame(3, 500), s"$parent/snapshots")
    val q = s.sql(s"SELECT k FROM graftlake.`$parent`.snapshots")
    assert(q.collect().map(_.getLong(0)).toSet == Set(500L, 501L, 502L))
    intercept[Exception] {
      s.sql(s"SELECT * FROM graftlake.`$parent`.bogusview").collect()
    }
    val empty = tmpDir("mt-none")
    intercept[Exception] {
      s.sql(s"SELECT * FROM graftlake.`$empty`.snapshots").collect()
    }
  }
}
