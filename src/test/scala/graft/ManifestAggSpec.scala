package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only aggregates (r19): COUNT(*) / COUNT(col) / MIN / MAX
  * over a graftlake catalog table answer from the manifest `#stats`
  * lines with ZERO file I/O — the plan is a LocalTableScan, no
  * BatchScan at all. Pins:
  *  1. values ≡ the real aggregate over the data, per function/type;
  *  2. THE zero-I/O claim: the answer survives physical deletion of
  *     every data file (only the manifest remains readable);
  *  3. conservativeness: filters, GROUP BY, DISTINCT, float/string
  *     MIN/MAX, schema-evolved tables, stats-less dirs all fall back to
  *     the scanning plan with identical values — never a wrong answer
  *     from metadata.
  */
class ManifestAggSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def isLocal(df: DataFrame): Boolean = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  private def frame(n: Int): DataFrame = {
    import s.implicits._
    (1 to n).map(i => (i.toLong, i % 7, s"v$i",
      BigDecimal(i).setScale(2) * 3, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i % 300)),
      if (i % 5 == 0) null else java.lang.Double.valueOf(i * 1.5)))
      .toDF("k", "m", "v", "amt", "d", "x")
  }

  test("count(*)/count(col)/min/max answer from the manifest as a " +
       "LocalTableScan with values exactly equal to the data's") {
    val t = tmpDir("magg")
    val df = frame(400)
    SnapshotLake.commit(df, t)
    SnapshotLake.commit(frame(100), t) // second dir — stats must fold
    val q = s.sql(
      s"SELECT count(*) AS c, count(x) AS cx, min(k) AS mnk, " +
      s"max(k) AS mxk, min(amt) AS mna, max(amt) AS mxa, " +
      s"min(d) AS mnd, max(d) AS mxd, min(m) AS mnm, max(m) AS mxm " +
      s"FROM graftlake.`$t`")
    assert(isLocal(q), s"metadata agg must plan LocalTableScan:\n" +
      q.queryExecution.executedPlan)
    val expected = df.unionAll(frame(100)).agg(
      count(lit(1)), count(col("x")), min("k"), max("k"), min("amt"),
      max("amt"), min("d"), max("d"), min("m"), max("m")).collect()(0)
    assert(q.collect()(0).toSeq == expected.toSeq)
  }

  test("the answer is zero-I/O: it survives physical deletion of a " +
       "whole dir's data files (table schema still infers off dir 1)") {
    val t = tmpDir("magg-noio")
    SnapshotLake.commit(frame(100), t)
    val dir1 = SnapshotLake.manifestDirs(s, t,
      SnapshotLake.latest(s, t).get).head
    SnapshotLake.commit(frame(150), t)
    // physically remove every data file of the SECOND dir; a correct
    // metadata answer must still count its 150 rows — impossible to get
    // from the surviving data, so this PROVES the files were never read
    SnapshotLake.manifestDirs(s, t, SnapshotLake.latest(s, t).get)
      .filterNot(_ == dir1).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d))
          .filter(p => p.toString.endsWith(".parquet"))
          .forEach(p => java.nio.file.Files.delete(p))
      }
    val q = s.sql(s"SELECT count(*) AS c, min(k) AS mn, max(k) AS mx " +
      s"FROM graftlake.`$t`")
    assert(isLocal(q))
    assert(q.collect()(0).toSeq == Seq(250L, 1L, 150L))
  }

  test("conservative fallbacks: filters, GROUP BY, DISTINCT, " +
       "float/string MIN, evolved tables and stats-less dirs all scan " +
       "— with correct values") {
    import s.implicits._
    val t = tmpDir("magg-fb")
    SnapshotLake.commit(frame(300), t)
    // WHERE → scans (and the manifest path must not fire)
    val w = s.sql(s"SELECT count(*) AS c FROM graftlake.`$t` WHERE k <= 10")
    assert(!isLocal(w)); assert(w.collect()(0).getLong(0) == 10L)
    // GROUP BY → scans
    val g = s.sql(s"SELECT m, count(*) AS c FROM graftlake.`$t` GROUP BY m")
    assert(!isLocal(g)); assert(g.collect().map(_.getLong(1)).sum == 300L)
    // DISTINCT count → scans
    val dct = s.sql(s"SELECT count(DISTINCT m) AS c FROM graftlake.`$t`")
    assert(!isLocal(dct)); assert(dct.collect()(0).getLong(0) == 7L)
    // float/double and string MIN/MAX → scans (inexact endpoints)
    val fx = s.sql(s"SELECT min(x) AS mn FROM graftlake.`$t`")
    assert(!isLocal(fx)); assert(fx.collect()(0).getDouble(0) == 1.5)
    val sx = s.sql(s"SELECT max(v) AS mx FROM graftlake.`$t`")
    assert(!isLocal(sx)); assert(sx.collect()(0).getString(0) == "v99")
    // count(*) together with an unanswerable min → the WHOLE statement
    // scans (never a half-metadata row)
    val mixed = s.sql(
      s"SELECT count(*) AS c, min(v) AS mn FROM graftlake.`$t`")
    assert(!isLocal(mixed))
    assert(mixed.collect()(0).toSeq == Seq(300L, "v1"))
    // schema evolution disables the path until compact
    val te = tmpDir("magg-ev")
    SnapshotLake.commit(frame(50), te)
    SnapshotLake.addColumn(s, te, "extra", "INT")
    val ev = s.sql(s"SELECT count(*) AS c FROM graftlake.`$te`")
    assert(!isLocal(ev)); assert(ev.collect()(0).getLong(0) == 50L)
    // a dir with NO eligible stats column (arrays only) bails
    val ta = tmpDir("magg-arr")
    SnapshotLake.commit(
      Seq(Tuple1(Seq(1, 2)), Tuple1(Seq(3))).toDF("arr"), ta)
    val ar = s.sql(s"SELECT count(*) AS c FROM graftlake.`$ta`")
    assert(!isLocal(ar)); assert(ar.collect()(0).getLong(0) == 2L)
  }

  test("NULL semantics: all-null column answers NULL min/max from " +
       "metadata; count(col) subtracts nulls; NaN bans the column") {
    import s.implicits._
    val t = tmpDir("magg-null")
    SnapshotLake.commit(
      Seq((1L, null: java.lang.Long, 1.0),
          (2L, null: java.lang.Long, Double.NaN),
          (3L, null: java.lang.Long, 3.0)).toDF("k", "e", "x"), t)
    val q = s.sql(s"SELECT count(e) AS ce, min(e) AS mne, " +
      s"count(*) AS c FROM graftlake.`$t`")
    assert(isLocal(q))
    assert(q.collect()(0).toSeq == Seq(0L, null, 3L))
    // the NaN-carrying double column is banned per dir → count(x)
    // cannot answer from metadata, falls back with the right value
    val cx = s.sql(s"SELECT count(x) AS cx FROM graftlake.`$t`")
    assert(!isLocal(cx)); assert(cx.collect()(0).getLong(0) == 3L)
  }

  test("time travel answers from the PINNED snapshot's manifest") {
    val t = tmpDir("magg-tt")
    SnapshotLake.commit(frame(100), t)
    val pre = SnapshotLake.latest(s, t).get
    SnapshotLake.commit(frame(50), t)
    val q = s.sql(
      s"SELECT count(*) AS c FROM graftlake.`$t` VERSION AS OF $pre")
    assert(isLocal(q)); assert(q.collect()(0).getLong(0) == 100L)
    val now = s.sql(s"SELECT count(*) AS c FROM graftlake.`$t`")
    assert(isLocal(now)); assert(now.collect()(0).getLong(0) == 150L)
  }

  test("bucketed tables answer too (layout orthogonal to metadata aggs)") {
    val t = tmpDir("magg-bkt")
    SnapshotLake.commitBucketed(frame(200), t, Seq("k"), 4)
    val q = s.sql(s"SELECT count(*) AS c, max(k) AS mx " +
      s"FROM graftlake.`$t`")
    assert(isLocal(q))
    assert(q.collect()(0).toSeq == Seq(200L, 200L))
  }
}
