package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (join-derived) directory pruning (r19): a star-schema join's
  * dim-side key set arrives at the graftlake fact scan as a DPP `IN`
  * predicate, and directories whose manifest-stats envelope excludes
  * every key are dropped BEFORE any file I/O — dynamic partition
  * pruning without a partition column. Pins:
  *  1. the DPP subquery is injected (plan carries `dynamicpruning`) and
  *     the scan records exactly the out-of-range dirs as pruned;
  *  2. values ≡ the same join with runtime filtering disabled;
  *  3. a key set touching every dir prunes nothing (conservative);
  *  4. the bucketed fact variant prunes too, with bucket alignment
  *     (partition count) preserved.
  */
class RuntimePruneSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Every node of the EXECUTED adaptive plan, stages unwrapped. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def prunedOf(df: DataFrame): Set[String] =
    allNodes(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }.collect {
      case r: graft.sources.RuntimeDirPruning => r.runtimePrunedDirs
    }.flatten.toSet

  /** Three commits with DISJOINT key ranges → three dirs with disjoint
    * stats envelopes. Returns dirs (manifest order is NOT commit
    * order). */
  private def threeDirFact(t: String, bucketed: Boolean): Seq[String] = {
    import s.implicits._
    (0 until 3).foreach { d =>
      val df = (d * 1000 + 1 to d * 1000 + 500)
        .map(i => (i.toLong, s"f$i", i * 2.0)).toDF("k", "v", "x")
      if (bucketed) SnapshotLake.commitBucketed(df, t, Seq("k"), 4)
      else SnapshotLake.commit(df, t)
    }
    SnapshotLake.manifestDirs(s, t, SnapshotLake.latest(s, t).get)
  }

  /** The dirs whose PHYSICAL key range excludes every given key — the
    * set a correct stats-pruner must drop, derived from the data
    * itself. */
  private def outOfRangeDirs(dirs: Seq[String], keys: Set[Long])
      : Set[String] =
    dirs.filter { d =>
      val mm = s.read.parquet(d)
        .agg(org.apache.spark.sql.functions.min("k"),
          org.apache.spark.sql.functions.max("k")).collect()(0)
      keys.forall(k => k < mm.getLong(0) || k > mm.getLong(1))
    }.toSet

  test("a dim filtered to dir 1's key range prunes dirs 2 and 3 at " +
       "runtime; values ≡ the unpruned twin; full-range keys prune " +
       "nothing") {
    import s.implicits._
    val t = tmpDir("rtp-fact")
    val dirs = threeDirFact(t, bucketed = false)
    val dim = tmpDir("rtp-dim")
    SnapshotLake.commit(
      Seq((10L, "a"), (20L, "b"), (2010L, "c"), (1L, "z"))
        .toDF("k", "tag"), dim)
    val sql =
      s"SELECT f.k, f.v, d.tag FROM graftlake.`$t` f " +
      s"JOIN graftlake.`$dim` d ON f.k = d.k AND d.tag <= 'b'"
    val q = s.sql(sql)
    val got = rows(q)
    assert(got == Set(Seq[Any](10L, "f10", "a"), Seq[Any](20L, "f20", "b"),
      Seq[Any](1L, "f1", "z")).filter(_(2).asInstanceOf[String] <= "b"))
    assert(q.queryExecution.executedPlan.toString
        .contains("dynamicpruning"),
      s"DPP subquery must be injected:\n${q.queryExecution.executedPlan}")
    // keys 1/10/20 live in one dir's [1,500] envelope → other 2 pruned
    val expectedPruned = outOfRangeDirs(dirs, Set(1L, 10L, 20L))
    assert(expectedPruned.size == 2)
    assert(prunedOf(q) == expectedPruned,
      s"expected $expectedPruned pruned, got ${prunedOf(q)}")
    // equality twin with runtime filtering off
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")
    try assert(rows(s.sql(sql)) == got)
    finally s.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // a dim spanning every dir prunes nothing — and loses no rows
    val wide = s.sql(
      s"SELECT f.k FROM graftlake.`$t` f JOIN graftlake.`$dim` d " +
      "ON f.k = d.k")
    assert(rows(wide).map(_.head) == Set(1L, 10L, 20L, 2010L))
    assert(prunedOf(wide).isEmpty)
  }

  test("string and decimal join keys prune through their stats kinds " +
       "(truncate(16) string envelopes, exact decimal endpoints) — " +
       "conservative, values exact") {
    import s.implicits._
    // string-keyed fact: three dirs with disjoint name prefixes
    val t = tmpDir("rtp-str")
    for (p <- Seq("alpha", "mid", "zulu"))
      SnapshotLake.commit((1 to 300).map(i => (s"$p$i", i))
        .toDF("name", "n"), t)
    val dims = tmpDir("rtp-str-dim")
    SnapshotLake.commit(Seq(("alpha7", "y"), ("alpha20", "y"),
      ("nomatch", "n")).toDF("name", "tag"), dims)
    val q = s.sql(s"SELECT f.name, f.n FROM graftlake.`$t` f " +
      s"JOIN graftlake.`$dims` d ON f.name = d.name AND d.tag = 'y'")
    assert(rows(q) == Set(Seq[Any]("alpha7", 7), Seq[Any]("alpha20", 20)))
    assert(prunedOf(q).size == 2,
      s"mid*/zulu* dirs must prune on string envelopes, got " +
      s"${prunedOf(q)}")
    // decimal-keyed fact (r19 decimal stats): disjoint money ranges
    val td = tmpDir("rtp-dec")
    for (base <- Seq(0, 10000, 20000))
      SnapshotLake.commit((1 to 300).map(i =>
        (BigDecimal(base + i, 2), i)).toDF("amt", "n"), td)
    val dimd = tmpDir("rtp-dec-dim")
    SnapshotLake.commit(Seq((BigDecimal(10042, 2), "y"),
      (BigDecimal(10099, 2), "y"), (BigDecimal(99999999, 2), "n"))
      .toDF("amt", "tag"), dimd)
    val qd = s.sql(s"SELECT f.n FROM graftlake.`$td` f " +
      s"JOIN graftlake.`$dimd` d ON f.amt = d.amt AND d.tag = 'y'")
    assert(rows(qd).map(_.head) == Set(42, 99))
    assert(prunedOf(qd).size == 2,
      s"out-of-range decimal dirs must prune, got ${prunedOf(qd)}")
  }

  test("bucketed fact: runtime pruning composes with the bucket layout " +
       "— dirs drop, every bucket partition survives (alignment), " +
       "values exact") {
    import s.implicits._
    val t = tmpDir("rtp-bfact")
    val dirs = threeDirFact(t, bucketed = true)
    val dim = tmpDir("rtp-bdim")
    SnapshotLake.commit(
      Seq((1010L, "a"), (1020L, "b"), (2020L, "x")).toDF("k", "tag"), dim)
    // DPP wants a SELECTIVE dim-side predicate to justify the subquery
    val q = s.sql(
      s"SELECT f.k, d.tag FROM graftlake.`$t` f " +
      s"JOIN graftlake.`$dim` d ON f.k = d.k AND d.tag <= 'b'")
    assert(rows(q) == Set(Seq[Any](1010L, "a"), Seq[Any](1020L, "b")))
    // keys 1010/1020 live in one dir's [1001,1500] envelope
    val expectedPruned = outOfRangeDirs(dirs, Set(1010L, 1020L))
    assert(expectedPruned.size == 2)
    assert(prunedOf(q) == expectedPruned,
      s"expected $expectedPruned pruned, got ${prunedOf(q)}")
  }
}
