package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins on the V2 catalog (r19, VERDICT r18 item 1):
  * a bucket-laid-out graftlake table's SQL scan reports
  * `KeyGroupedPartitioning(bucket(n, cols), n)` and the catalog serves
  * the `bucket` function, so `graftlake.a JOIN graftlake.b` on the
  * bucket columns plans with ZERO shuffle exchanges — the co-located
  * join the V1 provider's BucketSpec already gives the object API, now
  * on the SQL path. Pins:
  *  1. values: the SPJ join ≡ the unbucketed twin's join, row for row;
  *  2. THE plan claim: zero exchanges bucketed, >0 unbucketed;
  *  3. compatibility edges: different bucket counts shuffle (no wrong
  *     co-location), joins off the bucket column shuffle;
  *  4. the report survives the SQL INSERT INTO path (write-side routing
  *     and scan-side grouping agree end-to-end).
  */
class SpjSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    "Exchange (hash|range|single)".r.findAllIn(plan).length
  }

  private def frame(nRows: Int, tag: String): DataFrame = {
    import s.implicits._
    (1 to nRows).map(i => (i.toLong, s"$tag$i", i * 2.0))
      .toDF("k", "v", "x")
  }

  private def withNoBroadcast[T](body: => T): T = {
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SQL join of two same-layout bucketed tables plans exchange-free; " +
       "unbucketed twin pays the shuffles; values identical") {
    val a = tmpDir("spj-a"); val b = tmpDir("spj-b")
    val ua = tmpDir("spj-ua"); val ub = tmpDir("spj-ub")
    SnapshotLake.commitBucketed(frame(500, "a"), a, Seq("k"), 8)
    SnapshotLake.commitBucketed(frame(300, "b"), b, Seq("k"), 8)
    SnapshotLake.commit(frame(500, "a"), ua)
    SnapshotLake.commit(frame(300, "b"), ub)
    withNoBroadcast {
      val spj = s.sql(
        s"SELECT a.k, a.v, b.v AS bv FROM graftlake.`$a` a " +
        s"JOIN graftlake.`$b` b ON a.k = b.k")
      val twin = s.sql(
        s"SELECT a.k, a.v, b.v AS bv FROM graftlake.`$ua` a " +
        s"JOIN graftlake.`$ub` b ON a.k = b.k")
      assert(rows(spj) == rows(twin))
      assert(rows(spj).size == 300)
      assert(shuffles(spj) == 0,
        s"bucketed SQL join should be exchange-free:\n" +
        spj.queryExecution.executedPlan)
      assert(shuffles(twin) > 0)
    }
  }

  test("different bucket counts and off-column joins fall back to the " +
       "exchange plan (correct, never falsely co-located)") {
    val a = tmpDir("spj-n8"); val b = tmpDir("spj-n4")
    SnapshotLake.commitBucketed(frame(200, "a"), a, Seq("k"), 8)
    SnapshotLake.commitBucketed(frame(200, "b"), b, Seq("k"), 4)
    withNoBroadcast {
      val mixed = s.sql(
        s"SELECT a.k FROM graftlake.`$a` a JOIN graftlake.`$b` b " +
        "ON a.k = b.k")
      assert(rows(mixed).size == 200)
      assert(shuffles(mixed) > 0)
      // join off the bucket column: v is not the layout key
      val off = s.sql(
        s"SELECT a.k FROM graftlake.`$a` a JOIN graftlake.`$a` b " +
        "ON a.v = b.v")
      assert(rows(off).size == 200)
      assert(shuffles(off) > 0)
    }
  }

  test("SQL CREATE TABLE CLUSTERED BY + INSERT INTO lands the layout; " +
       "the join over two SQL-built tables is exchange-free") {
    val a = tmpDir("spj-sqla"); val b = tmpDir("spj-sqlb")
    s.sql(s"CREATE TABLE graftlake.`$a` (k BIGINT, v STRING, x DOUBLE) " +
      "CLUSTERED BY (k) INTO 8 BUCKETS")
    s.sql(s"CREATE TABLE graftlake.`$b` (k BIGINT, v STRING, x DOUBLE) " +
      "CLUSTERED BY (k) INTO 8 BUCKETS")
    frame(400, "a").createOrReplaceTempView("spj_src_a")
    frame(250, "b").createOrReplaceTempView("spj_src_b")
    s.sql(s"INSERT INTO graftlake.`$a` SELECT * FROM spj_src_a")
    s.sql(s"INSERT INTO graftlake.`$b` SELECT * FROM spj_src_b")
    withNoBroadcast {
      val j = s.sql(
        s"SELECT a.k, a.v, b.v AS bv FROM graftlake.`$a` a " +
        s"JOIN graftlake.`$b` b ON a.k = b.k")
      assert(rows(j).size == 250)
      assert(shuffles(j) == 0,
        s"SQL-built bucketed join should be exchange-free:\n" +
        j.queryExecution.executedPlan)
    }
  }

  test("SPJ groupBy on the bucket column aggregates without a shuffle " +
       "when partially-clustered handling allows; values exact") {
    val a = tmpDir("spj-agg")
    SnapshotLake.commitBucketed(frame(400, "a"), a, Seq("k"), 8)
    val g = s.sql(
      s"SELECT k, count(*) AS c FROM graftlake.`$a` GROUP BY k")
    // aggregation over a key-grouped scan: values are the contract (the
    // exchange-free agg needs the join-key machinery; pin correctness)
    assert(rows(g).size == 400)
    assert(g.collect().forall(_.getLong(1) == 1L))
  }
}
