package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized end-to-end sweep for metadata-only aggregates (r19):
  * random frames (negative longs/decimals, nulls, occasional NaN,
  * strings, dates) across 1–3 commits, then the full
  * count/min/max SQL against the catalog table. THE invariant: the
  * answer equals the data's aggregate whether or not the manifest
  * path fired. Trials with NaN-free doubles must answer from metadata
  * (LocalTableScan) — the sweep fails if the fast path silently stops
  * firing. Seeded: failures reproduce. */
class ManifestAggProps extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("12-trial randomized commit sweep: metadata answers ≡ data " +
       "aggregates; NaN-free trials answer as LocalTableScan") {
    import s.implicits._
    val rnd = new scala.util.Random(20260817L)
    var localTrials = 0
    for (trial <- 1 to 12) {
      val t = tmpDir(s"maggp$trial")
      val nCommits = 1 + rnd.nextInt(3)
      val withNaN = rnd.nextInt(4) == 0
      for (_ <- 1 to nCommits) {
        val n = 1 + rnd.nextInt(80)
        val rows = (1 to n).map { _ =>
          val k = rnd.nextLong() % 100000L
          val amt = BigDecimal(rnd.nextInt(2000001) - 1000000, 2)
          val d = java.sql.Date.valueOf(java.time.LocalDate
            .of(2020, 1, 1).plusDays(rnd.nextInt(3000)))
          val v = if (rnd.nextInt(5) == 0) null
            else rnd.alphanumeric.take(1 + rnd.nextInt(25)).mkString
          val x: java.lang.Double =
            if (rnd.nextInt(6) == 0) null
            else if (withNaN && rnd.nextInt(10) == 0) Double.NaN
            else rnd.nextDouble() * 200 - 100
          (k, amt, d, v, x)
        }
        SnapshotLake.commit(
          rows.toDF("k", "amt", "d", "v", "x"), t)
      }
      val q = s.sql(
        s"SELECT count(*) AS c, count(v) AS cv, count(x) AS cx, " +
        s"min(k) AS mnk, max(k) AS mxk, min(amt) AS mna, " +
        s"max(amt) AS mxa, min(d) AS mnd, max(d) AS mxd " +
        s"FROM graftlake.`$t`")
      val got = q.collect()(0)
      val plan = q.queryExecution.executedPlan.toString
      val local = plan.contains("LocalTableScan") &&
        !plan.contains("BatchScan")
      if (local) localTrials += 1
      val exp = s.read.format("graftlake").load(t).agg(
        count(lit(1)), count(col("v")), count(col("x")), min("k"),
        max("k"), min("amt"), max("amt"), min("d"), max("d"))
        .collect()(0)
      assert(got.toSeq == exp.toSeq,
        s"trial $trial (nCommits=$nCommits, nan=$withNaN, " +
        s"local=$local): ${got.toSeq} != ${exp.toSeq}")
      if (!withNaN)
        assert(local,
          s"trial $trial: NaN-free table must answer from metadata:\n" +
          plan.take(1200))
    }
    assert(localTrials >= 6, s"fast path fired in only $localTrials/12")
  }
}
