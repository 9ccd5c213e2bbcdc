package graft

import graft.sources.LakeSink
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
