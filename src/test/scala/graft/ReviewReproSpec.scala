package graft

import graft.sources.SnapshotLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReviewReproSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("repro: rename -> SQL UPDATE -> rename -> scan") {
    import s.implicits._
    val t = tmpDir("repro-fid")
    SnapshotLake.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "x"), t)
    SnapshotLake.renameColumn(s, t, "x", "y")
    // row-level rewrite through the catalog (full replace, drops directives)
    s.sql(s"UPDATE graftlake.`$t` SET y = concat(y, '!') WHERE k = 1")
    println("AFTER UPDATE: " +
      SnapshotLake.readLatest(s, t).collect().toSeq)
    SnapshotLake.renameColumn(s, t, "y", "z")
    val viaCatalog = s.sql(s"SELECT k, z FROM graftlake.`$t`").collect().toSeq
    val viaReadAt = SnapshotLake.readLatest(s, t).collect().toSeq
    println("CATALOG SCAN: " + viaCatalog)
    println("READAT      : " + viaReadAt)
    assert(viaCatalog.map(_.toSeq).toSet == viaReadAt.map(_.toSeq).toSet,
      "catalog scan diverged from readAt after rename->UPDATE->rename")
  }

  test("repro: rename -> INSERT OVERWRITE -> rename -> scan") {
    import s.implicits._
    val t = tmpDir("repro-fid2")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "x"), t)
    SnapshotLake.renameColumn(s, t, "x", "y")
    s.sql(s"INSERT OVERWRITE graftlake.`$t` VALUES (9L, 'z9')")
    SnapshotLake.renameColumn(s, t, "y", "z")
    val viaCatalog = s.sql(s"SELECT k, z FROM graftlake.`$t`").collect().toSeq
    val viaReadAt = SnapshotLake.readLatest(s, t).collect().toSeq
    println("CATALOG SCAN: " + viaCatalog)
    println("READAT      : " + viaReadAt)
    assert(viaCatalog.map(_.toSeq).toSet == viaReadAt.map(_.toSeq).toSet,
      "catalog scan diverged from readAt after rename->OVERWRITE->rename")
  }

  test("repro: swapped renames vs stats pruning") {
    import s.implicits._
    val t = tmpDir("repro-swap")
    // a in [0,10], b in [100,200]
    SnapshotLake.commit(Seq((0L, 100L), (10L, 200L)).toDF("a", "b"), t)
    SnapshotLake.renameColumn(s, t, "a", "tmp")
    SnapshotLake.renameColumn(s, t, "b", "a")
    SnapshotLake.renameColumn(s, t, "tmp", "b")
    // logical a (old b) has values 100..200 -> a > 50 matches both rows
    val bare = s.read.format("graftlake")
      .option("statsPruning", "false").load(t).collect().toSeq
    println("BARE    : " + bare)
    println("READAT  : " + SnapshotLake.readLatest(s, t).collect().toSeq)
    val pruned = s.read.format("graftlake").load(t)
      .filter(col("a") > 50L).collect().toSeq
    val unpruned = s.read.format("graftlake")
      .option("statsPruning", "false").load(t)
      .filter(col("a") > 50L).collect().toSeq
    println("PRUNED  : " + pruned)
    println("UNPRUNED: " + unpruned)
    assert(unpruned.size == 2,
      s"native scan with pushed filter lost rows under swapped renames: $unpruned")
    assert(pruned.map(_.toSeq).toSet == unpruned.map(_.toSeq).toSet,
      "stats pruning dropped rows under swapped renames")
  }
}
