package graft

import graft.sources.{SnapshotLake, StatsPrune}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-recorded per-dir column stats + planning-time pruning (r17,
  * VERDICT r16 item 2). Pins:
  *  1. commits record footer-derived stats; carried-over dirs inherit
  *     their lines byte-for-byte (no footer re-reads);
  *  2. a point probe on a range-laid-out table READS strictly fewer
  *     files with stats than with statsPruning=false — and identical
  *     rows (the acceptance criterion);
  *  3. the pruning is conservative: a predicate sweep (ranges, nulls,
  *     IN, OR, flipped literal sides) returns identical results with
  *     and without stats;
  *  4. legacy manifests (no stats lines) read fine with no pruning, and
  *     the first post-upgrade commit retrofits stats;
  *  5. the V2 catalog scan prunes through the same seam. */
class GraftLakeStatsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Files the executed V1 scan actually read. */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.getOrElse(fail("no FileSourceScanExec in plan"))
  }

  /** Two-dir table with disjoint k ranges: dir1 k∈[1,100] (v null on
    * evens), dir2 k∈[201,300] (v never null, extra all-null column w). */
  private def seedRanged(t: String): Unit = {
    import s.implicits._
    SnapshotLake.commit((1L to 100L).map(k =>
      (k, if (k % 2 == 0) null else s"v$k", java.lang.Double.valueOf(k * 0.5)))
      .toDF("k", "v", "score"), t)
    SnapshotLake.commit((201L to 300L).map(k =>
      (k, s"v$k", null: java.lang.Double))
      .toDF("k", "v", "score"), t, append = true)
  }

  test("commits record stats; carried-over dirs inherit lines byte-for-byte") {
    val t = tmpDir("stats-rec")
    seedRanged(t)
    val lines1 = SnapshotLake.manifestStats(s, t, 1L)
    val lines2 = SnapshotLake.manifestStats(s, t, 2L)
    // snapshot 1's dir has k/score stats; strings record as `str` lines
    // with base64 truncate(16) bounds (r18)
    assert(lines1.exists(_.contains("\tk\t")), s"no k stats in $lines1")
    val vLine = lines1.find(_.contains("\tv\tstr\t")).getOrElse(
      fail(s"string stats must record (r18): $lines1")).split("\t", -1)
    assert(vLine.length == 8 && vLine(4) == "100" && vLine(5) == "50",
      s"v stats wrong: ${vLine.toSeq}")
    val vMin = new String(java.util.Base64.getDecoder.decode(vLine(6)),
      "UTF-8")
    val vMax = new String(java.util.Base64.getDecoder.decode(vLine(7)),
      "UTF-8")
    // dir1 strings are v1..v99 (odd only): byte-order min "v1", max "v99"
    assert(vMin == "v1" && vMax == "v99", s"v bounds: $vMin / $vMax")
    val kLine = lines1.find(_.contains("\tk\t")).get.split("\t", -1)
    assert(kLine(3) == "100" && kLine(4) == "0" &&
      kLine(5) == "1" && kLine(6) == "100", s"k stats wrong: ${kLine.toSeq}")
    // dir1's lines carried verbatim into snapshot 2
    assert(lines1.toSet.subsetOf(lines2.toSet),
      "append must inherit the base dir's stat lines")
    // dir2: score is ALL NULL there -> empty min/max, nulls == rows
    val dir2 = SnapshotLake.manifestDirs(s, t, 2L)
      .diff(SnapshotLake.manifestDirs(s, t, 1L)).head
    val score2 = lines2.find(l => l.contains(dir2) && l.contains("\tscore\t"))
      .get.split("\t", -1)
    assert(score2(3) == "100" && score2(4) == "100" &&
      score2(5) == "" && score2(6) == "", s"all-null stats: ${score2.toSeq}")
  }

  test("point probe reads strictly fewer files with stats; rows identical") {
    val t = tmpDir("stats-probe")
    seedRanged(t)
    def read(pruning: Boolean) = s.read.format("graftlake")
      .option("statsPruning", pruning.toString).load(t)
      .filter(col("k") === 250L)
    val without = filesRead(read(false))
    val withStats = filesRead(read(true))
    assert(withStats < without,
      s"stats must prune files: $withStats !< $without")
    assert(rows(read(true)) == rows(read(false)))
    assert(rows(read(true)) ==
      rows(SnapshotLake.readLatest(s, t).filter(col("k") === 250L)))
  }

  test("decimal point/range probes read strictly fewer files; rows " +
       "identical; endpoints exact at fractional boundaries (r19)") {
    import s.implicits._
    val t = tmpDir("stats-dec")
    // two dirs with disjoint DECIMAL(12,2) price ranges — the money-
    // column shape (fractional endpoints would be lossy as doubles at
    // high precision; the manifest records the exact decimal)
    SnapshotLake.commit((1L to 100L).map(k =>
        (k, BigDecimal(k).setScale(2) + BigDecimal("0.25")))
      .toDF("k", "price").select(col("k"),
        col("price").cast("decimal(12,2)").as("price")), t)
    SnapshotLake.commit((201L to 300L).map(k =>
        (k, BigDecimal(k).setScale(2) + BigDecimal("0.75")))
      .toDF("k", "price").select(col("k"),
        col("price").cast("decimal(12,2)").as("price")), t, append = true)
    // the manifest line carries the exact decimal endpoints
    val lines = SnapshotLake.manifestStats(s, t, 2L)
    val pl = lines.filter(_.contains("\tprice\t")).map(_.split("\t", -1))
    assert(pl.exists(p => p(5) == "1.25" && p(6) == "100.25"),
      s"dir1 decimal endpoints: ${pl.map(_.toSeq)}")
    assert(pl.exists(p => p(5) == "201.75" && p(6) == "300.75"),
      s"dir2 decimal endpoints: ${pl.map(_.toSeq)}")
    def read(pruning: Boolean, cond: org.apache.spark.sql.Column) =
      s.read.format("graftlake").option("statsPruning", pruning.toString)
        .load(t).filter(cond)
    // point probe into dir2 only
    val eq = col("price") === lit(BigDecimal("250.75")).cast("decimal(12,2)")
    assert(filesRead(read(true, eq)) < filesRead(read(false, eq)),
      "decimal point probe must prune dir1")
    assert(rows(read(true, eq)) == rows(read(false, eq)))
    // range probe below dir2's min
    val ltc = col("price") < lit(BigDecimal("150.00")).cast("decimal(12,2)")
    assert(filesRead(read(true, ltc)) < filesRead(read(false, ltc)),
      "decimal range probe must prune dir2")
    assert(rows(read(true, ltc)) == rows(read(false, ltc)))
    // fractional boundary is EXACT: <= 100.25 keeps dir1, > 100.25
    // prunes it (a double-rounded bound would get one of these wrong)
    val le = col("price") <= lit(BigDecimal("100.25")).cast("decimal(12,2)")
    assert(rows(read(true, le)).size == 100)
    val gt = col("price") > lit(BigDecimal("100.25")).cast("decimal(12,2)")
    assert(filesRead(read(true, gt)) < filesRead(read(false, gt)))
    assert(rows(read(true, gt)).size == 100)
  }

  test("conservative: a predicate sweep matches the unpruned read exactly") {
    val t = tmpDir("stats-sweep")
    seedRanged(t)
    val preds = Seq(
      col("k") === 50L, col("k") === 150L, // 150 in the gap: both prune
      col("k") > 290L, col("k") >= 100L, col("k") < 5L, col("k") <= 201L,
      lit(100L) >= col("k"), lit(250L) === col("k"),
      col("k").isin(3L, 299L), col("k").isin(150L, 160L),
      col("v").isNull, col("v").isNotNull,
      col("score").isNull, col("score").isNotNull,
      col("score") > 49.9, col("score") <=> 1.0,
      (col("k") < 5L) || (col("k") > 295L),
      (col("k") < 5L) && col("v").isNotNull,
      !(col("k") < 5L),
      // string predicates over the truncated bounds (r18)
      col("v") === "v50", col("v") === "w0", col("v") === "u9",
      col("v") < "v1", col("v") <= "v1", col("v") > "v99", col("v") >= "v99",
      col("v").startsWith("v2"), col("v").startsWith("x"),
      col("v").isin("v3", "v297"), col("v").isin("a", "z"),
      col("v") <=> "v11", lit("v50") === col("v"))
    preds.zipWithIndex.foreach { case (p, i) =>
      val a = rows(s.read.format("graftlake").load(t).filter(p))
      val b = rows(s.read.format("graftlake")
        .option("statsPruning", "false").load(t).filter(p))
      assert(a == b, s"predicate #$i diverged under stats pruning: $p")
    }
  }

  test("legacy manifests read with no pruning; next commit retrofits stats") {
    import s.implicits._
    val t = tmpDir("stats-legacy")
    seedRanged(t)
    // simulate a pre-v3 manifest: strip the #stats lines from latest
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(s"$t/manifests/snap-2.manifest")
    val stripped = scala.io.Source.fromInputStream(fs.open(mp), "UTF-8")
      .getLines().filterNot(_.startsWith("#stats")).mkString("\n") + "\n"
    fs.delete(mp, false)
    val out = fs.create(mp, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    assert(SnapshotLake.manifestStats(s, t, 2L).isEmpty)
    // reads fine, full scan, correct rows
    val df = s.read.format("graftlake").load(t).filter(col("k") === 250L)
    assert(rows(df) == rows(SnapshotLake.readLatest(s, t)
      .filter(col("k") === 250L)))
    // the first post-upgrade commit computes stats for BOTH legacy dirs
    SnapshotLake.commit(Seq((500L, "x", 1.0)).toDF("k", "v", "score"), t,
      append = true)
    val lines3 = SnapshotLake.manifestStats(s, t, 3L)
    val dirs3 = SnapshotLake.manifestDirs(s, t, 3L)
    assert(dirs3.forall(d => lines3.exists(_.contains(s"\t$d\t") ||
        lines3.exists(_.split("\t", -1)(1) == d))),
      "retrofit must cover every dir")
    val probe = s.read.format("graftlake").load(t)
      .filter(col("k") === 250L)
    assert(filesRead(probe) <
      filesRead(s.read.format("graftlake").option("statsPruning", "false")
        .load(t).filter(col("k") === 250L)))
  }

  test("the V2 catalog scan prunes through the same seam") {
    val t = tmpDir("stats-v2")
    seedRanged(t)
    // plan-level: the scan's file listing under the pushed k=250 filter
    // excludes dir1 — read the partitions the executed plan touched
    val df = s.sql(s"SELECT k, v FROM graftlake.`$t` WHERE k = 250")
    assert(rows(df) == rows(SnapshotLake.readLatest(s, t)
      .filter(col("k") === 250L).select("k", "v")))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec"))
    val files = scan.inputRDD.partitions.flatMap {
      case p: org.apache.spark.sql.execution.datasources.v2
          .DataSourceRDDPartition =>
        p.inputPartitions.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString)
          case _ => Seq.empty
        }
    }.distinct
    val dir1 = SnapshotLake.manifestDirs(s, t, 1L).head
    assert(files.nonEmpty && !files.exists(_.contains(dir1)),
      s"dir1 must be pruned from the V2 scan: ${files.toSeq}")
  }

  test("string point probe reads strictly fewer files; rows identical (r18)") {
    import s.implicits._
    val t = tmpDir("stats-str")
    // disjoint id prefixes per dir: a… vs m…
    SnapshotLake.commit((1 to 50).map(i => (f"acct-$i%04d", i))
      .toDF("id", "n"), t)
    SnapshotLake.commit((1 to 50).map(i => (f"merch-$i%04d", i))
      .toDF("id", "n"), t, append = true)
    def read(pruning: Boolean) = s.read.format("graftlake")
      .option("statsPruning", pruning.toString).load(t)
      .filter(col("id") === "merch-0007")
    assert(filesRead(read(true)) < filesRead(read(false)),
      "string stats must prune the acct dir")
    assert(rows(read(true)) == rows(read(false)))
    // prefix probe prunes the same way
    def pre(pruning: Boolean) = s.read.format("graftlake")
      .option("statsPruning", pruning.toString).load(t)
      .filter(col("id").startsWith("acct-00"))
    assert(filesRead(pre(true)) < filesRead(pre(false)))
    assert(rows(pre(true)) == rows(pre(false)))
  }

  test("unicode + long-string bounds stay conservative across truncation (r18)") {
    import s.implicits._
    val t = tmpDir("stats-uni")
    // >16-code-point strings forcing truncation, incl. multi-byte and a
    // supplementary code point (U+1F600) where UTF-8 byte order and Java
    // String order diverge — the prune must still be exact-conservative
    val d1 = Seq("aaaaaaaaaaaaaaaaaa-1", "aaaaaaaaaaaaaaaaaa-2",
      "éclair-éclair-éclair")
    val d2 = Seq("z" + "😀" * 20, "zzzzzzzzzzzzzzzzzzzz",
      "交交交交交交交交交交交交交交交交交交")
    SnapshotLake.commit(d1.toDF("v"), t)
    SnapshotLake.commit(d2.toDF("v"), t, append = true)
    val preds = Seq(
      col("v") === "aaaaaaaaaaaaaaaaaa-2", col("v") === "zzzz",
      col("v") === "交交", col("v") === "😀",
      col("v") < "b", col("v") > "zz", col("v") >= "é",
      col("v").startsWith("aaaaaaaaaaaaaaaa"), // exactly the 16-cp prefix
      col("v").startsWith("z😀"),
      col("v").startsWith("交"))
    preds.zipWithIndex.foreach { case (p, i) =>
      val a = rows(s.read.format("graftlake").load(t).filter(p))
      val b = rows(s.read.format("graftlake")
        .option("statsPruning", "false").load(t).filter(p))
      assert(a == b, s"unicode predicate #$i diverged: $p")
    }
    // and the probe that CAN prune does: nothing below "a…" lives in d2
    assert(filesRead(s.read.format("graftlake").load(t)
        .filter(col("v") < "b")) <
      filesRead(s.read.format("graftlake").option("statsPruning", "false")
        .load(t).filter(col("v") < "b")))
  }

  test("StrBounds unit: truncate(16) lower/upper laws") {
    import graft.sources.StrBounds
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // short strings pass through exact
    assert(StrBounds.lower(u("abc")) == u("abc"))
    assert(StrBounds.upper(u("abc")).contains(u("abc")))
    // long: lower = prefix (≤ original), upper = prefix w/ last cp +1 (>)
    val long = u("abcdefghijklmnopqrstuvwxyz")
    val lo = StrBounds.lower(long)
    val hi = StrBounds.upper(long).get
    assert(lo.numChars == 16 && lo.compareTo(long) <= 0)
    assert(hi.numChars == 16 && hi.compareTo(long) > 0)
    assert(hi == u("abcdefghijklmnoq"))
    // surrogate-gap skip: U+D7FF increments to U+E000, never a surrogate
    val edge = u("a" * 15 + "퟿" + "tail")
    assert(StrBounds.upper(edge).contains(u("a" * 15 + "")))
    // all-U+10FFFF prefix has no finite upper bound
    val maxed = u(new String(Array.fill(17)(0x10FFFF), 0, 17))
    assert(StrBounds.upper(maxed).isEmpty)
    // …but still a usable lower bound
    assert(StrBounds.lower(maxed).compareTo(maxed) <= 0)
  }

  test("DirStrStats unit: one-sided bounds still prune their side") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val attr = AttributeReference("v",
      org.apache.spark.sql.types.StringType)()
    def lt(v: String) = Literal(u(v), org.apache.spark.sql.types.StringType)
    val both = Map[String, graft.sources.ColStats](
      "v" -> graft.sources.DirStrStats(10L, 0L, Some(u("f")), Some(u("m"))))
    assert(StatsPrune.disqualifies(EqualTo(attr, lt("a")), both))
    assert(StatsPrune.disqualifies(EqualTo(attr, lt("z")), both))
    assert(!StatsPrune.disqualifies(EqualTo(attr, lt("g")), both))
    assert(StatsPrune.disqualifies(GreaterThan(attr, lt("m")), both))
    assert(!StatsPrune.disqualifies(GreaterThanOrEqual(attr, lt("m")), both))
    assert(StatsPrune.disqualifies(LessThan(attr, lt("f")), both))
    // dropped upper bound: > cannot prune, < still can, = prunes low side
    val noMax = Map[String, graft.sources.ColStats](
      "v" -> graft.sources.DirStrStats(10L, 0L, Some(u("f")), None))
    assert(!StatsPrune.disqualifies(GreaterThan(attr, lt("zzz")), noMax))
    assert(StatsPrune.disqualifies(LessThan(attr, lt("f")), noMax))
    assert(StatsPrune.disqualifies(EqualTo(attr, lt("a")), noMax))
    assert(!StatsPrune.disqualifies(EqualTo(attr, lt("z")), noMax))
    // StartsWith: window [p, pIncr) vs envelope
    assert(StatsPrune.disqualifies(
      StartsWith(attr, lt("a")), both)) // max-below impossible: min "f" ≥ "b"
    assert(StatsPrune.disqualifies(StartsWith(attr, lt("n")), both))
    assert(!StatsPrune.disqualifies(StartsWith(attr, lt("f")), both))
    assert(!StatsPrune.disqualifies(StartsWith(attr, lt("")), both))
  }

  test("StatsPrune unit: gap probes prune, boundary probes keep") {
    val st = Map("k" -> graft.sources.DirColStats(100L, 0L,
      Some(BigDecimal(1)), Some(BigDecimal(100))))
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "k", org.apache.spark.sql.types.LongType)()
    import org.apache.spark.sql.catalyst.expressions._
    def lt(v: Long) = Literal(v)
    assert(StatsPrune.disqualifies(EqualTo(attr, lt(150L)), st))
    assert(!StatsPrune.disqualifies(EqualTo(attr, lt(100L)), st))
    assert(StatsPrune.disqualifies(GreaterThan(attr, lt(100L)), st))
    assert(!StatsPrune.disqualifies(GreaterThanOrEqual(attr, lt(100L)), st))
    assert(StatsPrune.disqualifies(LessThan(attr, lt(1L)), st))
    assert(!StatsPrune.disqualifies(LessThanOrEqual(attr, lt(1L)), st))
    assert(StatsPrune.disqualifies(IsNull(attr), st))
    assert(!StatsPrune.disqualifies(IsNotNull(attr), st))
    // unknown column never prunes
    val other = AttributeReference("z",
      org.apache.spark.sql.types.LongType)()
    assert(!StatsPrune.disqualifies(EqualTo(other, lt(5L)), st))
  }
}
