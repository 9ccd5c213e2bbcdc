package graft

import graft.sources.{GraftLakeBatchWrite, GraftLakeTable, SnapshotLake}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  RowLevelOperationInfo}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** The V2 TableCatalog SQL surface (r17, VERDICT r16 item 1): every DML
  * statement a Delta/Iceberg user types must land on the manifest-CAS
  * protocol and produce a table state EQUAL to the object-API call —
  * each test runs the SQL against one table and the object API against a
  * twin, then compares row sets. Also pinned: pre-mutation snapshots stay
  * time-travel readable, the single-CAS race fails loudly (never a
  * silent lost update), pushable DELETEs take the dir-granular metadata
  * path, and rename-evolved tables refuse the V2 scan like the V1
  * provider. */
class GraftLakeCatalogSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def seed(table: String): Unit = {
    import s.implicits._
    SnapshotLake.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table)
    SnapshotLake.commit(Seq((3L, "c"), (4L, "d")).toDF("k", "v"), table,
      append = true)
  }

  test("SELECT through the catalog == readLatest; pushdown plan intact") {
    val t = tmpDir("cat-read")
    seed(t)
    val got = s.sql(s"SELECT k, v FROM graftlake.`$t` WHERE k >= 2")
    assert(rows(got) ==
      rows(SnapshotLake.readLatest(s, t).filter(col("k") >= 2)))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"),
      s"catalog scan must push filters to parquet:\n$plan")
  }

  test("INSERT INTO appends one snapshot; INSERT OVERWRITE replaces atomically") {
    val t = tmpDir("cat-insert")
    seed(t)
    val pre = SnapshotLake.latest(s, t).get
    s.sql(s"INSERT INTO graftlake.`$t` VALUES (5L, 'e')")
    assert(SnapshotLake.latest(s, t).contains(pre + 1))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c"),
        Seq[Any](4L, "d"), Seq[Any](5L, "e")))
    s.sql(s"INSERT OVERWRITE graftlake.`$t` VALUES (9L, 'z')")
    assert(rows(SnapshotLake.readLatest(s, t)) == Set(Seq[Any](9L, "z")))
    // history stays byte-stable under both writes
    assert(rows(SnapshotLake.readAt(s, t, pre)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c"),
        Seq[Any](4L, "d")))
  }

  test("pushable DELETE == object API, takes the dir-granular metadata path") {
    val t = tmpDir("cat-del"); val twin = tmpDir("cat-del-twin")
    seed(t); seed(twin)
    val pre = SnapshotLake.latest(s, t).get
    val dirsBefore = SnapshotLake.readLatest(s, t).inputFiles.map(f =>
      f.substring(0, f.lastIndexOf('/'))).distinct.sorted
    s.sql(s"DELETE FROM graftlake.`$t` WHERE k <= 2")
    SnapshotLake.delete(s, twin, col("k") <= 2)
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      rows(SnapshotLake.readLatest(s, twin)),
      "SQL DELETE must equal the object-API delete")
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](3L, "c"), Seq[Any](4L, "d")))
    // dir-granular: k<=2 lives entirely in the FIRST seeded dir, so the
    // second dir must survive into the new manifest UNREWRITTEN — the
    // SupportsDeleteV2 metadata path, not a whole-table rewrite
    val dirsAfter = SnapshotLake.readLatest(s, t).inputFiles.map(f =>
      f.substring(0, f.lastIndexOf('/'))).distinct.sorted
    assert(dirsAfter.exists(dirsBefore.contains),
      s"expected the untouched dir to survive: $dirsBefore -> $dirsAfter")
    // pre-mutation snapshot time-travel readable
    assert(rows(SnapshotLake.readAt(s, t, pre)).size == 4)
  }

  test("non-pushable DELETE routes through the row-level rewrite, same state") {
    val t = tmpDir("cat-del2"); val twin = tmpDir("cat-del2-twin")
    seed(t); seed(twin)
    // k % 2 = 0 does not translate to a V2 filter -> group-based CoW
    s.sql(s"DELETE FROM graftlake.`$t` WHERE k % 2 = 0")
    SnapshotLake.delete(s, twin, col("k") % 2 === 0)
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      rows(SnapshotLake.readLatest(s, twin)))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](3L, "c")))
  }

  test("UPDATE == object API update; WHERE-null rows pass through") {
    val t = tmpDir("cat-upd"); val twin = tmpDir("cat-upd-twin")
    seed(t); seed(twin)
    val pre = SnapshotLake.latest(s, t).get
    s.sql(s"UPDATE graftlake.`$t` SET v = concat(v, '!') WHERE k >= 3")
    SnapshotLake.update(s, twin, col("k") >= 3,
      Map("v" -> concat(col("v"), lit("!"))))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      rows(SnapshotLake.readLatest(s, twin)))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c!"),
        Seq[Any](4L, "d!")))
    assert(rows(SnapshotLake.readAt(s, t, pre)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c"),
        Seq[Any](4L, "d")))
  }

  test("MERGE INTO == object API merge (matched update + not-matched insert)") {
    import s.implicits._
    val t = tmpDir("cat-mrg"); val twin = tmpDir("cat-mrg-twin")
    seed(t); seed(twin)
    val src = Seq((2L, "B"), (9L, "I")).toDF("k", "v")
    src.createOrReplaceTempView("cat_mrg_src")
    s.sql(
      s"""MERGE INTO graftlake.`$t` tgt USING cat_mrg_src src
         |ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    SnapshotLake.merge(s, twin, src, Seq("k"))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      rows(SnapshotLake.readLatest(s, twin)))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "B"), Seq[Any](3L, "c"),
        Seq[Any](4L, "d"), Seq[Any](9L, "I")))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE — the ANSI form beyond the object API") {
    import s.implicits._
    val t = tmpDir("cat-mrg2")
    seed(t)
    Seq((1L, "A"), (7L, "G")).toDF("k", "v")
      .createOrReplaceTempView("cat_mrg2_src")
    s.sql(
      s"""MERGE INTO graftlake.`$t` tgt USING cat_mrg2_src src
         |ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "A"), Seq[Any](7L, "G")))
  }

  test("CREATE TABLE / CTAS / ALTER ADD COLUMN / DROP TABLE round trip") {
    import s.implicits._
    val root = tmpDir("cat-ddl")
    val t = s"$root/created"
    s.sql(s"CREATE TABLE graftlake.`$t` (k BIGINT, v STRING)")
    assert(SnapshotLake.latest(s, t).contains(1L))
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t`")).isEmpty)
    s.sql(s"INSERT INTO graftlake.`$t` VALUES (1L, 'a')")
    s.sql(s"ALTER TABLE graftlake.`$t` ADD COLUMN score DOUBLE")
    // add directive: typed NULL everywhere until a write carries it
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t`")) ==
      Set(Seq[Any](1L, "a", null)))
    val ctas = s"$root/ctas"
    s.sql(s"CREATE TABLE graftlake.`$ctas` AS SELECT 5L AS k, 'e' AS v")
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$ctas`")) ==
      Set(Seq[Any](5L, "e")))
    s.sql(s"DROP TABLE graftlake.`$t`")
    assert(SnapshotLake.latest(s, t).isEmpty)
    intercept[Exception] { s.sql(s"SELECT * FROM graftlake.`$t`").collect() }
  }

  test("ALTER TABLE DROP COLUMN through SQL: masked read, refused reuse, " +
       "mutations on the narrowed schema (r18)") {
    import s.implicits._
    val t = tmpDir("cat-dropcol")
    SnapshotLake.commit(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "v", "score"), t)
    val pre = SnapshotLake.latest(s, t).get
    s.sql(s"ALTER TABLE graftlake.`$t` DROP COLUMN score")
    assert(s.sql(s"SELECT * FROM graftlake.`$t`").schema.fieldNames.toSeq
      == Seq("k", "v"))
    // time travel before the ALTER still serves the column
    assert(rows(s.sql(
      s"SELECT * FROM graftlake.`$t` VERSION AS OF $pre")) ==
      Set(Seq[Any](1L, "a", 1.0), Seq[Any](2L, "b", 2.0)))
    // INSERT resolves against the narrowed schema; a 3-col insert refuses
    intercept[Exception](
      s.sql(s"INSERT INTO graftlake.`$t` VALUES (3L, 'c', 9.0)"))
    s.sql(s"INSERT INTO graftlake.`$t` VALUES (3L, 'c')")
    // UPDATE runs on the narrowed schema (dir-granular machinery intact)
    s.sql(s"UPDATE graftlake.`$t` SET v = 'B' WHERE k = 2")
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t`")) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "B"), Seq[Any](3L, "c")))
    // re-adding the dropped name refuses until compact materializes
    intercept[Exception](
      s.sql(s"ALTER TABLE graftlake.`$t` ADD COLUMN score DOUBLE"))
    SnapshotLake.compact(s, t)
    s.sql(s"ALTER TABLE graftlake.`$t` ADD COLUMN score DOUBLE")
    assert(s.sql(s"SELECT * FROM graftlake.`$t`").schema.fieldNames.toSeq
      == Seq("k", "v", "score"))
  }

  test("TRUNCATE TABLE empties through the delete path; history intact (r18)") {
    val t = tmpDir("cat-trunc")
    seed(t)
    val pre = SnapshotLake.latest(s, t).get
    s.sql(s"TRUNCATE TABLE graftlake.`$t`")
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t`")).isEmpty)
    assert(s.sql(s"SELECT * FROM graftlake.`$t`").schema.fieldNames.toSeq
      == Seq("k", "v"), "an emptied table must stay schema-readable")
    assert(rows(SnapshotLake.readAt(s, t, pre)).size == 4,
      "pre-truncate history must stay time-travel readable")
    s.sql(s"INSERT INTO graftlake.`$t` VALUES (7L, 'g')")
    assert(rows(SnapshotLake.readLatest(s, t)) == Set(Seq[Any](7L, "g")))
  }

  test("row-level commit CAS races fail loudly, table state untouched") {
    import s.implicits._
    val t = tmpDir("cat-race")
    seed(t)
    val base = SnapshotLake.latest(s, t).get
    // the statement's table object pins `base`...
    val tbl = new GraftLakeTable(t, base)
    val op = tbl.newRowLevelOperationBuilder(new RowLevelOperationInfo {
      override def command(): Command = Command.DELETE
      override def options(): CaseInsensitiveStringMap =
        CaseInsensitiveStringMap.empty()
    }).build()
    val bw = op.newWriteBuilder(new LogicalWriteInfo {
      override def queryId(): String = "race-test"
      override def schema() = SnapshotLake.readLatest(s, t).schema
      override def options(): CaseInsensitiveStringMap =
        CaseInsensitiveStringMap.empty()
    }).build().toBatch
    // ...then an interleaving writer commits base+1 before the statement
    SnapshotLake.commit(Seq((99L, "zz")).toDF("k", "v"), t, append = true)
    val ex = intercept[IllegalStateException] { bw.commit(Array.empty) }
    assert(ex.getMessage.contains("concurrent commit"),
      s"wrong failure: ${ex.getMessage}")
    // no partial state: the interleaved commit IS the latest, its rows
    // intact, and no extra snapshot landed
    assert(SnapshotLake.latest(s, t).contains(base + 1))
    assert(rows(SnapshotLake.readLatest(s, t)).size == 5)
  }

  test("rename-evolved tables scan natively through the catalog (r17)") {
    val t = tmpDir("cat-ren")
    seed(t)
    SnapshotLake.renameColumn(s, t, "v", "label")
    // column mapping: pre-rename files resolve by origin-hash field id
    val got = s.sql(s"SELECT k, label FROM graftlake.`$t` WHERE k <= 2")
    assert(rows(got) == Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t`")) ==
      rows(SnapshotLake.readLatest(s, t)))
    // ALTER TABLE RENAME COLUMN through SQL routes to the same directive
    s.sql(s"ALTER TABLE graftlake.`$t` RENAME COLUMN label TO tag")
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t`")) ==
      rows(SnapshotLake.readLatest(s, t)))
    assert(s.sql(s"SELECT * FROM graftlake.`$t`").schema.fieldNames.toSeq
      == Seq("k", "tag"))
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel through SQL (r17)") {
    import s.implicits._
    val t = tmpDir("cat-tt")
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), t)
    Thread.sleep(1100) // distinct commit-clock seconds for the ts rule
    SnapshotLake.commit(Seq((2L, "b")).toDF("k", "v"), t, append = true)
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t` VERSION AS OF 1")) ==
      Set(Seq[Any](1L, "a")))
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t` VERSION AS OF 2")) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
    val exV = intercept[Exception] {
      s.sql(s"SELECT * FROM graftlake.`$t` VERSION AS OF 9").collect()
    }
    assert(exV.getMessage.contains("no committed snapshot"))
    // a timestamp between the two commits resolves to snapshot 1
    val t1 = SnapshotLake.snapshotTimes(s, t).head._2
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    val mid = fmt.format(java.time.Instant.ofEpochMilli(t1 + 500))
    assert(rows(s.sql(
      s"SELECT * FROM graftlake.`$t` TIMESTAMP AS OF '$mid'")) ==
      Set(Seq[Any](1L, "a")))
    val exT = intercept[Exception] {
      val early = fmt.format(java.time.Instant.ofEpochMilli(t1 - 60000))
      s.sql(s"SELECT * FROM graftlake.`$t` TIMESTAMP AS OF '$early'")
        .collect()
    }
    assert(exT.getMessage.contains("at or before"))
  }

  /** manifest dirs at the latest snapshot, via the package-private API. */
  private def dirsOf(t: String): Seq[String] =
    SnapshotLake.manifestDirs(s, t, SnapshotLake.latest(s, t).get)

  /** dir → sorted data files, for identity (not just path) comparison. */
  private def filesOf(t: String): Map[String, Seq[String]] =
    dirsOf(t).map { d =>
      val f = new java.io.File(d)
      d -> f.listFiles().map(_.getName).toSeq.sorted
    }.toMap

  test("SQL UPDATE rewrites ONLY matched directories — untouched dirs " +
       "survive by identity (r18)") {
    val t = tmpDir("cat-upd-dir")
    seed(t) // dir A: k=1,2   dir B: k=3,4
    val before = filesOf(t)
    assert(before.size == 2)
    val dirA = dirsOf(t).find(d =>
      rows(SnapshotLake.readLatest(s, t).filter(col("k") === 1))
        .nonEmpty && {
        val got = s.read.parquet(d).select("k")
        rows(got).contains(Seq[Any](1L))
      }).get
    val dirB = dirsOf(t).filterNot(_ == dirA).head
    // matches rows ONLY in dir B: Spark's runtime group filtering must
    // narrow the rewrite to dir B and the commit must carry dir A over
    // BY IDENTITY — same directory path, same files, zero rewrite
    s.sql(s"UPDATE graftlake.`$t` SET v = upper(v) WHERE k >= 3")
    val after = filesOf(t)
    assert(after.contains(dirA),
      s"untouched dir must survive by identity: $dirA -> ${after.keySet}")
    assert(after(dirA) == before(dirA),
      "untouched dir's files must be byte-identical (no rewrite)")
    assert(!after.contains(dirB),
      s"matched dir must be replaced: $dirB still visible")
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "C"),
        Seq[Any](4L, "D")))
  }

  test("SQL MERGE INTO rewrites ONLY directories the source touches (r18)") {
    import s.implicits._
    val t = tmpDir("cat-mrg-dir")
    seed(t) // dir A: k=1,2   dir B: k=3,4
    val before = filesOf(t)
    val dirA = dirsOf(t).find(d =>
      rows(s.read.parquet(d).select("k")).contains(Seq[Any](1L))).get
    val dirB = dirsOf(t).filterNot(_ == dirA).head
    // source keys hit only dir B (k=4) plus a fresh insert (k=9)
    Seq((4L, "DD"), (9L, "II")).toDF("k", "v")
      .createOrReplaceTempView("cat_mrg_dir_src")
    s.sql(
      s"""MERGE INTO graftlake.`$t` tgt USING cat_mrg_dir_src src
         |ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = filesOf(t)
    assert(after.contains(dirA) && after(dirA) == before(dirA),
      s"dir untouched by the source must survive by identity: " +
        s"$dirA -> ${after.keySet}")
    assert(!after.contains(dirB), "matched dir must be replaced")
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](3L, "c"),
        Seq[Any](4L, "DD"), Seq[Any](9L, "II")))
  }

  test("non-pushable DELETE narrows to matched dirs through the rewrite (r18)") {
    import s.implicits._
    val t = tmpDir("cat-del-dir")
    SnapshotLake.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    SnapshotLake.commit(Seq((30L, "c"), (40L, "d")).toDF("k", "v"), t,
      append = true)
    val before = filesOf(t)
    val dirA = dirsOf(t).find(d =>
      rows(s.read.parquet(d).select("k")).contains(Seq[Any](1L))).get
    // k % 10 = 0 is not V2-translatable (no metadata path) but only dir B
    // holds matching rows — the probe narrows the CoW to dir B
    s.sql(s"DELETE FROM graftlake.`$t` WHERE k % 10 = 0")
    val after = filesOf(t)
    assert(after.contains(dirA) && after(dirA) == before(dirA),
      "dir with no matching row must survive the residual DELETE")
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
  }

  test("_dir metadata column: projectable on demand, hidden from SELECT *") {
    val t = tmpDir("cat-dircol")
    seed(t)
    assert(s.sql(s"SELECT * FROM graftlake.`$t`").schema.fieldNames.toSeq
      == Seq("k", "v"), "_dir must not leak into SELECT *")
    val got = s.sql(s"SELECT k, _dir FROM graftlake.`$t`")
    val byDir = got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = dirsOf(t).toSet
    assert(byDir.values.toSet == expect,
      s"_dir must carry the manifest dir strings: ${byDir.values.toSet}")
    // rows seeded into the same commit share a dir; different commits differ
    assert(byDir(1L) == byDir(2L) && byDir(3L) == byDir(4L) &&
      byDir(1L) != byDir(3L))
    // and it prunes as a partition filter — no other dir's files read
    val one = s.sql(
      s"SELECT k FROM graftlake.`$t` WHERE _dir = '${byDir(1L)}'")
    assert(one.inputFiles.forall(_.contains(byDir(1L).split('/').last)))
    assert(rows(one) == Set(Seq[Any](1L), Seq[Any](2L)))
  }

  test("CALL graftlake.system.* maintenance procedures ≡ object API (r18)") {
    import s.implicits._
    val t = tmpDir("cat-proc"); val twin = tmpDir("cat-proc-twin")
    for (x <- Seq(t, twin)) {
      SnapshotLake.commit(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), x)
      SnapshotLake.commit(Seq((3L, 30L), (4L, 40L)).toDF("k", "v"), x,
        append = true)
    }
    // compact: one CALL == one object compact; committed flag + id ride out
    val c = s.sql(s"CALL graftlake.system.compact(table => '$t')").collect()
    SnapshotLake.compact(s, twin)
    assert(c.length == 1 && c(0).getBoolean(0) &&
      c(0).getLong(1) == SnapshotLake.latest(s, t).get)
    assert(SnapshotLake.manifestDirs(s, t,
      SnapshotLake.latest(s, t).get).size == 1, "compact must bin-pack")
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      rows(SnapshotLake.readLatest(s, twin)))
    // zorder: clustered rewrite, same rows
    val z = s.sql(
      s"CALL graftlake.system.zorder(table => '$t', cols => 'k,v')")
      .collect()
    SnapshotLake.compactZOrder(s, twin, Seq("k", "v"))
    assert(z(0).getBoolean(0))
    assert(rows(SnapshotLake.readLatest(s, t)) ==
      rows(SnapshotLake.readLatest(s, twin)))
    // expire: retain the latest snapshot only, GC the rest
    val e = s.sql(
      s"CALL graftlake.system.expire(table => '$t', keep_last => 1)")
      .collect()
    SnapshotLake.expire(s, twin, 1)
    assert(e(0).getInt(0) == 1 &&
      SnapshotLake.snapshots(s, t) == SnapshotLake.snapshots(s, twin)
        .map(_ => SnapshotLake.snapshots(s, t).head))
    assert(SnapshotLake.snapshots(s, t).length == 1)
    // rebalance: a cold index is a committed no-op at the same base
    val idx = tmpDir("cat-proc-idx")
    graft.ops.AnnIndex.build(Tables.embeddings(s, TestSpark.Sf0001),
      idx, 8)
    val base = SnapshotLake.latest(s, s"$idx/lists").get
    val r = s.sql(
      s"CALL graftlake.system.rebalance(index_root => '$idx')").collect()
    assert(r(0).getBoolean(0) && r(0).getLong(1) == base,
      "a balanced index must be a committed no-op at the same base")
    // history: one row per snapshot, ids and counts off the manifests
    val h = s.sql(s"CALL graftlake.system.history(table => '$twin')")
      .collect()
    assert(h.map(_.getLong(0)).toSeq ==
      SnapshotLake.snapshots(s, twin))
    assert(h.forall(r => r.getInt(2) >= 1 && !r.isNullAt(1)))
    // unknown procedures refuse with the known list
    val ex = intercept[Exception] {
      s.sql(s"CALL graftlake.system.nonsense(table => '$t')").collect()
    }
    // Spark wraps the catalog's refusal in FAILED_TO_LOAD_ROUTINE; the
    // known-procedure list rides the cause
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("FAILED_TO_LOAD_ROUTINE") ||
      msgs.contains("compact"), msgs)
  }

  test("MERGE INTO ... WITH SCHEMA EVOLUTION lands the source-only " +
       "column via the add directive; old rows read typed NULL; " +
       "pre-merge time travel byte-stable (r19)") {
    import s.implicits._
    val t = tmpDir("cat-evolve")
    seed(t)
    val preId = SnapshotLake.latest(s, t).get
    val pre = SnapshotLake.readLatest(s, t).collect().toSet
    Seq((2L, "B", 0.5), (9L, "i", 0.9)).toDF("k", "v", "score")
      .createOrReplaceTempView("cat_evolve_src")
    s.sql(s"MERGE WITH SCHEMA EVOLUTION INTO graftlake.`$t` t " +
      "USING cat_evolve_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val now = s.sql(s"SELECT * FROM graftlake.`$t`")
    assert(now.columns.toSeq == Seq("k", "v", "score"))
    assert(rows(now) == Set(
      Seq[Any](1L, "a", null), Seq[Any](2L, "B", 0.5),
      Seq[Any](3L, "c", null), Seq[Any](4L, "d", null),
      Seq[Any](9L, "i", 0.9)))
    // the evolution is a recorded add directive, not a data rewrite of
    // history: time travel before the merge is byte-stable
    assert(SnapshotLake.readAt(s, t, preId).collect().toSet == pre)
    assert(SnapshotLake.manifestDirectives(s, t,
        SnapshotLake.latest(s, t).get)
      .contains("#schema\tadd\tscore\tDOUBLE"))
  }

  test("VERSION AS OF 'tag' resolves named refs; CALL tag/drop_tag ≡ " +
       "object API (r19)") {
    val t = tmpDir("cat-tags")
    seed(t) // snapshots 1 (2 rows) and 2 (4 rows)
    val r = s.sql(s"CALL graftlake.system.tag(table => '$t', " +
      "name => 'v1', snapshot_id => 1)").collect()
    assert(r.head.getString(0) == "v1" && r.head.getLong(1) == 1L)
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t` VERSION AS OF 'v1'"))
      == Set(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
    // numeric travel still works beside tags
    assert(rows(s.sql(s"SELECT * FROM graftlake.`$t` VERSION AS OF 2"))
        .size == 4)
    // defaulted snapshot_id tags the latest
    s.sql(s"CALL graftlake.system.tag(table => '$t', name => 'head')")
    assert(SnapshotLake.tags(s, t)("head") == 2L)
    // unknown tag refuses with the known list
    val ex = intercept[Exception](
      s.sql(s"SELECT * FROM graftlake.`$t` VERSION AS OF 'nope'")
        .collect())
    assert(ex.getMessage.contains("v1") || ex.getMessage.contains("tag"))
    val d = s.sql(s"CALL graftlake.system.drop_tag(table => '$t', " +
      "name => 'head')").collect()
    assert(d.head.getBoolean(0))
    assert(SnapshotLake.tags(s, t) == Map("v1" -> 1L))
  }

  test("warehouse-relative names resolve and list") {
    import s.implicits._
    val wh = tmpDir("cat-wh")
    val s2 = s.newSession()
    s2.conf.set("spark.sql.catalog.whlake",
      "graft.sources.GraftLakeCatalog")
    s2.conf.set("spark.sql.catalog.whlake.warehouse", wh)
    SnapshotLake.commit(Seq((1L, "a")).toDF("k", "v"), s"$wh/events")
    assert(rows(s2.sql("SELECT * FROM whlake.events")) ==
      Set(Seq[Any](1L, "a")))
    assert(s2.sql("SHOW TABLES IN whlake").collect()
      .map(_.getString(1)).contains("events"))
  }
}
