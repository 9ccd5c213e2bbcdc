package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex,
  PartitionDirectory, PartitionPath, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The dir identity column every graftlake V2 scan can serve (r18,
  * VERDICT r17 item 1): `_dir` — the manifest data directory a row lives
  * in — surfaces as a METADATA column on [[GraftLakeTable]] (hidden from
  * `SELECT *`, projectable on demand) and, physically, as a PARTITION
  * column of this file index: each manifest directory is one partition
  * whose value is its own path string. That one framing buys three
  * things at zero row-width cost when unrequested:
  *
  *  1. Spark's vectorized parquet readers append partition values as
  *     constant column vectors — no custom reader, no row wrapping;
  *  2. predicates on `_dir` are PARTITION filters, pruned at listing;
  *  3. Spark's own `RowLevelOperationRuntimeGroupFiltering` can plan the
  *     matched-group probe (`SELECT DISTINCT _dir FROM t WHERE cond`)
  *     against the normal read path and runtime-narrow the row-level
  *     scan — the machinery [[GraftRowLevelScan]] plugs into.
  */
private[graft] object DirLabeledFileIndex {
  val DirColumn = "_dir"

  private[graft] def partitionSchema: StructType =
    StructType(Seq(StructField(DirColumn, StringType, nullable = false)))

  /** One partition per manifest dir, valued with the dir string exactly
    * as the manifest records it (the write side drops these strings from
    * the manifest at commit — the two must match verbatim). */
  private def spec(spark: SparkSession, dirs: Seq[String]): PartitionSpec = {
    val conf = spark.sparkContext.hadoopConfiguration
    PartitionSpec(partitionSchema, dirs.map { d =>
      val p = new Path(d)
      val q = p.getFileSystem(conf).makeQualified(p)
      PartitionPath(InternalRow(UTF8String.fromString(d)), q)
    })
  }
}

/** File index over exactly the manifest's directories with `_dir` as a
  * synthetic partition column (see companion), answering `listFiles`
  * THROUGH the manifest stats like [[StatsPrunedFileIndex]]: a directory
  * the pushed data filters disqualify contributes no files — planning
  * from O(manifest), zero footer reads. */
private[graft] class DirLabeledFileIndex(
    spark: SparkSession, dirs: Seq[String],
    schema: StructType,
    stats: Map[String, Map[String, ColStats]])
    extends InMemoryFileIndex(spark, dirs.map(new Path(_)),
      Map.empty[String, String], Some(schema),
      userSpecifiedPartitionSpec =
        Some(DirLabeledFileIndex.spec(spark, dirs))) {

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty || stats.isEmpty) base
    else base.filterNot { pd =>
      val d = pd.values.getUTF8String(0).toString
      stats.get(d).exists(st =>
        dataFilters.exists(f => StatsPrune.disqualifies(f, st)))
    }
  }
}

/** Which directories a row-level operation's scan actually served — the
  * single driver-side contract between the scan half and the write half
  * of [[GraftLakeRowLevelOperation]]: the commit replaces EXACTLY this
  * set (untouched directories survive into the new manifest by
  * identity). Starts at the pinned snapshot's full directory list (the
  * conservative full-replace); the scan narrows it if and only if
  * Spark's runtime group filtering hands it the matched-`_dir` values —
  * so the written rows and the replaced set can never disagree. */
private[graft] final class ServedDirs(val all: Seq[String]) {
  @volatile var dirs: Seq[String] = all
}

/** Scan builder for the row-level operation's target-table read. Column
  * pruning delegates to the inner parquet builder; FILTER pushdown is
  * deliberately absent — a group-based CoW scan must return every row of
  * the groups it serves (carry-over rows included), so row-granular
  * pushdown of the command's condition would corrupt the rewrite.
  * Group-granular narrowing happens at runtime instead, through
  * [[GraftRowLevelScan]]'s `SupportsRuntimeV2Filtering`. */
private[graft] class GraftRowLevelScanBuilder(
    table: GraftLakeTable, options: CaseInsensitiveStringMap,
    served: ServedDirs, dirTracking: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val spark = SparkSession.active
  // validates the rename-evolution preconditions exactly like a SELECT
  private val dataSchema: StructType = table.scanSchema(served.all)
  private val fullSchema: StructType =
    if (dirTracking)
      StructType(dataSchema.fields :+
        StructField(DirLabeledFileIndex.DirColumn, StringType,
          nullable = false))
    else dataSchema
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftRowLevelScan(spark, dataSchema, fullSchema, required,
      options, served, dirTracking)
}

/** The row-level operation's target scan: a delegated V2 parquet scan
  * over the served directories that implements
  * `SupportsRuntimeV2Filtering` on `_dir`. Spark's
  * `RowLevelOperationRuntimeGroupFiltering` plans the matched-row probe
  * (normal read path: pushdown, stats pruning, broadcast-friendly
  * source semi join for MERGE) as an IN-subquery runtime filter on
  * `_dir`; `BatchScanExec` evaluates it and calls [[filter]] before
  * re-planning partitions. Narrowing updates [[ServedDirs]], so the
  * write half replaces exactly the directories whose rows were read —
  * UPDATE / MERGE INTO / residual DELETE rewrite only the directories
  * the predicate or source touches, the [[SnapshotLake.update]]
  * dir-granular CoW shape surfaced through SQL (r18).
  *
  * Unparseable or absent runtime predicates leave the scan serving the
  * full pinned directory list — the conservative full replace, never a
  * lost row. */
private[graft] class GraftRowLevelScan(
    spark: SparkSession, dataSchema: StructType, fullSchema: StructType,
    required: StructType, options: CaseInsensitiveStringMap,
    served: ServedDirs, dirTracking: Boolean)
    extends Scan with SupportsRuntimeV2Filtering {

  @volatile private var inner: Scan = _

  private def delegate: Scan = synchronized {
    if (inner == null) {
      // a user `_dir` DATA column disables dir tracking — plain index,
      // no synthetic partition column, so the data column stays readable
      val idx =
        if (dirTracking)
          new DirLabeledFileIndex(spark, served.dirs, dataSchema, Map.empty)
        else new InMemoryFileIndex(spark,
          served.dirs.map(new Path(_)), Map.empty[String, String],
          Some(dataSchema))
      val b = ParquetScanBuilder(spark, idx, fullSchema, dataSchema,
        options)
      b.pruneColumns(required)
      inner = b.build()
    }
    inner
  }

  override def readSchema(): StructType = delegate.readSchema()

  override def toBatch: Batch = delegate.toBatch

  override def filterAttributes(): Array[NamedReference] =
    if (dirTracking) Array(Expressions.column(DirLabeledFileIndex.DirColumn))
    else Array.empty

  override def filter(predicates: Array[Predicate]): Unit = {
    val dirCol = DirLabeledFileIndex.DirColumn
    val keeps: Seq[Set[String]] = predicates.toSeq
      .flatMap(p => org.apache.spark.sql.GraftShim.predicateToV1(p))
      .flatMap {
        case sources.In(c, vs) if c == dirCol =>
          Some(vs.toSet[Any].map(String.valueOf(_: Any)))
        case sources.EqualTo(c, v) if c == dirCol =>
          Some(Set(String.valueOf(v)))
        // any other predicate shape: ignore (contract-sanctioned), the
        // scan stays wider and the replace stays conservative
        case _ => None
      }
    if (keeps.nonEmpty) synchronized {
      val keep = keeps.reduce(_ intersect _)
      served.dirs = served.dirs.filter(keep.contains)
      inner = null // re-plan partitions over the narrowed directories
    }
  }

  override def description(): String =
    s"graftlake row-level scan (${served.dirs.size}/${served.all.size} dirs)"
}
