package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, Expression, In, Literal}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.connector.expressions.{NamedReference,
  Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{InputPartition,
  SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Runtime (join-derived) directory pruning for graftlake catalog scans
  * (r19) — dynamic partition pruning generalized to manifest stats.
  *
  * Static literal predicates already disqualify whole directories at
  * plan time ([[StatsPrunedFileIndex]]). The predicates a star-schema
  * join produces — `fact.k IN (<keys the filtered dim survived with>)`
  * — only exist at RUNTIME, after the dim side materializes. This trait
  * makes the scan a [[SupportsRuntimeV2Filtering]]: Spark's
  * `PartitionPruning` rule injects a DPP subquery on any reported
  * stats-covered column that appears as a join key, `BatchScanExec`
  * delivers the materialized key set as an `IN` predicate before
  * execution, and the scan re-plans with every directory whose stats
  * envelope excludes ALL keys dropped — on a z-ordered or
  * naturally-clustered 100 TB fact table the dim filter prunes fact
  * I/O the way partition pruning would, without a partition column.
  *
  * Conservative by construction: evaluation reuses
  * [[StatsPrune.disqualifies]] (a dir survives unless the stats PROVE
  * no key can match; missing stats, unparseable values and null keys
  * all keep the dir), and only `IN`/`=` predicates on bare columns are
  * interpreted — anything else is ignored, never mis-pruned.
  */
private[graft] trait RuntimeDirPruning extends SupportsRuntimeV2Filtering {
  self: ParquetScan =>

  /** Manifest dirs / parsed stats / logical data schema of the scan. */
  protected def rtDirs: Seq[String]
  protected def rtStats: Map[String, Map[String, ColStats]]
  protected def rtSchema: org.apache.spark.sql.types.StructType

  @volatile private var pruned: Set[String] = Set.empty
  /** Observability for specs/ops: dirs dropped by the last runtime
    * filter delivery. */
  def runtimePrunedDirs: Set[String] = pruned

  override def filterAttributes(): Array[NamedReference] = {
    val covered = rtStats.valuesIterator.flatMap(_.keysIterator).toSet
    // only columns the (pruned) scan actually OUTPUTS — Spark resolves
    // these against the relation and errors on anything projected away
    readDataSchema.fieldNames.filter(covered).sorted
      .map(GraftShim.fieldRef)
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val exprs = predicates.toSeq.flatMap(toCatalyst)
    if (exprs.nonEmpty)
      pruned = rtDirs.filter(d => rtStats.get(d).exists(st =>
        exprs.exists(e => StatsPrune.disqualifies(e, st)))).toSet
  }

  private def attrOf(e: V2Expression): Option[AttributeReference] =
    e match {
      case nr: NamedReference if nr.fieldNames().length == 1 =>
        rtSchema.fields.find(_.name == nr.fieldNames().head)
          .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
      case _ => None
    }

  /** `IN(col, v...)` / `=(col, v)` → the Catalyst shape
    * [[StatsPrune.disqualifies]] evaluates; everything else → None
    * (ignored, the dir set stays complete). */
  private def toCatalyst(p: Predicate): Option[Expression] =
    (p.name(), p.children().toSeq) match {
      case ("IN", (head: V2Expression) +: rest) if rest.nonEmpty &&
          rest.forall(GraftShim.literalValueOf(_).isDefined) =>
        attrOf(head).map { a =>
          In(a, rest.map { r =>
            val (v, dt) = GraftShim.literalValueOf(r).get
            Literal(v, dt)
          })
        }
      case ("=", Seq(l, r)) =>
        for {
          a <- attrOf(l)
          (v, dt) <- GraftShim.literalValueOf(r)
        } yield EqualTo(a, Literal(v, dt))
      case _ => None
    }

  /** Drop every file under a pruned dir; keepEmpty preserves partition
    * COUNT and order (bucket alignment), otherwise empties vanish and
    * partitions re-index densely. */
  protected def dropPrunedFiles(parts: Array[InputPartition],
      keepEmpty: Boolean): Array[InputPartition] =
    if (pruned.isEmpty) parts
    else {
      val prefixes = pruned.map(_.stripSuffix("/") + "/")
      def keep(fp: FilePartition) = fp.files.filterNot(f =>
        prefixes.exists(f.toPath.toUri.getPath.startsWith))
      if (keepEmpty)
        parts.map {
          case bp: BucketFilePartition =>
            new BucketFilePartition(bp.index, keep(bp), bp.bucketId)
          case fp: FilePartition => FilePartition(fp.index, keep(fp))
          case other => other
        }
      else
        parts.map {
          case fp: FilePartition => keep(fp)
          // a parquet scan only plans FilePartitions; anything else
          // here would be silently mis-indexed — fail loudly instead
          case other => throw new IllegalStateException(
            "unexpected non-file input partition " +
            other.getClass.getName)
        }.filter(_.nonEmpty).zipWithIndex.map { case (fs, i) =>
          FilePartition(i, fs): InputPartition
        }
    }
}

/** A plain (unbucketed) catalog-table scan with runtime dir pruning:
  * identical parquet read path, re-planned minus pruned directories
  * when a DPP key set arrives. */
private[graft] final class RuntimePrunedParquetScan(
    p: ParquetScan,
    protected val rtDirs: Seq[String],
    protected val rtStats: Map[String, Map[String, ColStats]],
    protected val rtSchema: org.apache.spark.sql.types.StructType)
    extends ParquetScan(p.sparkSession, p.hadoopConf, p.fileIndex,
      p.dataSchema, p.readDataSchema, p.readPartitionSchema,
      p.pushedFilters, p.options, p.pushedAggregate, p.partitionFilters,
      p.dataFilters, p.pushedVariantExtractions)
    with RuntimeDirPruning {

  override def planInputPartitions(): Array[InputPartition] =
    dropPrunedFiles(super.planInputPartitions(), keepEmpty = false)

  // runtime state must not leak into scan-reuse equality
  override def equals(obj: Any): Boolean = obj match {
    case o: RuntimePrunedParquetScan => super.equals(o)
    case _ => false
  }
  override def hashCode(): Int = 31 * super.hashCode() + 17
}
