package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash,
  Pmod}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition,
  SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning,
  Partitioning}
import org.apache.spark.sql.execution.datasources.{BucketingUtils,
  FilePartition, PartitionedFile, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan,
  ParquetScanBuilder}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Storage-partitioned joins (SPJ) for the V2 catalog (r19, VERDICT r18
  * item 1) — the SQL half of the co-located-join win the V1 provider's
  * `BucketSpec` already gives the object API.
  *
  * A bucket-laid-out graftlake table (manifest `#bucket` line) stores
  * every row in the file whose `_%05d` tag equals
  * `pmod(murmur3(bucketCols), nBuckets)` — exactly Spark's
  * `HashPartitioning` bucket function. The V2 scan surfaces that layout
  * through the public connector SPJ contract (the Iceberg shape):
  *
  *  1. [[BucketedParquetScan]] implements `SupportsReportPartitioning`,
  *     reporting `KeyGroupedPartitioning(bucket(n, cols), n)` and
  *     planning ONE input partition per bucket id, each a
  *     [[BucketFilePartition]] carrying its id as the `HasPartitionKey`
  *     key;
  *  2. [[GraftLakeCatalog]] implements `FunctionCatalog`, serving
  *     [[GraftBucketFunction]] so Catalyst can resolve the reported
  *     transform (`V2ExpressionUtils.loadV2FunctionOpt` loads `bucket`
  *     with an empty namespace) and check two scans' layouts compatible
  *     by the function's canonical name and bucket count.
  *
  * With `spark.sql.sources.v2.bucketing.enabled=true`,
  * `EnsureRequirements` then plans `graftlake.a JOIN graftlake.b` on the
  * bucket columns with ZERO shuffle exchanges when both sides report the
  * same (cols, n) — at 100 TB this deletes the dominant shuffle of every
  * fact-to-fact join on the SQL path, not just the object-API path.
  * Tables with different bucket counts, or joins off the bucket columns,
  * fall back to the normal exchange plan (the report is advisory).
  */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "graftlake bucket routing: pmod(murmur3(cols), nBuckets) — " +
      "Spark's HashPartitioning bucket function, the routing " +
      "SnapshotLake.commitBucketed writes files by"

  /** Bound against `(nBuckets: int literal, col1, ..., colK)` — the
    * argument layout of the `bucket(n, cols)` transform. */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket(nBuckets, cols...) needs at least two arguments, got " +
      s"${inputType.length}")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is the integer bucket count, got " +
      s"${inputType.fields.head.dataType}")
    new GraftBoundBucket(inputType)
  }
}

/** The bound half: evaluates exactly `HashPartitioning(cols, n)`'s
  * partition-id expression (`Pmod(Murmur3Hash(cols, seed=42), n)`), so a
  * value computed here agrees with the file the write side routed it to.
  *
  * Also a [[org.apache.spark.sql.connector.catalog.functions
  * .ReducibleFunction]] (r19): when two tables' bucket counts differ but
  * divide (n=8 ⋈ n=4), the larger side's ids REDUCE by `mod smallerN` —
  * sound because `pmod(h, 8) % 4 == pmod(h, 4)` whenever 4 | 8 — so with
  * `spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled`
  * the join still plans exchange-free instead of falling back to a full
  * two-sided shuffle (the Iceberg bucket-reducer shape). The same
  * evaluable function powers
  * `spark.sql.sources.v2.bucketing.shuffle.enabled`: a join against an
  * UNBUCKETED side shuffles only that side into the bucketed layout. */
private[graft] final class GraftBoundBucket(input: StructType)
    extends ScalarFunction[Integer]
    with org.apache.spark.sql.connector.catalog.functions
      .ReducibleFunction[Integer, Integer] {

  override def reducer(thisNumBuckets: Int,
      otherFunction: org.apache.spark.sql.connector.catalog.functions
        .ReducibleFunction[_, _],
      otherNumBuckets: Int)
      : org.apache.spark.sql.connector.catalog.functions
        .Reducer[Integer, Integer] = {
    val sameFamily = otherFunction match {
      case b: GraftBoundBucket => b.canonicalName() == canonicalName()
      case _ => false
    }
    // reduce THIS side only when the other count strictly divides ours;
    // equal counts need no reduction, non-divisible counts shuffle
    if (sameFamily && thisNumBuckets != otherNumBuckets &&
        otherNumBuckets > 0 && thisNumBuckets % otherNumBuckets == 0)
      GraftBucketReducer(otherNumBuckets)
    else null
  }
  override def inputTypes(): Array[DataType] = input.fields.map(_.dataType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graftlake.bucket"
  override def isResultNullable: Boolean = false

  @transient private lazy val expr = {
    val refs = input.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }
    Pmod(new Murmur3Hash(refs.drop(1).toIndexedSeq), refs.head)
  }

  override def produceResult(row: InternalRow): Integer =
    expr.eval(row).asInstanceOf[Int]
}

/** Folds a larger bucket count onto a divisor count: `id % div`. A named
  * Serializable class (not an anonymous one) because Spark ships reducers
  * inside the key-grouped partitioning to executors. */
private[graft] final case class GraftBucketReducer(div: Int)
    extends org.apache.spark.sql.connector.catalog.functions
      .Reducer[Integer, Integer] with Serializable {
  override def reduce(v: Integer): Integer = Integer.valueOf(v.intValue % div)
}

/** A per-bucket file partition: all (splits of) files tagged `_%05d` with
  * this bucket id, keyed for Spark's key-grouped (storage-partitioned)
  * planning. Extends Spark's own [[FilePartition]] so the unmodified
  * parquet reader factory consumes it. */
private[graft] final class BucketFilePartition(
    index: Int, files: Array[PartitionedFile], val bucketId: Int)
    extends FilePartition(index, files) with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucketId)
}

/** [[ParquetScan]] over a bucket-laid-out table: identical read path
  * (vectorized reader, pushdown, `_dir` partition column), but input
  * partitions are grouped BY BUCKET ID — one partition per bucket,
  * empty buckets included so two same-`n` tables always align partition
  * lists — and the layout is reported as `KeyGroupedPartitioning`.
  * Also a [[RuntimeDirPruning]] scan (r19): a DPP key set prunes whole
  * directories through the manifest stats, with every bucket partition
  * kept (possibly file-less) so SPJ alignment survives the re-plan. */
private[graft] final class BucketedParquetScan(
    p: ParquetScan, val nBuckets: Int, val bucketCols: Seq[String],
    protected val rtDirs: Seq[String],
    protected val rtStats: Map[String, Map[String, ColStats]],
    protected val rtSchema: StructType)
    extends ParquetScan(p.sparkSession, p.hadoopConf, p.fileIndex,
      p.dataSchema, p.readDataSchema, p.readPartitionSchema,
      p.pushedFilters, p.options, p.pushedAggregate, p.partitionFilters,
      p.dataFilters, p.pushedVariantExtractions)
    with SupportsReportPartitioning with RuntimeDirPruning {

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(nBuckets, bucketCols: _*)), nBuckets)

  override def planInputPartitions(): Array[InputPartition] = {
    val files = super.partitions.flatMap(_.files)
    val byBucket = files.groupBy { f =>
      val name = f.toPath.getName
      BucketingUtils.getBucketId(name).getOrElse(
        throw new IllegalStateException(
          s"bucket-laid-out table has an untagged data file: $name — " +
          "the all-tagged invariant every committer preserves is broken"))
    }
    dropPrunedFiles((0 until nBuckets).map { b =>
      new BucketFilePartition(b,
        byBucket.getOrElse(b, Seq.empty).toArray, b)
    }.toArray[InputPartition], keepEmpty = true)
  }

  // distinct from an identically-configured plain scan (exchange/scan
  // reuse must not conflate grouped and ungrouped partition layouts)
  override def equals(obj: Any): Boolean = obj match {
    case o: BucketedParquetScan =>
      super.equals(o) && o.nBuckets == nBuckets && o.bucketCols == bucketCols
    case _ => false
  }
  override def hashCode(): Int =
    31 * super.hashCode() + (nBuckets, bucketCols).hashCode()
}

/** Scan builder for bucket-laid-out tables: full [[ParquetScanBuilder]]
  * pushdown (filters, column pruning, aggregate pushdown), with the
  * built scan upgraded to [[BucketedParquetScan]] when the layout is
  * servable — every listed file bucket-tagged below `n` (always true
  * under the manifest invariant; checked defensively) and no aggregate
  * pushdown (an agg-pushdown scan emits pre-aggregated rows whose
  * grouping no longer matches the bucket key). */
private[graft] class BucketedParquetScanBuilder(
    spark: SparkSession, index: PartitioningAwareFileIndex,
    fullSchema: StructType, dataSchema: StructType,
    options: CaseInsensitiveStringMap,
    nBuckets: Int, bucketCols: Seq[String],
    dirs: Seq[String] = Nil,
    stats: Map[String, Map[String, ColStats]] = Map.empty)
    extends ParquetScanBuilder(spark, index, fullSchema, dataSchema,
      options) {

  override def build(): ParquetScan = {
    val p = super.build()
    val servable = p.pushedAggregate.isEmpty &&
      index.allFiles().forall(f =>
        BucketingUtils.getBucketId(f.getPath.getName).exists(_ < nBuckets))
    if (servable)
      new BucketedParquetScan(p, nBuckets, bucketCols, dirs, stats,
        dataSchema)
    else p
  }
}
