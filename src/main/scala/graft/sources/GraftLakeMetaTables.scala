package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.BucketingUtils
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES (r19): every snapshot table exposes
  * driver-computed views of its own manifests as suffixed relations —
  *
  * {{{
  *   SELECT * FROM graftlake.`/t`.snapshots   -- commit history
  *   SELECT * FROM graftlake.`/t`.files       -- live data files
  *   SELECT * FROM graftlake.`/t`.tags        -- named refs
  *   SELECT * FROM graftlake.`/t`.stats       -- per-dir column stats
  * }}}
  *
  * planned as a [[LocalScan]] (`LocalTableScanExec`): the rows come
  * from the manifest (plus one FS listing for `files`) — no data I/O,
  * O(manifest) at any table size, and the result is an ordinary
  * DataFrame (joinable, filterable) rather than procedure output. A
  * REAL table whose path happens to end in a view name wins resolution
  * — the catalog only serves the view when no such table exists.
  */
private[graft] object GraftLakeMetaTables {

  val names: Set[String] =
    Set("snapshots", "files", "tags", "stats", "branches")

  private def ts(millis: Long): Any = millis * 1000L // micros internal

  def table(spark: SparkSession, parent: String, snap: Long,
            view: String): Table = view match {
    case "snapshots" =>
      val tags = SnapshotLake.tags(spark, parent)
        .groupBy(_._2).map { case (id, m) => id -> m.keys.toSeq.sorted }
      meta(s"$parent.snapshots", StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = false),
        StructField("n_dirs", IntegerType, nullable = false),
        StructField("n_directives", IntegerType, nullable = false),
        StructField("is_current", BooleanType, nullable = false),
        StructField("tags", ArrayType(StringType, containsNull = false),
          nullable = false))),
        SnapshotLake.snapshotTimes(spark, parent).sortBy(_._1).map {
          case (id, millis) => new GenericInternalRow(Array[Any](
            id, ts(millis),
            SnapshotLake.manifestDirs(spark, parent, id).length,
            SnapshotLake.manifestDirectives(spark, parent, id).length,
            id == snap,
            org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
              tags.getOrElse(id, Seq.empty).map(UTF8String.fromString)
                .toArray[Any]))): InternalRow
        })
    case "files" =>
      val conf = spark.sparkContext.hadoopConfiguration
      meta(s"$parent.files", StructType(Seq(
        StructField("dir", StringType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("size_bytes", LongType, nullable = false),
        StructField("bucket_id", IntegerType, nullable = true))),
        SnapshotLake.manifestDirs(spark, parent, snap).flatMap { d =>
          val p = new HPath(d)
          val fs = p.getFileSystem(conf)
          fs.listStatus(p).toSeq.collect {
            case st if st.isFile && !st.getPath.getName.startsWith("_") &&
                !st.getPath.getName.startsWith(".") =>
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(d),
                UTF8String.fromString(st.getPath.getName), st.getLen,
                BucketingUtils.getBucketId(st.getPath.getName)
                  .map(Integer.valueOf).orNull)): InternalRow
          }
        })
    case "tags" =>
      meta(s"$parent.tags", StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false))),
        SnapshotLake.tags(spark, parent).toSeq.sortBy(_._1).map {
          case (n, id) => new GenericInternalRow(Array[Any](
            UTF8String.fromString(n), id)): InternalRow
        })
    case "branches" =>
      meta(s"$parent.branches", StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("forked_from", LongType, nullable = false),
        StructField("head", LongType, nullable = false),
        StructField("root", StringType, nullable = false))),
        SnapshotLake.branches(spark, parent).toSeq.sortBy(_._1).map {
          case (n, (fork, head)) => new GenericInternalRow(Array[Any](
            UTF8String.fromString(n), fork, head,
            UTF8String.fromString(
              SnapshotLake.branchRoot(parent, n)))): InternalRow
        })
    case "stats" =>
      meta(s"$parent.stats", StructType(Seq(
        StructField("dir", StringType, nullable = false),
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("min", StringType, nullable = true),
        StructField("max", StringType, nullable = true))),
        StatsPrune.parse(SnapshotLake.manifestStats(spark, parent, snap))
          .toSeq.sortBy(_._1).flatMap { case (d, cols) =>
            cols.toSeq.sortBy(_._1).map { case (c, st) =>
              val (mn, mx) = st match {
                case n: DirColStats =>
                  (n.min.map(v => UTF8String.fromString(v.toString)),
                   n.max.map(v => UTF8String.fromString(v.toString)))
                case s: DirStrStats =>
                  (s.min.map(v => UTF8String.fromString(v.toString)),
                   s.max.map(v => UTF8String.fromString(v.toString)))
              }
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(d), UTF8String.fromString(c),
                st.rows, st.nulls, mn.orNull, mx.orNull)): InternalRow
            }
          })
    case other => throw new IllegalArgumentException(
      s"unknown graftlake metadata view '$other' — known: " +
        names.toSeq.sorted.mkString(", "))
  }

  /** A read-only table whose scan is the precomputed row set. Column
    * pruning/filtering happen ABOVE the LocalTableScan — fine at
    * manifest cardinality. */
  private def meta(tableName: String, tableSchema: StructType,
                   rowSeq: Seq[InternalRow]): Table =
    new Table with SupportsRead {
      override def name(): String = tableName
      override def schema(): StructType = tableSchema
      override def capabilities(): java.util.Set[TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap)
          : ScanBuilder = new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def rows(): Array[InternalRow] = rowSeq.toArray
          override def readSchema(): StructType = tableSchema
          override def description(): String =
            s"GraftLakeMetaTable($tableName, manifest-computed)"
        }
      }
    }
}
