package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet "lake" writer — the batch sink a 100 TB pipeline
  * actually uses between stages (persisting dedup signatures, enriched
  * events, features), as opposed to the per-record StreamSink of the
  * ingestion façade.
  *
  * Layout policy, all standard data-lake idioms:
  *  - directory-partitioned by a low-cardinality derived date column
  *    (`dt=yyyy-MM-dd`) so readers get partition pruning for free;
  *  - `repartition(partition cols)` before the write so each output
  *    directory is written by the tasks that own its rows — without it,
  *    every task writes a file into every partition (tasks × partitions
  *    small files, the classic lake pathology);
  *  - `maxRecordsPerFile` caps file size instead of a fixed file count,
  *    so the same writer works at any scale factor.
  */
object LakeSink {

  /** Write `df` date-partitioned on timestamp column `tsCol`.
    *
    * The pre-write repartition keys on (dt, bounded salt), not dt alone:
    * hashing only the low-cardinality date would funnel each entire day
    * into ONE task — a multi-TB day written single-threaded. The salt
    * gives every day up to `writersPerDay` parallel writers while still
    * bounding files per directory to `writersPerDay` (not tasks ×
    * partitions).
    */
  def writeByDay(df: DataFrame, tsCol: String, path: String,
                 maxRecordsPerFile: Long = 1000000L,
                 writersPerDay: Int = 4): Unit =
    // raw ts column, NOT pre-hashed: writeByKey applies the single xxhash64
    // (double-hashing would silently change writer-bucket assignment vs the
    // original pmod(xxhash64(ts), writers) layout)
    writeByKey(df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd")),
      "dt", col(tsCol), path, maxRecordsPerFile, writersPerDay)

  /** Generic form: partition directories by any low-cardinality column
    * (a language, a source, a corpus split — the partitions a training
    * pipeline reads selectively). Same layout policy as [[writeByDay]]:
    * salted repartition for up to `writersPerKey` parallel writers per
    * directory without the tasks×partitions small-file blow-up.
    * `saltExpr` must be a deterministic column expression with enough
    * cardinality to spread within a partition (a row id, a content hash).
    */
  def writeByKey(df: DataFrame, partCol: String, saltExpr:
                 org.apache.spark.sql.Column, path: String,
                 maxRecordsPerFile: Long = 1000000L,
                 writersPerKey: Int = 4): Unit =
    df.repartition(col(partCol),
        pmod(xxhash64(saltExpr), lit(writersPerKey.toLong)))
      .write
      .partitionBy(partCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Read back with partition pruning available on `dt`. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
