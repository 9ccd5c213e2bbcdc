package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2.B (the query inventory) and
  * §7 (build plan). Each ops.QueryPack contributes its keys + oracle SQL.
  */
object SparkEntry {
  private lazy val packs: Seq[QueryPack] = Seq(
    Aggregates, Joins, Scans, ScalarFuncs, Windows, SortSetOps,
    Ingestion, StreamingOps, TextOps, UdfOps, PipelineOps, Lakehouse,
    Analytics, EvalOps, MiningOps
  )

  private lazy val allQueries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap
  private lazy val allOracles: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries("q_agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = allQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = allOracles
}
