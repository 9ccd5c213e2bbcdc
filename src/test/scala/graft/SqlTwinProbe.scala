package graft

/** Scratch probe (not a spec): for every §2.B key with no SqlParitySpec
  * twin yet, try the key's DuckDB oracle SQL verbatim through `spark.sql`
  * over the fixture temp views and report whether it (a) parses/runs and
  * (b) matches the DSL result row-for-row with identical column names.
  * Output drives which keys can reuse their oracle as the Spark twin.
  */
object SqlTwinProbe {
  def main(args: Array[String]): Unit = {
    val covered = Set(
      "q_filter", "q_join_inner", "q_agg_groupby", "q_window_rank",
      "q_union_distinct", "q_string_funcs", "q_tumbling_window",
      "q_dedup_exact", "q_split_sample", "q_stratified_sample",
      "q_dedup_incremental", "q_token_budget", "q_grouping_sets", "q_pivot",
      "q_median_mode", "q_doc_chunk", "q_window_frame_range", "q_rollup",
      "q_agg_percentiles", "q_interval_arith", "q_date_spine",
      "q_topk_per_group", "q_sessionize", "q_pmi_bigrams", "q_event_enrich",
      "q_expr_go_ts", "q_unpivot", "q_agg_filtered", "q_scalar_subquery",
      "q_join_asof", "q_correlated_subquery", "q_window_ignore_nulls",
      "q_repetition_score", "q_funnel", "q_zorder", "q_null_semantics")

    val spark = TestSpark.extensionsSession()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      Tables.table(spark, TestSpark.Sf0001, t).createOrReplaceTempView(t)
    Tables.events(spark, TestSpark.Sf0001).createOrReplaceTempView("events")

    val keys = SparkEntry.queries.keySet.diff(covered).toSeq.sorted
    val results = keys.map { k =>
      SparkEntry.oracleSql.get(k) match {
        case None => k -> "NO_ORACLE"
        case Some(sql) =>
          try {
            val dsl = SparkEntry.queries(k)(spark, TestSpark.Sf0001)
            val viaSql = spark.sql(sql)
            if (dsl.columns.toSeq != viaSql.columns.toSeq)
              k -> s"COLS dsl=${dsl.columns.mkString(",")} sql=${viaSql.columns.mkString(",")}"
            else {
              val a = dsl.collect().toSeq
              val b = viaSql.collect().toSeq
              if (a.size != b.size) k -> s"ROWS ${a.size} vs ${b.size}"
              else a.zip(b).find { case (x, y) => x != y } match {
                case Some((x, y)) => k -> s"DIFF $x | $y"
                case None => k -> "OK"
              }
            }
          } catch {
            case e: Throwable =>
              k -> s"ERR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160)}"
          }
      }
    }
    results.foreach { case (k, st) => println(s"PROBE\t$k\t$st") }
    val ok = results.count(_._2 == "OK")
    println(s"PROBE_SUMMARY OK=$ok of ${results.size}")
    spark.stop()
  }
}
