package graft

/** Scratch probe (not a spec): for every §2.B key not yet covered by the
  * parity gate (covered = SqlParityKeys.handTwins ∪ oracleReuse — derived,
  * not hardcoded; ADVICE r9 item 1), try the key's DuckDB oracle SQL
  * verbatim through `spark.sql` over the fixture temp views and report
  * whether it (a) parses/runs and (b) matches the DSL result with
  * identical column names. `ORDER_ONLY` marks results equal as multisets
  * but not in iteration order (needs an ORDER BY, not a rewrite — ADVICE
  * r9 item 2); `DIFF` is a genuine value mismatch. Output drives which
  * exempt keys can graduate to oracleReuse vs need a hand twin.
  */
object SqlTwinProbe {
  def main(args: Array[String]): Unit = {
    val covered = SqlParityKeys.covered

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
              else if (a == b) k -> "OK"
              else {
                val as = a.sortBy(_.toString)
                val bs = b.sortBy(_.toString)
                if (as == bs) k -> "ORDER_ONLY"
                else as.zip(bs).find { case (x, y) => x != y } match {
                  case Some((x, y)) => k -> s"DIFF $x | $y"
                  case None => k -> "OK"
                }
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
