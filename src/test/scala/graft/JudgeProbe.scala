package graft

/** Throwaway judge probe: run a few failing keys and print the full error. */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.extensionsSession()
    import org.apache.spark.sql.functions._
    val ev = Tables.table(spark, "/root/testdata/sf0.01", "events")
    println("JUDGE schema: " + ev.schema.treeString)
    val fixed = ev.withColumn("ts", col("ts").cast("timestamp"))
    fixed.select(min("ts"), max("ts"), count(lit(1))).show(false)
    fixed.select(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("s"))
      .orderBy("s").limit(3).show(false)
    spark.stop()
  }
}
