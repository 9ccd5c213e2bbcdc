package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4's transformWithState — the modern arbitrary-state API (typed
  * state variables + RocksDB store) — running the same per-user byte
  * accumulator the EventQueue façade keeps, as a streaming operator: the
  * cluster-scale version of the reference's `currentSize` counter
  * (`/root/reference/main.go:29,208-228`), one state value per producer.
  */
/** Per-user running byte total with a batch-threshold flush counter —
  * pre-insert-flush semantics: an item that would cross the threshold
  * first "flushes" (increments the batch counter, resets the
  * accumulator), then seeds the next batch. Top-level: the processor is
  * serialized to tasks and must not capture the test suite.
  */
class SizeAccumulator extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {
  import SizeAccumulator.Threshold
  @transient private var cur: org.apache.spark.sql.streaming.ValueState[Long] = _
  @transient private var batches: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cur = getHandle.getValueState[Long]("cur",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
    batches = getHandle.getValueState[Long]("batches",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long, Long)] = {
    var c = Option(cur.get()).getOrElse(0L)
    var b = Option(batches.get()).getOrElse(0L)
    rows.foreach { case (_, sz) =>
      if (c + sz >= Threshold && c > 0) { b += 1; c = 0 } // pre-insert flush
      c += sz
    }
    cur.update(c); batches.update(b)
    Iterator.single((key, c, b))
  }
}
object SizeAccumulator { val Threshold = 100L }

class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transformWithState tracks the per-producer size accumulator") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Long)](spark)
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new SizeAccumulator, TimeMode.None(), OutputMode.Update())
    val q = out.toDF("user", "cur", "batches").writeStream
      .format("memory").queryName("tws_out").outputMode("update").start()
    try {
      input.addData(("u1", 40L), ("u1", 40L), ("u2", 10L))
      q.processAllAvailable()
      // u1: 40+40=80 (no flush yet); third 40 would cross 100 → flush first
      input.addData(("u1", 40L), ("u2", 10L))
      q.processAllAvailable()
      val last = spark.table("tws_out").groupBy("user")
        .agg(last_value(col("cur")).as("cur"), max("batches").as("b"))
        .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      assert(last("u1") == ((40L, 1L)), s"got $last") // flushed 80, seeded 40
      assert(last("u2") == ((20L, 0L)), s"got $last")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
