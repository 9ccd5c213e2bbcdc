package graft

import graft.queue.{EventQueue, StreamSink}

/** Ingestion-façade throughput micro-bench — the number that compares to
  * the reference client's single-node capability (the reference publishes
  * none, BASELINE.md). Measures enqueue→validate→enrich→size→batch→flush
  * throughput against a null sink, i.e. the library overhead a producer
  * pays per event, excluding network (the reference's cost beyond this
  * point is one PutRecord RPC per batch, which the zero-egress environment
  * cannot exercise).
  *
  * Run: `sbt "runMain graft.QueueBench"` — prints one JSON line.
  */
object QueueBench {
  private final class NullSink extends StreamSink {
    @volatile var records = 0L
    @volatile var bytes = 0L
    override def putRecord(data: Array[Byte], partitionKey: String): Unit = {
      records += 1; bytes += data.length
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2_000_000)
    def pass(): (Double, Long, Long) = {
      val sink = new NullSink
      val q = EventQueue.withOriginAndMaxSize("bench", "graft-app", 1024, sink).get
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        q.enqueue(Map("event" -> "purchase", "user_id" -> (i % 1000),
                      "value" -> (i * 0.5), "k" -> "v")).get
        i += 1
      }
      q.flush().get
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, sink.records, sink.bytes)
    }
    pass() // warm-up: JIT the enqueue path
    val (secs, records, bytes) = pass()
    println(f"""{"events":$n,"secs":$secs%.3f,"events_per_sec":${(n / secs).toLong},"mb_per_sec":${bytes / secs / 1e6}%.1f,"batches":$records,"avg_batch_bytes":${bytes / math.max(records, 1)}}""")
  }
}
