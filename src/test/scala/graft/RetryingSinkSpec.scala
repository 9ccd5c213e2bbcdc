package graft

import graft.queue._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Failure

/** [[RetryingSink]] — the analog of the reference's ≤5-attempt AWS client
  * retry (`/root/reference/main.go:165`). Pins: total-attempt counting,
  * exactly-once delivery on transient recovery, exponential backoff shape,
  * and the surviving `SendFailed`-carries-batch contract when all attempts
  * are exhausted.
  */
class RetryingSinkSpec extends AnyFunSuite {

  /** Inner sink that fails the first `failures` putRecord calls. */
  private final class FlakySink(var failures: Int) extends StreamSink {
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var attempts = 0
    override def putRecord(data: Array[Byte], partitionKey: String): Unit = {
      attempts += 1
      if (failures > 0) { failures -= 1; throw new RuntimeException("transient") }
      delivered += ((new String(data, "UTF-8"), partitionKey))
    }
  }

  test("transient failures are retried and the record is delivered ONCE") {
    val inner = new FlakySink(failures = 2)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink = new RetryingSink(inner, maxAttempts = 5, sleep = ms => sleeps += ms)
    sink.putRecord("payload".getBytes("UTF-8"), "pk")
    assert(inner.attempts == 3)
    assert(inner.delivered.map(_._1) == Seq("payload"))
    // exponential, no jitter: 100ms then 200ms
    assert(sleeps.toSeq == Seq(100L, 200L))
  }

  test("attempt counting is TOTAL (AWS SDK style): 5 means 4 retries") {
    val inner = new FlakySink(failures = Int.MaxValue)
    val sink = new RetryingSink(inner, maxAttempts = 5, sleep = _ => ())
    intercept[RuntimeException](sink.putRecord(Array[Byte](1), "pk"))
    assert(inner.attempts == 5)
  }

  test("maxAttempts=1 never retries (decorator can be configured away)") {
    val inner = new FlakySink(failures = 1)
    val sink = new RetryingSink(inner, maxAttempts = 1, sleep = _ => ())
    intercept[RuntimeException](sink.putRecord(Array[Byte](1), "pk"))
    assert(inner.attempts == 1)
  }

  test("a success on the final attempt is still a success") {
    val inner = new FlakySink(failures = 4)
    val sink = new RetryingSink(inner, maxAttempts = 5, sleep = _ => ())
    sink.putRecord("p".getBytes("UTF-8"), "pk")
    assert(inner.attempts == 5 && inner.delivered.size == 1)
  }

  test("through EventQueue: exhausted retries surface SendFailed WITH the batch") {
    val inner = new FlakySink(failures = Int.MaxValue)
    val sink = new RetryingSink(inner, maxAttempts = 5, sleep = _ => ())
    val q = EventQueue.withOpts("s", "", 1024, "", "", sink,
      () => 1704067200000000L).get
    assert(q.enqueue(Map("event" -> "a")).isSuccess) // buffered, no send yet
    val Failure(e: SendFailed) = q.flush()
    assert(e.batch.size == 1 && e.batch.head("event") == "a")
    assert(inner.attempts == 5) // the retry happened underneath the façade
  }

  test("through EventQueue: a flaky sink recovers invisibly to the caller") {
    val inner = new FlakySink(failures = 1)
    val sink = new RetryingSink(inner, maxAttempts = 5, sleep = _ => ())
    val q = EventQueue.withOpts("s", "", 1024, "", "", sink,
      () => 1704067200000000L).get
    assert(q.enqueue(Map("event" -> "a")).isSuccess)
    assert(q.flush().isSuccess)
    assert(inner.delivered.size == 1) // one record, despite the retry
  }
}
