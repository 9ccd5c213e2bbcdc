package graft.queue

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The sink seam of the engine's ingestion façade — the Spark-side analog of
  * the reference's `KinesisQueue`'s underlying AWS client call
  * (`/root/reference/main.go:283` `PutRecord`). One `putRecord` = one
  * "record" whose payload is an entire batch serialized as a single JSON
  * array (`main.go:267-276`).
  *
  * Zero-egress environment → no real Kinesis connector; the seam keeps the
  * engine pluggable (a cluster deployment would drop in a connector-backed
  * implementation with the reference's ≤5-attempt retry, `main.go:165`).
  */
trait StreamSink {
  def putRecord(data: Array[Byte], partitionKey: String): Unit
}

/** Retry decorator — the engine analog of the reference's AWS client retry
  * policy (`/root/reference/main.go:165`, `RetryMaxAttempts(5)`): a
  * `putRecord` is attempted up to `maxAttempts` times TOTAL (first try
  * included, matching the AWS SDK's counting); only when the last attempt
  * fails does the error surface to the caller — which in the [[EventQueue]]
  * integration means `SendFailed` still carries the undelivered batch (the
  * round-3 upgrade is preserved, it just fires 5x less eagerly).
  *
  * Backoff is exponential from `baseBackoffMs` (100ms, 200ms, 400ms, ... —
  * the SDK's standard-mode shape without jitter, which matters for
  * deterministic tests), capped at `maxBackoffMs` so a large `maxAttempts`
  * can neither overflow the shift nor sleep unboundedly; `sleep` is
  * injectable so specs run instantly. Only `NonFatal` errors are retried:
  * an `InterruptedException` from a killed Spark task or a JVM error must
  * propagate immediately, not burn 4 more delivery attempts.
  * Delivery is at-least-once by construction: a failure AFTER the inner
  * sink durably wrote (e.g. a timeout on the ack) retries and duplicates —
  * same trade-off as the reference's SDK retry; the exactly-once variant is
  * the checkpointed streaming sink, not this decorator.
  */
final class RetryingSink(
    inner: StreamSink,
    maxAttempts: Int = 5,
    baseBackoffMs: Long = 100L,
    maxBackoffMs: Long = 20000L,
    sleep: Long => Unit = Thread.sleep) extends StreamSink {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")
  // The shift clamp below only prevents Long overflow while
  // baseBackoffMs << 30 stays positive; reject pathological bases up front
  // so the clamp's no-overflow claim holds for every constructor input.
  require(baseBackoffMs > 0 && baseBackoffMs <= maxBackoffMs,
    "baseBackoffMs must be in (0, maxBackoffMs]")
  override def putRecord(data: Array[Byte], partitionKey: String): Unit = {
    var attempt = 1
    var done = false
    while (!done) {
      try { inner.putRecord(data, partitionKey); done = true }
      catch {
        case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
          // shift clamped to 30 before the min so the Long never overflows
          sleep(math.min(maxBackoffMs,
            baseBackoffMs << math.min(attempt - 1, 30)))
          attempt += 1
      }
    }
  }
}

/** Local-filesystem sink: one file per record under `dir`, named by an
  * arrival sequence + the partition key, so payloads can be re-read in
  * arrival order by tests (SURVEY §5.2 item 4 end-to-end smoke).
  */
final class LocalSink(dir: String) extends StreamSink {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)
  Files.createDirectories(Paths.get(dir))
  override def putRecord(data: Array[Byte], partitionKey: String): Unit = {
    val n = seq.getAndIncrement()
    Files.write(Paths.get(dir, f"$n%06d-$partitionKey.json"), data,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
  /** Payloads in arrival order (test helper). Files.list holds an open
    * DirectoryStream — close it instead of leaking an fd per call. */
  def records(): Seq[String] = {
    val stream = Files.list(Paths.get(dir))
    try stream.iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .map(p => new String(Files.readAllBytes(p), "UTF-8"))
    finally stream.close()
  }
}

/** In-memory sink for unit/property tests (the repo's analog of the
  * reference's mockery mock, `/root/reference/mocks/KinesisQueue.go`). */
final class InMemorySink extends StreamSink {
  private val buf = new ConcurrentLinkedQueue[(String, String)]()
  @volatile var failNext: Boolean = false
  override def putRecord(data: Array[Byte], partitionKey: String): Unit = {
    if (failNext) { failNext = false; throw new RuntimeException("sink down") }
    buf.add((new String(data, "UTF-8"), partitionKey))
  }
  def records(): Seq[(String, String)] = buf.asScala.toSeq
}
