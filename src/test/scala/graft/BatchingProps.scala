package graft

import graft.queue._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** scalacheck property families (SURVEY §5.2 item 3): batching conservation,
  * FIFO, the pre-insert-flush invariant, counter clamp, ARN parsing, and
  * enrichment idempotence — each pinned to its reference behavior.
  */
object BatchingProps extends Properties("batching") {

  private val T0 = 1704067200000000L

  private val genEvent: Gen[Map[String, Any]] = for {
    name <- Gen.alphaLowerStr.map(s => "e" + s.take(8))
    pad  <- Gen.choose(0, 300)
  } yield Map("event" -> name, "pad" -> ("x" * pad))

  private val genEvents: Gen[List[Map[String, Any]]] =
    Gen.nonEmptyListOf(genEvent).map(_.take(60))

  private val genMax: Gen[Long] = Gen.choose(16L, 2048L)

  private def run(events: List[Map[String, Any]], max: Long)
      : (BufferedEventQueue, InMemorySink) = {
    val sink = new InMemorySink
    val q = EventQueue.withOpts("s", "", max, "app", "", sink, () => T0)
      .get.asInstanceOf[BufferedEventQueue]
    events.foreach(e => q.enqueue(e).get)
    (q, sink)
  }

  /** Conservation: enqueued items = flushed items + still-buffered items,
    * and the buffered byte counter equals the byte sum of buffered items
    * (drain decrements by re-measured size, main.go:303-304). */
  property("conservation") = forAll(genEvents, genMax) { (evs, max) =>
    val (q, sink) = run(evs, max)
    val flushedItems = sink.records().map(_._1.count(_ == '{')).sum
    flushedItems + q.bufferedCount == evs.length
  }

  /** FIFO: concatenating all flushed payloads + the final flush preserves
    * enqueue order of the `event` field (queue is FIFO, main.go:291-312). */
  property("fifo-order") = forAll(genEvents, genMax) { (evs, max) =>
    val (q, sink) = run(evs, max)
    q.flush().get
    val names = sink.records().map(_._1)
      .flatMap("\"event\":\"([^\"]*)\"".r.findAllMatchIn(_).map(_.group(1)))
    names == evs.map(_("event"))
  }

  /** Pre-insert-flush invariant: a flush is triggered only when the
    * pre-existing buffered bytes plus the incoming item's size reach the
    * threshold, and the trigger item always survives into the buffer
    * (main.go:208-228) — so after every enqueue the buffer is non-empty. */
  property("trigger-item-seeds-next-batch") = forAll(genEvents, genMax) { (evs, max) =>
    val sink = new InMemorySink
    val q = EventQueue.withOpts("s", "", max, "", "", sink, () => T0)
      .get.asInstanceOf[BufferedEventQueue]
    Prop.all(evs.map { e =>
      q.enqueue(e).get
      Prop(q.bufferedCount >= 1) :| "buffer non-empty after enqueue"
    }: _*)
  }

  /** Counter clamp: bufferedBytes never goes negative and is exactly the
    * sum of the buffered items' encoded sizes (clamp at main.go:307-309). */
  property("counter-clamp-and-exactness") = forAll(genEvents, genMax) { (evs, max) =>
    val (q, sink) = run(evs, max)
    val expected = {
      // re-derive: only items enqueued after the last flush are buffered
      val flushed = sink.records().map(_._1.count(_ == '{')).sum
      evs.drop(flushed)
        .map(e => Json.byteSize(EventQueue.enrichAndValidate(e, "app", T0).get))
        .sum
    }
    q.bufferedBytes >= 0 && q.bufferedBytes == expected
  }

  /** Batch payloads respect the threshold the way the reference does: each
    * record's item count is maximal — the batch plus its trigger item
    * reached the threshold (a batch alone may be under it). */
  property("flush-only-at-threshold") = forAll(genEvents, genMax) { (evs, max) =>
    val sink = new InMemorySink
    val q = EventQueue.withOpts("s", "", max, "", "", sink, () => T0)
      .get.asInstanceOf[BufferedEventQueue]
    // replay the reference's trigger rule independently: a flush happens
    // iff pre-size + item size reaches max AND the buffer is non-empty
    // (main.go:208-210) — the sink must see exactly those records.
    var predicted = 0
    evs.foreach { e =>
      val pre = q.bufferedBytes
      val sz = Json.byteSize(EventQueue.enrichAndValidate(e, "", T0).get)
      if (pre + sz >= max && pre > 0) predicted += 1
      q.enqueue(e).get
    }
    val emitted = sink.records().size
    (Prop(emitted == predicted)
      :| s"emitted $emitted records, trigger rule predicts $predicted") &&
      Prop(sink.records().forall(_._1.count(_ == '{') > 0))
  }

  /** ARN parsing (main.go:107-113): name/`/`-count round trip. */
  property("arn-round-trip") = forAll(Gen.identifier, Gen.identifier) { (acc, name) =>
    EventQueue.extractStreamNameFromArn(s"$acc/$name").get == name
  }
  property("arn-reject-wrong-shape") = forAll(Gen.identifier) { s =>
    EventQueue.extractStreamNameFromArn(s).isFailure &&
    EventQueue.extractStreamNameFromArn(s"a/b/$s").isFailure
  }

  /** Enrichment idempotence: enriching an already-enriched event with the
    * same clock/origin is a no-op (reference mutates in place; re-running
    * it overwrites with identical values, main.go:174-186). */
  property("enrichment-idempotent") = forAll(genEvent) { e =>
    val once = EventQueue.enrichAndValidate(e, "app", T0).get
    EventQueue.enrichAndValidate(once, "app", T0).get == once
  }

  /** Required-field rejection (main.go:175-177). */
  property("enrichment-rejects-missing-event") = forAll(Gen.identifier) { k =>
    EventQueue.enrichAndValidate(Map(("not_" + k) -> "v"), "", T0).isFailure
  }
}
