package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.runtime.{MicroBatchExecution, StreamingQueryWrapper, WatermarkTracker}
import org.apache.spark.sql.streaming.StreamingQuery

/** Synchronous access to a running query's engine watermark.
  *
  * `WatermarkTracker.currentWatermark` is updated on the
  * stream-execution thread when a batch COMMITS — strictly before the
  * next batch's sink (`foreachBatch`) runs on that same thread — so a
  * read during batch N returns the watermark derived from batches
  * < N: exactly the boundary batch N's stateful operators drop late
  * rows on. Neither public alternative has that property:
  * `StreamingQueryListener` rides the async listener bus (batch N can
  * run before batch N-1's event is delivered), and
  * `lastProgress.eventTime("watermark")` reports the watermark USED
  * by the reported batch, so reading it in batch N yields batch N-1's
  * boundary — one batch stale (measured on Spark 4.1). The tracker
  * lives behind `private[sql]` types, hence this bridge. */
object StreamingBridge {
  // `watermarkTracker` is `protected` in MicroBatchExecution (Scala
  // protected compiles to a public bytecode accessor) — reached via
  // reflection; one call per micro-batch, cost irrelevant. The lookup
  // is version-sensitive: fail with the assumption spelled out rather
  // than a bare NoSuchMethodException inside someone's micro-batch.
  private lazy val trackerAccessor =
    try classOf[MicroBatchExecution].getMethod("watermarkTracker")
    catch {
      case e: NoSuchMethodException => throw new IllegalStateException(
        "graftbridge.StreamingBridge assumes Spark 4.1's " +
          "MicroBatchExecution.watermarkTracker accessor (StreamingSpec " +
          "pins the semantics); this Spark build renamed or moved it — " +
          "update StreamingBridge for the new runtime layout", e)
    }

  /** Engine watermark (epoch ms) the CURRENT micro-batch's stateful
    * operators use; None for non-microbatch queries. */
  def currentWatermarkMs(q: StreamingQuery): Option[Long] = q match {
    case w: StreamingQueryWrapper => w.streamingQuery match {
      case m: MicroBatchExecution =>
        Some(trackerAccessor.invoke(m).asInstanceOf[WatermarkTracker].currentWatermark)
      case _ => None
    }
    case _ => None
  }
}
