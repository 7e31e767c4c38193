package graft

import graft.sources.Readers
import graft.streaming.StreamingJobs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Batch/stream parity: the SAME windowed aggregation over the SAME
  * events data must produce identical results whether it runs as a
  * batch plan (WindowOps-style) or as a Structured Streaming query
  * over a file stream — the property that lets one graft pipeline
  * serve both backfill (batch over 100 TB of history) and live
  * serving (streaming) without forked logic. */
class ParitySpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed agg over the events table equals the batch plan") {
    // batch side: tumbling 6h window totals per user
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("user_id"),
        col("cnt"), col("sum_value"))
      .as[(java.sql.Timestamp, Long, Long, Double)]
      .collect().toSet

    // streaming side: same plan over a file stream of the same parquet,
    // drained with AvailableNow; watermark long enough that nothing drops
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-stream sources read directories; stage the single file
    val dir = tmpDir("parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val raw = spark.read.parquet(dir)
    val stream = Tables.tsFromNanos(Readers.fileStream(spark, dir, raw.schema))
    val q = StreamingJobs.windowedCounts(stream, "3650 days", "6 hours")
      .writeStream.format("memory").queryName("parity")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("parity")
        .as[(java.sql.Timestamp, Long, Long, Double)]
        .collect().toSet
      // counts must match exactly; double sums up to summation-order
      // jitter (the oracle-gated queries use fixed-point for exactness)
      val bm = batch.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val sm = streamed.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(bm.keySet == sm.keySet,
        s"stream/batch key divergence: ${sm.size} vs ${bm.size} windows")
      bm.foreach { case (k, (cnt, s)) =>
        assert(sm(k)._1 == cnt, s"count mismatch at $k")
        assert(math.abs(sm(k)._2 - s) <= math.max(1e-9, math.abs(s) * 1e-12),
          s"sum mismatch at $k: ${sm(k)._2} vs $s")
      }
    } finally if (q.isActive) q.stop()
  }
}
