package graft.jobs

import graft.sinks.{KvStore, Sinks}
import graft.sources.Readers
import graft.streaming.{Restarts, StreamingJobs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's flagship end-to-end job re-expressed Spark-first:
  * the "double-11 order dashboard" (reference
  * orderTest/OrderAnalysy.scala:400-580 — Kafka order stream →
  * windowed global totals + per-province totals → MySQL upsert
  * dashboard, exactly-once via checkpoints).
  *
  * Composition of the library's pieces:
  *  - source: Kafka in production ([[Readers.kafkaSource]]); any
  *    directory of order files for backfill/testing
  *    ([[Readers.fileStream]]) — same downstream plan either way;
  *  - transform: [[StreamingJobs.orderDashboard]] — watermarked daily
  *    window per province, integer money (map-side partial agg);
  *  - sink: [[Sinks.mergeUpsertWriter]] keyed by (day, province) —
  *    idempotent upsert, so checkpointed replay is exactly-once;
  *  - resilience: [[Restarts.fixedDelay]] around the checkpointed
  *    query (the reference's RestartStrategies).
  *
  * At 100 TB/day: the only shuffle is the aggregation (keys =
  * days × provinces — tiny); state is bounded by the watermark; the
  * sink writes O(keys) rows per trigger from executors.
  */
object OrderDashboard {

  /** Expected order-stream schema: ts TIMESTAMP, province STRING,
    * amount DOUBLE. */
  def run(spark: SparkSession, sourceDir: String, schema: StructType,
          store: KvStore, checkpoint: String, delay: String = "1 day",
          maxRestarts: Int = 3): Int =
    Restarts.fixedDelay(maxRestarts, delayMs = 1000) { () =>
      val orders = Readers.fileStream(spark, sourceDir, schema)
      StreamingJobs.orderDashboard(orders, delay)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .outputMode(OutputMode.Update)
        .foreachBatch(Sinks.mergeUpsertWriter(store,
          Seq("order_day", "province"), Seq("total_num", "total_money_e2")))
        .trigger(Trigger.AvailableNow())
        .start()
    }
}
