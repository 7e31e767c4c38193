package graft

import graft.sinks.{Sinks, StoreRegistry}
import graft.sources.Readers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Checkpoint / exactly-once / restart-resume (SURVEY.md §2.4 #29,
  * reference CheckPointTest.scala:37): a streaming aggregation with a
  * checkpointLocation is stopped and restarted; offsets + state
  * resume, and the idempotent sink sees each input exactly once. */
class CheckpointSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming agg resumes from checkpoint after a stop/restart") {
    val srcDir = tmpDir("cksrc")
    val ckDir = tmpDir("ckpt")
    val store = StoreRegistry.kv("ck")

    def runOnce(): Unit = {
      val schema = spark.read.parquet(srcDir).schema
      val counts = Readers.fileStream(spark, srcDir, schema, maxFilesPerTrigger = 1)
        .groupBy(col("k")).agg(sum(col("v")).as("total"))
      val q = counts.writeStream
        .option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Update)
        .foreachBatch(Sinks.kvUpsertWriter(store, "k", "total"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      if (q.isActive) q.stop()
    }

    Seq(("a", 1L), ("b", 10L)).toDF("k", "v").write.mode("append").parquet(srcDir)
    runOnce()
    assert(store.get("a").contains("1") && store.get("b").contains("10"))

    // more data lands while the job is down; restart must resume state
    // (sums continue, not restart from zero) and not re-read old files
    Seq(("a", 2L), ("c", 100L)).toDF("k", "v").write.mode("append").parquet(srcDir)
    runOnce()
    assert(store.get("a").contains("3"), s"state must resume: got ${store.get("a")}")
    assert(store.get("b").contains("10"))
    assert(store.get("c").contains("100"))
    StoreRegistry.clear("ck")
  }
}
