package graft

import graft.sources.Readers
import graft.streaming.StreamingJobs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.{Files, Paths}

/** Source surface (SURVEY.md §2.4 #23-24): collection/file readers,
  * Kafka option builder, live streaming file source. */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("fromCollection and readText mirror fromCollection/readTextFile") {
    val ds = Readers.fromCollection(spark, Seq("a", "b", "c"))
    assert(ds.count() == 3)
    val dir = tmpDir("txt")
    Files.writeString(Paths.get(dir, "f.txt"), "hello\nworld\n")
    assert(Readers.readText(spark, dir).as[String].collect().sorted.toSeq ==
      Seq("hello", "world"))
  }

  test("readCsv parses headers and readParquet prunes columns") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "f.csv"), "id,name\n1,x\n2,y\n")
    val df = Readers.readCsv(spark, dir)
    assert(df.columns.toSeq == Seq("id", "name") && df.count() == 2)
    val lq = Readers.readParquet(spark, s"$sf/lineitem.parquet").select(col("l_orderkey"))
    // column pruning must reach the scan: only 1 column in ReadSchema
    val plan = lq.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && plan.contains("l_orderkey"))
    assert(!plan.contains("l_comment"))
  }

  test("kafka source options carry bootstrap/subscribe/offsets (SourceFromKafka analog)") {
    val opts = Readers.kafkaSourceOptions("broker:9092", "sensor", "earliest")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "sensor")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("failOnDataLoss") == "true")
  }

  test("kafkaSource resolves the connector or fails fast with an actionable error") {
    if (Readers.kafkaAvailable(spark)) {
      // connector deployed → the plan must build as a streaming source
      assert(Readers.kafkaSource(spark, "broker:9092", "sensor").isStreaming)
    } else {
      // this sandbox has no spark-sql-kafka jar: the builder must fail
      // at CONSTRUCTION with a deploy hint, not DATA_SOURCE_NOT_FOUND
      // at first load() deep inside a job
      val e = intercept[IllegalArgumentException] {
        Readers.kafkaSource(spark, "broker:9092", "sensor")
      }
      assert(e.getMessage.contains("spark-sql-kafka-0-10"))
    }
  }

  test("streaming file source drains a directory with bounded triggers") {
    val srcDir = tmpDir("fsrc")
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = Readers.fileStream(spark, srcDir, schema, maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.groupBy(col("tag")).count()
      .writeStream.format("memory").queryName("fsrc").outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(30000)
      assert(spark.table("fsrc").count() == 2)
    } finally if (q.isActive) q.stop()
  }
}
