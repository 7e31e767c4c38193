package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source builders (SURVEY.md §2.4).
  *
  * Re-expresses the reference's source surface:
  *  - fromCollection / fromElements / readTextFile (reference
  *    sourceTest/SourceFromListOrFile.scala:17) → `createDataset` /
  *    `spark.read`;
  *  - Kafka consumer with properties (SourceFromKafka.scala:22) →
  *    `readStream.format("kafka")`. No broker exists in this
  *    environment, so the option-map builder is the unit-tested part
  *    and [[kafkaSource]] applies it verbatim; file streams exercise
  *    the same streaming plan shape live;
  *  - custom SourceFunction generating readings (StateTest's
  *    MySensorSource) → `MemoryStream` in specs / `rate` source.
  *
  * Scale: file sources list+split in parallel and prune columns at
  * the scan (parquet). `maxFilesPerTrigger` bounds micro-batch size
  * so a 100 TB backlog drains in bounded-memory batches.
  */
object Readers {

  def fromCollection[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, data: Seq[T]): Dataset[T] =
    spark.createDataset(data)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The in-process generated order stream (reference
    * orderTest/OrderAnalysy.scala:338 `OrderSource extends
    * SourceFunction`) as a DataSourceV2 micro-batch source — see
    * [[OrderGen]]. Deterministic and replayable: the same offset
    * range always yields the same rows. */
  def orderStream(spark: SparkSession,
      maxOrders: Long = OrderGen.DefaultMaxOrders,
      rowsPerBatch: Long = 500L,
      startEpochMs: Long = OrderGen.DefaultStartEpochMs,
      numPartitions: Int = 4,
      minRowsPerBatch: Long = 0L): DataFrame =
    spark.readStream.format(classOf[OrderSourceProvider].getName)
      .option("maxOrders", maxOrders)
      .option("rowsPerBatch", rowsPerBatch)
      .option("startEpochMs", startEpochMs)
      .option("numPartitions", numPartitions)
      .option("minRowsPerBatch", minRowsPerBatch)
      .load()

  /** Kafka consumer options (reference SourceFromKafka.scala:22-28
    * builds Properties with bootstrap.servers/group.id/deserializers;
    * Spark's kafka source replaces deserializers with `CAST(value AS
    * STRING)` and group management with checkpointed offsets). */
  def kafkaSourceOptions(bootstrap: String, topic: String,
                         startingOffsets: String = "latest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      // exactly-once-friendly: fail rather than silently lose data
      "failOnDataLoss" -> "true")

  /** True iff the `kafka` streaming source resolves on this classpath
    * (Spark's own lookup, including provider aliases). The connector
    * ships separately from spark-sql, so a deployment can silently
    * lack it — callers use this to fail fast at build time. */
  def kafkaAvailable(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      true
    } catch { case _: Exception => false }

  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "latest"): DataFrame = {
    // Fail fast with an actionable message instead of Spark's
    // DATA_SOURCE_NOT_FOUND at first load() deep inside a job.
    require(kafkaAvailable(spark),
      "the 'kafka' data source is not on the classpath — deploy the " +
        "spark-sql-kafka-0-10 connector artifact matching your Spark version " +
        "(e.g. --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)")
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrap, topic, startingOffsets))
      .load()
  }

  /** Streaming file source over a directory (the live-tested analog of
    * the Kafka plan: same unbounded-scan node, bounded per trigger). */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
                 format: String = "parquet",
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .format(format)
      .load(path)
}
