package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.LongType

/** Table loaders over the driver-generated parquet star schema.
  *
  * Plans stay declarative: callers `select` only the columns they
  * need, so Catalyst prunes the parquet `ReadSchema` and pushes
  * filters into the scan — at 100 TB the scan cost is the game.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read it as raw nanos and rebuild a µs TimestampType
    * column. Session-wide side effect by necessity: the nanosAsLong
    * flag must be on when the parquet footer is decoded, and it only
    * changes behavior for TIMESTAMP(NANOS) columns that would
    * otherwise throw. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsFromNanos(table(s, d, "events"))
  }

  /** Normalize the `ts` column to a µs TimestampType, whatever the
    * parquet writer produced. Three shapes appear across testdata
    * generations: a standard µs TIMESTAMP (pass through), a µs
    * TIMESTAMP_NTZ (isAdjustedToUTC=false — the session timezone is
    * pinned to UTC, so the cast relabels the same instant), and a
    * TIMESTAMP(NANOS) read as raw nanos long (the data is µs-grain,
    * so `div 1000` is exact). Shared by [[events]] and any streaming
    * read of the same files. */
  def tsFromNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Cross-engine determinism helpers (SURVEY.md §4).
  *
  * Cross-row floating-point SUM is summation-order-dependent, so any
  * aggregated money/measure is scaled to an integer per row first;
  * integer addition is associative and hash-matches DuckDB exactly.
  * Per-row IEEE double arithmetic (mul/sub/round) is deterministic
  * across engines, so the pre-scaling expression is safe.
  */
object Det {
  /** round(x * 10^e) as BIGINT — exact-summable fixed-point. */
  def toFixed(c: Column, e: Int): Column =
    round(c * math.pow(10, e), 0).cast(LongType)

  def sumFixed(c: Column, e: Int): Column = sum(toFixed(c, e))
}
