package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, ReadMinRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-process order-stream generator as a DataSourceV2
  * `MicroBatchStream` — the Spark twin of the reference's custom
  * `SourceFunction` (reference orderTest/OrderAnalysy.scala:338
  * `OrderSource`: up to 2000 orders, uuid order/user ids, one of six
  * provinces, amount = 10 + uniform[0,1) rounded to 2 decimals, one
  * order per 200 ms). Where the reference source is imperative and
  * non-replayable (wall clock + RNG), a Spark micro-batch source must
  * hand back the SAME rows for the same offset range on every replay
  * or checkpoint recovery breaks exactly-once — so every field is a
  * pure function of the order INDEX ([[OrderGen.rowAt]]: splitmix64
  * streams for ids/province/amount, event time = start + i·200 ms),
  * which also gives the spec a batch oracle: the stream's aggregate
  * state must equal a batch aggregation of [[OrderGen.frame]] over
  * the same index range, row for row.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.OrderSourceProvider")
  *     .option("maxOrders", 2000).load()
  * }}}
  *
  * Options: `maxOrders` (total rows, default 2000), `rowsPerBatch`
  * (micro-batch growth cap, default 500 — `Trigger.AvailableNow`
  * drains the backlog in bounded batches), `numPartitions` (split of
  * each batch, default 4), `startEpochMs` (event-time origin, default
  * 2024-01-01T00:00:00Z).
  *
  * Scale: the generator is a test/backfill fixture, but the shape is
  * the real one — offsets are a single long cursor, each batch plans
  * `numPartitions` independent readers, no driver-side row
  * materialization. */
object OrderGen {
  val Schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("order_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("province", StringType, nullable = false),
    StructField("amount", DoubleType, nullable = false)))

  /** The reference's province list (orderTest/OrderAnalysy.scala:343)
    * — 北京 twice, so it draws with double weight, as there. */
  val Provinces: IndexedSeq[String] =
    IndexedSeq("北京", "北京", "上海", "广州", "深圳", "天津")

  val DefaultMaxOrders = 2000L
  val DefaultStartEpochMs: Long = 1704067200000L // 2024-01-01T00:00:00Z
  val StepMs = 200L

  /** splitmix64 — the standard 64-bit finalizer; (index, stream) →
    * uniform bits, pure and stable across JVMs. */
  private def mix(i: Long, stream: Long): Long = {
    var z = i * 0x9e3779b97f4a7c15L + stream * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def uuidAt(i: Long, stream: Long): String =
    new util.UUID(mix(i, stream), mix(i, stream + 7)).toString

  /** Row i of the stream: (epoch-µs ts, order_id, user_id, province,
    * amount). amount = 10 + uniform[0,1) rounded HALF_UP to 2 decimals
    * (the reference's `"%.2f".format(nextDouble) + 10`). */
  def rowAt(i: Long, startEpochMs: Long = DefaultStartEpochMs):
      (Long, String, String, String, Double) = {
    val u01 = (mix(i, 3) >>> 11).toDouble / (1L << 53).toDouble
    val amount = math.round(u01 * 100.0).toDouble / 100.0 + 10.0
    val prov = Provinces(((mix(i, 5) >>> 1) % Provinces.size).toInt)
    ((startEpochMs + i * StepMs) * 1000L, uuidAt(i, 11), uuidAt(i, 23), prov, amount)
  }

  /** The same rows as a BATCH frame — the spec's oracle side and the
    * backfill twin (one row definition with the streaming reader). */
  def frame(spark: SparkSession, maxOrders: Long,
      startEpochMs: Long = DefaultStartEpochMs): DataFrame = {
    import spark.implicits.{newProductEncoder, newLongEncoder}
    spark.range(0L, maxOrders).as[Long]
      .map { i =>
        val (us, oid, uid, prov, amt) = rowAt(i, startEpochMs)
        (us, oid, uid, prov, amt)
      }
      .toDF("us", "order_id", "user_id", "province", "amount")
      .select(timestamp_micros(col("us")).as("ts"),
        col("order_id"), col("user_id"), col("province"), col("amount"))
  }
}

/** `format("graft.sources.OrderSourceProvider")` entry point. */
class OrderSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OrderGen.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OrderTable()
}

class OrderTable extends Table with SupportsRead {
  override def name(): String = "graft_orders"
  override def schema(): StructType = OrderGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxOrders = options.getLong("maxOrders", OrderGen.DefaultMaxOrders)
    val rowsPerBatch = options.getLong("rowsPerBatch", 500L)
    val numPartitions = options.getInt("numPartitions", 4)
    val startEpochMs = options.getLong("startEpochMs", OrderGen.DefaultStartEpochMs)
    val minRowsPerBatch = options.getLong("minRowsPerBatch", 0L)
    val maxTriggerDelayMs = options.getLong("maxTriggerDelayMs", 60000L)
    () => new OrderScan(maxOrders, rowsPerBatch, numPartitions, startEpochMs,
      minRowsPerBatch, maxTriggerDelayMs)
  }
}

class OrderScan(maxOrders: Long, rowsPerBatch: Long, numPartitions: Int,
    startEpochMs: Long, minRowsPerBatch: Long = 0L,
    maxTriggerDelayMs: Long = 60000L) extends Scan {
  override def readSchema(): StructType = OrderGen.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OrderMicroBatchStream(maxOrders, rowsPerBatch, numPartitions,
      startEpochMs, minRowsPerBatch, maxTriggerDelayMs)
}

/** Offset = count of orders emitted so far (a single long cursor —
  * the replayable stand-in for the reference source's mutable
  * `count`). */
case class OrderOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class OrderMicroBatchStream(maxOrders: Long, rowsPerBatch: Long,
    numPartitions: Int, startEpochMs: Long, minRowsPerBatch: Long = 0L,
    maxTriggerDelayMs: Long = 60000L) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  // STATELESS between triggers: the next end is a pure function of
  // the engine-supplied start offset, so checkpoint recovery and
  // Trigger.AvailableNow's drain-to-end loop both replay exactly
  override def initialOffset(): Offset = OrderOffset(0L)
  override def deserializeOffset(json: String): Offset =
    OrderOffset(json.trim.toLong)
  /** Default admission: a per-batch row cap; with `minRowsPerBatch`
    * set, a COMPOSITE of min-rows (don't fire a near-empty batch
    * before `maxTriggerDelayMs`) and max-rows (bound state growth) —
    * the rate-limited continuous shape Spark's own rate/kafka sources
    * expose. The engine hands whichever limit the trigger implies
    * back into [[latestOffset(start:*]], where [[admittedCap]] folds
    * the composite. */
  override def getDefaultReadLimit: ReadLimit =
    if (minRowsPerBatch > 0L)
      ReadLimit.compositeLimit(Array(
        ReadLimit.minRows(minRowsPerBatch, maxTriggerDelayMs),
        ReadLimit.maxRows(rowsPerBatch)))
    else ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")
  /** Rows admitted under a limit: max-rows caps, all-available lifts
    * the cap, min-rows is a trigger FLOOR, not a cap (the generator
    * always has backlog up to maxOrders, so the floor is satisfiable
    * immediately and the batch admits the source's own per-batch
    * default — or the floor itself when it exceeds that default),
    * and a composite folds member caps — the tightest max wins,
    * matching the engine's semantics (a composite is the conjunction
    * of its members). */
  private def admittedCap(limit: ReadLimit): Long = limit match {
    case r: ReadMaxRows => math.max(1L, r.maxRows())
    // bare min-rows carries no cap: admit the per-batch default once
    // the floor is met, never exactly the floor (r10 ADVICE — Spark's
    // min-rows semantics are "don't trigger before N", not "read N")
    case r: ReadMinRows => math.max(math.max(1L, r.minRows()), rowsPerBatch)
    case _: ReadAllAvailable => maxOrders
    case c: CompositeReadLimit =>
      val caps = c.getReadLimits.toSeq.collect {
        case r: ReadMaxRows => math.max(1L, r.maxRows())
        case _: ReadAllAvailable => maxOrders
      }
      if (caps.isEmpty) rowsPerBatch else caps.min
    case _ => rowsPerBatch
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[OrderOffset].n
    OrderOffset(math.min(maxOrders, s + admittedCap(limit)))
  }
  override def reportLatestOffset(): Offset = OrderOffset(maxOrders)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OrderOffset].n
    val e = end.asInstanceOf[OrderOffset].n
    val total = math.max(0L, e - s)
    val per = math.max(1L, (total + numPartitions - 1) / numPartitions)
    Iterator.range(0, numPartitions)
      .map(p => (s + p * per, math.min(e, s + (p + 1) * per)))
      .filter { case (a, b) => a < b }
      .map { case (a, b) => OrderRange(a, b, startEpochMs): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new OrderReaderFactory()
}

case class OrderRange(from: Long, until: Long, startEpochMs: Long)
    extends InputPartition

class OrderReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[OrderRange]
    new PartitionReader[InternalRow] {
      private var i = r.from - 1
      override def next(): Boolean = { i += 1; i < r.until }
      override def get(): InternalRow = {
        val (us, oid, uid, prov, amt) = OrderGen.rowAt(i, r.startEpochMs)
        InternalRow(us, UTF8String.fromString(oid), UTF8String.fromString(uid),
          UTF8String.fromString(prov), amt)
      }
      override def close(): Unit = ()
    }
  }
}
