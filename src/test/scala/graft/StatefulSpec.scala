package graft

import graft.streaming.{CountWin, JumpAlarm, Reading, RiseAlarm, StatefulJobs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** flatMapGroupsWithState jobs (SURVEY.md §2.3 #20-21): ValueState
  * jump alarm and timer-based rising alarm. */
class StatefulSpec extends SparkTestBase {
  import spark.implicits._

  private def withEventTime(ds: org.apache.spark.sql.Dataset[Reading]) =
    ds.withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", "0 seconds")
      .as[Reading]

  test("jump alarm fires on |Δ|>threshold across micro-batches (ValueState analog)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Reading]
    val q = StatefulJobs.jumpAlarms(in.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("jump").outputMode(OutputMode.Append).start()
    try {
      in.addData(Reading("s1", 1, 20.0), Reading("s1", 2, 25.0))
      q.processAllAvailable()
      assert(spark.table("jump").count() == 0) // Δ=5, no alarm
      // state (last=25.0) must survive into the next micro-batch
      in.addData(Reading("s1", 3, 40.0), Reading("s2", 1, 5.0))
      q.processAllAvailable()
      val alarms = spark.table("jump").as[JumpAlarm].collect().toSet
      assert(alarms == Set(JumpAlarm("s1", 3, 25.0, 40.0)))
    } finally q.stop()
  }

  test("rising alarm fires on a sustained rise; a fall deletes the timer") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Reading]
    val q = StatefulJobs.risingAlarms(withEventTime(in.toDS()), holdUs = 10_000_000L)
      .writeStream.format("memory").queryName("rise").outputMode(OutputMode.Append).start()
    try {
      // rise at 5s interrupted by a fall at 8s → timer deleted, no alarm
      in.addData(Reading("s1", 1_000_000L, 1.0), Reading("s1", 5_000_000L, 2.0),
        Reading("s1", 8_000_000L, 0.5))
      q.processAllAvailable()
      assert(spark.table("rise").count() == 0)
      // new rise starts at 12s; still < hold at 19s
      in.addData(Reading("s1", 12_000_000L, 1.0), Reading("s1", 19_000_000L, 2.0))
      q.processAllAvailable()
      assert(spark.table("rise").count() == 0)
      // 25s extends the rise past the 10s hold → alarm [12s, 25s]
      in.addData(Reading("s1", 25_000_000L, 3.0))
      q.processAllAvailable()
      val alarms = spark.table("rise").as[RiseAlarm].collect()
      assert(alarms.map(a => (a.id, a.startUs, a.endUs)).toSet ==
        Set(("s1", 12_000_000L, 25_000_000L)))
    } finally q.stop()
  }

  test("jump alarm runs on the RocksDB state store (the at-scale state backend)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Reading]
    val q = StatefulJobs.jumpAlarms(in.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("jumprocks").outputMode(OutputMode.Append).start()
    try {
      in.addData(Reading("s1", 1, 20.0))
      q.processAllAvailable()
      in.addData(Reading("s1", 2, 40.0)) // state survives in RocksDB
      q.processAllAvailable()
      val alarms = spark.table("jumprocks").as[JumpAlarm].collect().toSet
      assert(alarms == Set(JumpAlarm("s1", 2, 20.0, 40.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming count window fires every N elements per key (countWindow analog)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Reading]
    val q = StatefulJobs.countWindows(in.toDS(), size = 2)
      .writeStream.format("memory").queryName("cwin").outputMode(OutputMode.Append).start()
    try {
      in.addData(Reading("s1", 1, 1.5), Reading("s1", 2, 2.5),
        Reading("s1", 3, 4.0), Reading("s2", 1, 7.0))
      q.processAllAvailable()
      // only s1's first bucket filled; s1's 3rd element and s2 pend in state
      assert(spark.table("cwin").as[CountWin].collect().toSet ==
        Set(CountWin("s1", 0L, 2L, 4_000_000L)))
      // partial buckets fill ACROSS micro-batches (state carries over)
      in.addData(Reading("s1", 4, 0.5), Reading("s2", 2, 1.0))
      q.processAllAvailable()
      assert(spark.table("cwin").as[CountWin].collect().toSet == Set(
        CountWin("s1", 0L, 2L, 4_000_000L),
        CountWin("s1", 1L, 2L, 4_500_000L),
        CountWin("s2", 0L, 2L, 8_000_000L)))
    } finally q.stop()
  }

  test("count window sums round negative half-µ values HALF_UP like the batch contract") {
    // -2.5 µ must round to -3 (away from zero, the Det.sumFixed /
    // Spark round(x, 0) contract), not -2 (math.round's toward-+∞) —
    // the ADVICE-flagged batch/stream divergence, now pinned
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Reading]
    val q = StatefulJobs.countWindows(in.toDS(), size = 2)
      .writeStream.format("memory").queryName("cwneg").outputMode(OutputMode.Append).start()
    try {
      in.addData(Reading("k", 1, -2.5e-6), Reading("k", 2, 0.0))
      q.processAllAvailable()
      assert(spark.table("cwneg").as[CountWin].collect().toSet ==
        Set(CountWin("k", 0L, 2L, -3L)))
    } finally q.stop()
  }

  test("rising alarm fires via event-time timeout when the key goes quiet (onTimer analog)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Reading]
    val q = StatefulJobs.risingAlarms(withEventTime(in.toDS()), holdUs = 10_000_000L)
      .writeStream.format("memory").queryName("riseq").outputMode(OutputMode.Append).start()
    try {
      in.addData(Reading("s1", 1_000_000L, 1.0), Reading("s1", 2_000_000L, 2.0))
      q.processAllAvailable() // rise starts at 2s; timer due at 12s
      // another key's events push the watermark past 12s → timeout fires
      in.addData(Reading("s2", 30_000_000L, 1.0))
      q.processAllAvailable()
      in.addData(Reading("s2", 40_000_000L, 0.5)) // one more batch delivers the timeout
      q.processAllAvailable()
      val alarms = spark.table("riseq").as[RiseAlarm].collect().filter(_.id == "s1")
      assert(alarms.map(a => (a.startUs, a.endUs)).toSet == Set((2_000_000L, 12_000_000L)))
    } finally q.stop()
  }
}
