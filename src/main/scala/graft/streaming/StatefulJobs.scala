package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for the stateful jobs (mirrors the reference's
  * SensorReading(id, timestamp, temperature)). */
case class Reading(id: String, tsUs: Long, value: Double)

/** Jump alarm emitted when a value changes by more than `threshold`
  * between consecutive readings of one key. */
case class JumpAlarm(id: String, tsUs: Long, prev: Double, value: Double)

/** Rising alarm: value rose continuously from `startUs` to `endUs`
  * (≥ the hold period). */
case class RiseAlarm(id: String, startUs: Long, endUs: Long)

/** One COMPLETED per-key count window (reference StateTest.scala:119
  * countWindow): bucket index, element count (== window size) and
  * fixed-point e6 value sum (the Det.sumFixed integer contract). */
case class CountWin(id: String, winIdx: Long, cnt: Long, sumValueE6: Long)

/** Keyed-state / timer jobs via `flatMapGroupsWithState`
  * (SURVEY.md §2.3) — the streaming-native forms of StateOps.
  *
  * Reference semantics re-expressed:
  *  - ValueState last-value jump alarm (reference
  *    StateTest/StateTest.scala:136, StateTest3.scala:287
  *    `flatMapWithState`): GroupState[Double] holds the previous
  *    value per key; emit when |Δ| > threshold.
  *  - KeyedProcessFunction + registerEventTimeTimer rising alarm
  *    (reference processFunctionTest/ProcessAlarmTest.scala:850):
  *    Flink registers a timer `hold` after the first rising reading
  *    and deletes it on a fall; the timer firing means "the value
  *    rose for the whole hold period". Spark analog: GroupState
  *    stores (lastValue, riseStartUs); a reading that extends the
  *    rise past the hold emits immediately, and
  *    GroupStateTimeout.EventTimeTimeout covers the quiet-key case —
  *    if no reading arrives but the watermark passes riseStart+hold,
  *    the timeout fires and emits (the Flink onTimer path).
  *
  * Scale: state is O(1) per key (two numbers), the input shuffles
  * once on the key, and watermark-driven timeouts expire state —
  * exactly the properties that keep a 1000-executor job stable.
  */
object StatefulJobs {

  /** Per-key state for [[risingAlarms]]; riseStartUs < 0 = not rising
    * (the "no timer registered" state). */
  case class RiseState(lastValue: Double, riseStartUs: Long)

  /** Per-key state for [[countWindows]]: the open (unfilled) bucket. */
  case class CountState(winIdx: Long, cnt: Long, sumE6: Long)

  /** Streaming keyed count window (reference StateTest.scala:119
    * countWindow comment; batch analog WindowOps.windowCount): every
    * `size` elements of a key emit one window, Flink tumbling-count
    * semantics — a window fires exactly when it fills, the trailing
    * partial stays in state (the batch form emits it because batch
    * input is bounded). Elements are ordered (tsUs, value) within a
    * micro-batch, same contract as the other stateful jobs.
    *
    * Scale: one shuffle on the key, state is O(1)/key (three longs) —
    * count windows never buffer elements because count+sum are the
    * only window functions we expose (any associative agg fits). */
  def countWindows(readings: Dataset[Reading], size: Int): Dataset[CountWin] = {
    implicit val winEnc = Encoders.product[CountWin]
    implicit val stateEnc = Encoders.product[CountState]
    implicit val keyEnc = Encoders.STRING
    readings
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (id: String, rows: Iterator[Reading], state: GroupState[CountState]) =>
          var cur = state.getOption.getOrElse(CountState(0L, 0L, 0L))
          val out = Seq.newBuilder[CountWin]
          rows.toSeq.sortBy(r => (r.tsUs, r.value)).foreach { r =>
            // roundHalfUp, not math.round: math.round takes -2.5 → -2
            // (toward +∞) while the batch/oracle Det.sumFixed contract
            // is HALF_UP away from zero (-2.5 → -3)
            cur = CountState(cur.winIdx, cur.cnt + 1,
              cur.sumE6 + graft.functions.VectorFunctions.roundHalfUp(r.value * 1e6))
            if (cur.cnt == size) {
              out += CountWin(id, cur.winIdx, cur.cnt, cur.sumE6)
              cur = CountState(cur.winIdx + 1, 0L, 0L)
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }

  def jumpAlarms(readings: Dataset[Reading], threshold: Double): Dataset[JumpAlarm] = {
    implicit val alarmEnc = Encoders.product[JumpAlarm]
    implicit val stateEnc = Encoders.scalaDouble
    implicit val keyEnc = Encoders.STRING
    readings
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (id: String, rows: Iterator[Reading], state: GroupState[Double]) =>
          // Micro-batches are unordered within a key; sort by event time
          // (same contract as the reference's per-record stream order).
          val sorted = rows.toSeq.sortBy(r => (r.tsUs, r.value))
          val out = Seq.newBuilder[JumpAlarm]
          var prev = state.getOption
          sorted.foreach { r =>
            prev.foreach { p =>
              if (math.abs(r.value - p) > threshold)
                out += JumpAlarm(id, r.tsUs, p, r.value)
            }
            prev = Some(r.value)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  def risingAlarms(readings: Dataset[Reading], holdUs: Long): Dataset[RiseAlarm] = {
    // A timeout timestamp must always be ≥ the watermark, and Spark
    // keeps the last one set; "no timer" is modeled as far-future.
    val FarFutureMs = Long.MaxValue / 2000L
    implicit val alarmEnc = Encoders.product[RiseAlarm]
    implicit val stateEnc = Encoders.product[RiseState]
    implicit val keyEnc = Encoders.STRING
    readings
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (id: String, rows: Iterator[Reading], state: GroupState[RiseState]) =>
          val out = Seq.newBuilder[RiseAlarm]
          if (state.hasTimedOut) {
            // Watermark passed riseStart+hold with no fall in between —
            // the Flink timer fired (ProcessAlarmTest.scala onTimer).
            state.getOption.filter(_.riseStartUs >= 0).foreach { s =>
              out += RiseAlarm(id, s.riseStartUs, s.riseStartUs + holdUs)
              state.update(RiseState(s.lastValue, -1L))
            }
            state.setTimeoutTimestamp(FarFutureMs)
          } else {
            var cur = state.getOption
            rows.toSeq.sortBy(r => (r.tsUs, r.value)).foreach { r =>
              cur = cur match {
                case Some(RiseState(last, start)) if r.value > last =>
                  val riseStart = if (start >= 0) start else r.tsUs
                  if (r.tsUs - riseStart >= holdUs) {
                    out += RiseAlarm(id, riseStart, r.tsUs)
                    Some(RiseState(r.value, r.tsUs)) // timer fired; re-arm
                  } else Some(RiseState(r.value, riseStart))
                case Some(_) => Some(RiseState(r.value, -1L)) // fall/flat: delete timer
                case None => Some(RiseState(r.value, -1L)) // first reading: no prev
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                if (s.riseStartUs >= 0) (s.riseStartUs + holdUs) / 1000L
                else FarFutureMs)
            }
          }
          out.result().iterator
      }
  }
}
