package graft.operators

import graft.{ColumnInterpolator, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-state / process-function batch analogs (SURVEY.md §2.3).
  *
  * The reference keeps a per-key ValueState of the previous value and
  * emits an alarm on a large jump (reference StateTest/StateTest.scala:136,
  * StateTest3.scala:287 `flatMapWithState`), or registers a timer and
  * alarms on a sustained rise (processFunctionTest/ProcessAlarmTest.scala:850).
  * In batch, "previous value per key in event order" is exactly
  * `lag()` over a keyed window — a single shuffle by key, sorted
  * within partition, streaming-friendly at any scale because the
  * window is keyed (never global). The true streaming forms with
  * GroupState live in graft.streaming.StatefulJobs.
  */
object StateOps {

  private def keyed = eventOrder

  /** Jump alarm: |value − previous value| > 50 per key. */
  def stateJump(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("prev_value", lag($"value", 1).over(keyed))
      .filter($"prev_value".isNotNull && abs($"value" - $"prev_value") > 50.0)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        $"prev_value", $"value")
      .orderBy($"user_id", $"ts_us", $"event_id")

  /** Rising alarm: two consecutive rises within 24 hours — the
    * batch analog of the reference's register-timer-on-rise /
    * clear-on-fall pattern (ProcessAlarmTest.scala:858). */
  def risingAlarm(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("v1", lag($"value", 1).over(keyed))
      .withColumn("v2", lag($"value", 2).over(keyed))
      .withColumn("t2_us", lag($"ts_us", 2).over(keyed))
      .filter($"v2".isNotNull && $"value" > $"v1" && $"v1" > $"v2" &&
        $"ts_us" - $"t2_us" <= 86400000000L)
      .select($"user_id", $"event_id", $"ts_us", $"v2", $"v1", $"value")
      .orderBy($"user_id", $"ts_us", $"event_id")
}
