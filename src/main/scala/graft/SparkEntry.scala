package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry
  * (a lazy plan builder `(spark, sfDir) => DataFrame`) and, where the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle in `oracleSql`
  * with identical column names/ordering (SURVEY.md §4 determinism
  * contract: fixed-point integer aggregation, total ORDER BY).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (CoreOps.q1Agg _),
    "q_wordcount" -> (CoreOps.wordCount _),
    "q_map_filter" -> (CoreOps.mapFilter _),
    "q_keyed_sum" -> (CoreOps.keyedSum _),
    "q_keyed_minmax" -> (CoreOps.keyedMinMax _),
    "q_minby" -> (CoreOps.minBy _),
    "q_reduce_running" -> (CoreOps.reduceRunning _),
    "q_split_select" -> (CoreOps.splitSelect _),
    "q_union_connect" -> (CoreOps.unionConnect _),
    "q_side_output" -> (CoreOps.sideOutput _),
    "q_json_extract" -> (CoreOps.jsonExtract _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_base_e2,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "q_map_filter" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE value >= 50.0 AND event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_keyed_sum" ->
      """SELECT user_id, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_keyed_minmax" ->
      """SELECT user_id, min(value) AS min_value, max(value) AS max_value,
        |  count(*) AS cnt
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_minby" ->
      """SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_reduce_running" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  count(*) OVER w AS running_cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) OVER w AS BIGINT) AS running_sum_e6
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_split_select" ->
      """SELECT CASE WHEN value >= 80.0 THEN 'high'
        |            WHEN value >= 50.0 THEN 'mid' ELSE 'low' END AS severity,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_union_connect" ->
      """SELECT * FROM (
        |  SELECT user_id, event_id, 'error' AS tag FROM events WHERE value >= 80.0
        |  UNION ALL
        |  SELECT user_id, event_id, 'warn' AS tag FROM events WHERE value >= 50.0 AND value < 80.0
        |) ORDER BY event_id""".stripMargin,
    "q_side_output" ->
      """SELECT event_id, user_id, event_type, value, 'hot' AS tag
        |FROM events WHERE value > 90.0 ORDER BY event_id""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
  )
}
