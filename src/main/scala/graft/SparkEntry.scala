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
    "q_window_tumbling" -> (WindowOps.windowTumbling _),
    "q_window_sliding" -> (WindowOps.windowSliding _),
    "q_window_day_offset" -> (WindowOps.windowDayOffset _),
    "q_window_count" -> (WindowOps.windowCount _),
    "q_session_window" -> (WindowOps.sessionWindow _),
    "q_state_jump" -> (StateOps.stateJump _),
    "q_rising_alarm" -> (StateOps.risingAlarm _),
    "q_order_daily" -> (JoinOps.orderDaily _),
    "q_order_nation" -> (JoinOps.orderNation _),
    "q_join_enrich" -> (JoinOps.joinEnrich _),
    "q_semi_join" -> (JoinOps.semiJoin _),
    "q_anti_join" -> (JoinOps.antiJoin _),
    "q_topn_window" -> (JoinOps.topnWindow _),
    "q_shipping_priority" -> (JoinOps.shippingPriority _),
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
    "q_window_tumbling" ->
      """SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS window_start_us, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window_sliding" ->
      """SELECT ws AS window_start_us, event_type, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6
        |FROM (
        |  SELECT (epoch_us(ts) // 21600000000) * 21600000000 - k.k * 21600000000 AS ws,
        |         event_type, value
        |  FROM events, (VALUES (0), (1), (2), (3)) k(k))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window_day_offset" ->
      """SELECT ((epoch_us(ts) - 57600000000) // 86400000000) * 86400000000 + 57600000000 AS window_start_us,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_count" ->
      """SELECT user_id, win_idx, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6
        |FROM (
        |  SELECT user_id, value,
        |    CAST((row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1) // 10 AS BIGINT) AS win_idx
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_session_window" ->
      """SELECT user_id, session_id, count(*) AS cnt,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_e6
        |FROM (
        |  SELECT user_id, value, ts_us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |      CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) IS NULL
        |             OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_state_jump" ->
      """SELECT user_id, event_id, ts_us, prev_value, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value
        |  FROM events)
        |WHERE prev_value IS NOT NULL AND abs(value - prev_value) > 50.0
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_rising_alarm" ->
      """SELECT user_id, event_id, ts_us, v2, v1, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
        |    lag(epoch_us(ts), 2) OVER w AS t2_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |WHERE v2 IS NOT NULL AND value > v1 AND v1 > v2 AND ts_us - t2_us <= 86400000000
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_order_daily" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
        |  count(*) AS total_num,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS total_money_e2
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_order_nation" ->
      """SELECT n_name, count(*) AS total_num,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS total_money_e2
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_enrich" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 45.0)
        |ORDER BY p_partkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_topn_window" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q_shipping_priority" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1, 2 ORDER BY revenue_e4 DESC, o_orderkey ASC LIMIT 20""".stripMargin,
  )
}
