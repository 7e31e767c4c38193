package graft.operators

import graft.ColumnInterpolator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance (SURVEY §2.6 #30c) — the TPC-H
  * refresh-stream shape (RF1 order inserts / RF2 order deletes)
  * applied to a MAINTAINED aggregate instead of a recompute: the
  * nightly dashboard table absorbs a day's delta without ever
  * rescanning the 100 TB fact history.
  *
  * Correctness rests on the aggregate being a group-keyed commutative
  * monoid (counts and integer sums — exactly the SURVEY §4
  * determinism contract): new = old ⊕ agg(inserts) ⊖ agg(deletes),
  * merged group-by-group. Deletes are passed as the deleted ROWS
  * (the RF2 contract: the refresh function knows which orders it
  * removes), so the subtraction is the same aggregation negated —
  * one delta-sized shuffle per side; the base aggregate is joined,
  * never rebuilt.
  */
object Maintenance {

  /** Apply an orders delta to a maintained #30 daily-totals frame.
    *
    * `base` must have the `orderDailyAgg` schema
    * (order_day, total_num, total_money_e2); `inserted` / `deleted`
    * are orders-shaped frames (either may be empty). A day whose
    * count reaches zero drops out of the view, exactly as a
    * recompute would drop it. The aggregation rule is the SHARED
    * [[JoinOps.orderDailyAgg]] — one definition for the batch
    * report, the streaming dashboard, and this maintenance path.
    *
    * Scale shape: two delta-sized partial-agg'd shuffles, one
    * |days|-keyed full-outer merge (the view is bounded by the
    * calendar; AQE broadcasts the delta side), zero base-fact I/O. */
  def applyOrdersDelta(base: DataFrame, inserted: DataFrame,
      deleted: DataFrame): DataFrame = {
    val plus = JoinOps.orderDailyAgg(inserted)
      .select($"order_day", $"total_num".as("d_num"),
        $"total_money_e2".as("d_money"))
    val minus = JoinOps.orderDailyAgg(deleted)
      .select($"order_day", (-$"total_num").as("d_num"),
        (-$"total_money_e2").as("d_money"))
    val delta = plus.unionByName(minus)
      .groupBy($"order_day")
      .agg(sum($"d_num").as("d_num"), sum($"d_money").as("d_money"))
    base
      .join(delta, Seq("order_day"), "full_outer")
      .select($"order_day",
        (coalesce($"total_num", lit(0L)) + coalesce($"d_num", lit(0L)))
          .as("total_num"),
        (coalesce($"total_money_e2", lit(0L)) + coalesce($"d_money", lit(0L)))
          .as("total_money_e2"))
      // == 0 is a legitimate drop (every order of the day deleted,
      // exactly as a recompute would drop it); < 0 means the delta
      // deleted rows the base never absorbed — upstream corruption
      // that silently masking as a clean disappearance would hide, so
      // it FAILS the job instead (the raise_error lives inside the
      // keep-rule itself, where no plan rewrite can skip it)
      .filter(
        when($"total_num" > 0L, lit(true))
          .when($"total_num" === 0L, lit(false))
          .otherwise(raise_error(concat(
            lit("applyOrdersDelta: maintained count went negative ("),
            $"total_num".cast("string"), lit(") for "),
            $"order_day".cast("string"),
            lit(" — delete delta not present in the base")))))
  }
}
