package graft

import graft.operators.{JoinOps, Maintenance}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (SURVEY §2.6 #30c): the maintained
  * dashboard aggregate under TPC-H-refresh-style order inserts and
  * deletes must equal the from-scratch aggregation of the modified
  * table — digit for digit, including days that appear with the
  * inserts and days that vanish when their last order is deleted. */
class MaintenanceSpec extends SparkTestBase {
  import spark.implicits.newProductEncoder

  private def daily(df: org.apache.spark.sql.DataFrame) =
    JoinOps.orderDailyAgg(df).orderBy(col("order_day"))
      .as[(String, Long, Long)].collect().toSeq

  test("delta maintenance equals a from-scratch recompute of the modified table") {
    val orders = Tables.orders(spark, sf)
    // RF1: re-insert a disjoint slice under fresh keys (new orders);
    // RF2: delete a different slice of the existing table
    val base = orders.filter(col("o_orderkey") % 7 =!= 0L)
    val inserts = orders.filter(col("o_orderkey") % 7 === 0L)
    val deletes = base.filter(col("o_orderkey") % 5 === 0L)

    val maintained = Maintenance.applyOrdersDelta(
      JoinOps.orderDailyAgg(base), inserts, deletes)
      .orderBy(col("order_day")).as[(String, Long, Long)].collect().toSeq
    val recomputed = daily(base.except(deletes).unionByName(inserts))
    assert(maintained == recomputed,
      s"maintained view diverges: extra=${maintained.diff(recomputed).take(3)} " +
        s"missing=${recomputed.diff(maintained).take(3)}")
  }

  test("empty deltas are the identity; deleting a day's last order drops the day") {
    val orders = Tables.orders(spark, sf)
    val baseAgg = daily(orders)
    val none = orders.limit(0)
    val kept = Maintenance.applyOrdersDelta(JoinOps.orderDailyAgg(orders), none, none)
      .orderBy(col("order_day")).as[(String, Long, Long)].collect().toSeq
    assert(kept == baseAgg, "empty delta must be the identity")

    // delete EVERY order of the first day: the day must vanish,
    // exactly as a recompute would drop its group
    val firstDay = baseAgg.head._1
    val dayOrders = orders.filter(
      date_format(col("o_orderdate"), "yyyy-MM-dd") === firstDay)
    val after = Maintenance.applyOrdersDelta(
      JoinOps.orderDailyAgg(orders), none, dayOrders)
      .orderBy(col("order_day")).as[(String, Long, Long)].collect().toSeq
    assert(!after.exists(_._1 == firstDay), "emptied day must drop out")
    assert(after == baseAgg.tail, "all other days untouched")
  }

  test("a delta deleting rows the base never absorbed FAILS instead of vanishing") {
    // deleting the same day twice drives its maintained count
    // negative — a contract violation (RF2 deletes rows known to be
    // present); masking it as a clean disappearance would hide
    // upstream corruption, so the apply must throw
    val orders = Tables.orders(spark, sf)
    val baseAgg = JoinOps.orderDailyAgg(orders)
    val firstDay = daily(orders).head._1
    val dayOrders = orders.filter(
      date_format(col("o_orderdate"), "yyyy-MM-dd") === firstDay)
    val doubled = dayOrders.unionByName(dayOrders)
    val ex = intercept[Exception] {
      Maintenance.applyOrdersDelta(baseAgg, orders.limit(0), doubled).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("negative")),
      s"expected the negative-count raise_error, got: $ex")
  }
}
