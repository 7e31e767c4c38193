package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._

/** As-of join semantics (the union+window carry-forward form): each
  * left row matches the greatest right time ≤ its own, equal times
  * match, left rows before any right row drop (inner), and the plan
  * stays single-shuffle-per-side (no range-join cross product). The
  * sf-scale behavior is separately oracle-gated against DuckDB's
  * native ASOF JOIN (q_asof_join). */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("matches greatest right time <= left time; equal time matches; early rows drop") {
    val left = Seq((1L, 5L, "e1"), (1L, 9L, "e2"), (1L, 2L, "e0"),
      (2L, 4L, "e3"), (3L, 8L, "e4"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 3L, 30L), (1L, 7L, 70L), (1L, 9L, 90L), (2L, 10L, 100L))
      .toDF("k", "t", "v")
    val out = JoinOps.asofJoin(left, right, "k", "t", "t_right")
      .select(col("k"), col("t"), col("ev"), col("t_right"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // e0 (t=2): no right row <= 2 → dropped (inner)
    // e3 (k=2, t=4): k=2's only right row is at 10, in the future → dropped
    // e4 (k=3): no right rows for the key at all → dropped
    assert(out == Set(
      (1L, 5L, "e1", 3L, 30L),  // greatest <= 5 is 3
      (1L, 9L, "e2", 9L, 90L)), // equal time matches
      s"got $out")
  }

  test("a NULL right payload value is preserved — never fused with a stale row") {
    // right (t=5) legitimately carries v=null; per-column
    // last(ignoreNulls) carry would emit (t=5, v=10) — a row that
    // never existed. The struct carry must yield (t=5, null).
    val left = Seq((1L, 6L, "e")).toDF("k", "t", "ev")
    val right = Seq((1L, 1L, Some(10L)), (1L, 5L, None)).toDF("k", "t", "v")
    val out = JoinOps.asofJoin(left, right, "k", "t", "t_right")
      .select(col("t_right"), col("v")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 5L && out(0).isNullAt(1),
      s"expected (5, null), got ${out(0)}")
  }

  test("payload-name collision is rejected up front") {
    val l = Seq((1L, 1L, 1L)).toDF("k", "t", "v")
    val r = Seq((1L, 1L, 2L)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](JoinOps.asofJoin(l, r, "k", "t", "m"))
    assert(e.getMessage.contains("disjoint"))
  }

  test("one shuffle for the window — no range-join cross product") {
    val left = Seq((1L, 5L, 10L)).toDF("k", "t", "lv")
    val right = Seq((1L, 3L, 30L)).toDF("k", "t", "rv")
    val plan = JoinOps.asofJoin(left, right, "k", "t", "mt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not fall back to a product join:\n$plan")
  }

  test("packed asofOrderEvents equals the generic asofJoin build row for row") {
    // the flagship query specializes the union-window shape with a
    // single-long ordering key and a single-long packed dim carry —
    // this pins that the packing is a pure plan optimization: the
    // generic operator over the same inputs yields the identical rows
    import graft.Tables
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val dim = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("user_id"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        graft.Det.sumFixed(col("o_totalprice"), 2).as("day_total_e2"))
    val generic = JoinOps.asofJoin(ev, dim, "user_id", "day", "order_day")
      .select(col("event_id"), col("user_id"), col("day").as("event_day"),
        col("order_day"), col("n_orders"), col("day_total_e2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    val packed = JoinOps.asofOrderEvents(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(packed.nonEmpty && packed == generic)
  }

  test("packed asof carry round-trips in domain and raises out of domain") {
    // the SAME expression the query uses (JoinOps.asofPackedCarry):
    // exact div/pmod round-trip across the domain corners, loud raise
    // just past each edge — silent wrap would corrupt an oracle-gated
    // answer
    val inDomain = Seq(
      (0L, 0L, 0L), (16383L, 511L, (1L << 40) - 1),
      (10957L, 3L, 123456789L))
    val df = inDomain.toDF("day", "n_orders", "day_total_e2")
      .select(JoinOps.asofPackedCarry(col("day"), col("n_orders"),
        col("day_total_e2")).as("p"))
      .select(expr("(p div 1099511627776) div 512").as("day"),
        expr("pmod(p div 1099511627776, 512)").as("n_orders"),
        expr("pmod(p, 1099511627776)").as("day_total_e2"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted == inDomain.sorted)
    for (bad <- Seq((1L << 14, 1L, 5L), (1L, 512L, 5L), (1L, 1L, 1L << 40), (-1L, 0L, 0L))) {
      val e = intercept[Exception](Seq(bad).toDF("day", "n_orders", "day_total_e2")
        .select(JoinOps.asofPackedCarry(col("day"), col("n_orders"),
          col("day_total_e2"))).collect())
      assert(e.getMessage.contains("packed domain") ||
        Option(e.getCause).exists(_.getMessage.contains("packed domain")),
        s"expected domain raise for $bad, got $e")
    }
  }

  test("window-form rangeEventBursts equals the generic rangeJoin build row for row") {
    // the flagship burst query serves per-event band AGGREGATES from a
    // native RANGE-frame window (one shuffle, no 3x replication); this
    // pins that it answers exactly what the generic bucketed rangeJoin
    // + self-filter + groupBy build answers on the same inputs
    import graft.Tables
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("value"))
    val left = ev.select(col("event_id"), col("user_id"), col("t"))
    val right = ev.select(col("user_id"), col("t"),
      col("event_id").as("nbr_id"), col("value"))
    val generic = JoinOps.rangeJoin(left, right, "user_id", "t", JoinOps.BurstBandUs)
      .filter(col("nbr_id") =!= col("event_id"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        graft.Det.sumFixed(col("value"), 6).as("nbr_value_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val windowed = JoinOps.rangeEventBursts(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(windowed.nonEmpty && windowed == generic)
  }

  test("rangeJoin pairs exactly the rows within the band, once each") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 7L, 70L), (1L, 13L, 130L), (1L, 14L, 140L),
      (2L, 30L, 300L)).toDF("k", "t", "rv")
    val out = JoinOps.rangeJoin(left, right, "k", "t", band = 3L)
      .select(col("lv"), col("rv"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a(t=10): 7 and 13 within ±3; 14 is 4 away. b(t=20): none within ±3
    // of {7,13,14}... 17..23 → none. c(k=2,t=10): 30 is 20 away → none.
    assert(out.sorted.toSeq == Seq(("a", 70L), ("a", 130L)), s"got ${out.toSeq}")
    // each qualifying pair appears exactly once despite 3× replication
    assert(out.length == out.distinct.length)
  }

  test("asofJoin equals brute force on seeded random inputs") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val left = Seq.fill(40)(
        (rnd.nextInt(5).toLong, rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong))
      val right = Seq.fill(40)((rnd.nextInt(5).toLong, rnd.nextInt(30).toLong))
        .distinct // one right row per (key, time) — the caller contract
        .map { case (k, t) => (k, t, rnd.nextInt(1000).toLong) }
      val got = JoinOps.asofJoin(left.toDF("k", "t", "lv"),
          right.toDF("k", "t", "rv"), "k", "t", "mt")
        .select(col("k"), col("t"), col("lv"), col("mt"), col("rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      val expect = left.flatMap { case (k, t, lv) =>
        val cand = right.filter(rr => rr._1 == k && rr._2 <= t)
        if (cand.isEmpty) None
        else { val m = cand.maxBy(_._2); Some((k, t, lv, m._2, m._3)) }
      }.sorted
      assert(got == expect, s"round $round")
    }
  }

  test("rangeJoin equals brute force on seeded random inputs") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 3) {
      val band = 1L + rnd.nextInt(7)
      val left = Seq.fill(40)(
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      val right = Seq.fill(40)(
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      val got = JoinOps.rangeJoin(left.toDF("k", "t", "lv"),
          right.toDF("k", "t", "rv"), "k", "t", band)
        .select(col("k"), col("t"), col("lv"), col("t_r"), col("rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      val expect = (for {
        (k, t, lv) <- left
        (k2, t2, rv) <- right
        if k == k2 && math.abs(t - t2) <= band
      } yield (k, t, lv, t2, rv)).sorted
      assert(got == expect, s"round $round band=$band")
    }
  }

  test("rangeJoin plan is an equi join — no nested-loop product") {
    val left = Seq((1L, 5L, 10L)).toDF("k", "t", "lv")
    val right = Seq((1L, 3L, 30L)).toDF("k", "t", "rv")
    val plan = JoinOps.rangeJoin(left, right, "k", "t", band = 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay equi-bucketed:\n$plan")
  }
}
