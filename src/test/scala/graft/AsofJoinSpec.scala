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
}
