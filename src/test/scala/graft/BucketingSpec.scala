package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables (SURVEY.md §5): when both
  * fact tables are bucketed on the join key, the join needs NO
  * shuffle at all — at 100 TB this is the difference between moving
  * the fact table over the network per query and never moving it.
  * The spec writes bucketed copies of orders/lineitem and asserts the
  * join plan is exchange-free. */
class BucketingSpec extends SparkTestBase {

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      val s = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      if (s.isInstanceOf[ShuffleExchangeLike]) n += 1
      s.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  test("join of two tables bucketed on the key plans without any shuffle") {
    val wh = tmpDir("warehouse") // explicit per-table paths; the
    // static warehouse dir is irrelevant for path-based tables
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    // at test SF the dim is broadcastable, which would also be
    // shuffle-free; disable broadcast to force the bucket-aligned
    // sort-merge path (what a fact-fact join uses at 100 TB)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      joined.collect() // finalize AQE
      // allowed: 1 exchange for the final small aggregation; the JOIN
      // itself must be shuffle-free (bucket-aligned scan on both sides)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(countShuffles(joined) <= 1,
        s"bucketed join must not shuffle the fact tables:\n$plan")
      // sanity: same result as the unbucketed join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
