package graft

import graft.operators.RollupViews
import org.apache.spark.sql.functions._

/** The per-order and per-customer rollup views (#155): each served
  * artifact must be row-for-row its defining aggregation, build once
  * per source fingerprint, and follow a rewritten source — six
  * oracle-gated reports serve from them. */
class RollupViewsSpec extends SparkTestBase {

  test("orderStats scan equals the defining rollup row-for-row") {
    val direct = RollupViews.orderStatsDirect(spark, sf)
    val scan = RollupViews.orderStats(spark, sf)
    assert(scan.schema.map(f => (f.name, f.dataType.catalogString)) ===
      direct.schema.map(f => (f.name, f.dataType.catalogString)))
    assert(scan.count() === direct.count())
    assert(scan.exceptAll(direct).isEmpty && direct.exceptAll(scan).isEmpty)
  }

  test("customerStats scan equals the defining rollup row-for-row") {
    val direct = RollupViews.customerStatsDirect(spark, sf)
    val scan = RollupViews.customerStats(spark, sf)
    // catalogString: the parquet round-trip widens array element
    // nullability (containsNull) — type identity is what matters
    assert(scan.schema.map(f => (f.name, f.dataType.catalogString)) ===
      direct.schema.map(f => (f.name, f.dataType.catalogString)))
    assert(scan.count() === direct.count())
    assert(scan.exceptAll(direct).isEmpty && direct.exceptAll(scan).isEmpty,
      "stored rollup must match a fresh aggregation (incl. sorted yrs)")
  }

  test("build-once: repeated scans serve the same artifact files") {
    assert(RollupViews.orderStats(spark, sf).inputFiles.toSet ===
      RollupViews.orderStats(spark, sf).inputFiles.toSet)
    assert(RollupViews.customerStats(spark, sf).inputFiles.toSet ===
      RollupViews.customerStats(spark, sf).inputFiles.toSet)
  }

  test("a changed source fingerprint supersedes the customer rollup") {
    val dir = tmpDir("rollup-src-")
    Tables.orders(spark, sf).write.parquet(s"$dir/orders.parquet")
    val before = RollupViews.customerStats(spark, dir)
    val beforeFiles = before.inputFiles.toSet
    val beforeCount = before.count()
    val half = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 2 === 0).cache()
    half.count()
    half.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    half.unpersist()
    val after = RollupViews.customerStats(spark, dir)
    assert(after.inputFiles.toSet !== beforeFiles)
    assert(after.count() ===
      RollupViews.customerStatsDirect(spark, dir).count() &&
      after.count() <= beforeCount)
  }
}
