package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one named SparkEntry query N times at a given SF dir:
  * `sbt "runMain graft.tools.TimeQ q_overlap_pairs /root/testdata/sf0.1 3"`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm-up
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeq] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
