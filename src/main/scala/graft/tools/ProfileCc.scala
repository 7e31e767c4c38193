package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution for [[graft.operators.ClusterOps.embedCluster]]'s
  * decade curve: how much of the wall is the OR-LSH pair subtree vs
  * the connected-components rounds, how many rounds the star contraction
  * takes, and how big/welded the edge graph is (components + largest
  * component) — the numbers that tell a chain-diameter story apart
  * from a pair-volume story.
  * `tools/run_main.sh graft.tools.ProfileCc <sfDir>`. */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    // persist BEFORE timing the CC leg: connectedComponents only
    // persists its own symmetric-doubled frame, so an un-persisted
    // pairs subtree would recompute inside tCc and conflate pair-build
    // cost into the CC number this tool exists to separate (r11
    // ADVICE)
    val t0 = System.nanoTime()
    val pairs = graft.operators.DedupOps.dedupEmbeddingLshOr(spark, sfDir)
      .select($"vec_a", $"vec_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    println(f"[cc] or-lsh pairs: $nPairs%d rows in $tPairs%.1f s")

    // arg2 "force": drive the distributed star-contraction path even
    // under the driver bound, to measure ITS rounds/wall in isolation
    val limit =
      if (args.lift(1).contains("force")) 0L
      else graft.operators.ClusterOps.DriverEdgeLimit
    val t1 = System.nanoTime()
    val labels = graft.operators.ClusterOps
      .connectedComponents(pairs, "vec_a", "vec_b", limit)
    val nNodes = labels.count()
    val tCc = (System.nanoTime() - t1) / 1e9
    val rounds = graft.operators.ClusterOps.lastRounds.get()
    println(f"[cc] cc: $nNodes%d nodes in $tCc%.1f s, $rounds%d rounds")

    val comp = labels.groupBy($"label").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_components"), max($"sz").as("largest"),
        sum($"sz").as("n_nodes")).head()
    println(s"[cc] components=${comp.getLong(0)} largest=${comp.getLong(1)} " +
      s"nodes=${comp.getLong(2)}")
    pairs.unpersist()
    spark.stop()
  }
}
