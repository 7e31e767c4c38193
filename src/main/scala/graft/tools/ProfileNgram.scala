package graft.tools

import graft.{ColumnInterpolator, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the #41 prefix-filter AllPairs plan:
  * `sbt "runMain graft.tools.ProfileNgram <sfDir>"`. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.sfgen/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    def gramSets = docs.select($"doc_id",
      sort_array(graft.functions.TextHash.gramHashes($"text", 3)).as("gs"))
      .filter(size($"gs") > 0)
    time("gramSets")(gramSets.count())
    val t0 = System.nanoTime()
    val (hot, rank) = graft.operators.DedupOps.hotGrams(spark, sfDir)
    println(f"[prof] hotGrams build                     ${(System.nanoTime() - t0) / 1e9}%8.2f s  (${hot.length} grams)")
    val prefixed = gramSets.select($"doc_id",
      explode(graft.functions.TextHash.dfPrefix($"gs", hot, rank)).as("h"))
    time("prefix explode")(prefixed.count())
    val grouped = prefixed.groupBy($"h").agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1)
    time("group>1")(grouped.count())
    val pairs = grouped.select(explode(
      graft.functions.TextSetExprs.orderedPairs($"ids")).as("p"))
      .select($"p.doc_a".as("doc_a"), $"p.doc_b".as("doc_b"))
    time("pairs (pre-distinct)")(pairs.count())
    val cand = pairs.distinct()
    time("pairs distinct")(cand.count())
    val gs = gramSets
    val ver = cand
      .join(gs.select($"doc_id".as("doc_a"), $"gs".as("gs_a")), "doc_a")
      .join(gs.select($"doc_id".as("doc_b"), $"gs".as("gs_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        graft.functions.TextHash.sortedIntersectCount($"gs_a", $"gs_b").as("n_common"),
        (size($"gs_a") + size($"gs_b")).cast("long").as("sz"))
      .select($"doc_a", $"doc_b", $"n_common", ($"sz" - $"n_common").as("n_union"))
      .filter($"n_common" * 2 >= $"n_union")
    time("verify join")(ver.count())
    time("full query")(graft.operators.DedupOps.dedupNgram(spark, sfDir).count())
    spark.stop()
  }
}
