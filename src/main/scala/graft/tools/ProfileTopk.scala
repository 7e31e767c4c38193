package graft.tools

import graft.{ColumnInterpolator, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Variant attribution for the #55 vocabulary-profile aggregation and
  * the #81 LM scoring joins at scale:
  * `sbt "runMain graft.tools.ProfileTopk <sfDir>"`. */
object ProfileTopk {
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
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    def grams = docs.select(
      explode(graft.functions.TextHash.gramStrings($"text", 2)).as("gram"))

    println("== ngram_topk variants")
    time("explode only")(grams.count())
    time("string groupBy count")(grams.groupBy($"gram")
      .agg(count(lit(1)).as("df")).count())
    time("xxh64 groupBy count")(grams
      .select(xxhash64($"gram").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("df")).count())
    time("xxh64 groupBy count+min+max gram")(grams
      .select(xxhash64($"gram").as("h"), $"gram")
      .groupBy($"h").agg(count(lit(1)).as("df"),
        min($"gram").as("g"), max($"gram").as("gx")).count())
    time("string groupBy + top20 sort")(grams.groupBy($"gram")
      .agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"gram".asc).limit(20).count())

    println("== lm_quality variants")
    val (uni, big) = graft.operators.TextOps.lmCountsShared(spark, sfDir)
    val bg = graft.operators.TextOps.lmBigrams(docs)
    time("lmBigrams count")(bg.count())
    time("join big broadcast")(bg.join(broadcast(big), Seq("w1", "w2")).count())
    time("join big+uni broadcast")(bg.join(broadcast(big), Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1")).count())
    time("full scoring (joins+agg)")(bg.join(broadcast(big), Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .select($"doc_id", expr("c2 * 1000000 div c1").as("r"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(r) div count(1)").as("lm_score_e6")).count())
    spark.stop()
  }
}
