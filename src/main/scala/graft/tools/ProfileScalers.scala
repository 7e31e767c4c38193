package graft.tools

import graft.{ColumnInterpolator, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage attribution for the four queries the round-9 judge flagged
  * as >=12x/decade at sf1 -> sf10 (q_rolling_fp, q_ngram_topk,
  * q_rollup, q_lm_quality). Each query is decomposed into its plan
  * stages so the decade curve can be pinned on a stage — or on the
  * DATA shape: the generated sf10 documents carry x18.6 the
  * CHARACTERS of sf1 at x10 rows (avg text length 394.6 -> 735.7),
  * so a byte-linear text kernel measuring <=x18.6 wall is LINEAR in
  * its true input unit.
  * `sbt "runMain graft.tools.ProfileScalers <sfDir>"`. */
object ProfileScalers {
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
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    println(s"== corpus shape ($sfDir)")
    time("docs count")(docs.count())
    time("sum chars")(docs.agg(sum(length($"text"))).collect().head.getLong(0))

    println("== q_rolling_fp stages")
    import graft.functions.RollingHash.{rollingHashes, P}
    time("kernel: rollingHashes size")(docs
      .select($"doc_id", rollingHashes($"text", graft.operators.TextOps.RollWindow).as("hs"))
      .filter(size($"hs") > 0).count())
    time("kernel+aggs (no sort)")(docs
      .select($"doc_id", rollingHashes($"text", graft.operators.TextOps.RollWindow).as("hs"))
      .filter(size($"hs") > 0)
      .select($"doc_id", size($"hs").cast(LongType).as("n_windows"),
        array_min($"hs").as("min_h"), array_max($"hs").as("max_h"),
        graft.functions.VectorExprs.sumMod($"hs", P).as("sum_mod"))
      .filter($"n_windows" >= 0).count())
    time("full (with orderBy)")(
      graft.operators.TextOps.rollingFp(spark, sfDir).count())

    println("== q_ngram_topk stages")
    time("gramStrings explode")(docs
      .select(explode(graft.functions.TextHash.gramStrings($"text", 2)).as("gram"))
      .count())
    time("groupBy gram agg")(docs
      .select(explode(graft.functions.TextHash.gramStrings($"text", 2)).as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("doc_freq")).count())
    time("full (with top-20 sort)")(
      graft.operators.TextOps.ngramTopk(spark, sfDir).count())

    println("== q_rollup stages")
    val ev = Tables.events(spark, sfDir)
    time("events scan")(ev.count())
    time("plain (type,user) agg")(ev
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("cnt"),
        graft.Det.sumFixed($"value", 6).as("sum_value_e6"))
      .count())
    time("rollup agg (no sort)")(ev
      .rollup($"event_type", $"user_id")
      .agg(count(lit(1)).as("cnt"),
        graft.Det.sumFixed($"value", 6).as("sum_value_e6"))
      .count())
    time("full (with orderBy)")(
      graft.operators.CoreOps.rollupAgg(spark, sfDir).count())

    println("== q_lm_quality stages")
    time("lmCountsShared build+count")({
      val (uni, big) = graft.operators.TextOps.lmCountsShared(spark, sfDir)
      uni.count() + big.count()
    })
    time("bigram occurrence stream")(
      graft.operators.TextOps.lmBigrams(docs).count())
    time("full lm_quality")(
      graft.operators.TextOps.lmQuality(spark, sfDir).count())
    spark.stop()
  }
}
