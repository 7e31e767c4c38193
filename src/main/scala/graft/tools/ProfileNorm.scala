package graft.tools

import graft.{ColumnInterpolator, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage attribution for the #85 normalized-dedup plan:
  * `sbt "runMain graft.tools.ProfileNorm <sfDir>"`. */
object ProfileNorm {
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
    val docs = Tables.documents(spark, sfDir)
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    time("scan text")(docs.select($"text").count())
    time("md5(lower(trim))")(docs.select(md5(lower(trim($"text"))).as("h"))
      .filter(length($"h") > 0).count())
    time("regex1")(docs.select(
      regexp_replace(lower($"text"), "[^a-z0-9 ]", " ").as("t"))
      .filter(length($"t") >= 0).count())
    time("regex1+2")(docs.select(
      regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " ").as("t"))
      .filter(length($"t") >= 0).count())
    time("norm md5 both")(docs.select(
        md5(trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))).as("norm_hash"),
        md5(lower(trim($"text"))).as("raw_hash"))
      .filter(length($"norm_hash") > 0).count())
    time("agg without countDistinct")(docs.select($"doc_id",
        md5(trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))).as("norm_hash"),
        md5(lower(trim($"text"))).as("raw_hash"))
      .groupBy($"norm_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("cnt"))
      .count())
    time("full with countDistinct")(docs.select($"doc_id",
        md5(trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))).as("norm_hash"),
        md5(lower(trim($"text"))).as("raw_hash"))
      .groupBy($"norm_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("cnt"),
        countDistinct($"raw_hash").as("n_raw_variants"))
      .count())
    spark.stop()
  }
}
