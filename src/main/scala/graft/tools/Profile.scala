package graft.tools

import graft.{ColumnInterpolator, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan profiler: times labeled plan fragments so bench
  * hotspots can be attributed to a stage, not guessed at.
  * `sbt "runMain graft.tools.Profile <sfDir>"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, sfDir)
    time("scan text")(docs.select($"text").count())
    time("tokens")(docs.select(tokens($"text").as("tk")).count())
    time("ngrams2")(docs.select(ngrams(tokens($"text"), 2).as("gs")).count())
    time("ngrams2+hash")(docs.select(
      transform(ngrams(tokens($"text"), 2), g => hash60(g)).as("gs")).count())
    time("explode grams")(docs.select(
      explode(transform(ngrams(tokens($"text"), 2), g => hash60(g))).as("h")).count())
    val ab = minhashAB(16)
    val aggs = (0 until 16).map(i => min(permute($"h", ab(i)._1, ab(i)._2)).as(s"mh$i"))
    time("minhash groupBy")(docs.select($"doc_id",
        explode(transform(ngrams(tokens($"text"), 2), g => hash60(g))).as("h"))
      .groupBy($"doc_id").agg(aggs.head, aggs.tail: _*).count())
    time("full minhashBands")(graft.operators.DedupOps.minhashBands(spark, sfDir).count())
    time("minhash cand pairs")({
      val bands = graft.operators.DedupOps.minhashBands(spark, sfDir)
      bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id").distinct().count()
    })

    // incremental-dedup phase attribution (uses the band artifact —
    // first call below pays its build, the repeats are steady state).
    // Fragments reuse the operator's own unsorted subtrees so the
    // timings attribute the cost the operator actually pays.
    // reuse the operator's own constants so the profiler times the
    // same subtree the operator executes if either ever changes
    val IncrMod = graft.operators.DedupOps.IncrMod
    val VerifyGram = graft.operators.DedupOps.VerifyGram
    val newDocs = docs.select($"doc_id", $"text").filter($"doc_id" % IncrMod === 0L)
    time("bands artifact (build)")(
      graft.operators.DedupOps.minhashBandsShared(spark, sfDir).count())
    time("bands artifact (scan)")(
      graft.operators.DedupOps.minhashBandsShared(spark, sfDir).count())
    time("drop bandExplode")(graft.operators.DedupOps.minhashBands(spark, sfDir)
      .filter($"doc_id" % IncrMod === 0L).count())
    time("incr cand join")(
      graft.operators.DedupOps.incrCandFrame(spark, sfDir).count())
    time("drop gram sets")(newDocs.select($"doc_id",
      sort_array(graft.functions.TextHash.gramHashes($"text", VerifyGram)).as("gs")).count())
    time("full q_dedup_incremental 1")(
      graft.SparkEntry.queries("q_dedup_incremental")(spark, sfDir).count())
    time("full q_dedup_incremental 2")(
      graft.SparkEntry.queries("q_dedup_incremental")(spark, sfDir).count())
    spark.stop()
  }
}
