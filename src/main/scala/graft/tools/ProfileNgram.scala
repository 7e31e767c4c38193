package graft.tools

import graft.{ColumnInterpolator, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage attribution for the #41 prefix-filter AllPairs plan, kept in
  * sync with the CURRENT [[graft.operators.DedupOps.dedupNgram]] shape
  * (k-extended prefixes, pid-packed sizes, shared gram3 artifact):
  * `tools/run_main.sh graft.tools.ProfileNgram <sfDir>`. */
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

    import graft.operators.DedupOps
    // stage 0: the build-once gram3 artifact (tokenize+hash+sort+write)
    val t0 = System.nanoTime()
    val gs = DedupOps.gramSets3Shared(spark, sfDir)
    println(f"[prof] gram3 artifact build               ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    time("gram3 artifact scan")(gs.count())

    // stage 1: hot-gram profile (sampled top-K + exact heavy pass)
    val t1 = System.nanoTime()
    val (hot, rank) = DedupOps.hotGrams(spark, sfDir)
    println(f"[prof] hotGrams build (sample+heavy)      ${(System.nanoTime() - t1) / 1e9}%8.2f s  (${hot.length} grams)")

    val pk = DedupOps.NgramPrefixK
    val PackN = DedupOps.PackN
    val pidSafe = $"doc_id" // profiling only; domain guard lives in the operator
    val prefixed = gs.select(
      (pidSafe * PackN + least(size($"gs").cast(LongType), lit(PackN - 1))).as("pid"),
      explode(graft.functions.TextHash.dfPrefix($"gs", hot, rank, pk)).as("h"))
    time("prefix explode")(prefixed.count())

    val grouped = prefixed.groupBy($"h").agg(collect_list($"pid").as("ids"))
      .filter(size($"ids") > 1)
    time("bucket groupBy (>1)")(grouped.count())

    val counted = grouped.select(explode(
        graft.functions.TextSetExprs.orderedPairs($"ids")).as("p"))
      .select($"p.doc_a".as("pa"), $"p.doc_b".as("pb"))
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= least(lit(pk.toLong),
        expr(s"(pmod(pa, $PackN) + pmod(pb, $PackN) + 2) div 3")))
    time("pair count+filter")(counted.count())

    // candidate volume PRE-count — the metric the hot-table width
    // controls (Σ C(bucket,2); the pair exchange and count agg scale
    // with exactly this). NOTE a repartition+sorted-run mapPartitions
    // variant of the pair stage was A/B'd here and measured 2x WORSE
    // at sf100 (532 s vs 246 s — per-row Vector allocation + tuple
    // encoding lose to the codegen'd orderedPairs explode; the sf10
    // "win" was cache-ordering bias), so the declarative shape stays.
    time("pair volume (pre-count)")(grouped.select(explode(
        graft.functions.TextSetExprs.orderedPairs($"ids")).as("p"))
      .count())

    // size-compatibility cut (J >= 1/2 forces max <= 2*min; sizes ride
    // the pid packing, clamped sizes only ever KEEP more — recall-safe)
    val pairsSized = grouped.select(explode(
        graft.functions.TextSetExprs.orderedPairs($"ids")).as("p"))
      .select($"p.doc_a".as("pa"), $"p.doc_b".as("pb"))
      .filter(greatest(pmod($"pa", lit(PackN)), pmod($"pb", lit(PackN))) <=
        least(pmod($"pa", lit(PackN)), pmod($"pb", lit(PackN))) * 2)
    time("pair volume (size-filtered)")(pairsSized.count())
    val countedSized = pairsSized
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= least(lit(pk.toLong),
        expr(s"(pmod(pa, $PackN) + pmod(pb, $PackN) + 2) div 3")))
    time("pair count+filter (size-pref)")(countedSized.count())

    time("full query (steady)")(DedupOps.dedupNgram(spark, sfDir).count())
    time("full query (steady 2)")(DedupOps.dedupNgram(spark, sfDir).count())
    spark.stop()
  }
}
