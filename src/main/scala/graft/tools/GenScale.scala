package graft.tools

import graft.{ColumnInterpolator, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicate an sf* directory
  * `factor`-fold into a larger one (default 10× → "sf1" from sf0.1)
  * so the 100 TB-shape plan claims can be MEASURED a decade up
  * instead of argued from scaladoc.
  *
  * `sbt "runMain graft.tools.GenScale <srcDir> <outDir> [factor]"`
  *
  * Replica 0 is the source data verbatim — every id-anchored fixture
  * (ANN query vectors vec_id < 10, k-means seeds, the %-mod drop and
  * benchmark selections) keeps its original members. Replicas k ≥ 1
  * shift every key by k·offset (offset = a power of 10 above the
  * table's max key, so `doc_id % IncrMod` membership replicates) and
  * keep referential integrity inside the replica (orders→customer,
  * lineitem→orders/part/supplier, events→user). Dimension tables
  * (region, nation) stay fixed — growing a corpus does not grow the
  * country list.
  *
  * Content perturbation keeps the statistical shape without welding
  * replicas together:
  *  - documents: every token gets a `~(k·offset)` suffix (bijective
  *    per replica AND unique across chained generations), so
  *    exact-dup groups and n-gram Jaccard structure replicate WITHIN
  *    a replica but no text matches across replicas — dedup output
  *    scales linearly instead of quadratically;
  *  - embeddings: the vector is rotated by k positions and
  *    sign-flipped by a mask keyed on k·offset (norm- and
  *    structure-preserving within a replica, uncorrelated across —
  *    including across chained generations, where bare rotation
  *    composed additively and welded replica paths together).
  *
  * Everything is column arithmetic on the source rows — no rand(),
  * same output on every run. events.ts is written as a standard µs
  * TIMESTAMP (Tables.tsFromNanos passes it through; DuckDB's
  * epoch_us reads it the same).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/.sfgen/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // next power of 10 strictly above the table's max key — keeps
    // mod-selection membership (%10, %IncrMod) identical per replica
    def pow10Above(df: DataFrame, c: String): Long = {
      val mx = df.agg(max(col(c))).head().getLong(0)
      var p = 10L
      while (p <= mx) p *= 10
      p
    }
    // replicate rows factor-fold with a `rep` column 0..factor-1
    def reps(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0L), lit(factor - 1L))))
    def shifted(c: String, off: Long) = col(c) + $"rep" * off
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // dimension tables: fixed
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    val offC = pow10Above(Tables.customer(spark, src), "c_custkey")
    val offS = pow10Above(Tables.supplier(spark, src), "s_suppkey")
    val offP = pow10Above(Tables.part(spark, src), "p_partkey")
    val offO = pow10Above(Tables.orders(spark, src), "o_orderkey")

    write(reps(Tables.customer(spark, src))
      .withColumn("c_custkey", shifted("c_custkey", offC)).drop("rep"), "customer")
    write(reps(Tables.supplier(spark, src))
      .withColumn("s_suppkey", shifted("s_suppkey", offS)).drop("rep"), "supplier")
    write(reps(Tables.part(spark, src))
      .withColumn("p_partkey", shifted("p_partkey", offP)).drop("rep"), "part")
    write(reps(Tables.orders(spark, src))
      .withColumn("o_orderkey", shifted("o_orderkey", offO))
      .withColumn("o_custkey", shifted("o_custkey", offC)).drop("rep"), "orders")
    write(reps(Tables.lineitem(spark, src))
      .withColumn("l_orderkey", shifted("l_orderkey", offO))
      .withColumn("l_partkey", shifted("l_partkey", offP))
      .withColumn("l_suppkey", shifted("l_suppkey", offS)).drop("rep"), "lineitem")

    val ev = Tables.events(spark, src) // ts rebuilt to µs TimestampType
    val offE = pow10Above(ev, "event_id")
    val offU = pow10Above(ev, "user_id")
    write(reps(ev)
      .withColumn("event_id", shifted("event_id", offE))
      .withColumn("user_id", shifted("user_id", offU)).drop("rep"), "events")

    val docs = Tables.documents(spark, src)
    val offD = pow10Above(docs, "doc_id")
    // suffix tag = rep · offD, NOT the bare rep: offD grows every
    // generation, so chained runs (sf0.1 → sf1 → sf10) keep replica
    // token spaces disjoint ACROSS generations too. With a bare rep,
    // generation-2 replica k of generation-1 replica 0 ("tok~k")
    // collided with generation-1 replica k's verbatim copy — exact
    // cross-replica duplicate docs, which silently tripled the
    // near-dup pair count in the first sf10 corpus (measured: 75,208
    // q_dedup_ngram rows where linear replication predicts 25,600).
    val scaledText = when($"rep" === 0L, $"text").otherwise(expr(
      s"""array_join(transform(split(text, ' '),
         |  t -> CASE WHEN t = '' THEN t ELSE concat(t, '~', CAST(rep * $offD AS STRING)) END), ' ')""".stripMargin))
    write(reps(docs)
      .withColumn("doc_id", shifted("doc_id", offD))
      .withColumn("text", scaledText)
      .withColumn("n_chars", length($"text").cast("long"))
      .drop("rep"), "documents")

    val emb = Tables.embeddings(spark, src)
    val offV = pow10Above(emb, "vec_id")
    // rotation alone composes additively (rot j ∘ rot k = rot j+k),
    // so chained generations collided (gen-2 replica j of gen-1
    // replica 0 ≡ gen-1 replica j verbatim) and a single run with
    // factor > dim wrapped back to the identity. The sign-flip layer
    // keyed by rep·offV (generation-unique, like the text suffix)
    // breaks both: norm-preserving, deterministic, and two distinct
    // replica paths now differ by a pseudo-random 64-bit mask XOR.
    val rotatedFlipped = expr(
      s"""transform(
         |  concat(slice(embedding, CAST(pmod(rep, size(embedding)) + 1 AS INT), size(embedding) - CAST(pmod(rep, size(embedding)) AS INT)),
         |         slice(embedding, 1, CAST(pmod(rep, size(embedding)) AS INT))),
         |  (x, i) -> CASE WHEN pmod(xxhash64(rep * $offV, i), 2) = 0 THEN x ELSE -x END)""".stripMargin)
    write(reps(emb)
      .withColumn("vec_id", shifted("vec_id", offV))
      .withColumn("embedding", when($"rep" === 0L, $"embedding").otherwise(rotatedFlipped))
      .drop("rep"), "embeddings")

    spark.stop()
  }
}
