package graft.operators

import graft.{ColumnInterpolator, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Approximate-nearest-neighbor search over the embedding corpus
  * (SURVEY.md §2.7 #43-44).
  *
  * Query set = vec_id < 10; corpus = the rest. Brute force broadcasts
  * the (small) query set over the corpus — a single linear scan with
  * no shuffle, the right plan when queries are few and the corpus is
  * 100 TB. The LSH variant sign-buckets the corpus once (reusable
  * across query batches) and joins on the bucket key — candidate
  * count drops 2^nPlanes-fold, the sublinear scale path.
  *
  * All ranking is on e6-quantized cosine (integer) with vec_id
  * tiebreak — fully deterministic, DuckDB-oracle-exact.
  */
object SimilarityOps {

  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantize($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))

  private def ranked(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_e6".desc, $"vec_id".asc)
    joined
      .select($"query_id", $"vec_id",
        cosineE6(dotL($"a.q", $"b.q"), $"a.n2", $"b.n2").as("cos_e6"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id", $"cos_e6")
      .orderBy($"query_id", $"rank")
  }

  /** #43 Brute-force cosine top-5: broadcast queries x corpus scan. */
  def annTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val v = vecs(spark, sfDir)
    val queries = v.filter($"vec_id" < 10)
      .withColumnRenamed("vec_id", "query_id")
    val corpus = v.filter($"vec_id" >= 10)
    ranked(corpus.as("b").join(broadcast(queries.as("a"))), k = 5)
  }

  /** #44 LSH-bucketed ANN top-3: corpus bucketed by hyperplane signs,
    * probe = the query's own bucket (equi-join on bucket). */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val v = vecs(spark, sfDir).withColumn("bucket", lshBucket($"q"))
    val queries = v.filter($"vec_id" < 10)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("bucket", "qbucket")
    val corpus = v.filter($"vec_id" >= 10)
    ranked(
      corpus.as("b").join(broadcast(queries.as("a")), $"qbucket" === $"bucket"),
      k = 3)
  }

  /** Multi-probe LSH ANN top-3: each query probes its own bucket plus
    * the nPlanes Hamming-1 neighbors (flip one hyperplane sign) — the
    * standard recall lever that costs probes, not a bigger index. The
    * corpus is bucketed ONCE (reusable across query batches); probes
    * explode only the tiny query side. Still an equi-join. */
  def annMultiprobe(spark: SparkSession, sfDir: String): DataFrame = {
    val v = vecs(spark, sfDir).withColumn("bucket", lshBucket($"q"))
    val masks = lit(0L) +: (0 until nPlanes).map(j => lit(1L << j))
    val queries = v.filter($"vec_id" < 10)
      .withColumnRenamed("vec_id", "query_id")
      .select($"query_id", $"q", $"n2",
        explode(array(masks.map($"bucket".bitwiseXOR(_)): _*)).as("qbucket"))
    val corpus = v.filter($"vec_id" >= 10)
    ranked(
      corpus.as("b").join(broadcast(queries.as("a")), $"qbucket" === $"bucket"),
      k = 3)
  }

  val ivfCells = 8

  /** IVF-style ANN top-3: the corpus is partitioned into cells by
    * nearest pivot (cell assignment = one narrow map against the
    * broadcast pivot set — at 100 TB this is the build-once index
    * shuffle, reusable for every query batch), and each query probes
    * its 2 nearest cells. Pivots here are the `ivfCells` lowest
    * corpus vectors — a deterministic stand-in for trained k-means
    * centroids; the plan shape (assign → cell equi-join → rank) is
    * the production article. Determinism: cell choice compares
    * e6-rounded cosine with pivot-id tiebreak (SURVEY.md §4). */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits.{newProductEncoder, newLongEncoder, newLongArrayEncoder}
    // The quantized corpus feeds pivots, cell assignment AND probes.
    // No session-lifetime persist (it leaks across callers and showed
    // no bench win — BENCH_r02): quantize is a narrow codegen'd map,
    // so recomputing two scans is cheaper than columnar caching. At
    // production scale the IVF index (cell column) would be BUILT ONCE
    // and written out, amortized over every query batch.
    val quant = graft.functions.VectorFunctions.quantized(
      Tables.embeddings(spark, sfDir))
    val pivots = spark.sparkContext.broadcast(
      quant.filter(r => r._1 >= 10 && r._1 < 10 + ivfCells).collect().sortBy(_._1))
    def bestCells(q: Array[Long], n2: Long, k: Int): Seq[Long] =
      pivots.value.map { case (pid, pq, pn2) =>
        (pid, graft.functions.VectorFunctions.cosineE6Jvm(q, pq, n2, pn2))
      }.sortBy { case (pid, c6) => (-c6, pid) }.take(k).map(_._1).toSeq
    val cells = quant.filter(_._1 >= 10)
      .map { case (id, q, n2) => (bestCells(q, n2, 1).head, id, q, n2) }
      .toDF("cell", "vec_id", "q", "n2")
    val probes = quant.filter(_._1 < 10)
      .flatMap { case (id, q, n2) => bestCells(q, n2, 2).map(c => (c, id, q, n2)) }
      .toDF("qcell", "query_id", "q", "n2")
    ranked(
      cells.as("b").join(broadcast(probes.as("a")), $"qcell" === $"cell"),
      k = 3)
  }
}
