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
}
