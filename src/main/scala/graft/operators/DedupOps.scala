package graft.operators

import graft.{ColumnInterpolator, Tables}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication family for LLM training-data pipelines
  * (SURVEY.md §2.7 #37-42): exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine.
  *
  * Scale design (100 TB): exact dedup is one hash shuffle on md5 —
  * uniform keys, no skew. MinHash-LSH bounds the candidate-pair space
  * to band-bucket collisions (equi-join on (band, band_hash) — a
  * plain shuffle join on a uniform 60-bit key), and only candidates
  * pay the exact-Jaccard verify. n-gram Jaccard uses size-bucket
  * blocking expressed as an explode+equi-join (never a theta join).
  * All hashing is md5-derived (cross-engine identical, SURVEY.md §4);
  * all Jaccard comparisons are integer (`2*|A∩B| >= |A∪B|`), so the
  * DuckDB oracle matches bit-for-bit.
  */
object DedupOps {

  /** #37 Exact dedup: md5 over normalized text, keep the min doc_id
    * per group. One shuffle; at 100 TB, partial-agg keeps it cheap. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select($"doc_id", md5(lower(trim($"text"))).as("text_hash"))
      .groupBy($"text_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("cnt"))
      .orderBy($"text_hash")

  val numHashes = 16
  val numBands = 8 // 8 bands x 2 rows: P(candidate | J=0.5) ≈ 0.9

  /** doc_id + distinct word-n-gram shingle set. */
  private def gramSets(spark: SparkSession, sfDir: String, n: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .select($"doc_id", ngrams(tokens($"text"), n).as("gs"))
      .filter(size($"gs") > 0)

  /** #38 MinHash signatures banded for LSH: k=16 hash permutations
    * h_i(g) = hash60(i:g), minimum per doc; bands of 2 rows hashed
    * into a single band key. Exploded shingles → ONE groupBy with 16
    * partial-agg'd `min` columns — a single shuffle over doc_id. */
  def minhashBands(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs = (0 until numHashes).map { i =>
      min(hash60(concat(lit(s"$i:"), $"g"))).as(s"mh$i")
    }
    val sig = gramSets(spark, sfDir, 2)
      .select($"doc_id", explode($"gs").as("g"))
      .groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
    val rows = numHashes / numBands
    val bandCols = (0 until numBands).map { b =>
      val parts = lit(b.toString) +:
        (0 until rows).map(r => col(s"mh${rows * b + r}").cast("string"))
      struct(lit(b.toLong).as("band"),
        hash60(concat_ws(",", parts: _*)).as("band_hash"))
    }
    sig.select($"doc_id", explode(array(bandCols: _*)).as("bb"))
      .select($"doc_id", $"bb.band".as("band"), $"bb.band_hash".as("band_hash"))
  }

  def minhashBandsQ(spark: SparkSession, sfDir: String): DataFrame =
    minhashBands(spark, sfDir).orderBy($"doc_id", $"band")

  private def jaccardVerify(cand: DataFrame, gs: DataFrame,
                            keyA: String, keyB: String,
                            num: Int, den: Int): DataFrame = {
    val inter = size(array_intersect($"x.gs", $"y.gs")).cast(LongType)
    cand
      .join(gs.as("x"), col(keyA) === $"x.doc_id")
      .join(gs.as("y"), col(keyB) === $"y.doc_id")
      .select(col(keyA), col(keyB), inter.as("n_common"),
        (size($"x.gs") + size($"y.gs")).cast(LongType).as("sz"))
      .withColumn("n_union", $"sz" - $"n_common").drop("sz")
      .filter($"n_common" * den >= $"n_union" * num)
      .orderBy(col(keyA), col(keyB))
  }

  /** #39 MinHash-LSH near-dup pairs: candidates from band-bucket
    * collisions (equi self-join), verified by exact 2-gram Jaccard
    * >= 1/2 in integer math. Only bucket-colliding pairs are verified
    * — the property that makes this sublinear at 100 TB. */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = minhashBands(spark, sfDir)
    val cand = bands.as("a")
      .join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    jaccardVerify(cand, gramSets(spark, sfDir, 2), "doc_a", "doc_b", 1, 2)
  }

  /** #41 Exact n-gram Jaccard near-dup (3-grams, J >= 1/2) with
    * shingle-count blocking: each doc is exploded to its own bucket
    * ±1 (bucket = |gs| div 8) and pairs meet via an EQUI-join on the
    * bucket — the blocking trick that avoids a theta/cross join. A
    * true J>=0.5 pair has size ratio <= 2, so ±1 buckets of width 8
    * keep recall while bounding the candidate space. */
  def dedupNgram(spark: SparkSession, sfDir: String): DataFrame = {
    val gs = gramSets(spark, sfDir, 3)
    val withB = gs.withColumn("bucket", expr("size(gs) div 8").cast(LongType))
    val left = withB
      .select($"doc_id", explode(array($"bucket" - 1, $"bucket", $"bucket" + 1)).as("bk"))
    val cand = left.as("a")
      .join(withB.select($"doc_id", $"bucket").as("b"),
        $"a.bk" === $"b.bucket" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
    jaccardVerify(cand, gs, "doc_a", "doc_b", 1, 2)
  }

  /** #40 SimHash: 32-bit signature; bit b is the sign of the
    * count-weighted sum of (+-1) over token-hash bit b. Exploded
    * tokens → one groupBy(doc) with 32 integer partial aggs. Near-dup
    * = small Hamming distance (exercised in DedupSpec). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val bits = 32
    val aggs = (0 until bits).map { b =>
      sum(shiftright($"h", b).bitwiseAND(1) * 2 - 1).as(s"v$b")
    }
    val fp = (0 until bits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .withColumn("h", hash60($"tok"))
      .groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select($"doc_id", fp.as("simhash"))
      .orderBy($"doc_id")
  }

  /** #42 Embedding-cosine near-dup pairs (cos >= 0.4): integer dot /
    * norms from e3-quantized vectors, one per-row IEEE division. The
    * test corpus is broadcastable so the pair join is a broadcast
    * nested loop here; the 100 TB path is [[SimilarityOps.annLsh]]'s
    * bucketed join (same math, LSH-bounded candidates). */
  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", VectorFunctions.quantize($"embedding").as("q"))
      .withColumn("n2", VectorFunctions.norm2($"q"))
    val cos = VectorFunctions.cosine(
      VectorFunctions.dotL($"a.q", $"b.q"), $"a.n2", $"b.n2")
    e.as("a").join(broadcast(e.as("b")), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        round(cos * 1e6, 0).cast(LongType).as("cos_e6"))
      .filter($"cos_e6" >= 400000L)
      .orderBy($"vec_a", $"vec_b")
  }
}
