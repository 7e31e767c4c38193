package graft.operators

import graft.ColumnInterpolator
import graft.tools.Materialize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: near-dup PAIRS (MinHash/SimHash/
  * n-gram output) are only half the dedup story — a training pipeline
  * must group transitively-linked docs into clusters and keep ONE
  * canonical doc per cluster. That grouping is connected components
  * over the pair graph.
  *
  * Scale design (100 TB): min-label propagation with POINTER JUMPING
  * (label := label of label, the Shiloach–Vishkin / large-star move),
  * which converges in O(log d) rounds instead of O(d) for diameter-d
  * components. Each round is two equi shuffles on uniform ids (edges
  * ⋈ labels, labels ⋈ labels) and exactly ONE Spark job: the
  * convergence check rides along as a `sum(label < old)` aggregate on
  * the round's own output instead of a separate join+count job. The
  * label frame is one row per node, `localCheckpoint`ed each round to
  * truncate lineage (on a real cluster: `checkpoint` to durable
  * storage); each round's blocks are freed the moment the next round
  * lands, and the FINAL labels are copied out of the block manager
  * with a parquet round-trip (the production write-out step) so a
  * call leaves ZERO resident blocks behind — the BENCH_r03 lesson,
  * where leaked checkpoint blocks taxed every later query in the
  * session. Near-dup graphs are dense blobs with tiny diameters, so
  * rounds ≈ 2-4 in practice regardless of corpus size.
  */
object ClusterOps {

  /** Rounds taken by the most recent [[connectedComponents]] call
    * (test observability: ClusterSpec asserts one job per round). */
  @volatile private[graft] var lastRounds: Int = 0

  /** Connected components of an undirected edge list: returns
    * `(id, label)` with label = MIN node id in the component —
    * deterministic, engine-independent. Only nodes that appear in
    * `pairs` are returned (isolated docs are their own trivial
    * cluster; emitting them would just echo the corpus). The result
    * is backed by a plain parquet scan — no cached or checkpointed
    * blocks outlive the call. */
  def connectedComponents(pairs: DataFrame, a: String, b: String): DataFrame = {
    val edges = pairs.select(col(a).as("s"), col(b).as("d"))
      .union(pairs.select(col(b).as("s"), col(a).as("d")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select($"s".as("id")).distinct()
      .select($"id", $"id".as("label"))
      .localCheckpoint(true)
    var rounds = 0
    try {
      var changed = 1L
      while (changed > 0) {
        // min over self ∪ neighbours' labels. Symmetric edges mean
        // every node occurs as a destination, so the join is inner.
        // (A union of the two sides would share attribute ids across
        // branches — Spark's Union constraint rewrite rejects that.)
        // `old` rides along so convergence needs no second join.
        val neighborMin = edges.join(labels, edges("s") === labels("id"))
          .groupBy($"d").agg(min($"label").as("nmin"))
        val folded = labels.join(neighborMin, labels("id") === neighborMin("d"))
          .select(labels("id"), labels("label").as("old"),
            least(labels("label"), $"nmin").as("label"))
        // pointer jump: follow label -> that node's label (labels are
        // node ids, so the equi join always matches) — O(log d) rounds.
        // lazy checkpoint: the convergence aggregate below materializes
        // it, so each round is ONE job (checkpoint + changed-count).
        val jumped = folded.as("x")
          .join(folded.select($"id".as("lid"), $"label".as("llabel")).as("y"),
            col("x.label") === col("y.lid"))
          .select(col("x.id").as("id"), col("x.old").as("old"),
            least(col("x.label"), col("y.llabel")).as("label"))
          .localCheckpoint(false)
        changed = jumped
          .agg(coalesce(sum(when($"label" < $"old", 1L).otherwise(0L)), lit(0L)))
          .first().getLong(0)
        rounds += 1
        val prev = labels
        labels = jumped.select($"id", $"label")
        // frees the PREVIOUS round's checkpoint blocks (unpersist on
        // the Dataset only drops the SQL-cache entry, not these)
        Materialize.freeCheckpoint(prev)
      }
      // copy the converged labels out of the block manager, then free
      // the last round's checkpoint too — the caller gets a frame that
      // holds no session state at all
      Materialize.parquetRoundTrip(labels, "cc_labels")
    } finally {
      Materialize.freeCheckpoint(labels)
      edges.unpersist()
      lastRounds = rounds
    }
  }

  /** #50 Duplicate clusters over the MinHash-LSH near-dup pairs:
    * every doc in a near-dup pair gets its transitive cluster id
    * (= min doc_id in the cluster) and keep = 1 only for that
    * canonical doc — the row set a pipeline anti-joins against the
    * corpus to drop redundant docs. */
  def dedupCluster(spark: SparkSession, sfDir: String): DataFrame =
    connectedComponents(
      DedupOps.minhashPairs(spark, sfDir).select($"doc_a", $"doc_b"),
      "doc_a", "doc_b")
      .select($"id".as("doc_id"), $"label".as("cluster_id"),
        when($"id" === $"label", 1L).otherwise(0L).as("keep"))
      .orderBy($"doc_id")
}
