package graft.operators

import graft.ColumnInterpolator
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
  * ⋈ labels, labels ⋈ labels) plus one count action for the
  * convergence check — no driver-side graph, no quadratic state. The
  * label frame is one row per node and is `localCheckpoint`ed each
  * round to truncate lineage (on a real cluster: `checkpoint` to
  * durable storage); the previous round's blocks are freed eagerly so
  * state never accumulates (the BENCH_r02 persist-leak lesson).
  * Near-dup graphs are dense blobs with tiny diameters, so rounds ≈
  * 2-4 in practice regardless of corpus size.
  */
object ClusterOps {

  /** Connected components of an undirected edge list: returns
    * `(id, label)` with label = MIN node id in the component —
    * deterministic, engine-independent. Only nodes that appear in
    * `pairs` are returned (isolated docs are their own trivial
    * cluster; emitting them would just echo the corpus). */
  def connectedComponents(pairs: DataFrame, a: String, b: String): DataFrame = {
    val edges = pairs.select(col(a).as("s"), col(b).as("d"))
      .union(pairs.select(col(b).as("s"), col(a).as("d")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select($"s".as("id")).distinct()
      .select($"id", $"id".as("label"))
      .localCheckpoint(true)
    try {
      var changed = 1L
      while (changed > 0) {
        // min over self ∪ neighbours' labels. Symmetric edges mean
        // every node occurs as a destination, so the join is inner.
        // (A union of the two sides would share attribute ids across
        // branches — Spark's Union constraint rewrite rejects that.)
        val neighborMin = edges.join(labels, edges("s") === labels("id"))
          .groupBy($"d").agg(min($"label").as("nmin"))
        val folded = labels.join(neighborMin, labels("id") === neighborMin("d"))
          .select(labels("id"), least(labels("label"), $"nmin").as("label"))
        // pointer jump: follow label -> that node's label (labels are
        // node ids, so the equi join always matches) — O(log d) rounds
        // lazy checkpoint: the convergence count below materializes it,
        // so each round is ONE job, not checkpoint-job + count-job
        val jumped = folded.as("x")
          .join(folded.select($"id".as("lid"), $"label".as("llabel")).as("y"),
            col("x.label") === col("y.lid"))
          .select(col("x.id").as("id"),
            least(col("x.label"), col("y.llabel")).as("label"))
          .localCheckpoint(false)
        changed = jumped
          .join(labels.select($"id", $"label".as("old")), "id")
          .filter($"label" < $"old").count()
        val prev = labels
        labels = jumped
        prev.unpersist()
      }
      labels
    } finally edges.unpersist()
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
