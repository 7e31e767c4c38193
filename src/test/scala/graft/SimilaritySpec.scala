package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** ANN quality: the LSH-bucketed path must agree with brute force on
  * what it returns (same cosines) and keep usable recall
  * (SURVEY.md §2.7 #43-44). */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("brute-force top-k is deterministically ranked and complete") {
    val rows = SimilarityOps.annTopk(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val byQuery = rows.groupBy(_._1)
    byQuery.foreach { case (_, rs) =>
      assert(rs.map(_._2).toSeq == (1L to rs.length))
      // ranks ordered by descending cosine, vec_id tiebreak
      val cos = rs.sortBy(_._2).map(_._4)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF probes the materialized index — corpus cell assignment is not recomputed") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = SimilarityOps.annIvf(spark, sf)
    df.collect() // finalize the adaptive plan
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val s = scans(df.queryExecution.executedPlan)
    def paths(f: FileSourceScanExec) =
      f.relation.location.rootPaths.map(_.toString)
    assert(s.exists(paths(_).exists(_.contains("ivf-index"))),
      s"the corpus side must be a scan of the saved IVF index table; scans: ${s.flatMap(paths)}")
    // the raw embeddings are read ONLY for the 10 probe vectors — if
    // the corpus side re-derived cells per query batch, a second
    // embeddings scan (plus the pivot-distance map) would show up here
    val embScans = s.filter(paths(_).exists(_.contains("embeddings")))
    assert(embScans.size == 1,
      s"exactly one embeddings scan (probe side) expected, saw ${embScans.size}")
  }

  test("LSH top-k results appear in the brute-force ranking with identical cosines") {
    val brute = SimilarityOps.annTopk(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (q, _, v, c) => (q, v) -> c }.toMap
    val lsh = SimilarityOps.annLsh(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    // every LSH hit that brute force also ranked must carry the same cosine
    val overlapping = lsh.filter { case (q, _, v, _) => brute.contains((q, v)) }
    assert(overlapping.forall { case (q, _, v, c) => brute((q, v)) == c })
    // rank sequences are dense 1..n per query (single-probe recall is a
    // tunable — 4 planes ⇒ P(collide | cos 0.4) ≈ 0.16 — so agreement
    // with brute-force top-1 is NOT asserted; see NOTES.md)
    lsh.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length))
    }
  }
}
