package graft

import graft.operators.ClusterOps
import org.apache.spark.sql.functions._

/** Connected-components clustering (ClusterOps): label = min id in
  * the component, only paired nodes returned, O(log d) pointer-jump
  * convergence (exercised by the chain graph, whose diameter forces
  * multiple rounds). */
class ClusterSpec extends SparkTestBase {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    ClusterOps.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle, and isolated pair resolve to min-id labels") {
    // chain 1-2-3-4-5-6-7-8 (diameter 7 → needs >1 pointer-jump round),
    // triangle {100,101,102}, pair {200,201}
    val pairs = (1L to 7L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val labels = cc(pairs)
    assert((1L to 8L).forall(labels(_) == 1L))
    assert(Seq(100L, 101L, 102L).forall(labels(_) == 100L))
    assert(labels(200L) == 200L && labels(201L) == 200L)
    assert(labels.size == 13) // no isolated nodes invented
  }

  test("edge direction does not matter") {
    val labels = cc(Seq((5L, 3L), (3L, 9L), (9L, 1L)))
    assert(labels.values.toSet == Set(1L))
  }

  test("dedupCluster keeps exactly one doc per cluster") {
    val df = ClusterOps.dedupCluster(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid, s"cluster $cid label is not the min doc_id")
      assert(members.count(_.getLong(2) == 1L) == 1, s"cluster $cid must keep exactly one doc")
      members.filter(_.getLong(2) == 1L)
        .foreach(r => assert(r.getLong(0) == cid))
    }
  }
}
