package graft

import graft.jobs.VectorIngest
import graft.operators.{CurationOps, SimilarityOps}
import graft.sinks.StoreRegistry
import org.apache.spark.sql.functions._

/** End-to-end vector ingest job (jobs.VectorIngest): embedding drops
  * → benchmark contamination screen → PQ encoding → index admission
  * with quarantine. The screen and the coder are the SAME stages the
  * gated batch operators run, so the strongest check is parity: the
  * quarantine must equal the `q_decon_embedding` report and the index
  * must hold exactly the clean vectors' batch codes. */
class VectorIngestSpec extends SparkTestBase {
  import spark.implicits.{newProductEncoder, newLongEncoder}

  test("vector ingest quarantines the decon report and indexes clean codes; replay idempotent") {
    val src = tmpDir("vecsrc")
    val ck = tmpDir("vecck")
    val index = StoreRegistry.doc("vecindex")
    val quarantine = StoreRegistry.doc("vecquar")

    val bench = CurationOps.embBench(spark, sf)
    val books = SimilarityOps.pqCodebooksShared(spark, sf)
    // drops = the corpus side only (the benchmark itself is held out,
    // exactly as in the batch #91 contract)
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % CurationOps.EmbDecontMod =!= 0L)
    val ids = corpus.select(col("vec_id")).as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val schema = corpus.schema
    corpus.filter(col("vec_id") < cut).coalesce(1)
      .write.mode("append").parquet(src)
    assert(VectorIngest.run(spark, src, schema, index, quarantine, ck,
      bench, books) == 0)
    corpus.filter(col("vec_id") >= cut).coalesce(1)
      .write.mode("append").parquet(src)
    assert(VectorIngest.run(spark, src, schema, index, quarantine, ck,
      bench, books) == 0)

    // quarantine ≡ the gated #91 report, field for field
    val want = SparkEntry.queries("q_decon_embedding")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(quarantine.size == want.length, s"${quarantine.size} vs ${want.length}")
    for ((vid, bb, cos, nh) <- want) {
      val q = quarantine.get(vid.toString)
      assert(q.isDefined, s"vector $vid missing from quarantine")
      assert(q.get("best_bench") == bb.toString && q.get("max_cos_e6") == cos.toString
        && q.get("n_hits") == nh.toString, s"quarantine row for $vid: ${q.get}")
    }
    // index ≡ batch codes of exactly the clean vectors
    val dirty = want.map(_._1).toSet
    val codes = SimilarityOps.encodeFrame(corpus, books)
      .as[(Long, Array[Int])].collect()
    val clean = codes.filterNot { case (id, _) => dirty.contains(id) }
    assert(index.size == clean.length, s"${index.size} vs ${clean.length}")
    for ((id, cs) <- clean)
      assert(index.get(id.toString).exists(_("codes") == cs.mkString(",")),
        s"codes for $id")
    assert(!dirty.exists(id => index.get(id.toString).isDefined),
      "no contaminated vector may enter the index")

    // replay with a fresh checkpoint: the same files land the same state
    val ck2 = tmpDir("vecck2")
    assert(VectorIngest.run(spark, src, schema, index, quarantine, ck2,
      bench, books) == 0)
    assert(index.size == clean.length && quarantine.size == want.length)

    StoreRegistry.clear("vecindex"); StoreRegistry.clear("vecquar")
  }
}
