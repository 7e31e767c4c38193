package graft

import graft.multimodal.{MediaAsset, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY.md §2.7 #49): schema,
  * frame sampling, per-partition decode, deterministic stub codec. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media table carries binary bytes + typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val row = media.filter(col("doc_id") === 3L).head()
    assert(row.kind == "image") // 3 % 3 == 0
    assert(row.bytes.nonEmpty && row.width >= 16 && row.height >= 16)
    val schema = media.schema
    assert(schema("bytes").dataType.typeName == "binary")
  }

  test("frame sampling: image→1, audio→per-second, video→strided") {
    val assets = Seq(
      MediaAsset(1, "image", Array[Byte](1), 8, 8, 0),
      MediaAsset(2, "audio", Array[Byte](2), 0, 0, 3000),
      MediaAsset(3, "video", Array[Byte](3), 8, 8, 2000)).toDS()
    val sampled = Multimodal.sampleFrames(assets, stride = 10)
      .map { case (a, f) => (a.doc_id, f) }.collect().groupBy(_._1)
    assert(sampled(1L).length == 1)
    assert(sampled(2L).length == 3) // 3 s of audio → 3 clips
    assert(sampled(3L).length == 5) // 50 frames / stride 10
  }

  test("resize mean-pools features to the target dim without shuffling") {
    val feats = Multimodal.extractFeatures(
      Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(spark, sf).limit(10), stride = 10), 8)
    val resized = Multimodal.resize(feats, 4)
    val r = resized.head()
    assert(r.featDim == 4 && r.feature.length == 4)
    // mean-pooling: first output = mean of first window
    val f = feats.filter(col("doc_id") === r.doc_id && col("frameIdx") === r.frameIdx).head()
    assert(math.abs(r.feature(0) - (f.feature(0) + f.feature(1)) / 2.0f) < 1e-6)
    // narrow stage: resize adds no exchange beyond what its input has
    def nExchanges(df: org.apache.spark.sql.Dataset[_]): Int =
      df.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange"))
    assert(nExchanges(resized) == nExchanges(feats))
  }

  test("stub decode is deterministic and feature extraction is distributed") {
    val a = Multimodal.StubCodec.decode("hello".getBytes, 4)
    val b = Multimodal.StubCodec.decode("hello".getBytes, 4)
    assert(a.toSeq == b.toSeq)
    assert(Multimodal.StubCodec.decode("other".getBytes, 4).toSeq != a.toSeq)

    val out = Multimodal.pipeline(spark, sf, stride = 10, featDim = 4)
    val n = out.count()
    assert(n > 0)
    // deterministic end-to-end: same input → same aggregate
    val s1 = out.agg(sum(col("sum_norm2"))).head().getDouble(0)
    val s2 = Multimodal.pipeline(spark, sf, stride = 10, featDim = 4)
      .agg(sum(col("sum_norm2"))).head().getDouble(0)
    assert(math.abs(s1 - s2) < 1e-9)
  }
}
