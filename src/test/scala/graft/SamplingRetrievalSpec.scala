package graft

import graft.operators.{CurationOps, TextOps}
import graft.functions.TextFunctions.{hash60, tokens}
import org.apache.spark.sql.functions._

/** Structural properties of the sampling / retrieval / bloom-decon
  * family (#75-#78b) that the DuckDB hash gate can't express:
  * report-vs-filter agreement, bounded-heap equivalence to a full
  * sort, bloom-prefilter answer identity, and ranking shape. */
class SamplingRetrievalSpec extends SparkTestBase {
  // selective encoder imports: the full `spark.implicits._` would
  // shadow-fight graft's ColumnInterpolator over `$"..."`
  import spark.implicits.{newLongEncoder, newProductEncoder, newStringEncoder}

  test("mixture sample report equals what the per-doc filter would keep") {
    val rows = CurationOps.mixtureSample(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, w, nDocs, avail, target, rate, sDocs, sTok) =>
      assert(w == CurationOps.MixtureWeights.toMap
        .getOrElse(src, CurationOps.MixtureDefaultWeight))
      assert(sDocs <= nDocs && sTok <= avail)
      assert(rate >= 0L && rate <= 10000L)
      if (rate == 10000L) assert(sDocs == nDocs && sTok == avail,
        s"$src: uncapped rate must keep everything")
      assert(target <= CurationOps.MixtureBudget)
    }
    // the report's sampled_docs is EXACTLY what the narrow per-doc
    // keep filter (bucket < rate_e4) selects — report and sample
    // cannot disagree
    val rateMap = rows.map(r => r._1 -> r._6).toMap
    val perDoc = Tables.documents(spark, sf)
      .select($"source",
        (hash60(concat($"doc_id".cast("string"), lit(":mix"))) % 10000L)
          .as("bucket"))
      .as[(String, Long)].collect()
      .filter { case (src, b) => b < rateMap(src) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (src, _, _, _, _, _, sDocs, _) =>
      assert(perDoc.getOrElse(src, 0L) == sDocs,
        s"$src: filter keeps ${perDoc.getOrElse(src, 0L)}, report says $sDocs")
    }
  }

  test("uniform sample equals the full-sort answer without sorting the corpus") {
    val got = CurationOps.uniformSample(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val want = Tables.documents(spark, sf)
      .select(hash60(concat($"doc_id".cast("string"), lit(":u"))).as("h"),
        $"doc_id", $"source")
      .orderBy($"h", $"doc_id")
      .limit(CurationOps.UniformK)
      .as[(Long, Long, String)].collect()
    assert(got.length == math.min(CurationOps.UniformK, want.length))
    assert(got.map(_._1).toSeq == (1L to got.length), "ranks dense 1..k")
    got.zip(want).foreach { case ((_, doc, h, src), (wh, wdoc, wsrc)) =>
      assert(doc == wdoc && h == wh && src == wsrc)
    }
  }

  test("quality gate counts satisfy the union bound per source") {
    val rows = TextOps.qualityGate(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == total, "every doc lands in exactly one source row")
    rows.foreach { case (src, n, pass, fLen, fAvg, fDup, fSym, fStop) =>
      val fails = Seq(fLen, fAvg, fDup, fSym, fStop)
      assert(fails.forall(f => f >= 0L && f <= n))
      // a doc fails ≥1 rule iff it doesn't pass all → union bound on
      // the fail counts brackets n_pass from both sides
      assert(pass >= n - fails.sum, s"$src: union lower bound")
      assert(pass <= n - fails.max, s"$src: single-rule upper bound")
    }
  }

  test("bloom-prefiltered decontamination answers exactly like the raw-set join") {
    val got = CurationOps.decontaminateBloom(spark, sf)
      .as[(Long, Long)].collect().toSeq.sorted
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter($"doc_id" % CurationOps.BloomDecontMod === 0L)
      .select(explode(graft.functions.TextHash
        .gramHashes($"text", CurationOps.BloomDecontGram)).as("h"))
      .distinct()
    val want = docs.filter($"doc_id" % CurationOps.BloomDecontMod =!= 0L)
      .select($"doc_id", explode(graft.functions.TextHash
        .gramHashes($"text", CurationOps.BloomDecontGram)).as("h"))
      .join(broadcast(bench), "h")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hit"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == want, "bloom is a prefilter, never a semantics change")
  }

  test("bm25 ranking is dense, non-increasing, and only over term-bearing docs") {
    val rows = TextOps.bm25Topk(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val qids = TextOps.Bm25Queries.map(_._1).toSet
    assert(rows.map(_._1).toSet.subsetOf(qids))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= TextOps.Bm25TopK)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length), s"$qid ranks")
      val scores = sorted.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$qid scores must be non-increasing")
      // ≥ 0, not > 0: integer flooring can legally score an
      // extreme-length doc to 0 even though it carries a query term
      // (sat_e3 floors to 0 when dl ≫ avgdl); term membership is
      // asserted structurally below instead
      assert(scores.forall(_ >= 0L))
    }
    // every retrieved doc really contains a term of its query
    val terms = TextOps.Bm25Queries.toMap
      .view.mapValues(_.split(" ").toSet).toMap
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", tokens($"text").as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach { case (qid, _, doc, _) =>
      assert(texts(doc).intersect(terms(qid)).nonEmpty,
        s"$qid returned doc $doc with no query term")
    }
  }

  test("hybrid RRF equals plain-Scala fusion of the two rankings") {
    // independent model: rebuild both top-K rankings from the
    // operator's OWN gated outputs? no — from scratch would re-code
    // BM25; instead pin the fusion LAYER exactly: rrf_e6 must equal
    // sum over rankers of 10^6 div (60 + rank) for the doc's rank in
    // that ranker's top-K, ranked by (rrf desc, doc_id asc), top-10
    val bm25 = TextOps.bm25Topk(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map { case (q, r, d, _) => (q, d) -> r }.toMap
    // the second ranker is not a gated query on its own; recompute it
    // as the model: tf * ((1e6*N) div df) summed per (qid, doc)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", tokens($"text").as("tk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val nDocs = docs.length.toLong
    val qterms = TextOps.Bm25Queries.map { case (q, s) => q -> s.split(" ").toSet }
    val allQTerms = qterms.flatMap(_._2).toSet
    val tf = docs.flatMap { case (d, tk) =>
      tk.filter(allQTerms).groupBy(identity).map { case (t, os) => (d, t, os.size.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tfidf = (for {
      (q, ts) <- qterms
      (d, t, k) <- tf if ts(t)
    } yield ((q, d), k * ((1000000L * nDocs) / df(t))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tfidfRank = tfidf.groupBy(_._1._1).flatMap { case (q, m) =>
      m.toSeq.map { case ((_, d), s) => (d, s) }
        .sortBy { case (d, s) => (-s, d) }.take(TextOps.Bm25TopK)
        .zipWithIndex.map { case ((d, _), i) => (q, d) -> (i + 1).toLong }
    }
    val want = (bm25.keySet ++ tfidfRank.keySet).groupBy(_._1).flatMap { case (q, keys) =>
      keys.toSeq.map { case (_, d) =>
        val c = bm25.get((q, d)).map(r => 1000000L / (TextOps.RrfKE + r)).getOrElse(0L) +
          tfidfRank.get((q, d)).map(r => 1000000L / (TextOps.RrfKE + r)).getOrElse(0L)
        (d, c)
      }.sortBy { case (d, c) => (-c, d) }.take(TextOps.RrfTopK)
        .zipWithIndex.map { case ((d, c), i) => (q, (i + 1).toLong, d, c) }
    }.toSet
    val got = TextOps.hybridRrf(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"fusion drift: extra=${got.diff(want).take(3)} missing=${want.diff(got).take(3)}")
  }

  test("weighted sample equals the full-sort priority answer") {
    val got = CurationOps.weightedSample(spark, sf)
      .as[(Long, Long, Long, Long)].collect() // rnk, doc_id, prio, w
    val want = Tables.documents(spark, sf)
      .select(hash60(concat($"doc_id".cast("string"), lit(":w"))).as("u"),
        $"doc_id",
        (size(tokens($"text")).cast("long") + 1L).as("w"))
      .select(expr("u div w").as("prio"), $"doc_id", $"w")
      .orderBy($"prio", $"doc_id")
      .limit(CurationOps.WeightedK)
      .as[(Long, Long, Long)].collect()
    assert(got.length == math.min(CurationOps.WeightedK, want.length))
    assert(got.map(_._1).toSeq == (1L to got.length), "ranks dense 1..k")
    got.zip(want).foreach { case ((_, doc, p, w), (wp, wdoc, ww)) =>
      assert(doc == wdoc && p == wp && w == ww)
    }
    // the point of priority sampling: inclusion ∝ token weight, so the
    // sample's mean weight must exceed the corpus mean (deterministic
    // given the fixed testdata + fixed hash — not a flaky statistical
    // bound)
    val corpusMeanW = Tables.documents(spark, sf)
      .select(avg(size(tokens($"text")).cast("long") + 1L))
      .first().getDouble(0)
    val sampleMeanW = got.map(_._4).sum.toDouble / got.length
    assert(sampleMeanW > corpusMeanW,
      s"size bias missing: sample mean w $sampleMeanW <= corpus $corpusMeanW")
  }

  test("per-source sample equals the window answer and strata are independent") {
    val got = CurationOps.groupSample(spark, sf)
      .as[(String, Long, Long, Long)].collect() // source, rnk, doc_id, h
    val bySrc = got.groupBy(_._1)
    assert(bySrc.nonEmpty)
    // dense ranks per source, ordered by (h, doc_id)
    bySrc.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= CurationOps.GroupK)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length), s"$src ranks")
      val keys = sorted.map(r => (r._4, r._3))
      assert(keys.zip(keys.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      }, s"$src not in (h, doc_id) order")
    }
    // equality with the full window-sort answer, computed independently
    val all = Tables.documents(spark, sf)
      .select($"source",
        hash60(concat($"doc_id".cast("string"), lit(":g"))).as("h"), $"doc_id")
      .as[(String, Long, Long)].collect()
    all.groupBy(_._1).foreach { case (src, rows) =>
      val want = rows.map(r => (r._2, r._3)).sorted.take(CurationOps.GroupK)
      val gotSrc = bySrc(src).sortBy(_._2).map(r => (r._4, r._3)).toSeq
      assert(gotSrc == want.toSeq, s"$src sample diverges from full sort")
    }
  }

  test("temperature mixture: exact isqrt weights, flattening dominance, share accounting") {
    def isqrt(x: BigInt): BigInt = { // Newton, exact
      if (x <= 0) BigInt(0)
      else { var g = x; var n = (g + 1) / 2
        while (n < g) { g = n; n = (g + x / g) / 2 }; g }
    }
    val got = CurationOps.mixtureTemperature(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val totAvail = got.map(r => BigInt(r._2)).sum
    val totW = got.map(r => BigInt(r._3)).sum
    got.foreach { case (src, avail, w, nat, temp) =>
      assert(BigInt(w) == isqrt(BigInt(avail)), s"$src weight must be exact isqrt")
      assert(BigInt(nat) == BigInt(avail) * 1000000 / totAvail, s"$src natural share")
      assert(BigInt(temp) == BigInt(w) * 1000000 / totW, s"$src temp share")
    }
    // flattening: temperature shrinks the head and lifts the tail —
    // sqrt weighting preserves source order but compresses ratios
    val sorted = got.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array(small, big) =>
        assert(big._3 >= small._3, "weights must be monotone in avail")
        if (small._2 > 0 && big._2 > small._2) {
          // share ratio big/small is smaller under temperature; the
          // floor in isqrt costs at most one unit of slack on the
          // small side (w_big·a < (w_small+1)·b holds exactly:
          // w_big ≤ √b, w_small+1 > √a, and √b·a ≤ √a·b for a ≤ b)
          assert(BigInt(big._3) * small._2 < BigInt(small._3 + 1) * big._2,
            s"${big._1}/${small._1}: sqrt must compress the ratio")
        }
      case _ =>
    }
    // floor-rounded shares sum to at most 1e6, within |sources| of it
    val sumT = got.map(_._5).sum
    assert(sumT <= 1000000L && sumT >= 1000000L - got.length)
  }

  test("source cap equals the full window answer and scores match the quality artifact") {
    import org.apache.spark.sql.expressions.Window
    val got = CurationOps.sourceCap(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val quality = CurationOps.qualityPercentile(spark, sf)
      .select($"doc_id", $"composite_e4")
    val w = Window.partitionBy($"source")
      .orderBy($"composite_e4".desc, $"doc_id".asc)
    val want = Tables.documents(spark, sf).select($"source", $"doc_id")
      .join(quality, Seq("doc_id"), "left")
      .withColumn("composite_e4", coalesce($"composite_e4", lit(-1L)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= CurationOps.SourceCapK)
      .select($"source", $"rnk", $"doc_id", $"composite_e4")
      .as[(String, Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq == want.sortBy(r => (r._1, r._2)).toSeq,
      "bounded-heap cap must equal the full per-source rank")
    // per source: ranks dense from 1, scores non-increasing
    got.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong),
        s"$src ranks must be dense")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 <= a._4, s"$src scores must be non-increasing")
        case _ =>
      }
    }
  }
}
