package graft

import graft.operators.{CurationOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Sketch/profile operators (SURVEY.md §2.7 #60-63): structural
  * properties the DuckDB hash gate can't express — estimator bounds,
  * rank shape, and membership exclusions. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("CMS estimate never underestimates and is exact without collisions") {
    val rows = CurationOps.cmsHeavy(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length == CurationOps.CmsTopK)
    // Count-Min's one-sided error guarantee: cells only ever ADD
    // colliding tokens' counts, so est >= exact for every token
    assert(rows.forall { case (_, exact, est) => est >= exact },
      rows.filter { case (_, exact, est) => est < exact }.toSeq.toString)
    // top-k ordering is (exact desc, token asc) — total and dense
    val exacts = rows.map(_._2)
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b })
  }

  test("event funnel equals a per-user sequential-scan model and shrinks monotonically") {
    import graft.operators.CoreOps
    val got = CoreOps.eventFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).toSeq == "all" +: CoreOps.FunnelSteps)
    // plain-Scala model: per user, greedy earliest chain through the steps
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val wantCounts = Seq(byUser.size.toLong) ++
      CoreOps.FunnelSteps.indices.map { k =>
        byUser.values.count { evs =>
          // fold the user's events through the step chain greedily
          CoreOps.FunnelSteps.take(k + 1).foldLeft(Option(Long.MinValue)) {
            case (Some(after), step) =>
              val ts = evs.filter(e => e._2 == step && e._3 > after).map(_._3)
              if (ts.isEmpty) None else Some(ts.min)
            case (None, _) => None
          }.isDefined
        }.toLong
      }
    assert(got.map(_._3).toSeq == wantCounts, "stage counts must equal the model")
    // funnel stages only ever shrink, and conversions reflect that
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)), "monotone stages")
    got.sliding(2).foreach {
      case Array(prev, cur) =>
        val want = if (prev._3 == 0L) 0L else cur._3 * 10000L / prev._3
        assert(cur._4 == want, s"stage ${cur._1} conv_e4")
      case _ =>
    }
    assert(got.head._4 == 10000L)
  }

  test("A/B funnel reconciles with the pooled funnel and splits users disjointly") {
    import graft.operators.CoreOps
    val ab = CoreOps.abFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val pooled = CoreOps.eventFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(ab.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // variants partition the users: per stage, n_a + n_b = pooled count
    // (the same shared stageTimes chain, so the split must reconcile
    // digit for digit)
    ab.foreach { case (stage, _, na, nb, _, _, _) =>
      assert(na + nb == pooled(stage), s"stage $stage: $na + $nb != ${pooled(stage)}")
    }
    // per-variant conversions recompute from the counts
    ab.sliding(2).foreach {
      case Array(prev, cur) =>
        val wantA = if (prev._3 == 0L) 0L else cur._3 * 10000L / prev._3
        val wantB = if (prev._4 == 0L) 0L else cur._4 * 10000L / prev._4
        assert(cur._5 == wantA && cur._6 == wantB, s"stage ${cur._1} conv")
      case _ =>
    }
    // lift recomputes from the conversions; stage 0 lift is 10000
    ab.foreach { case (stage, _, _, _, ca, cb, lift) =>
      val want = if (ca == 0L) 0L else cb * 10000L / ca
      assert(lift == want, s"stage $stage lift")
      if (stage == 0L) assert(lift == 10000L, "both variants fully present at stage 0")
    }
  }

  test("snapshot diff classifies crafted docs exactly and partitions both snapshots") {
    import graft.operators.CurationOps
    import spark.implicits.newProductEncoder
    // old: docs 1-4; new: 1 unchanged, 2 changed, 3 missing (removed),
    // 5 appears (added)
    val old = Seq((1L, "a b c"), (2L, "d e"), (3L, "f"), (4L, "g h i j"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "a b c"), (2L, "d e CHANGED"), (4L, "g h i j"), (5L, "new doc"))
      .toDF("doc_id", "text")
    val got = CurationOps.snapshotDiff(old, nw).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "added" -> ((1L, 0L, 2L)),       // doc 5: 2 new tokens, nothing old
      "removed" -> ((1L, 1L, 0L)),     // doc 3: 1 old token, nothing new
      "changed" -> ((1L, 2L, 3L)),     // doc 2: 2 -> 3 tokens
      "unchanged" -> ((2L, 7L, 7L))),  // docs 1 & 4
      s"got $got")
    // the classes partition the union of both snapshots
    assert(got.values.map(_._1).sum == 5L)
    // the gated instantiation covers every documents row exactly once
    // on each side it belongs to
    val diff = SparkEntry.queries("q_corpus_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sf).count()
    val nOld = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 =!= 3L).count()
    val nNew = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 =!= 2L).count()
    assert(diff.getOrElse("added", 0L) + diff.getOrElse("changed", 0L) +
      diff.getOrElse("unchanged", 0L) == nNew, "new side covered")
    assert(diff.getOrElse("removed", 0L) + diff.getOrElse("changed", 0L) +
      diff.getOrElse("unchanged", 0L) == nOld, "old side covered")
    assert(diff.values.sum >= n / 2, "diff must cover the corpus scale")
  }

  test("diff severity classes crafted changes exactly — including the no-gram edge") {
    import graft.operators.CurationOps
    import spark.implicits.newProductEncoder
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val old = Seq(
      (1L, base),                 // unchanged — must not appear
      (2L, base + " v1"),         // cosmetic: 1 of 10 grams differs
      (3L, "w1 w2 w3 w4 w5 w6"),  // revised: 5 shared of 9+5... J in [1/2, 9/10)
      (4L, "w10 w9 w8 w7 w6 w5 w4 w3 w2 w1"), // rewritten: reversed, J = 0
      (5L, "solo"),               // no grams either side: rewritten, j = 0
      (6L, base)).toDF("doc_id", "text")
    val nw = Seq(
      (1L, base), (2L, base), (3L, base), (4L, base), (5L, "other"),
      (6L, base)).toDF("doc_id", "text")
    val got = CurationOps.diffSeverity(old, nw).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 2: common 9, union 10 -> 9000 >= 9/10 -> cosmetic
    // doc 3: common 5, union 9+5-5=9 -> j_e4 = 5555 -> revised
    // doc 4: common 0 -> rewritten, j 0; doc 5: union 0 -> rewritten, j 0
    assert(got("cosmetic") == ((1L, 9000L)), got)
    assert(got("revised") == ((1L, 5555L)), got)
    assert(got("rewritten") == ((2L, 0L)), got)
    assert(got.values.map(_._1).sum == 4L, "only changed docs are classed")
  }

  test("session stats reconcile exactly with the session-window listing") {
    import graft.operators.WindowOps
    val sessions = WindowOps.sessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sessions.nonEmpty)
    val model = sessions.groupBy(_._1).map { case (u, ss) =>
      val durs = ss.map(s => s._5 - s._4)
      u -> (ss.length.toLong, ss.map(_._3).sum, ss.map(_._3).max,
        durs.sum, durs.max, durs.sum / ss.length)
    }
    val got = WindowOps.sessionStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toMap == model,
      "per-user stats must equal the aggregate of the session listing")
    // session ids are dense per user, so n_sessions = max session_id
    val maxId = sessions.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
    val gotMap = got.toMap
    assert(gotMap.keys.forall(u => gotMap(u)._1 == maxId(u)),
      "session count must equal the densely-numbered last session id")
  }

  test("novelty curve equals a plain-Scala first-occurrence model") {
    import graft.functions.TextHash
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val grams = docs.map { case (id, t) =>
      id -> TextHash.gramHashesJvm(t, CurationOps.ProfGram) }.toMap
    val firstDoc = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).min }
    val (lo, hi) = (docs.map(_._1).min, docs.map(_._1).max)
    val k = CurationOps.NoveltyBuckets
    val model = docs.groupBy { case (id, _) =>
      math.min(k - 1, (id - lo) * k / (hi - lo + 1))
    }.map { case (b, ds) =>
      val ng = ds.map(d => grams(d._1).length.toLong).sum
      val ns = ds.map(d => grams(d._1).count(h => firstDoc(h) < d._1).toLong).sum
      b -> (ds.length.toLong, ng, ns, if (ng == 0) 0L else ns * 10000L / ng)
    }
    val got = CurationOps.noveltyCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toMap == model, "bucket rows must equal the model")
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq, "sorted buckets")
    assert(got.head._1 == model.keys.min)
  }

  test("per-source novelty reconciles exactly with the novelty curve's totals") {
    // both reports aggregate the SAME noveltyPerDoc stage, so their
    // corpus-wide gram and seen totals must agree to the digit
    val curve = CurationOps.noveltyCurve(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySrc = CurationOps.noveltySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(bySrc.nonEmpty)
    assert(bySrc.map(_._2).sum == curve.map(_._1).sum, "doc totals")
    assert(bySrc.map(_._3).sum == curve.map(_._2).sum, "gram totals")
    assert(bySrc.map(_._4).sum == curve.map(_._3).sum, "seen totals")
    bySrc.foreach { case (src, _, ng, ns, e4) =>
      assert(ns <= ng, s"$src seen bound")
      assert(e4 == (if (ng == 0) 0L else ns * 10000L / ng), s"$src ratio")
    }
  }

  test("boilerplate ratio equals a plain-Scala document-frequency model") {
    import graft.functions.TextHash
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val grams = docs.map { case (id, _, t) =>
      id -> TextHash.gramHashesJvm(t, CurationOps.ProfGram) }.toMap
    val df = grams.values.flatten.groupBy(identity)
      .map { case (h, xs) => h -> xs.size.toLong }
    val model = docs.groupBy(_._2).map { case (src, ds) =>
      val perDoc = ds.map { case (id, _, _) =>
        val gs = grams(id)
        (gs.length.toLong, gs.count(h => df(h) >= CurationOps.BoilerDf).toLong)
      }
      val ng = perDoc.map(_._1).sum
      val nc = perDoc.map(_._2).sum
      src -> (ds.length.toLong, ng, nc,
        if (ng == 0) 0L else nc * 10000L / ng,
        perDoc.count(p => p._1 > 0 && p._2 * 2 >= p._1).toLong)
    }
    // columns: source, n_docs, n_grams, n_common, boiler_e4, n_flagged
    val got = CurationOps.boilerplateRatio(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toMap == model, "per-source rows must equal the model")
    // ratios are well-formed shares
    got.foreach { case (src, (_, ng, nc, e4, _)) =>
      assert(nc <= ng && e4 >= 0L && e4 <= 10000L, s"$src share bounds")
    }
  }

  test("funnel latency covers exactly the converting users with positive latencies") {
    import graft.operators.CoreOps
    val funnel = CoreOps.eventFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lat = CoreOps.funnelLatency(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(lat.map(_._1).toSeq == Seq(1L, 2L))
    assert(lat.map(t => (t._2, t._3)).toSeq ==
      CoreOps.FunnelSteps.sliding(2).map(p => (p(0), p(1))).toSeq)
    // step-k latencies exist for exactly the users the funnel counted
    // at stage k+1 (later stages refine earlier ones)
    lat.foreach { case (k, _, _, n, mn, mx, mean) =>
      assert(n == funnel(k + 1), s"pair $k user count")
      assert(mn > 0L && mn <= mean && mean <= mx, s"pair $k latency bounds")
    }
  }

  test("windowed funnel equals the gap-bounded chain model and is dominated by the unbounded funnel") {
    import graft.operators.CoreOps
    val wind = CoreOps.eventFunnelWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val free = CoreOps.eventFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(wind.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // the conversion window can only disqualify chains
    wind.foreach { case (k, _, n, _) => assert(n <= free(k), s"stage $k dominance") }
    // ≡ the shared JVM chain with the same gap (an independent
    // implementation of the same first-touch-then-window semantic)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect()
    val stepIdx = CoreOps.FunnelSteps.zipWithIndex.toMap
    val byUser = ev.groupBy(_._1)
    val wantCounts = Seq(byUser.size.toLong) ++ (1 to 3).map { k =>
      byUser.values.count { evs =>
        CoreOps.chainStage(
          evs.collect { case (_, t, us) if stepIdx.contains(t) => (stepIdx(t), us) }.toSeq,
          3, CoreOps.FunnelGapUs) >= k
      }.toLong
    }
    assert(wind.map(_._3).toSeq == wantCounts, "windowed stage counts must equal the model")
  }

  test("TF-IDF ranks are dense 1..k and scores non-increasing per doc") {
    val rows = TextOps.tfidfTopk(spark, sf)
      .as[(Long, Long, String, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      val scores = sorted.map(_._6)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // only the profiled batch appears; df/N still span the whole corpus
    assert(rows.forall(_._1 < TextOps.TfidfDocLimit))
    // ...and the batch prunes AT THE SCAN (the df side legitimately
    // reads everything; the tf side must not)
    val scans = TextOps.tfidfTopk(spark, sf).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }
    assert(scans.exists(_.contains("doc_id")),
      s"profiled-batch scan must push the doc_id filter; PushedFilters: $scans")
  }

  test("embedding profile covers every dimension with the full corpus") {
    val rows = SimilarityOps.embedProfile(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0L until rows.length))
    // every vector contributes to every dimension (no ragged arrays)
    assert(rows.map(_._2).distinct.length == 1)
    assert(rows.forall { case (_, _, _, mn, mx, mean) => mn <= mean && mean <= mx })
  }

  test("token drift ranks are dense, rates bounded, and drift consistent") {
    val rows = CurationOps.tokenDrift(spark, sf)
      .as[(String, Long, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      val drifts = sorted.map(_._7)
      assert(drifts.zip(drifts.tail).forall { case (x, y) => x >= y })
    }
    // per-mille-e3 rates are bounded and drift is their difference
    assert(rows.forall { case (_, _, _, _, rate, rest, drift) =>
      rate >= 0 && rate <= 1000 && rest >= 0 && rest <= 1000 && drift == rate - rest
    })
  }

  test("substring decontamination flags only non-benchmark docs, via a broadcast join") {
    val df = CurationOps.decontaminateSubstr(spark, sf)
    val rows = df.as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (id, _) => id % CurationOps.DecontMod != 0L })
    assert(rows.forall(_._2 >= 1L))
    // the benchmark window set must broadcast — the corpus side never
    // shuffles before the semi-join at 100 TB
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "benchmark window set must broadcast")
  }

  test("curation funnel stages are monotone and reconcile with the curated output") {
    val funnel = CurationOps.curationFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(funnel.nonEmpty)
    funnel.foreach { case (src, raw, q, g, u, nd) =>
      assert(raw >= q && q >= g && g >= u && u >= nd && nd >= 0,
        s"$src: stages must shrink monotonically ($raw, $q, $g, $u, $nd)")
    }
    // the exact-dedup stage IS the curated set — per-source unique
    // counts must sum to exactly what curate keeps
    val curated = CurationOps.curate(spark, sf).as[Long].collect().toSeq
    assert(funnel.map(_._5).sum == curated.size)
    // the near-dup stage reconciles with an independent recompute:
    // group the curated keepers by their #50 cluster label (docs in
    // no pair are singletons), one survivor per cluster
    val labels = graft.operators.ClusterOps.dedupCluster(spark, sf)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val survivors = curated.groupBy(d => labels.getOrElse(d, d)).size
    assert(funnel.map(_._6).sum == survivors,
      s"n_neardup total ${funnel.map(_._6).sum} != independent recompute $survivors")
  }

  test("bigram-LM fluency equals a plain-Scala model") {
    import spark.implicits.newProductEncoder
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.split(' ').toSeq.filter(_.nonEmpty)
    }
    val uni = toks.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val big = toks.flatMap { case (_, tk) => tk.zip(tk.drop(1)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = toks.filter(_._2.length >= 2).map { case (id, tk) =>
      val rs = tk.zip(tk.drop(1)).map(p => big(p) * 1000000L / uni(p._1))
      (id, rs.length.toLong, rs.sum / rs.length)
    }.sortBy(_._1).toSeq
    val got = TextOps.lmQuality(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want, "operator diverges from the reference model")
    // sanity of the signal itself: scores live strictly inside the
    // fixed-point range (a bigram ratio can never exceed 1e6)
    assert(got.forall { case (_, n, s) => n >= 1L && s >= 0L && s <= 1000000L })
  }

  test("PMI collocation lift equals a plain-BigInt model") {
    import spark.implicits.newProductEncoder
    import TextOps.{PmiMinCount, PmiTopK}
    val toks = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(' ').toSeq.filter(_.nonEmpty) }
    val uni = toks.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val big = toks.filter(_._2.length >= 2)
      .flatMap { case (_, tk) => tk.zip(tk.drop(1)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = big.values.sum
    val want = big.toSeq.collect { case ((w1, w2), c12) if c12 >= PmiMinCount =>
      val lift = (BigInt(c12) * nTot * 1000000L /
        (BigInt(uni(w1)) * uni(w2))).toLong
      (w1, w2, c12, lift)
    }.sortBy { case (w1, w2, _, l) => (-l, w1, w2) }.take(PmiTopK)
    val got = TextOps.pmiTopk(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == want, "operator diverges from the reference model")
    // lift is symmetric in scale: a perfectly-predictive pair attains
    // n_tot·1e6/max(c1,c2) ≥ lift; no score can be negative
    assert(got.forall(_._4 >= 0L))
  }

  test("metadata audit equals a plain-Scala model and bounds its counts") {
    import spark.implicits.newProductEncoder
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars", "text").as[(String, Long, String)].collect()
    val want = docs.groupBy(_._1).view.mapValues { rows =>
      val diffs = rows.map { case (_, nc, t) => math.abs(nc - t.length.toLong) }
      (rows.length.toLong, diffs.count(_ != 0L).toLong, diffs.max)
    }.toMap
    val got = graft.operators.CurationOps.metaAudit(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (src, n, m, d) =>
      assert((n, m, d) == want(src), s"$src diverges")
      assert(m <= n && (m > 0L || d == 0L))
    }
  }

  test("vocabulary growth profile equals a plain-Scala model") {
    import spark.implicits.newProductEncoder
    val docs = Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
    val want = docs.groupBy(_._1).view.mapValues { rows =>
      val counts = rows.flatMap(_._2.split(' ').filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.length.toLong)
      val nTok = counts.values.sum
      val nTerms = counts.size.toLong
      val nHapax = counts.count(_._2 == 1L).toLong
      (nTok, nTerms, nHapax, nTerms * 1000000L / nTok, nHapax * 1000000L / nTerms)
    }.toMap
    val got = TextOps.vocabGrowth(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (src, nTok, nTerms, nHapax, ttr, hr) =>
      assert((nTok, nTerms, nHapax, ttr, hr) == want(src), s"$src diverges")
      assert(nHapax <= nTerms && nTerms <= nTok)
    }
  }

  test("token diversity equals a plain-Scala model") {
    import spark.implicits.newProductEncoder
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = docs.flatMap { case (id, t) =>
      val tk = t.split(' ').filter(_.nonEmpty)
      val n = tk.length.toLong
      if (n == 0L) None
      else {
        val ssq = tk.groupBy(identity).values
          .map(g => g.length.toLong * g.length).sum
        Some((id, n, ssq, (n * n - ssq) * 1000000L / (n * n)))
      }
    }.sortBy(_._1).toSeq
    val got = TextOps.tokenDiversity(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want, "operator diverges from the reference model")
    // Σc² is bracketed by all-distinct (= n) and all-same (= n²), so
    // the Simpson share lives strictly inside [0, 1e6)
    assert(got.forall { case (_, n, ssq, s) =>
      ssq >= n && ssq <= n * n && s >= 0L && s < 1000000L
    })
  }

  test("token diversity survives a multi-million-token doc (no Long overflow)") {
    import spark.implicits.newProductEncoder
    // 3.2M tokens over 20 distinct words: (n² − Σc²)·10⁶ ≈ 9.7e18
    // exceeds Long.MaxValue — the DECIMAL(38,0) intermediate must
    // carry it (simpson = (1 − 1/20)·1e6 = 950000 exactly)
    val n = 3200000
    val sb = new StringBuilder(n * 4)
    var i = 0
    while (i < n) { sb.append('w').append(i % 20).append(' '); i += 1 }
    val dir = tmpDir("graft-diversity-huge-")
    Seq((1L, sb.toString, "en", "srcA", n.toLong * 4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.tokenDiversity(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ssq = 20L * 160000L * 160000L
    assert(got == Seq((1L, n.toLong, ssq, 950000L)))
  }

  test("length gate equals a plain-Scala model and conserves its flags") {
    import spark.implicits.newProductEncoder
    val lens = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").as[(String, Long, String)].collect()
      .map { case (s, id, t) => (s, id, t.split(' ').count(_.nonEmpty).toLong) }
    val want = lens.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      val lo = sorted(((n - 1) * CurationOps.LengthGateLoPct / 100L).toInt)
      val hi = sorted(((n - 1) * CurationOps.LengthGateHiPct / 100L).toInt)
      val below = sorted.count(_ < lo).toLong
      val above = sorted.count(_ > hi).toLong
      (n, lo, hi, below, above, n - below - above)
    }.toMap
    val got = CurationOps.lengthGate(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (s, n, lo, hi, nb, na, nk) =>
      assert((n, lo, hi, nb, na, nk) == want(s), s"$s diverges")
      assert(lo <= hi && nb + na + nk == n)
    }
  }

  test("histogram quantile estimates bracket the exact rank picks within one bucket") {
    val rows = CurationOps.histQuantiles(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val w = CurationOps.HistBucketW
    rows.foreach { case (s, n, p50, e50, p90, e90, p99, e99) =>
      assert(n > 0L)
      // the rank-picked value lies inside its own bucket, so the
      // bucket-upper estimate is ≥ exact and < one bucket above
      Seq((p50, e50), (p90, e90), (p99, e99)).foreach { case (ex, est) =>
        assert(est >= ex && est - ex < w, s"$s: est $est vs exact $ex")
      }
      assert(p50 <= p90 && p90 <= p99 && e50 <= e90 && e90 <= e99)
    }
  }

  test("quality percentiles equal the histogram-rank model over the raw metric frames") {
    import spark.implicits.newProductEncoder
    val w = CurationOps.PctBucketW
    // expected pct per doc, derived from each operator's own output
    // (the metric operators carry their own ≡-model proofs)
    def pcts(rows: Seq[(Long, Long)]): Map[Long, Long] = {
      val byBucket = rows.groupBy(_._2 / w).view.mapValues(_.size.toLong).toMap
      val n = rows.size.toLong
      rows.map { case (id, s) =>
        val below = byBucket.filter(_._1 < s / w).values.sum
        id -> below * 10000L / n
      }.toMap
    }
    val lm = pcts(TextOps.lmQuality(spark, sf)
      .select("doc_id", "lm_score_e6").as[(Long, Long)].collect().toSeq)
    val dv = pcts(TextOps.tokenDiversity(spark, sf)
      .select("doc_id", "simpson_e6").as[(Long, Long)].collect().toSeq)
    val rp = pcts(TextOps.textRepetition(spark, sf)
      .select("doc_id", "top_tok_ratio_e4").as[(Long, Long)].collect().toSeq
      .map { case (id, r) => (id, (10000L - r) * 100L) })
    val got = CurationOps.qualityPercentile(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet == lm.keySet, "domain = the LM metric's docs")
    got.foreach { case (id, l, d, r, c) =>
      assert((l, d, r) == (lm(id), dv(id), rp(id)), s"doc $id pct diverges")
      assert(c == (l + d + r) / 3L)
      assert(l >= 0L && l < 10000L && d < 10000L && r < 10000L)
    }
  }

  test("retention cohorts: conservation and bounds") {
    val rows = graft.operators.CoreOps.retentionDaily(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1) // day, n_active, n_new, n_retained, retention_e4
    assert(rows.nonEmpty)
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect()
    // every user is new exactly once: Σ n_new = distinct users
    assert(rows.map(_._3).sum == ud.map(_._1).distinct.length)
    // the first day has no history: everyone is new, nobody retained
    val first = rows.head
    assert(first._3 == first._2 && first._4 == 0L)
    val actByDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, act, nw, ret, e4) =>
      assert(nw <= act && ret <= act)
      val prev = actByDay.getOrElse(day - 1, 0L)
      assert(ret <= prev, s"day $day: retained $ret > prev actives $prev")
      assert(e4 == (if (prev == 0L) 0L else ret * 10000L / prev))
      // retained + new <= active (a user is never both), and a day
      // with a predecessor accounts every active as new|retained|lapsed-return
      assert(nw + ret <= act)
    }
  }

  test("event gaps equal a per-(user,type) sequential-scan model") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")))
      .as[(Long, String, Long, Long)].collect()
    val model = ev.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, typ), es) =>
        es.sortBy(e => (e._4, e._3)).toSeq.sliding(2).collect {
          case Seq(a, b) => (typ, b._4 - a._4)
        }
      }
      .groupBy(_._1).view.mapValues { rows =>
        val gs = rows.map(_._2)
        (gs.size.toLong, gs.min, gs.max, gs.sum / gs.size)
      }.toMap
    val got = graft.operators.WindowOps.eventGaps(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.map(_._1).distinct.length == got.length)
    got.foreach { case (typ, n, mn, mx, mean) =>
      val (wn, wmn, wmx, wmean) = model(typ)
      assert((n, mn, mx, mean) == ((wn, wmn, wmx, wmean)), s"$typ diverges from model")
      assert(mn >= 0L && mn <= mean && mean <= mx, s"$typ bounds must order")
    }
    assert(got.map(_._1).toSet == model.keySet, "every type with >=2 same-user events reports")
  }

  test("oov rate equals a plain-Scala model over the deterministic vocab cut") {
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(spark, sf)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .as[(String, String)].collect()
    val vocab = toks.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(TextOps.OovVocabK).map(_._1).toSet
    val model = toks.groupBy(_._1).view.mapValues { rows =>
      val n = rows.length.toLong
      val oov = rows.count(r => !vocab.contains(r._2)).toLong
      (n, oov, oov * 1000000L / n)
    }.toMap
    val got = TextOps.oovRate(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, n, oov, rate) =>
      assert((n, oov, rate) == model(src), s"$src diverges from model")
      assert(oov <= n && rate >= 0L && rate <= 1000000L)
    }
    assert(got.map(_._1).toSet == model.keySet)
  }

  test("quality yield curve reconciles with the quality artifact and is cumulative-consistent") {
    import graft.functions.TextFunctions.tokens
    val per = Tables.documents(spark, sf)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .join(CurationOps.qualityPercentile(spark, sf)
        .select(col("doc_id"), col("composite_e4")), Seq("doc_id"))
      .select(col("composite_e4"), col("n_tok"))
      .as[(Long, Long)].collect()
    val model = per.groupBy(r => math.min(r._1 / 1000L, 9L)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    val got = CurationOps.qualityYield(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSet == model.keySet)
    got.foreach { case (d, n, t, _, _) =>
      assert((n, t) == model(d), s"decile $d diverges from model")
    }
    // cumulative columns: docs/tokens kept when gating at >= decile
    got.foreach { case (d, _, _, cd, ct) =>
      val keep = per.filter(r => math.min(r._1 / 1000L, 9L) >= d)
      assert(cd == keep.length.toLong && ct == keep.map(_._2).sum,
        s"decile $d cumulative diverges")
    }
    assert(got.map(_._2).sum == per.length.toLong, "deciles must partition the quality domain")
  }

  test("contamination-by-split reconciles with the hit listing under the split map") {
    val split = CurationOps.splitTrainVal(spark, sf)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    val hits = CurationOps.decontaminate(spark, sf)
      .select(col("doc_id")).as[Long].collect().toSet
    val corpusByCplit = split.toSeq
      .filter(_._1 % CurationOps.DecontMod != 0L).groupBy(_._2)
    val got = CurationOps.deconBySplit(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == corpusByCplit.keySet)
    got.foreach { case (sp, n, cont, rate) =>
      val docs = corpusByCplit(sp).map(_._1)
      assert(n == docs.length.toLong, s"$sp corpus count")
      assert(cont == docs.count(hits).toLong, s"$sp contaminated count")
      assert(rate == cont * 1000000L / n)
    }
  }

  test("rolling 7-day actives equal a per-day set model and bound DAU") {
    import graft.operators.CoreOps
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect()
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = CoreOps.rollingActive(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == byDay.keySet, "every observed day reports")
    got.foreach { case (day, dau, wau) =>
      val want = (day - 6L to day).flatMap(d => byDay.getOrElse(d, Set.empty)).toSet
      assert(dau == byDay(day).size.toLong, s"day $day DAU")
      assert(wau == want.size.toLong, s"day $day WAU7 diverges from the set model")
      assert(wau >= dau, s"day $day: the window must contain the day")
    }
  }

  test("char profile equals a plain-Scala classifier and the classes bound the total") {
    val per = Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
    val model = per.groupBy(_._1).view.mapValues { rows =>
      val n = rows.map(_._2.length.toLong).sum
      val na = rows.map(_._2.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')).toLong).sum
      val nd = rows.map(_._2.count(c => c >= '0' && c <= '9').toLong).sum
      val ns = rows.map(_._2.count(_ == ' ').toLong).sum
      (n, na, nd, ns, na * 1000000L / n, nd * 1000000L / n, ns * 1000000L / n)
    }.toMap
    val got = TextOps.charProfile(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == model.keySet)
    got.foreach { case (src, n, na, nd, ns, ae, de, se) =>
      assert((n, na, nd, ns, ae, de, se) == model(src), s"$src diverges from model")
      assert(na + nd + ns <= n, s"$src classes must bound the total")
    }
  }

  test("token funnel: monotone stages, reconciles with source stats and the doc funnel") {
    val got = CurationOps.curationFunnelTokens(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, raw, q, g, u, nd) =>
      assert(raw >= q && q >= g && g >= u && u >= nd,
        s"$src: token stages must be monotone non-increasing")
    }
    // t_raw per source = sourceStats token totals (one tokens() rule)
    val stats = CurationOps.sourceStats(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    got.foreach { case (src, raw, _, _, _, _) =>
      assert(raw == stats(src), s"$src t_raw drifts from sourceStats")
    }
    // zero docs at a stage <=> zero tokens at that stage (same keepers)
    val docs = CurationOps.curationFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    got.foreach { case (src, _, _, _, u, nd) =>
      val d = docs(src)
      assert((d._5 == 0L) == (u == 0L) && (d._6 == 0L) == (nd == 0L),
        s"$src: doc and token funnels disagree on empty stages")
      assert(u >= d._5 && nd >= d._6,
        s"$src: every surviving doc has >= 1 token (gated docs have >= 10)")
    }
  }

  test("quality-length slope equals a plain-BigInt least-squares model") {
    import graft.functions.TextFunctions.tokens
    val per = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("x"))
      .join(CurationOps.qualityPercentile(spark, sf)
        .select(col("doc_id"), col("composite_e4")), Seq("doc_id"))
      .select(col("source"), col("x"), col("composite_e4"))
      .as[(String, Long, Long)].collect()
    val model = per.groupBy(_._1).view.mapValues { rows =>
      val n = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._2)).sum
      val sy = rows.map(r => BigInt(r._3)).sum
      val sxy = rows.map(r => BigInt(r._2) * r._3).sum
      val sxx = rows.map(r => BigInt(r._2) * r._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope = if (den == 0) BigInt(0)
        else if (num < 0) -((-num) * 1000000 / den)
        else num * 1000000 / den
      (n.toLong, sx.toLong, sy.toLong, slope.toLong)
    }.toMap
    val got = CurationOps.qualityLengthSlope(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, n, sx, sy, slope) =>
      assert((n, sx, sy, slope) == model(src), s"$src diverges from model")
    }
    assert(got.map(_._1).toSet == model.keySet)
  }

  test("daily anomaly equals a plain-BigInt model — flag exact, never ulp-dependent") {
    import graft.operators.CoreOps
    val days = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ordered = days.toSeq.sortBy(_._1)
    val n = BigInt(ordered.length)
    val s = BigInt(ordered.map(_._2).sum)
    val q = BigInt(ordered.map(v => v._2 * v._2).sum)
    val model = ordered.zipWithIndex.map { case ((day, x), i) =>
      val delta = if (i == 0) 0L else x - ordered(i - 1)._2
      val dev = n * BigInt(x) - s
      val spike = if (dev * dev > 9 * (n * q - s * s)) 1L else 0L
      (day, x, delta, spike)
    }
    val got = CoreOps.dailyAnomaly(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == model, s"anomaly drift: got=${got.take(3)} want=${model.take(3)}")
  }

  test("event affinity equals a brute-force pair model with exact lift") {
    import graft.operators.CoreOps
    val ut = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
      .as[(Long, String)].collect()
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nUsers = BigInt(ut.map(_._1).distinct.length)
    val types = byType.keys.toSeq.sorted
    val model = (for {
      (a, i) <- types.zipWithIndex; b <- types.drop(i + 1)
      both = (byType(a) & byType(b)).size.toLong if both > 0
    } yield {
      val (na, nb) = (byType(a).size.toLong, byType(b).size.toLong)
      val lift = (BigInt(both) * nUsers * 10000) / (BigInt(na) * nb)
      (a, b, both, na, nb, lift.toLong)
    }).toSet
    val got = CoreOps.eventAffinity(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == model,
      s"affinity drift: extra=${got.diff(model).take(2)} missing=${model.diff(got).take(2)}")
  }

  test("event transitions equal a per-user sequential-scan model with exact shares") {
    import graft.operators.WindowOps
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4)
      }
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val model = counts.toSeq.sortBy(_._1).map { case ((a, b), n) =>
      (a, b, n, 10000L * n / fromTot(a))
    }
    val got = WindowOps.eventTransitions(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == model,
      s"transition drift: extra=${got.diff(model).take(2)} missing=${model.diff(got).take(2)}")
    // shares of each from-type's outgoing edges sum to ~1e4 (floor div)
    got.groupBy(_._1).foreach { case (a, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 10000L && s > 10000L - rows.size,
        s"outgoing shares of $a must sum to 1e4 within floor-division slack")
    }
  }

  test("peak-rate profile equals a per-user minute-grid model") {
    import graft.operators.WindowOps
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    val peaks = ev.groupBy(_._1).values.map { rows =>
      rows.groupBy(r => r._2 / 60000000L).values.map(_.size.toLong).max
    }
    def log2len(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val model = peaks.groupBy(p => log2len(p).toLong).toSeq.sorted.map {
      case (b, ps) => (b, ps.size.toLong, ps.max)
    }
    val got = WindowOps.rateProfile(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == model, s"rate profile diverges: $got vs $model")
    assert(got.map(_._2).sum == ev.map(_._1).distinct.length.toLong,
      "every user lands in exactly one bucket")
  }

  test("RFM segmentation equals a per-customer recompute") {
    import graft.operators.JoinOps
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("date").cast("string"),
        expr("CAST(round(o_totalprice * 100.0, 0) AS BIGINT)"))
      .as[(Long, String, Long)].collect()
    val ref = java.time.LocalDate.parse(orders.map(_._2).max)
    def log2len(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val cells = orders.groupBy(_._1).values.map { os =>
      val last = java.time.LocalDate.parse(os.map(_._2).max)
      val rDays = java.time.temporal.ChronoUnit.DAYS.between(last, ref)
      (log2len(rDays + 1), log2len(os.size.toLong), log2len(os.map(_._3).sum),
        os.map(_._3).sum)
    }.toSeq
    val model = cells.groupBy(c => (c._1, c._2, c._3)).toSeq.sortBy(_._1)
      .map { case ((r, f, m), cs) =>
        (r, f, m, cs.size.toLong, cs.map(_._4).sum)
      }
    val got = JoinOps.rfmSegments(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == model, s"RFM diverges: extra=${got.diff(model).take(2)} " +
      s"missing=${model.diff(got).take(2)}")
  }

  test("order cohorts equal a per-customer recompute; diagonal is the cohort size") {
    import graft.operators.JoinOps
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), expr("CAST(year(o_orderdate) AS BIGINT)"))
      .as[(Long, Long)].collect()
    val firstYr = o.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = firstYr.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val model = o.distinct.map { case (c, y) => (firstYr(c), y) }
      .groupBy(identity).toSeq.sortBy(_._1).map { case ((co, y), cells) =>
        (co, y, cells.size.toLong, cohortSize(co),
          10000L * cells.size / cohortSize(co))
      }
    val got = JoinOps.orderCohorts(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == model, s"cohorts diverge: extra=${got.diff(model).take(2)} " +
      s"missing=${model.diff(got).take(2)}")
    // the cohort's first year retains everyone by construction
    got.filter(r => r._1 == r._2).foreach { r =>
      assert(r._3 == r._4 && r._5 == 10000L, s"diagonal cell $r")
    }
    assert(got.forall(_._5 <= 10000L))
  }

  test("brand basket equals a brute-force co-purchase model with exact lift") {
    import graft.operators.JoinOps
    val ob = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.part(spark, sf).select(col("p_partkey"), col("p_brand")),
        expr("l_partkey = p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .as[(Long, String)].collect()
    val byBrand = ob.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nOrders = BigInt(ob.map(_._1).distinct.length)
    val brands = byBrand.keys.toSeq.sorted
    val model = (for {
      (a, i) <- brands.zipWithIndex; b <- brands.drop(i + 1)
      both = (byBrand(a) & byBrand(b)).size.toLong if both > 0
    } yield {
      val (na, nb) = (byBrand(a).size.toLong, byBrand(b).size.toLong)
      (a, b, both, na, nb,
        ((BigInt(both) * nOrders * 10000) / (BigInt(na) * nb)).toLong)
    }).toSet
    val got = JoinOps.brandBasket(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == model, s"basket diverges: extra=${got.diff(model).take(2)} " +
      s"missing=${model.diff(got).take(2)}")
  }

  test("session conversion equals a sequential session model") {
    import graft.operators.WindowOps
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val gap = 30L * 60 * 1000000
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      var prev = Long.MinValue
      for (r <- sorted) {
        if (prev != Long.MinValue && r._2 - prev > gap) { out += cur; cur = Nil }
        cur = r._4 :: cur
        prev = r._2
      }
      out += cur
      out
    }.toSeq
    def log2len(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val model = sessions.map(s => (log2len(s.size.toLong),
        if (s.contains("purchase")) 1L else 0L))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (b, ss) =>
        (b, ss.size.toLong, ss.map(_._2).sum,
          10000L * ss.map(_._2).sum / ss.size)
      }
    val got = WindowOps.sessionConversion(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == model, s"conversion curve diverges: $got vs $model")
    assert(got.forall(r => r._4 <= 10000L && r._3 <= r._2))
  }

  test("vocab coverage equals a plain token-count model and ends at full coverage") {
    import graft.operators.TextOps
    import graft.functions.TextFunctions.tokens
    val counts = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("t"))
      .groupBy(col("t")).count()
      .as[(String, Long)].collect()
    def log2len(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val tiers = counts.groupBy(c => log2len(c._2)).toSeq.sortBy(-_._1)
    val tot = counts.map(_._2).sum
    var (cumT, cumO) = (0L, 0L)
    val model = tiers.map { case (b, cs) =>
      cumT += cs.size; cumO += cs.map(_._2).sum
      (b, cs.size.toLong, cs.map(_._2).sum, cumT, cumO,
        (BigInt(cumO) * 1000000 / BigInt(tot)).toLong)
    }
    val got = TextOps.vocabCoverage(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == model, s"coverage curve diverges: $got vs $model")
    assert(got.last._6 == 1000000L, "the full vocab covers everything")
    assert(got.map(_._6) == got.map(_._6).sorted, "coverage is monotone down the tiers")
  }

  test("quality trend equals a slice recompute from the composite artifact") {
    import graft.operators.CurationOps
    val comp = CurationOps.qualityPercentile(spark, sf)
      .select(col("doc_id"), col("composite_e4"))
      .as[(Long, Long)].collect()
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .as[Long].collect()
    val (lo, hi) = (ids.min, ids.max)
    val nb = CurationOps.NoveltyBuckets
    val model = comp.groupBy { case (id, _) =>
        math.min(nb - 1, (id - lo) * nb / (hi - lo + 1))
      }.toSeq.sortBy(_._1).map { case (b, cs) =>
        val vs = cs.map(_._2)
        (b, cs.size.toLong, vs.sum / vs.size, vs.min, vs.max)
      }
    val got = SparkEntry.queries("q_quality_trend")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == model, s"trend diverges: $got vs $model")
    assert(got.map(_._2).sum == comp.length.toLong,
      "slices cover exactly the scored docs")
  }

  test("duplication trend equals a first-member model and reconciles with exact dedup") {
    import graft.operators.CurationOps
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(lower(trim(col("text")))))
      .as[(Long, String)].collect()
    val firstOf = docs.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val (lo, hi) = (docs.map(_._1).min, docs.map(_._1).max)
    val nb = CurationOps.NoveltyBuckets
    val model = docs.groupBy { case (id, _) =>
        math.min(nb - 1, (id - lo) * nb / (hi - lo + 1))
      }.toSeq.sortBy(_._1).map { case (b, ds) =>
        val re = ds.count { case (id, h) => id > firstOf(h) }.toLong
        (b, ds.size.toLong, re, 10000L * re / ds.size)
      }
    val got = SparkEntry.queries("q_dup_trend")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == model, s"dup trend diverges: $got vs $model")
    // total refetches = docs − exact classes (the #37 reconciliation)
    assert(got.map(_._3).sum == docs.length - firstOf.size)
  }

  test("contamination trend reconciles with the decontamination hit listing") {
    import graft.operators.CurationOps
    val hits = SparkEntry.queries("q_decontaminate")(spark, sf)
      .as[(Long, Long)].collect()
    val got = SparkEntry.queries("q_decon_trend")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._3).sum == hits.length.toLong,
      "contaminated-doc total must equal the hit listing")
    assert(got.map(_._4).sum == hits.map(_._2).sum,
      "gram-hit total must equal the hit listing digit-for-digit")
    val corpusN = Tables.documents(spark, sf)
      .filter(col("doc_id") % CurationOps.DecontMod =!= 0L).count()
    assert(got.map(_._2).sum == corpusN, "slices cover the non-benchmark corpus")
  }

  test("integrity audit: every constraint fires on crafted dirty frames and is silent on clean ones") {
    import graft.operators.JoinOps
    // clean production tables: all-zero violations
    val clean = JoinOps.integrityAudit(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(clean.length == 7 && clean.forall(_._3 == 0L),
      s"clean data must audit clean: ${clean.filter(_._3 != 0L).toSeq}")
    // dirty frames: one violation of EVERY rule, driven through the
    // SAME production stage
    val li = Seq(
      (1L, 5.0, 0.1, 10.0),   // ok (order 1 exists)
      (99L, 5.0, 0.1, 10.0),  // FK orphan: no order 99
      (1L, -2.0, 0.1, 10.0),  // quantity <= 0
      (1L, 5.0, 1.5, 10.0))   // discount > 1
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val o = Seq((1L, 10L, 50.0), (2L, 77L, -5.0)) // cust 77 missing; negative total
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val c = Seq(Tuple1(10L)).toDF("c_custkey")
    val ev = Seq(Some(5L), None).toDF("user_id")
    val docs = Seq(1L, 1L, 2L).toDF("doc_id") // duplicate id
    val dirty = JoinOps.integrityReport(li, o, c, ev, docs)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(dirty("fk lineitem.l_orderkey -> orders") == (4L, 1L))
    assert(dirty("fk orders.o_custkey -> customer") == (2L, 1L))
    assert(dirty("range lineitem.l_quantity > 0") == (4L, 1L))
    assert(dirty("range lineitem.l_discount in [0,1]") == (4L, 1L))
    assert(dirty("range orders.o_totalprice >= 0") == (2L, 1L))
    assert(dirty("notnull events.user_id") == (2L, 1L))
    assert(dirty("unique documents.doc_id") == (3L, 1L))
  }

  /** Plain-Scala BPE reference: greedy merge rounds over a word-type
    * count table, symbols as explicit vectors (no string-replace
    * trickery — the independent formulation the operator's wrapped
    * `replace` encoding must agree with). */
  private def bpeModel(counts: Map[String, Long], rounds: Int)
      : (List[(Long, String, String, Long)], Map[String, Vector[String]]) = {
    var types = counts.map { case (w, c) => w -> (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= rounds && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      types.values.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.isEmpty) stop = true
      else {
        val ((s1, s2), n) = pc.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
        merges += ((r.toLong, s1, s2, n))
        types = types.map { case (w, (syms, c)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == s1 && syms(i + 1) == s2) {
              out += s1 + s2; i += 2 // greedy left-to-right, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          w -> (out.result(), c)
        }
      }
      r += 1
    }
    (merges.toList, types.map { case (w, (syms, _)) => w -> syms })
  }

  test("BPE training equals a greedy symbol-vector model; apply reconciles with it") {
    import graft.functions.TextHash.tokensJvm
    val texts = Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
    val counts = texts.flatMap(t => tokensJvm(t._2))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val (wantMerges, finalSyms) = bpeModel(counts, TextOps.BpeTrainRounds)
    val gotMerges = TextOps.bpeMerges(spark, sf)
      .as[(Long, String, String, Long)].collect().toList
    assert(gotMerges == wantMerges,
      s"merge drift: got=${gotMerges.take(3)} want=${wantMerges.take(3)}")
    // overlap semantics: a crafted run-heavy corpus where the wrapped
    // string-replace encoding and the vector model diverge if either
    // double-counts overlapping pairs or merges them non-greedily
    val crafted = Map("aaaa" -> 10L, "aaab" -> 5L, "baaa" -> 3L)
    val (cm, cs) = bpeModel(crafted, 3)
    assert(cm.head._2 == "a" && cm.head._3 == "a" && cm.head._4 == 46L,
      s"(a,a) counts 3+2+2 per type occurrence-weighted: $cm")
    // rounds: (a,a) 46 → (aa,aa) 10 → (aa,a) 8; greedy non-overlap pins
    // "aaaa"→[aa,aa]→[aaaa], "aaab"→[aa,a,b]→[aaa,b], "baaa"→[b,aaa]
    assert(cs("aaaa") == Vector("aaaa") && cs("aaab") == Vector("aaa", "b") &&
      cs("baaa") == Vector("b", "aaa"), cs.toString)
    // apply report reconciles with the model's final segmentation
    val perSrc = texts.flatMap { case (src, txt) => tokensJvm(txt).map(src -> _) }
    val want = perSrc.groupBy(_._1).map { case (src, ws) =>
      val toks = ws.map(_._2)
      (src, toks.length.toLong, toks.map(_.length.toLong).sum,
        toks.map(w => finalSyms(w).length.toLong).sum)
    }.toSet
    val got = TextOps.bpeApply(spark, sf)
      .select(col("source"), col("n_tokens"), col("n_chars"), col("n_units"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"apply drift: extra=${got.diff(want).take(2)} missing=${want.diff(got).take(2)}")
    // fertility bounds: merges only ever shrink, units never below 1/token
    got.foreach { case (_, nt, nc, nu) => assert(nt <= nu && nu <= nc) }
  }
}
