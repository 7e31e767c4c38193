package graft

import graft.functions.TextFunctions.tokens
import graft.operators.CurationOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing (#68): the scalable two-level prefix sum must be
  * row-identical to the naive single-partition global window it
  * replaces, and the block-offset join must broadcast. */
class PackingSpec extends SparkTestBase {
  // selective import: the package-level ColumnInterpolator supplies $
  import spark.implicits.{localSeqToDatasetHolder, newLongEncoder,
    newProductEncoder, newStringEncoder}

  private def naive = {
    val w = Window.orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sf)
      .select($"doc_id", size(tokens($"text")).cast(LongType).as("n_tokens"))
      .withColumn("cum_prev", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("first_pack", expr(s"cum_prev div ${CurationOps.PackBudget}"))
      .withColumn("last_pack",
        expr(s"(cum_prev + greatest(n_tokens, 1) - 1) div ${CurationOps.PackBudget}"))
      .select($"doc_id", $"n_tokens", $"cum_prev", $"first_pack", $"last_pack",
        ($"last_pack" - $"first_pack" + 1L).as("n_packs"))
      .orderBy($"doc_id")
  }

  test("two-level prefix sum equals the naive global-window form") {
    val fast = CurationOps.packSequences(spark, sf).collect().toSeq
    val slow = naive.collect().toSeq
    assert(fast == slow)
  }

  test("packing covers the token stream with no gaps or overlaps") {
    val rows = CurationOps.packSequences(spark, sf)
      .select($"n_tokens", $"cum_prev").as[(Long, Long)].collect()
    // cum_prev of each doc is exactly the sum of all earlier docs —
    // the packed stream has no holes, so pack cuts land where the
    // trainer expects them
    var cum = 0L
    rows.foreach { case (n, prev) => assert(prev == cum); cum += n }
  }

  test("token-less docs: chunking skips them, packing and funnel stay well-formed") {
    val dir = tmpDir("graft-degen-doc-")
    Seq((0L, "", "en", "srcA", 0L), (1L, "   ", "zz", "srcA", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // no tokens → no chunks at all
    assert(CurationOps.chunkDocs(spark, dir).count() == 0L)
    // packing: every doc still OCCUPIES one position (greatest(n,1)),
    // cumulative stream stays at zero tokens
    val packed = CurationOps.packSequences(spark, dir)
      .select($"doc_id", $"n_tokens", $"cum_prev", $"n_packs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(packed == Seq((0L, 0L, 0L, 1L), (1L, 0L, 0L, 1L)))
    // funnel: both docs counted raw, none pass the quality gate (the
    // integer-div-by-zero guard must yield q_ok = 0, not an error)
    val funnel = CurationOps.curationFunnel(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(funnel == Seq(("srcA", 2L, 0L, 0L, 0L, 0L)))
  }

  test("two-level prefix sum matches a plain-Scala model on random corpora") {
    // independent model: sequential fold over (doc_id asc) — no Spark,
    // no windows — pins the distributed two-level scan (including
    // sparse/duplicate-free ids crossing block boundaries) exactly
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val nDocs = 1 + rnd.nextInt(400)
      // sparse ids: stress blocks with uneven populations
      val ids = Seq.fill(nDocs)(rnd.nextInt(1 << 14).toLong).distinct.sorted
      val docs = ids.map(id => (id, Seq.fill(rnd.nextInt(40))("w").mkString(" ")))
      val expected = {
        var cum = 0L
        docs.map { case (id, text) =>
          val n = text.split(" ").count(_.nonEmpty).toLong
          val first = cum / CurationOps.PackBudget
          val last = (cum + math.max(n, 1L) - 1L) / CurationOps.PackBudget
          val row = (id, n, cum, first, last, last - first + 1L)
          cum += n
          row
        }
      }
      val got = CurationOps.packFrame(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"nDocs=$nDocs")
    }
  }

  test("block offsets broadcast — the per-doc side never shuffles for the join") {
    val plan = CurationOps.packSequences(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join on the block-offset frame:\n$plan")
  }

  test("pack stats reconcile: exact fill, full packs except the last, spanning bounds") {
    import spark.implicits.{newLongEncoder, newProductEncoder}
    import graft.operators.CurationOps
    val stats = CurationOps.packStats(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    // pack ids are dense 0..P-1
    assert(stats.map(_._1).toSeq == (0L until stats.length.toLong))
    // every pack except possibly the last is filled to the exact
    // budget; waste is the complement everywhere
    stats.dropRight(1).foreach { case (p, _, _, fill, waste) =>
      assert(fill == CurationOps.PackBudget && waste == 0L, s"pack $p not full")
    }
    stats.foreach { case (_, nd, ns, fill, waste) =>
      assert(ns <= nd && fill + waste == CurationOps.PackBudget)
    }
    // Σ fill_tokens = the corpus token count (nothing lost or
    // double-counted by the per-pack clipping)
    val totalTokens = Tables.documents(spark, sf)
      .select(size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long")).as[Long].collect().sum
    assert(stats.map(_._4).sum == totalTokens)
  }

  test("pack sweep reconciles with the gated packing at the shared budget and is monotone") {
    val sweep = CurationOps.packSweep(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(sweep.map(_._1) == CurationOps.PackSweepBudgets, "one row per budget, ordered")
    val placement = CurationOps.packSequences(spark, sf)
      .select(col("n_tokens"), col("n_packs"), col("last_pack"))
      .as[(Long, Long, Long)].collect()
    // the swept column at the #68 budget must equal the gated operator
    val at = sweep.find(_._1 == CurationOps.PackBudget).get
    assert(at._2 == placement.length.toLong)
    assert(at._3 == placement.map(_._1).sum)
    assert(at._4 == placement.map(_._3).max + 1, "pack count ≡ #68 placement")
    assert(at._5 == placement.count(_._2 > 1L).toLong, "straddlers ≡ #68 n_packs>1")
    // a bigger budget never needs more packs and never straddles more docs
    sweep.sliding(2).foreach { case Seq(a, b) =>
      assert(b._4 <= a._4 && b._5 <= a._5, s"monotone in budget: $a vs $b")
    case _ => }
    // waste is only ever final-pack slack: less than one budget's worth
    sweep.foreach(r => assert(r._7 >= 0L && r._7 < r._1, s"waste bound: $r"))
  }

  test("shard assignment covers the corpus and balances to within two documents") {
    import spark.implicits.{newLongEncoder, newProductEncoder}
    val shards = CurationOps.shardAssign(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val lens = Tables.documents(spark, sf)
      .select(size(tokens($"text")).cast(LongType)).as[Long].collect()
    val total = lens.sum
    val ideal = total / CurationOps.NumShards
    // partition: every doc and every token lands in exactly one shard
    assert(shards.map(_._2).sum == lens.length.toLong)
    assert(shards.map(_._3).sum == total)
    // shard ids live in [0, N) and are sorted/unique; every shard is
    // present unless a single doc outweighs a whole ideal share
    assert(shards.map(_._1).toSeq == shards.map(_._1).sorted.toSeq.distinct)
    assert(shards.forall(s => s._1 >= 0L && s._1 < CurationOps.NumShards))
    val maxDoc = lens.max
    if (maxDoc < ideal)
      assert(shards.length.toLong == CurationOps.NumShards,
        "no doc spans an ideal share, so all shards must be populated")
    // contiguous token-prefix cuts land within one doc of the ideal
    // boundary, so each shard's mass is within two docs of ideal
    shards.foreach { case (s, _, nt, dev) =>
      assert(math.abs(nt - ideal) <= 2 * maxDoc + CurationOps.NumShards,
        s"shard $s mass $nt vs ideal $ideal exceeds the two-doc bound")
      val wantDev = (nt - ideal) * 10000L / math.max(ideal, 1L)
      assert(dev == wantDev, s"shard $s dev_e4")
    }
  }
}
