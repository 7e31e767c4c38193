package graft

import graft.functions.{RollingHash, TextHash}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Native expressions + SQL registration (SURVEY.md §2.7 #48, §3):
  * rolling polynomial hash and the SparkSessionExtensions surface. */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("rolling hash matches the direct polynomial on every window") {
    val text = "the quick brown fox jumps over the lazy dog"
    val w = 8
    def direct(s: String): Long =
      s.foldLeft(0L)((h, c) => (RollingHash.mulmod(h, RollingHash.B) + c) % RollingHash.P)
    val rolled = RollingHash.rollingJvm(text, w)
    val naive = text.sliding(w).map(direct).toArray
    assert(rolled.toSeq == naive.toSeq)
    assert(RollingHash.rollingJvm("abc", 8).isEmpty)
    // identical windows hash identically across documents (set semantics)
    assert(RollingHash.rollingJvm("xx abcdefgh yy", 8).toSet
      .intersect(RollingHash.rollingJvm("abcdefgh", 8).toSet).nonEmpty)
  }

  test("mulmod is exact for values near the modulus") {
    val big = RollingHash.P - 1
    // (P-1)^2 mod P = 1
    assert(RollingHash.mulmod(big, big) == 1L)
    assert(RollingHash.mulmod(big, 2L) == RollingHash.P - 2)
  }

  test("rolling hashes work as a Column over documents") {
    val out = Tables.documents(spark, sf)
      .select(col("doc_id"), size(RollingHash.rollingHashes(col("text"), 16)).as("n"))
      .filter(col("n") > 0)
    assert(out.count() > 0)
  }

  test("GraftExtensions registers SQL functions on an extended session") {
    // force a NEW session (same SparkContext) so withExtensions applies;
    // getOrCreate would return the active session and skip them
    val base = spark // initialize shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val grams = s2.sql("SELECT graft_gram_hashes('a b c', 2) AS g")
        .collect()(0).getSeq[Long](0)
      assert(grams.toSet == Set(TextHash.hash60Jvm("a b"), TextHash.hash60Jvm("b c")))
      val sig = s2.sql("SELECT graft_minhash_sig('a b c d', 2, 16) AS s")
        .collect()(0).getSeq[Long](0)
      assert(sig.length == 16 && sig.forall(_ < graft.functions.TextFunctions.MinhashP))
      val rh = s2.sql("SELECT size(graft_rolling_hashes('hello world', 4)) AS n")
        .collect()(0).getInt(0)
      assert(rh == "hello world".length - 3)
      val gs = s2.sql("SELECT graft_gram_strings('a b c', 2) AS g")
        .collect()(0).getSeq[String](0)
      assert(gs == Seq("a b", "b c"))
      val cis = s2.sql(
        "SELECT graft_count_in_set(array('the','fox','the'), 'the,a,of') AS c")
        .collect()(0).getLong(0)
      assert(cis == 2L)
      val mtc = s2.sql(
        "SELECT graft_max_token_count(array('x','y','x','x')) AS m")
        .collect()(0).getLong(0)
      assert(mtc == 3L)
      val zv = s2.sql("SELECT graft_zvalue(3L, 3L, 7) AS z")
        .collect()(0).getLong(0)
      assert(zv == 15L)
      // INT literals must coerce (ImplicitCastInputTypes) — constant
      // folding runs the INTERPRETED eval, which would otherwise CCE
      val zvInt = s2.sql("SELECT graft_zvalue(3, 3, 7) AS z")
        .collect()(0).getLong(0)
      assert(zvInt == 15L)
      val op = s2.sql(
        "SELECT graft_ordered_pairs(array(5L, 2L, 9L)) AS p")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(op == Set((2L, 5L), (5L, 9L), (2L, 9L)))
      // int-element arrays coerce; duplicate ids emit no self-pair
      val opInt = s2.sql(
        "SELECT graft_ordered_pairs(array(7, 7, 2)) AS p")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(opInt == Seq((2L, 7L), (2L, 7L)))
      // out-of-range bits is an error, not a corrupted interleave
      val zerr = intercept[Exception](
        s2.sql("SELECT graft_zvalue(1L, 1L, 40)").collect())
      assert(zerr.getMessage.contains("[1,31]") ||
        zerr.getMessage.contains("zvalue"))
      // NULL id slots emit nothing — reading them as 0 would
      // fabricate phantom doc-0 pairs the declarative form dropped
      val opNull = s2.sql(
        "SELECT graft_ordered_pairs(array(5L, NULL, 9L)) AS p")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(opNull == Set((5L, 9L)))
      // negative coordinates have no grid cell: error, not a
      // silently-corrupted top-tile z value
      val zneg = intercept[Exception](
        s2.sql("SELECT graft_zvalue(-1L, 0L, 16)").collect())
      assert(zneg.getMessage.contains("non-negative"))
      // non-literal shape parameter is rejected with a clear error
      val err = intercept[Exception](
        s2.sql("SELECT graft_gram_hashes('a b', CAST(rand()*2 AS INT))").collect())
      assert(err.getMessage.contains("integer literal") ||
        err.getMessage.contains("graft_gram_hashes"))
      // vector kernels: e3 quantization (HALF_UP — the §4 contract),
      // integer dot, squared norm
      val qz = s2.sql("SELECT graft_quantize(array(0.5F, -0.0015F)) AS q")
        .collect()(0).getSeq[Long](0)
      assert(qz == Seq(500L, -2L), qz)
      val dot = s2.sql("SELECT graft_dot(array(2L, 3L), array(4L, -1L)) AS d")
        .collect()(0).getLong(0)
      assert(dot == 5L)
      val n2 = s2.sql("SELECT graft_norm2(array(3L, -4L)) AS n")
        .collect()(0).getLong(0)
      assert(n2 == 25L)
      // the composed cosine numerator matches the Scala kernel path
      val cos = s2.sql(
        """SELECT graft_dot(graft_quantize(array(1.0F, 0.0F)),
          |                 graft_quantize(array(1.0F, 0.0F))) AS d""".stripMargin)
        .collect()(0).getLong(0)
      assert(cos == 1000000L)
    } finally {
      // do NOT stop s2 — it shares the test SparkContext; just restore
      // the shared session as active/default for the remaining suites
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
