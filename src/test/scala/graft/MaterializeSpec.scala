package graft

import graft.tools.Materialize
import org.apache.spark.sql.functions._

/** Materialization machinery behind the build-once artifacts (pairs,
  * windows, IVF cells): fingerprint sensitivity and the
  * SupersedingCache contract. */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  test("fingerprint tracks content writes and distinguishes paths") {
    val dir = tmpDir("graft-fp-")
    assert(Materialize.fingerprint(spark, s"$dir/t.parquet") == "absent")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    val fp1 = Materialize.fingerprint(spark, s"$dir/t.parquet")
    assert(fp1 != "absent" && fp1.nonEmpty)
    assert(Materialize.fingerprint(spark, s"$dir/t.parquet") == fp1, "stable between reads")
    // rewrite → part names/sizes/mtimes change → new key
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Materialize.fingerprint(spark, s"$dir/t.parquet") != fp1,
      "a regenerated table must fingerprint differently")
    // the FULL path participates, not just the base name (partition
    // dirs carry data)
    assert(fp1.contains(dir.stripPrefix("/").takeRight(8)) || fp1.contains("t.parquet"))
  }

  test("SupersedingCache builds once per key and evicts the superseded entry") {
    val cache = new Materialize.SupersedingCache[String]
    var builds = 0
    def build(tag: String): String = { builds += 1; tag }
    assert(cache.getOrBuild("dirA", "fp1")(build("a1")) == "a1")
    assert(cache.getOrBuild("dirA", "fp1")(build("a1-again")) == "a1")
    assert(builds == 1, "same (dir, fingerprint) must not rebuild")
    // independent dirs don't interfere
    assert(cache.getOrBuild("dirB", "fp1")(build("b1")) == "b1")
    assert(builds == 2)
    // new fingerprint for dirA supersedes: evicts fp1's ENTRY, so a
    // later fp1 call rebuilds (stale key, regenerated source)
    assert(cache.getOrBuild("dirA", "fp2")(build("a2")) == "a2")
    assert(builds == 3)
    assert(cache.getOrBuild("dirA", "fp1")(build("a1-rebuilt")) == "a1-rebuilt")
    assert(builds == 4, "a superseded key must have been evicted")
    // dirB's entry was untouched by dirA's supersession
    assert(cache.getOrBuild("dirB", "fp1")(build("b1-again")) == "b1")
    assert(builds == 4)
  }
}
