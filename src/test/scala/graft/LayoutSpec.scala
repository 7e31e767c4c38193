package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Data-layout operators (SURVEY §2.7 #148/#149): the z-order write
  * must make row-group min/max statistics prune on the SECOND
  * dimension (where a single-column sort layout reads everything),
  * and compaction must hit its file-count target — both measured
  * against the actual parquet footers, not the plan. */
class LayoutSpec extends SparkTestBase {

  // deterministic 128x128 grid: x = id % 128, y = id / 128
  private def grid = {
    spark.range(128L * 128L)
      .select((col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"),
        col("id").as("payload"))
  }

  test("z-order layout prunes row groups on the non-leading dimension; linear does not") {
    val zDir = tmpDir("layout-z")
    val xDir = tmpDir("layout-x")
    LayoutOps.zorderWrite(grid, "x", "y", zDir, nFiles = 16, bits = 7)
    LayoutOps.linearWrite(grid, "x", xDir, nFiles = 16)

    val zStats = LayoutOps.rowGroupStats(spark, zDir, "x", "y")
    val xStats = LayoutOps.rowGroupStats(spark, xDir, "x", "y")
    assert(zStats.nonEmpty && xStats.nonEmpty)

    // a y-only slab: 1/16 of the y span, x unconstrained
    val yBox = Some((0L, 7L))
    val zMatch = LayoutOps.matchingGroups(zStats, None, yBox)
    val xMatch = LayoutOps.matchingGroups(xStats, None, yBox)
    // linear-on-x files each span all of y — zero pruning
    assert(xMatch == xStats.size, s"expected no pruning, got $xMatch/${xStats.size}")
    // z files are ~axis-aligned tiles — most never touch the slab
    assert(zMatch * 2 <= zStats.size,
      s"z-order pruned too little: $zMatch of ${zStats.size} groups match")

    // the rewrite moved rows, never changed them
    val out = spark.read.parquet(zDir)
      .agg(count(lit(1)), sum("x"), sum("y"), sum("payload")).head()
    val in = grid.agg(count(lit(1)), sum("x"), sum("y"), sum("payload")).head()
    assert(out == in)
  }

  test("z-order layout still prunes on the leading dimension") {
    val zDir = tmpDir("layout-z2")
    LayoutOps.zorderWrite(grid, "x", "y", zDir, nFiles = 16, bits = 7)
    val zStats = LayoutOps.rowGroupStats(spark, zDir, "x", "y")
    val zMatch = LayoutOps.matchingGroups(zStats, Some((0L, 7L)), None)
    assert(zMatch * 2 <= zStats.size,
      s"x-slab pruned too little: $zMatch of ${zStats.size}")
  }

  test("compaction rewrites a many-small-files directory to the byte-target count") {
    val smallDir = tmpDir("layout-small")
    val outDir = tmpDir("layout-compact")
    grid.repartition(64).write.mode("overwrite").parquet(smallDir)
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files(smallDir).length == 64)

    val totalBytes = files(smallDir).map(_.length()).sum
    val n = LayoutOps.compact(spark, smallDir, outDir, targetBytes = totalBytes / 4)
    assert(n >= 4 && n <= 5, s"unexpected target count $n") // ceil division
    // coalesce caps at the scan's partition count (tiny files pack
    // into fewer read splits), so the result can undershoot the
    // target — never overshoot it
    val outCount = files(outDir).length
    assert(outCount <= n && outCount >= 1, s"got $outCount files for target $n")

    val got = spark.read.parquet(outDir)
      .agg(count(lit(1)), sum("x"), sum("y"), sum("payload")).head()
    val want = grid.agg(count(lit(1)), sum("x"), sum("y"), sum("payload")).head()
    assert(got == want)
  }

  test("compaction sizes partitioned (nested) input from a recursive listing") {
    val partDir = tmpDir("layout-part")
    val outDir = tmpDir("layout-part-out")
    grid.withColumn("k", col("x") % 4)
      .write.mode("overwrite").partitionBy("k").parquet(partDir)
    // files live in k=*/ subdirs: a top-level listing sees 0 bytes and
    // would coalesce everything to 1 file regardless of the target
    val bytes = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(partDir))
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    assert(bytes > 0)
    val n = LayoutOps.compact(spark, partDir, outDir, targetBytes = bytes / 4)
    assert(n >= 4, s"partitioned input must size from nested bytes, got n=$n")
    val got = spark.read.parquet(outDir).agg(count(lit(1)), sum("x")).head()
    val want = grid.agg(count(lit(1)), sum("x")).head()
    assert(got == want)
  }

  test("hive-partitioned write prunes non-matching partitions at plan time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val out = tmpDir("parted")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      col("source"))
    LayoutOps.partitionedWrite(docs, "lang", out)
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).sorted
    assert(langs.length > 1, "test needs several partitions to prune")
    // directory layout: one subdir per lang value
    val subdirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(subdirs.toSeq == langs.map("lang=" + _).toSeq, subdirs.toSeq)

    val read = spark.read.parquet(out).filter(col("lang") === langs.head)
    // materialize THIS plan (a separate count() would execute a fresh
    // plan instance and leave these scan metrics untouched)
    assert(read.collect().length.toLong ==
      docs.filter(col("lang") === langs.head).count())
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
    val scan = scans(read.queryExecution.executedPlan).head
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
    // the scan must open ONLY the matching partition's files —
    // planning-time directory pruning, not row filtering
    val partFiles = new java.io.File(s"$out/lang=${langs.head}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == partFiles.toLong,
      s"scan read ${scan.metrics("numFiles").value} files, partition has $partFiles")
    // content round-trips across the partitioned layout
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("zorderWrite on empty input writes empty output instead of NPE-ing") {
    val outDir = tmpDir("layout-empty")
    LayoutOps.zorderWrite(grid.filter(col("x") < -1), "x", "y", outDir, 4)
    assert(spark.read.parquet(outDir).count() == 0)
  }

  test("z-interleave kernel: bit-exact round trip on tile corners") {
    import graft.functions.LayoutFunctions.zInterleaveJvm
    assert(zInterleaveJvm(0L, 0L, 7) == 0L)
    assert(zInterleaveJvm(1L, 0L, 7) == 1L)
    assert(zInterleaveJvm(0L, 1L, 7) == 2L)
    assert(zInterleaveJvm(3L, 3L, 7) == 15L)
    assert(zInterleaveJvm(127L, 127L, 7) == (1L << 14) - 1)
    // z range of one 32x32 tile is contiguous: the tile (x in [32,63],
    // y in [0,31]) occupies exactly one 2^10-aligned z block
    val zs = for (x <- 32L to 63L; y <- 0L to 31L) yield zInterleaveJvm(x, y, 7)
    assert(zs.min == zInterleaveJvm(32L, 0L, 7))
    assert(zs.max - zs.min == (1L << 10) - 1 && zs.distinct.size == 1024)
  }
}
