package graft.tools

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene helpers for iterative operators.
  *
  * `localCheckpoint` truncates lineage by persisting the plan's RDD,
  * but `Dataset.unpersist` does NOT free those blocks (it only drops
  * the SQL cache entry) — they stay resident for the session unless
  * the underlying RDD itself is unpersisted. That leak measurably
  * taxed every later query sharing the session (BENCH_r03:
  * q_json_extract 21 s in-bench vs 0.5 s isolated). These helpers
  * give iterative code an explicit lifetime: find the checkpoint RDD
  * behind a frame, free it once superseded, and copy a final result
  * OUT of the block manager via a short parquet round-trip (on a real
  * cluster that round-trip is the reliable-checkpoint / write-out step
  * a production pipeline does anyway).
  */
object Materialize {

  /** The persisted RDDs behind a `localCheckpoint`ed frame (every
    * `LogicalRDD` leaf Spark rewrote the plan to) — plural, so a
    * join/union of checkpointed frames frees ALL of them, not just
    * the first leaf. Works on any projection of the checkpointed
    * frame(s) too. */
  def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }.distinct

  /** Free the checkpoint blocks behind `df` (no-op if none). Safe to
    * call once the frame's data has been copied or superseded —
    * recomputation is impossible after this (lineage was truncated). */
  def freeCheckpoint(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(blocking = false))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close() // an unclosed walk leaks a directory fd
    }

  private lazy val tmpRoot: Path = {
    val dir = Files.createTempDirectory("graft-materialize-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir
  }

  /** Copy `df` out of the block manager: write parquet under a
    * session-temp dir and return a plain scan of it. The result holds
    * no cached/checkpointed blocks, so every checkpoint feeding `df`
    * can be freed immediately after this returns.
    *
    * Lifetime: the backing dir lives until JVM exit (reclaimed by the
    * [[tmpRoot]] shutdown hook), so the returned frame is valid no
    * matter how late it is consumed. An earlier last-K-per-name eager
    * eviction could delete the dir under a still-held lazily-read
    * frame; frames round-tripped here are small by contract (label /
    * index frames, never corpora), so session temp growth is bounded
    * by call count, not data size — per-call eviction buys nothing
    * worth that failure mode. */
  def parquetRoundTrip(df: DataFrame, name: String): DataFrame = {
    val dir = Files.createTempDirectory(tmpRoot, name)
    df.write.mode("overwrite").parquet(dir.toString)
    // explicit schema: an all-empty frame writes no part files, which
    // would otherwise fail schema inference on the read back
    df.sparkSession.read.schema(df.schema).parquet(dir.toString)
  }

  /** Write `df` as parquet under the session-temp root and return the
    * path — for build-once/probe-many indexes (e.g. IVF cells). */
  def writeParquet(df: DataFrame, name: String): String = {
    val dir = Files.createTempDirectory(tmpRoot, name).toString
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  /** (name, size, mtime) fingerprint of a table path, resolved through
    * the path's Hadoop FileSystem — works on hdfs:// and s3:// the
    * same as file:// (a java.io.File walk would fingerprint every
    * remote store as a constant, silently serving stale derived data).
    * "absent" when the path does not exist. */
  def fingerprint(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val files = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(p, true) // recursive, files only
      while (it.hasNext) {
        val st = it.next()
        // FULL path, not base name: partition-dir names carry data
        // (year=2026/...), so a layout-only move must change the key
        files += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      files.sorted.mkString(",")
    }
  }

  /** Build-once cache for derived artifacts keyed by (source dir,
    * source [[fingerprint]]), with SUPERSEDE eviction: when a new
    * fingerprint lands for a dir, the old MAP ENTRY is dropped so the
    * cache holds one live artifact per source. The superseded temp dir
    * itself is NOT deleted eagerly: fingerprints carry no ordering, so
    * under racing callers (one computed its fingerprint just before a
    * source rewrite) "superseded" cannot be told from "newest", and an
    * eager delete could destroy the artifact a just-served lazily-read
    * frame still scans. Disk stays bounded by build count (artifacts
    * are small by the [[parquetRoundTrip]] contract) and is reclaimed
    * by the [[tmpRoot]] shutdown hook. */
  final class SupersedingCache[V] {
    private val entries = new java.util.concurrent.ConcurrentHashMap[String, V]()
    private val current = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def getOrBuild(dir: String, fingerprint: String)(build: => V): V = {
      val key = s"$dir|$fingerprint"
      val v = entries.computeIfAbsent(key, _ => build)
      val prev = current.put(dir, key)
      if (prev != null && prev != key) entries.remove(prev)
      v
    }

    /** Re-key `dir`'s live entry to a new fingerprint after an
      * APPEND-style source update whose derived delta has already
      * been folded into the stored artifact (e.g. a dedup drop's band
      * rows appended to the band table) — the artifact follows the
      * source without a from-scratch rebuild. `f` runs on the live
      * value before the re-key (the append itself). None when `dir`
      * has no live entry — the caller falls back to the ordinary
      * build-on-next-touch path. */
    def rekey(dir: String, newFingerprint: String)(f: V => V): Option[V] =
      Option(current.get(dir)).flatMap(k => Option(entries.get(k))).map { v =>
        val nv = f(v)
        val key = s"$dir|$newFingerprint"
        entries.put(key, nv)
        val prev = current.put(dir, key)
        if (prev != null && prev != key) entries.remove(prev)
        nv
      }
  }
}
