package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Per-stage shuffle/IO attribution for one named SparkEntry query:
  * `tools/run_main.sh graft.tools.ProfileShuffle q_waiting_supplier /root/repo/.sfgen/sf100`.
  *
  * Captures, per completed stage: input bytes read, shuffle bytes
  * written, shuffle bytes read (local + remote), executor run/CPU
  * time. The point (round-10 VERDICT item 5) is to turn "the residual
  * is single-disk shuffle bandwidth" from an argument into a recorded
  * measurement: local[32] funnels every exchange through one node's
  * disk, so total-shuffle-bytes / wall is the observable bandwidth. */
object ProfileShuffle {
  final case class StageRow(id: Int, name: String, tasks: Int,
      inputMB: Double, shufWriteMB: Double, shufReadMB: Double,
      runSec: Double, cpuSec: Double)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    val rows = ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows.synchronized {
          rows += StageRow(si.stageId,
            si.name.takeWhile(_ != '\n').take(60), si.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.shuffleReadMetrics.localBytesRead +
              m.shuffleReadMetrics.remoteBytesRead) / 1e6,
            m.executorRunTime / 1e3, m.executorCpuTime / 1e9)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listenerBus is private[spark]; a short sleep drains the queue
    Thread.sleep(2000)

    println(f"[shuf] $name: wall ${wall}%.1f s, $n rows")
    println(f"[shuf] ${"stage"}%-6s ${"tasks"}%5s ${"input MB"}%10s " +
      f"${"shufW MB"}%10s ${"shufR MB"}%10s ${"run s"}%8s ${"cpu s"}%8s  name")
    val snap = rows.synchronized(rows.sortBy(_.id).toVector)
    snap.foreach { r =>
      println(f"[shuf] ${r.id}%-6d ${r.tasks}%5d ${r.inputMB}%10.1f " +
        f"${r.shufWriteMB}%10.1f ${r.shufReadMB}%10.1f ${r.runSec}%8.1f " +
        f"${r.cpuSec}%8.1f  ${r.name}")
    }
    val w = snap.map(_.shufWriteMB).sum
    val rd = snap.map(_.shufReadMB).sum
    val in = snap.map(_.inputMB).sum
    println(f"[shuf] TOTAL input ${in}%.1f MB, shuffle write ${w}%.1f MB, " +
      f"shuffle read ${rd}%.1f MB; write+read/wall = ${(w + rd) / wall}%.1f MB/s")
    spark.stop()
  }
}
