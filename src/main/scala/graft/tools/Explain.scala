package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for selected queries so plan
  * properties (PushedFilters, ReadSchema pruning, broadcast joins,
  * partial aggregation, WholeStageCodegen spans) can be reviewed.
  * `sbt "runMain graft.tools.Explain q1_agg q_order_nation ..."`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
