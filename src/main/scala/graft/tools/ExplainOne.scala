package graft.tools

import org.apache.spark.sql.SparkSession

/** Print one query's formatted + executed plan — the plan-audit loop
  * behind PlanSpec's pins ("is the filter pushed? did the join
  * broadcast? where are the exchanges?") without attaching a
  * debugger to the bench.
  *
  * `sbt "runMain graft.tools.ExplainOne <queryName> [sfDir]"`
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ExplainOne <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    println("=== executedPlan ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
