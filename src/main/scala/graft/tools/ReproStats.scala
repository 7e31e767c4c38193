package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal reproducer for the q_embed_cluster sf100 failure
  * ("BigInteger would overflow supported range"): drive the
  * pointer-jump round shape (self-join + localCheckpoint(false)) on a
  * 100-row frame and print the optimizer's sizeInBytes BIT LENGTH per
  * round — if lazy local checkpoints inherit the child plan's
  * statistics, the estimate grows multiplicatively per round until
  * BigInteger arithmetic in stats estimation overflows. */
object ReproStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var df = spark.range(100).toDF("id")
      .withColumn("label", col("id")).localCheckpoint(true)
    for (i <- 1 to 40) {
      val j = df.as("x")
        .join(df.select($"id".as("lid"), $"label".as("llabel")).as("y"),
          col("x.label") === col("y.lid"))
        .select(col("x.id").as("id"),
          least(col("x.label"), $"llabel").as("label"))
        .localCheckpoint(false)
      val c = j.count()
      val bits = j.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      println(s"[repro] round $i rows=$c sizeInBytes.bitLength=$bits")
      df = j
    }
    spark.stop()
  }
}
