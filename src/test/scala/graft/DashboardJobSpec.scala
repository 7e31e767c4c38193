package graft

import graft.jobs.OrderDashboard
import graft.sinks.{Sinks, StoreRegistry}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** End-to-end flagship job (reference OrderAnalysy): file-sourced
  * order stream → dashboard aggregation → idempotent upsert store,
  * resumable across invocations via the checkpoint. */
class DashboardJobSpec extends SparkTestBase {
  import spark.implicits._

  test("order dashboard drains a backlog, upserts totals, and resumes incrementally") {
    val src = tmpDir("dashsrc")
    val ck = tmpDir("dashck")
    val store = StoreRegistry.kv("dashjob")
    def t(s: Long) = new Timestamp(s * 1000L)

    Seq((t(100), "zhejiang", 10.5), (t(200), "shanghai", 2.0))
      .toDF("ts", "province", "amount").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    assert(OrderDashboard.run(spark, src, schema, store, ck) == 0) // no restarts needed
    // per-province totals (reference GroupDataFuc)
    assert(store.get("1970-01-01 00:00:00.0|zhejiang").contains("1|1050"))
    assert(store.get("1970-01-01 00:00:00.0|shanghai").contains("1|200"))
    // site-wide totals (reference TotalDataFun — the headline number)
    assert(store.get("1970-01-01 00:00:00.0").contains("2|1250"))

    // new orders land; a re-run processes ONLY them and upserts totals
    Seq((t(300), "zhejiang", 1.0))
      .toDF("ts", "province", "amount").write.mode("append").parquet(src)
    OrderDashboard.run(spark, src, schema, store, ck)
    assert(store.get("1970-01-01 00:00:00.0|zhejiang").contains("2|1150"))
    assert(store.get("1970-01-01 00:00:00.0|shanghai").contains("1|200"))
    assert(store.get("1970-01-01 00:00:00.0").contains("3|1350"))
    StoreRegistry.clear("dashjob")
  }

  test("kafka sink options carry broker/topic and idempotence") {
    val opts = Sinks.kafkaSinkOptions("broker:9092", "dashboard")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("topic") == "dashboard")
    assert(opts("kafka.enable.idempotence") == "true")
  }
}
