package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditSinkSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase commit: every task's count message reaches the driver commit") {
    val run = "ok-" + System.nanoTime()
    spark.range(0, 1000).repartition(4)
      .write.format("graft.sources.AuditSink")
      .option("run", run).mode("append").save()
    val (total, perTask) = AuditSink.committed.get(run)
    assert(total == 1000L)
    assert(perTask.size == 4)
    assert(perTask.sum == 1000L)
    assert(!AuditSink.aborted.containsKey(run))
  }

  test("a failing task aborts the job: nothing commits, abort fires") {
    val run = "fail-" + System.nanoTime()
    val boom = udf((x: Long) => {
      if (x == 700L) throw new RuntimeException("poison row")
      x
    })
    intercept[Exception] {
      spark.range(0, 1000).repartition(4)
        .select(boom(col("id")).as("id"))
        .write.format("graft.sources.AuditSink")
        .option("run", run).mode("append").save()
    }
    assert(!AuditSink.committed.containsKey(run),
      "partial write committed despite task failure")
    assert(AuditSink.aborted.containsKey(run), "abort hook never fired")
  }
}
