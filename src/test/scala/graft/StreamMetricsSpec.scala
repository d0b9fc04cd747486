package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.observe.StreamMetrics

/** The streaming observability leg: the listener must see real batches,
  * real input-row counts, and — on a stateful query — real state-store
  * rows, because state growth is the number DEPLOY.md's sizing formulas
  * are checked against on a live query.
  */
class StreamMetricsSpec extends SparkSuite {

  private val ss = spark
  import ss.implicits._

  /** Progress events are delivered async after processAllAvailable —
    * poll until the condition holds or the deadline passes.
    */
  private def eventually[T](timeoutMs: Long = 20000)(body: => Option[T]): T = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var r = body
    while (r.isEmpty && System.nanoTime() < deadline) { Thread.sleep(100); r = body }
    r.getOrElse(fail(s"condition not met within ${timeoutMs}ms"))
  }

  test("StreamMetrics captures batches, input rows, and state rows of a stateful query") {
    val sm = StreamMetrics.attach(spark)
    val input = MemoryStream[(Timestamp, String)](ss, 2)
    val counts = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("k")).count()
    val qName = s"sm_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = counts.writeStream.queryName(qName).outputMode("update")
      .format("memory").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
      input.addData((t0, "a"), (t0, "b"), (t0, "a"))
      q.processAllAvailable()
      input.addData((new Timestamp(t0.getTime + 60000), "a"))
      q.processAllAvailable()

      val report = eventually() {
        sm.report(qName).filter(r => r.totalInputRows >= 4 && r.lastStateRows >= 2)
      }
      assert(report.batches >= 1)
      assert(report.totalInputRows == 4, report)
      // both timestamps fall in the [00:00, 00:10) window → 2 distinct
      // (window, k) cells carried as streaming state
      assert(report.lastStateRows == 2, report)
      assert(report.maxStateMemBytes > 0, report)
      val bs = sm.batches(qName)
      assert(bs.forall(_.queryName == qName))
      assert(bs.map(_.numInputRows).sum == 4, bs)
    } finally {
      q.stop()
      StreamMetrics.detach(spark, sm)
    }
  }

  test("StreamMetrics history is bounded per query") {
    val sm = StreamMetrics.attach(spark, historyPerQuery = 3)
    val input = MemoryStream[Long](ss, 2)
    val qName = s"sm_bound_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = input.toDF().writeStream.queryName(qName)
      .outputMode("append").format("memory").start()
    try {
      (1 to 6).foreach { i => input.addData(i.toLong); q.processAllAvailable() }
      val bs = eventually() {
        val b = sm.batches(qName); if (b.length >= 3) Some(b) else None
      }
      assert(bs.length == 3, s"history must cap at 3, got ${bs.length}")
      // the kept window is the most recent batches
      assert(bs.map(_.batchId) == bs.map(_.batchId).sorted)
    } finally {
      q.stop()
      StreamMetrics.detach(spark, sm)
    }
  }
}
