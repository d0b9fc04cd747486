package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("as-of semantics: latest version at-or-before; null before first version") {
    val events = spark.createDataFrame(Seq(
      (1L, 1L, t(5)), (2L, 1L, t(15)), (3L, 1L, t(25)), (4L, 2L, t(20))))
      .toDF("event_id", "k", "ts")
    val versions = spark.createDataFrame(Seq(
      (1L, t(10), "v1"), (1L, t(20), "v2"), (2L, t(30), "w1")))
      .toDF("k", "vts", "payload")
    val out = AsOfJoin.asOf(events, versions, "k", "ts", "vts",
      Map("payload" -> "version"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, None),         // before any version
      (2L, Some("v1")),   // v1 at 10 ≤ 15
      (3L, Some("v2")),   // v2 at 20 ≤ 25
      (4L, None)))        // user 2's version is later (30 > 20)
  }

  test("same-timestamp version is visible to the event at that timestamp (>= semantics)") {
    val events = spark.createDataFrame(Seq((1L, 1L, t(10)))).toDF("event_id", "k", "ts")
    val versions = spark.createDataFrame(Seq((1L, t(10), "v"))).toDF("k", "vts", "payload")
    val out = AsOfJoin.asOf(events, versions, "k", "ts", "vts", Map("payload" -> "version"))
    assert(out.head().getString(3) == "v")
  }

  test("one shuffle: plan has a single exchange for the union-window form") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet").select("event_id", "user_id", "ts")
    val up = spark.read.parquet(s"${sf()}/events.parquet")
      .filter(col("event_id") % 10 === 0).select(col("user_id"), col("ts"), col("value"))
    val out = AsOfJoin.asOf(ev, up, "user_id", "ts", "ts", Map("value" -> "pv"))
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 2, s"as-of join shuffles too much ($exchanges exchanges)")
  }
}
