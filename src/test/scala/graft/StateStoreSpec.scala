package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** State-store fidelity (R11's `Materialized.as(stateStoreName)` ≅ Structured
  * Streaming state under a checkpoint): counts survive a query restart, and
  * the state store can be the RocksDB provider (the reference's actual state
  * backend) rather than the default HDFS-backed map.
  */
class StateStoreSpec extends SparkSuite {

  private val ss = spark
  import ss.implicits._

  test("aggregation state survives a stop/restart from the checkpoint (R11 state store)") {
    val ckpt = tempDir("graft-ckpt")
    val input = MemoryStream[Long](ss, 2)
    val counts = input.toDF().toDF("user_id").groupBy("user_id").count()

    def start() = counts.writeStream.format("memory").queryName("ckpt_t")
      .option("checkpointLocation", ckpt).outputMode("complete").start()

    val q1 = start()
    try {
      input.addData(1L, 1L, 2L)
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the same checkpoint; new data ADDS to recovered state
    val q2 = start()
    try {
      input.addData(1L)
      q2.processAllAvailable()
      val state = spark.table("ckpt_t").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(state == Seq((1L, 3L), (2L, 1L)), s"state after restart: $state")
    } finally q2.stop()
  }

  test("streaming near-dup bucket state survives a stop/restart from the checkpoint (X2)") {
    // the LSH bucket index lives in flatMapGroupsWithState keyed state — a
    // doc ingested BEFORE a restart must still pair against one arriving
    // AFTER, from recovered state, and the remembered-id replay guard must
    // also recover (no duplicate emissions after restart)
    val base = "state recovery keeps every previously indexed signature " +
      "available for matching long after the original micro batch finished " +
      "processing its documents through the streaming near dup operator"
    val nearDup = base.replace("finished", "completed")
    val ckpt = tempDir("graft-ckpt-neardup")
    val input = MemoryStream[(Long, String)](ss, 2)
    val pairs = graft.streaming.StreamingDedup.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)

    // append-mode memory sink cannot recover from a checkpoint; foreachBatch
    // can, and collects into a driver buffer
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    def start() = pairs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          graft.streaming.StreamingDedup.NearDupPair], _: Long) =>
        batch.collect().foreach(p => seen.add((p.id1, p.id2)))
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      input.addData((1L, base))
      q1.processAllAvailable()
      assert(seen.isEmpty)
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData((2L, nearDup))
      q2.processAllAvailable()
      val got = scala.jdk.CollectionConverters.ListHasAsScala(seen).asScala.toSet
      assert(got == Set((1L, 2L)),
        s"cross-restart near-dup not detected from recovered state: $got")
    } finally q2.stop()
  }

  test("streaming near-dup bucket index runs on the RocksDB state store provider (X2)") {
    // the near-dup state (buckets × signatures) is the engine's heaviest
    // state user — DEPLOY.md sizes it for RocksDB; pin that it actually
    // runs there, cross-batch matching included
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val text = "rocksdb backed bucket state must hold signatures across " +
        "micro batches exactly like the default provider does for this test"
      val input = MemoryStream[(Long, String)](ss, 2)
      val pairs = graft.streaming.StreamingDedup.nearDupPairs(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      val q = pairs.writeStream.format("memory").queryName("neardup_rocks_t")
        .outputMode("append").start()
      try {
        input.addData((1L, text))
        q.processAllAvailable()
        input.addData((2L, text))
        q.processAllAvailable()
        val got = spark.table("neardup_rocks_t").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == Set((1L, 2L)), s"got $got")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("latest-per-key state runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Long, String)](ss, 2)
      val df = input.toDF().toDF("k", "__offset", "v")
      val latest = graft.streaming.StreamingTables.latestPerKey(df, Seq("k"), Seq("__offset"))
      val q = latest.writeStream.format("memory").queryName("rocks_t")
        .outputMode("update").start()
      try {
        input.addData((1L, 1L, "a"), (1L, 2L, "b"))
        q.processAllAvailable()
        input.addData((1L, 3L, "c"))
        q.processAllAvailable()
        val last = spark.table("rocks_t")
          .groupBy("k").agg(max_by(col("v"), col("__offset")).as("v")).head()
        assert(last.getString(1) == "c")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
