package graft

import org.apache.spark.sql.functions._

import graft.config.{PipelineSpec, TestdataCatalog}
import graft.streaming.{FileStreamSourceResolver, StreamRunner}
import graft.sources.ParquetSourceResolver

/** Streaming ≡ batch equivalence: the same PipelineSpec JSON produces the
  * same rows whether interpreted over batch parquet or a file stream —
  * the resolver is the only thing that changes (SURVEY §7 design stance).
  */
class StreamRunnerSpec extends SparkSuite {

  private val joinSpec = PipelineSpec.fromJson(
    """{"id":"orders-customer-enrichment","processingMode":"JOIN_CHAIN",
      |"sourceTopic":{"name":"orders","keyClass":"java.lang.Long"},
      |"joinOperations":[{"id":"customer-step","type":"INNER_JOIN",
      |  "initialSourceIsStream":true,
      |  "primaryKeyExtraction":{"source":"VALUE","fieldName":"o_custkey"},
      |  "enrichmentTopic":{"name":"customer","keyClass":"java.lang.Long"},
      |  "outputFieldsMapping":[
      |    {"source":"LEFT","sourceFieldName":"o_orderkey","outputFieldName":"order_id"},
      |    {"source":"RIGHT","sourceFieldName":"c_name","outputFieldName":"customer_name"}]}],
      |"outputTopic":{"enabled":true,"name":"enriched-orders"}}""".stripMargin)

  test("JOIN_CHAIN spec over a file stream equals the batch result (stream–static join)") {
    val q = StreamRunner.startMemory(spark, joinSpec,
      new FileStreamSourceResolver(sf(), TestdataCatalog), "join_stream_t")
    try {
      q.processAllAvailable()
      val streaming = spark.table("join_stream_t")
        .select("order_id", "customer_name").orderBy("order_id").collect().toSeq
      val batch = graft.pipeline.Interpreter.values(graft.pipeline.Interpreter.build(
        spark, joinSpec, new ParquetSourceResolver(sf(), TestdataCatalog)))
        .select("order_id", "customer_name").orderBy("order_id").collect().toSeq
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }

  test("AGGREGATION spec over a file stream converges to the batch counts (update mode)") {
    val aggSpec = PipelineSpec.fromJson(
      """{"id":"events-per-user","processingMode":"AGGREGATION",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"groupByKeyExtraction":{"source":"VALUE","fieldName":"user_id"},
        |"groupByKeyType":"java.lang.Long",
        |"stateStoreName":"events-per-user-store",
        |"outputTopic":{"enabled":true,"name":"events-per-user"}}""".stripMargin)
    // keep the key for comparison: build (not values) + rename
    val df = StreamRunner.build(spark, aggSpec,
      new FileStreamSourceResolver(sf(), TestdataCatalog))
      .withColumnRenamed(graft.pipeline.Interpreter.KeyCol, "user_id")
    val q = df.writeStream.format("memory").queryName("agg_stream_t")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // update mode: last emission per key is the final state
      val streaming = spark.table("agg_stream_t")
        .groupBy("user_id").agg(max("count").as("cnt"))
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val batch = spark.read.parquet(s"${sf()}/events.parquet")
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streaming == batch)
    } finally q.stop()
  }

  test("windowed AGGREGATION spec (eventTime + watermark) converges to the batch result") {
    val spec = PipelineSpec.fromJson(
      """{"id":"events-windowed-stream","processingMode":"AGGREGATION",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"groupByKeyExtraction":{"source":"VALUE","fieldName":"event_type"},
        |"groupByKeyType":"java.lang.String",
        |"eventTime":{"column":"ts","window":"10 minutes","watermark":"15 minutes"},
        |"stateStoreName":"s","outputTopic":{"enabled":true,"name":"o"}}""".stripMargin)
    val df = StreamRunner.build(spark, spec,
      new graft.streaming.FileStreamSourceResolver(sf(), TestdataCatalog))
      .withColumnRenamed(graft.pipeline.Interpreter.KeyCol, "event_type")
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").queryName("wagg_t")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // update mode: last emission per (window, key) is the final state
      val streaming = spark.table("wagg_t")
        .groupBy("window_start", "event_type").agg(max("count").as("cnt"))
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      val batch = graft.pipeline.Interpreter.build(spark, spec,
        new ParquetSourceResolver(sf(), TestdataCatalog))
        .withColumnRenamed(graft.pipeline.Interpreter.KeyCol, "event_type")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[String]("event_type"), r.getAs[Long]("count"))).toSeq
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }

  test("session-windowed AGGREGATION runs streaming in Append mode and emits closed sessions") {
    // Spark 4 rejects session-window streaming aggregation in Update mode —
    // outputModeFor must pick Append for session specs (and validate()
    // guarantees the watermark Append needs). Closed sessions (past the
    // watermark) must match the batch interpreter over the same rows.
    val spec = PipelineSpec.fromJson(
      """{"id":"mem-sessions","processingMode":"AGGREGATION",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"groupByKeyExtraction":{"source":"VALUE","fieldName":"user_id"},
        |"groupByKeyType":"java.lang.Long",
        |"eventTime":{"column":"ts","window":"5 minutes","watermark":"10 minutes",
        |  "windowType":"session"},
        |"stateStoreName":"s","outputTopic":{"enabled":true,"name":"o"}}""".stripMargin)
    assert(StreamRunner.outputModeFor(spec) == org.apache.spark.sql.streaming.OutputMode.Append())
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val input = MemoryStream[(Timestamp, Long)](ss, 2)
    val mem = new graft.sources.SourceResolver {
      val catalog = TestdataCatalog
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("ts", "user_id")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
    }
    val q = StreamRunner.build(spark, spec, mem)
      .withColumnRenamed(graft.pipeline.Interpreter.KeyCol, "user_id")
      .writeStream.format("memory").queryName("sess_append_t")
      .outputMode(StreamRunner.outputModeFor(spec))
      .start()
    try {
      // user 1: two events 2min apart (one session), then one 20min later
      // (second session); user 2: one event
      val batch1 = Seq((t(0), 1L), (t(2), 1L), (t(22), 1L), (t(1), 2L))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData((t(59), 9L)) // advance watermark past every session above
      q.processAllAvailable()
      val streaming = spark.table("sess_append_t")
        .select("window_start", "user_id", "count")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      assert(streaming == Set((t(0), 1L, 2L), (t(22), 1L, 1L), (t(1), 2L, 1L)))
    } finally q.stop()
  }

  test("table-rooted emission: update-mode changelog head equals the batch table per input batch (R2/R14)") {
    // SURVEY §7 contract: batch is authoritative, streaming is a best-effort
    // update-mode changelog of the same view. After EVERY input batch the
    // changelog head (latest emission per key) must equal Tables.latestPerKey
    // over all rows ingested so far.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, String)](ss, 2) // (k, __offset, v)
    val changelog = graft.streaming.StreamingTables.latestPerKey(
      input.toDF().toDF("k", "__offset", "v"), Seq("k"), Seq("__offset"))
    val q = changelog.writeStream.format("memory").queryName("head_t")
      .outputMode("update").start()
    val ingested = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def checkHead(): Unit = {
      // head = per key, the row from the LAST batch that touched it
      val head = spark.table("head_t")
        .groupBy("k").agg(max_by(struct(col("__offset"), col("v")), col("__offset")).as("h"))
        .select(col("k"), col("h.v").as("v"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = graft.sources.Tables.latestPerKey(
        ingested.toSeq.toDF("k", "__offset", "v"), Seq("k"), Seq("__offset"))
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(head == batch, s"changelog head $head != batch $batch")
    }
    try {
      for (batch <- Seq(
          Seq((1L, 1L, "a"), (2L, 1L, "x")),
          Seq((1L, 2L, "b"), (3L, 1L, "m")),
          Seq((2L, 0L, "stale"), (3L, 2L, "n")))) {
        input.addData(batch: _*)
        q.processAllAvailable()
        ingested ++= batch
        checkHead()
      }
    } finally q.stop()
  }

  test("streaming queries expose the R13 peek channel as observed metrics") {
    val q = StreamRunner.startMemory(spark, joinSpec,
      new graft.streaming.FileStreamSourceResolver(sf(), TestdataCatalog), "peek_t")
    try {
      q.processAllAvailable()
      val progress = q.recentProgress.reverse.find(_.observedMetrics.containsKey(
        "orders-customer-enrichment_peek"))
      assert(progress.isDefined, "no progress carried the peek metrics")
      val m = progress.get.observedMetrics.get("orders-customer-enrichment_peek")
      assert(m.getAs[Long]("rows") > 0)
      assert(m.getAs[Long]("null_keys") == 0)
    } finally q.stop()
  }

  test("streaming branches: one query per sink, predicate-routed (split)") {
    val spec = PipelineSpec.fromJson(
      """{"id":"events-split-stream","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"all"},
        |"branches":[{"predicate":"event_type = 'error'",
        |             "outputTopic":{"enabled":true,"name":"errs"}}]}""".stripMargin)
    // single-query entry points refuse rather than silently dropping branches
    intercept[IllegalArgumentException] {
      StreamRunner.startMemory(spark, spec,
        new graft.streaming.FileStreamSourceResolver(sf(), TestdataCatalog), "nope_t")
    }
    val qs = StreamRunner.startMemoryBranches(spark, spec,
      new graft.streaming.FileStreamSourceResolver(sf(), TestdataCatalog), "split_t")
    try {
      qs.foreach(_.processAllAvailable())
      val ev = spark.read.parquet(s"${sf()}/events.parquet")
      assert(spark.table("split_t").count() == ev.count())
      assert(spark.table("split_t_errs").count() ==
        ev.filter(col("event_type") === "error").count())
      assert(spark.table("split_t_errs").count() > 0)
    } finally qs.foreach(_.stop())
  }

  test("chunking runs unchanged on a streaming frame (map-only, no state)") {
    val src = new FileStreamSourceResolver(sf(), TestdataCatalog)
    val docs = src.stream(spark, graft.config.TopicConfig("documents"))
    val chunked = graft.operators.TextAnalysis.chunk(docs, "doc_id", "text", 40, 30)
    assert(chunked.isStreaming)
    val q = chunked.writeStream.format("memory").queryName("chunk_stream_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("chunk_stream_t")
        .orderBy("doc_id", "chunk_id").collect().toSeq
      val batch = graft.operators.TextAnalysis.chunk(
        spark.read.parquet(s"${sf()}/documents.parquet"), "doc_id", "text", 40, 30)
        .orderBy("doc_id", "chunk_id").collect().toSeq
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }

  test("nanos timestamp conversion applies on the streaming path too") {
    val src = new FileStreamSourceResolver(sf(), TestdataCatalog)
    val ev = src.stream(spark, graft.config.TopicConfig("events"))
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    val q = ev.select(min(col("ts")).as("m")).writeStream.format("memory")
      .queryName("ts_stream_t").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamMin = spark.table("ts_stream_t").head().getTimestamp(0)
      val batchMin = new ParquetSourceResolver(sf(), TestdataCatalog)
        .stream(spark, graft.config.TopicConfig("events"))
        .agg(min(col("ts"))).head().getTimestamp(0)
      assert(streamMin == batchMin)
    } finally q.stop()
  }

  test("snapshot sink: streamed changelog continuously upserts a queryable parquet table") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, String)](ss, 2) // (k, ver, v)
    val mem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("event_id", "ver", "v")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        graft.streaming.StreamingTables.latestPerKey(stream(s, topic), Seq("event_id"), Seq("ver"))
      override def catalog = TestdataCatalog
    }
    val spec = graft.config.PipelineSpec.fromJson(
      """{"id":"snap","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"snap-out"}}""".stripMargin)
    val base = tempDir("graft_snap")
    val q = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("event_id"), Seq("ver"), s"$base/ckpt")
    try {
      input.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q.processAllAvailable()
      input.addData((1L, 2L, "a2"), (2L, 0L, "stale"), (3L, 1L, "c1"))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/table").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("v"))).toMap
      assert(got == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"),
        s"snapshot after two batches wrong: $got")
    } finally q.stop()
  }

  test("snapshot sink streams an AGGREGATION spec: counts upsert continuously (update mode)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long)](ss, 2) // (event_id, user_id)
    val mem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("event_id", "user_id")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        graft.streaming.StreamingTables.latestPerKey(stream(s, topic), Seq("event_id"), Seq("user_id"))
      override def catalog = TestdataCatalog
    }
    val spec = PipelineSpec.fromJson(
      """{"id":"snap-agg","processingMode":"AGGREGATION",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"groupByKeyExtraction":{"source":"VALUE","fieldName":"user_id"},
        |"groupByKeyType":"java.lang.Long",
        |"stateStoreName":"s","outputTopic":{"enabled":true,"name":"snap-agg-out"}}""".stripMargin)
    val base = tempDir("graft_snap_agg")
    // per-key counts only grow, so the count IS a valid last-write-wins
    // version column for the upsert
    val q = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq(graft.pipeline.Interpreter.KeyCol), Seq("count"), s"$base/ckpt")
    try {
      input.addData((1L, 10L), (2L, 10L), (3L, 20L))
      q.processAllAvailable()
      input.addData((4L, 10L), (5L, 30L))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/table").collect()
        .map(r => (r.getAs[Long](graft.pipeline.Interpreter.KeyCol), r.getAs[Long]("count"))).toMap
      assert(got == Map(10L -> 3L, 20L -> 1L, 30L -> 1L),
        s"aggregated snapshot wrong: $got")
    } finally q.stop()
  }

  test("stateless spec transforms (quality_filter + redact_pii) run unchanged on a stream") {
    // the map-only transform ops are streaming-legal; the same spec JSON
    // must produce the same rows over a file stream as over batch parquet
    val json =
      """{"id":"docs-stream-clean","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"documents","keyClass":"java.lang.Long"},
        |"transform":[
        |  {"op":"quality_filter","column":"text","minTokens":12},
        |  {"op":"redact_pii","column":"text"}],
        |"outputTopic":{"enabled":true,"name":"docs-clean-stream"}}""".stripMargin
    val spec = PipelineSpec.fromJson(json)
    val q = StreamRunner.startMemory(spark, spec,
      new FileStreamSourceResolver(sf(), TestdataCatalog), "transform_stream_t")
    try {
      q.processAllAvailable()
      val streaming = spark.table("transform_stream_t")
        .select("doc_id", "text").orderBy("doc_id").collect().toSeq
      val batch = graft.pipeline.Interpreter.values(graft.pipeline.Interpreter.build(
        spark, spec, new ParquetSourceResolver(sf(), TestdataCatalog)))
        .select("doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }

  test("contamination_screen transform is streaming-legal (stateless projection, append mode)") {
    // the config-declared eval-leakage screen must run on a stream in plain
    // Append mode — its benchmark side is compiled to broadcast hashes at
    // build time, so the op is a pure projection with no state/watermark
    val json =
      s"""{"id":"docs-contam-stream","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"documents","keyClass":"java.lang.Long"},
         |"transform":[{"op":"contamination_screen","column":"text",
         |  "idColumn":"doc_id","shingleSize":3,
         |  "benchPath":"${sf()}/documents.parquet","benchFilter":"doc_id < 20"}],
         |"filter":"doc_id >= 20",
         |"outputTopic":{"enabled":true,"name":"docs-contam-stream"}}""".stripMargin
    val spec = PipelineSpec.fromJson(json)
    assert(StreamRunner.outputModeFor(spec) ==
      org.apache.spark.sql.streaming.OutputMode.Append())
    val q = StreamRunner.startMemory(spark, spec,
      new FileStreamSourceResolver(sf(), TestdataCatalog), "contam_stream_t")
    try {
      q.processAllAvailable()
      val streaming = spark.table("contam_stream_t")
        .orderBy("doc_id").collect().toSeq
      val batch = graft.pipeline.Interpreter.values(graft.pipeline.Interpreter.build(
        spark, spec, new ParquetSourceResolver(sf(), TestdataCatalog)))
        .orderBy("doc_id").collect().toSeq
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }

  test("dedup_exact transform streams in update mode and converges to the batch dedup") {
    // a dedup transform on a stream is a per-group changelog — outputModeFor
    // must pick Update (Append rejects the unwatermarked aggregate), and the
    // converged head (last emission per dup group) must equal batch dedup
    val json =
      """{"id":"docs-stream-dedup","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"documents","keyClass":"java.lang.Long"},
        |"transform":[{"op":"dedup_exact","dupColumns":["text"],"tieBreak":"doc_id"}],
        |"outputTopic":{"enabled":true,"name":"docs-dedup-stream"}}""".stripMargin
    val spec = PipelineSpec.fromJson(json)
    assert(StreamRunner.outputModeFor(spec) ==
      org.apache.spark.sql.streaming.OutputMode.Update())
    val q = StreamRunner.startMemory(spark, spec,
      new FileStreamSourceResolver(sf(), TestdataCatalog), "dedup_stream_t")
    try {
      q.processAllAvailable()
      // update mode: the last emission per text group is the final state
      val streaming = spark.table("dedup_stream_t")
        .groupBy("text").agg(min("doc_id").as("doc_id"))
        .select("doc_id").orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
      val batch = graft.operators.Dedup.exact(
        spark.read.parquet(s"${sf()}/documents.parquet"), Seq("text"), "doc_id")
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }

  test("partitioned snapshot sink: bucketed merge through foreachBatch survives a checkpoint restart") {
    // startSnapshotSink(partitionCols=...) end-to-end: a multi-batch
    // changelog into a bucketed snapshot, killed and restarted across its
    // checkpoint. The restarted query must resume (not replay committed
    // batches), a post-restart delta must merge only its bucket (an
    // untouched bucket's files carry over unrewritten — mtimes pinned),
    // and the converged snapshot must equal latestPerKey over everything
    // ingested (the equivalence law, now across a query lifetime boundary).
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, String)](ss, 2) // (k, ver, v)
    val mem = new graft.sources.SourceResolver {
      // bucket is key-determined (k % 3) — the partitioned-upsert contract
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("event_id", "ver", "v")
          .withColumn("bucket", col("event_id") % 3)
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    val spec = PipelineSpec.fromJson(
      """{"id":"snap-part","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"snap-part-out"}}""".stripMargin)
    val base = tempDir("graft_snap_part")
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("event_id"), Seq("ver"), s"$base/ckpt", Seq("bucket"))
    val ingested = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def ingest(q: org.apache.spark.sql.streaming.StreamingQuery,
        rows: (Long, Long, String)*): Unit = {
      input.addData(rows: _*); ingested ++= rows
      q.processAllAvailable()
    }
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p)).toSeq
      .filter(_.isFile).map(s => (s.getPath.getName, s.getModificationTime)).sorted
    def snapshot() = spark.read.parquet(s"$base/table").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("v"))).toMap
    def want() = graft.sources.Tables.latestPerKey(
      ingested.toSeq.toDF("event_id", "ver", "v"), Seq("event_id"), Seq("ver"))
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("v"))).toMap

    val q1 = start()
    try {
      ingest(q1, (1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 1L, "c1")) // buckets 1,2,0
      ingest(q1, (2L, 2L, "b2"), (1L, 0L, "stale"))              // buckets 2,1
      assert(snapshot() == want(), "pre-restart snapshot diverged")
    } finally q1.stop() // kill across the checkpoint
    val bucket0Before = files(s"$base/table/bucket=0")
    assert(bucket0Before.nonEmpty)
    val q2 = start() // resume from the same checkpoint
    try {
      // post-restart delta touches ONLY bucket=1 (1%3, 7%3)
      ingest(q2, (1L, 2L, "a2"), (7L, 1L, "g1"))
      assert(snapshot() == want(),
        "snapshot diverged from latestPerKey across the restart boundary")
      assert(files(s"$base/table/bucket=0") == bucket0Before,
        "untouched bucket=0 was rewritten after the restart — the partitioned " +
          "merge degraded to a full rewrite when resumed from a checkpoint")
    } finally q2.stop()
  }

  test("KTable loop end-to-end: snapshot sink feeds a stream-static enrichment join") {
    // The versioned-dimension streaming story (DynamicTopologyBuilder.java:159's
    // KStream⋈KTable): one query maintains the dimension SNAPSHOT from its
    // changelog (partition-pruned upsert — the 100 TB write side), a second
    // query enriches an event stream against it. The static side must be
    // re-read per micro-batch (foreachBatch + a fresh read): a captured
    // DataFrame pins its file listing, and the upsert swaps files in — so
    // events joined after a dimension update see the NEW version, events
    // already emitted keep the version that was current at their time.
    val ss = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import ss.implicits._
    val dimIn = MemoryStream[(Long, Long, String)](ss, 2) // cust_id (keyed as event_id per catalog), ver, name
    val mem = new graft.sources.SourceResolver {
      // event_id doubles as the customer key (the spec keys on the catalog's
      // events key field); the bucket column is the writer-computed
      // key-determined partition the contract requires
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        dimIn.toDF().toDF("event_id", "ver", "name")
          .withColumn("bucket", graft.sinks.BatchSink.keyBucket(2, col("event_id")))
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    val spec = PipelineSpec.fromJson(
      """{"id":"dim-snap","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"dim-out"}}""".stripMargin)
    val base = tempDir("graft_ktable_loop")
    val dimQ = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/dim", Seq("event_id"), Seq("ver"), s"$base/ckpt_dim", Seq("bucket"))
    val evIn = MemoryStream[(Long, Long)](ss, 2) // ev_id, customer key
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val evQ = evIn.toDF().toDF("ev_id", "event_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.join(spark.read.parquet(s"$base/dim"), "event_id")
          .select("ev_id", "name").collect()
          .foreach(r => results.add((r.getLong(0), r.getString(1))))
        ()
      }
      .option("checkpointLocation", s"$base/ckpt_ev")
      .start()
    try {
      dimIn.addData((1L, 1L, "alice-v1"), (2L, 1L, "bob-v1"))
      dimQ.processAllAvailable()
      evIn.addData((100L, 1L))
      evQ.processAllAvailable()
      dimIn.addData((1L, 2L, "alice-v2")) // dimension update: only key 1's bucket merges
      dimQ.processAllAvailable()
      evIn.addData((101L, 1L), (102L, 2L))
      evQ.processAllAvailable()
      val got = results.toArray(Array.empty[(Long, String)]).toSet
      assert(got == Set((100L, "alice-v1"), (101L, "alice-v2"), (102L, "bob-v1")),
        s"enrichment must track the live snapshot per micro-batch: $got")
    } finally { dimQ.stop(); evQ.stop() }
  }
}
