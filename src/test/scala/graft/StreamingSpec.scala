package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingTables

class StreamingSpec extends SparkSuite {

  private val ss = spark
  import ss.implicits._

  test("streaming latest-per-key keeps last-write-wins state across batches (R2)") {
    val input = MemoryStream[(Long, Long, String)](ss, 2) // (user_id, offset, v)
    val df = input.toDF().toDF("user_id", "__offset", "v")
    val latest = StreamingTables.latestPerKey(df, Seq("user_id"), Seq("__offset"))
    val q = latest.writeStream.format("memory").queryName("latest_t")
      .outputMode("update").start()
    try {
      input.addData((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "x"))
      q.processAllAvailable()
      input.addData((1L, 3L, "c")) // later write wins
      input.addData((2L, 0L, "stale")) // earlier offset must NOT win
      q.processAllAvailable()
      val rows = spark.table("latest_t")
        .groupBy("user_id").agg(max_by(col("v"), col("__offset")).as("v"))
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "c"), (2L, "x")))
    } finally q.stop()
  }

  test("watermarked tumbling window counts match batch (X6/R11 streaming form)") {
    val input = MemoryStream[(Timestamp, String)](ss, 2)
    val df = input.toDF().toDF("ts", "event_type")
    val counts = StreamingTables.windowedCounts(df, "ts", "20 minutes", "10 minutes",
      Seq("event_type"))
    val q = counts.writeStream.format("memory").queryName("win_t")
      .outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((t(1), "a"), (t(2), "a"), (t(11), "a"), (t(3), "b"))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((t(59), "a"))
      q.processAllAvailable()
      val rows = spark.table("win_t")
        .select("window_start", "event_type", "count")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "a", 2L)))
      assert(rows.contains(("2024-01-01 10:10:00.0", "a", 1L)))
      assert(rows.contains(("2024-01-01 10:00:00.0", "b", 1L)))
    } finally q.stop()
  }

  test("grouped top-k (custom Aggregator) runs streaming in update mode, converges to batch") {
    val input = MemoryStream[(String, Double, Long)](ss, 2) // (grp, score, id)
    val df = input.toDF().toDF("grp", "score", "id")
    val topped = df.groupBy(col("grp"))
      .agg(graft.functions.TopK.topk(col("score"), col("id"), 2).as("top"))
    val q = topped.writeStream.format("memory").queryName("topk_stream_t")
      .outputMode("update").start()
    try {
      input.addData(("a", 0.9, 1L), ("a", 0.5, 2L), ("b", 0.7, 3L))
      q.processAllAvailable()
      input.addData(("a", 0.8, 4L), ("a", 0.1, 5L)) // 4 displaces 2; 5 never ranks
      q.processAllAvailable()
      // update mode: the last emission per group is the current top-k state
      val last = spark.table("topk_stream_t")
        .withColumn("__batch", monotonically_increasing_id())
        .groupBy("grp").agg(max_by(col("top"), col("__batch")).as("top"))
        .collect().map(r => (r.getString(0),
          r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))))).toMap
      assert(last("a") == Seq((0.9, 1L), (0.8, 4L)))
      assert(last("b") == Seq((0.7, 3L)))
    } finally q.stop()
  }

  test("quantile sketch aggregates streaming in update mode, estimates equal the batch sketch") {
    // the live-profile use: a per-group percentile summary maintained on a
    // stream by the SAME mergeable aggregator the batch sketch table uses —
    // cross-batch merge is the aggregator's own merge(), so after both
    // batches the streamed sketch must estimate exactly what a batch sketch
    // over the union estimates (identical centroid arithmetic; group
    // cardinality bounds the state)
    val input = MemoryStream[(String, Double)](ss, 2)
    val df = input.toDF().toDF("grp", "v")
    val sketched = df.groupBy(col("grp"))
      .agg(graft.functions.QuantileSketch.sketch(col("v"), 16).as("qsketch"))
    val q = sketched.writeStream.format("memory").queryName("qsketch_stream_t")
      .outputMode("update").start()
    val rows1 = (1 to 40).map(i => ("a", i.toDouble)) :+ (("b", 5.0))
    val rows2 = (41 to 80).map(i => ("a", i.toDouble))
    try {
      input.addData(rows1: _*)
      q.processAllAvailable()
      input.addData(rows2: _*)
      q.processAllAvailable()
      val last = spark.table("qsketch_stream_t")
        .withColumn("__batch", monotonically_increasing_id())
        .groupBy("grp").agg(max_by(col("qsketch"), col("__batch")).as("qsketch"))
      val streamed = last.collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1)))).toMap
      // mass is never lost across micro-batches
      assert(streamed("a").map(_._2).sum == 80L)
      assert(streamed("b") == Seq((5.0, 1L)))
      // streamed estimates vs a batch sketch on the union: same rank
      // resolution — the group-a medians must agree within one centroid
      // budget (80/16 = 5 ranks => values within ~5.0 here)
      val est = graft.functions.QuantileSketch.estimate(streamed("a"), 0.5)
      val batch = spark.createDataFrame(rows1 ++ rows2).toDF("grp", "v")
        .filter(col("grp") === "a")
        .agg(graft.functions.QuantileSketch.sketch(col("v"), 16).as("s"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(p => (p.getDouble(0), p.getLong(1)))
      val batchEst = graft.functions.QuantileSketch.estimate(batch, 0.5)
      assert(math.abs(est - batchEst) <= 80.0 / 16,
        s"streamed median $est vs batch $batchEst")
      assert(math.abs(est - 40.5) <= 80.0 / 16, s"median $est far from true 40.5")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the watermark window (X1 streaming)") {
    val input = MemoryStream[(Timestamp, Long)](ss, 2)
    val df = input.toDF().toDF("ts", "k")
    val deduped = graft.streaming.StreamingTables.dedupWithinWatermark(
      df, "ts", "10 minutes", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((t(1), 1L), (t(2), 1L), (t(3), 2L)) // dup of k=1 in-window
      q.processAllAvailable()
      input.addData((t(4), 1L)) // still within watermark → dropped
      q.processAllAvailable()
      val rows = spark.table("dedup_t").collect().map(_.getLong(1)).sorted.toSeq
      assert(rows == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming near-dup flags cross-batch and same-batch LSH collisions (X2 streaming)") {
    val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the deep dark forest to hide from the loud hunting party all night long"
    val nearDup = base.replace("dark", "cold") // one token differs → J ≈ 0.9
    val unrelated = "completely different content about spark sql streaming state " +
      "stores and watermarks with no overlap at all in any shingle of this text " +
      "because every single word sequence here is distinct from the fox story"
    val input = MemoryStream[(Long, String)](ss, 2)
    val pairs = graft.streaming.StreamingDedup.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
    val q = pairs.writeStream.format("memory").queryName("neardup_t")
      .outputMode("append").start()
    try {
      input.addData((1L, base), (3L, unrelated))
      q.processAllAvailable()
      assert(spark.table("neardup_t").isEmpty, "no pairs expected in batch 1")
      // batch 2: a near-copy of a batch-1 doc (cross-batch, via state) and a
      // same-batch copy of the unrelated doc
      input.addData((2L, nearDup), (4L, unrelated))
      q.processAllAvailable()
      val got = spark.table("neardup_t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pairsSeen = got.map { case (a, b, _) => (a, b) }
      assert(pairsSeen == Set((1L, 2L), (3L, 4L)), s"got $pairsSeen")
      assert(got.filter(p => p._1 == 1L && p._2 == 2L).forall(_._3 >= 0.5))
      assert(got.filter(p => p._1 == 3L && p._2 == 4L).forall(_._3 == 1.0),
        "identical docs must estimate jaccard 1.0")
      // batch 3: the same near-dup text again — pairs with BOTH prior copies
      input.addData((5L, nearDup))
      q.processAllAvailable()
      val p3 = spark.table("neardup_t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p3.contains((1L, 5L)) && p3.contains((2L, 5L)), s"got $p3")
    } finally q.stop()
  }

  test("streaming near-dup survives null texts and redelivered ids") {
    val text = "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty more"
    val input = MemoryStream[(Long, String)](ss, 2)
    val pairs = graft.streaming.StreamingDedup.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
    val q = pairs.writeStream.format("memory").queryName("neardup_null_t")
      .outputMode("append").start()
    try {
      // two null-text docs across batches: must neither pair nor crash
      // (null sigs would otherwise enter bucket state and NPE on compare)
      input.addData((1L, text), (2L, null))
      q.processAllAvailable()
      input.addData((3L, null), (4L, text)) // 4 pairs with 1; nulls ignored
      q.processAllAvailable()
      val got = spark.table("neardup_null_t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 4L)), s"got $got")
      val before = spark.table("neardup_null_t").count() // once per colliding band
      // doc 1 redelivered (at-least-once source): no self-pair and no
      // re-emission of (1,4) — the id is already remembered in its buckets
      input.addData((1L, text))
      q.processAllAvailable()
      val after = spark.table("neardup_null_t").count()
      assert(after == before, s"redelivery re-emitted pairs: $before -> $after")
    } finally q.stop()
  }

  test("streaming near-dup bucket cap bounds state; over-cap docs stop matching (skew guard)") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two three four"
    val input = MemoryStream[(Long, String)](ss, 2)
    val pairs = graft.streaming.StreamingDedup.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, maxBucketDocs = 2)
    val q = pairs.writeStream.format("memory").queryName("neardup_cap_t")
      .outputMode("append").start()
    try {
      input.addData((1L, text), (2L, text))
      q.processAllAvailable()
      // ids 1 and 2 fill every bucket to the cap; 3 can still MATCH against
      // them but must not be remembered...
      input.addData((3L, text))
      q.processAllAvailable()
      val afterThree = spark.table("neardup_cap_t")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterThree == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $afterThree")
      // ...so 4 pairs with the two REMEMBERED docs only, never with 3
      input.addData((4L, text))
      q.processAllAvailable()
      val afterFour = spark.table("neardup_cap_t")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterFour == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)),
        s"got $afterFour")
    } finally q.stop()
  }

  test("streaming near-dup TTL expires idle bucket state (processing-time timeout)") {
    val text = "ttl expiry removes remembered signatures so an identical doc " +
      "arriving after the idle window no longer reports a near duplicate pair"
    val input = MemoryStream[(Long, String)](ss, 2)
    val pairs = graft.streaming.StreamingDedup.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, stateTtl = "2 seconds")
    // a PACED trigger is required with a TTL (DEPLOY.md): under the default
    // as-fast-as-possible trigger the timer-driven no-data batches run
    // back-to-back and processAllAvailable never observes an idle query
    val q = pairs.writeStream.format("memory").queryName("neardup_ttl_t")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .outputMode("append").start()
    // processAllAvailable is unreliable while processing-time timers drive
    // no-data batches — poll the sink with a deadline instead, using the
    // (2,3) pair as the positive signal that later batches really ran
    def pairsNow() = spark.table("neardup_ttl_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def awaitPair(p: (Long, Long), deadlineMs: Long = 60000): Unit = {
      val end = System.currentTimeMillis() + deadlineMs
      while (!pairsNow().contains(p) && System.currentTimeMillis() < end)
        Thread.sleep(250)
      assert(pairsNow().contains(p), s"pair $p never emitted; have ${pairsNow()}")
    }
    try {
      input.addData((1L, text))
      // the TTL clock arms when the batch PROCESSING doc 1 commits, not at
      // addData — wait for that commit first (slow first-batch codegen on a
      // loaded host would otherwise leave doc 1 alive past the fixed sleep)
      val armed = System.currentTimeMillis() + 60000
      while (!q.recentProgress.exists(_.numInputRows > 0) &&
        System.currentTimeMillis() < armed) Thread.sleep(250)
      assert(q.recentProgress.exists(_.numInputRows > 0), "doc 1 batch never committed")
      // let doc 1's bucket state expire (TTL 2s; timers fire on the paced
      // triggers) — generous margin, then ingest an identical doc
      Thread.sleep(8000)
      input.addData((2L, text)) // identical, but doc 1's state has expired
      input.addData((3L, text)) // pairs with the freshly remembered doc 2
      awaitPair((2L, 3L))
      val got = pairsNow()
      assert(!got.contains((1L, 2L)) && !got.contains((1L, 3L)),
        s"pair emitted against state that should have expired: $got")
    } finally q.stop()
  }

  test("stream–stream join matches within the time bound, drops outside (watermarked)") {
    val li = MemoryStream[(Timestamp, Long, String)](ss, 2)
    val ri = MemoryStream[(Timestamp, Long, String)](ss, 2)
    val l = li.toDF().toDF("lts", "lk", "lv")
    val r = ri.toDF().toDF("rts", "rk", "rv")
    val joined = graft.streaming.StreamingTables.streamStreamJoin(
      l, r, "lk", "rk", "lts", "rts", watermark = "1 hour", maxDelay = "10 MINUTES")
    val q = joined.writeStream.format("memory").queryName("ss_join_t")
      .outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      li.addData((t(10), 1L, "a"), (t(30), 2L, "b"))
      ri.addData((t(12), 1L, "x"), (t(55), 2L, "y")) // y is 25min late → no match
      q.processAllAvailable()
      val rows = spark.table("ss_join_t").select("lv", "rv")
        .collect().map(r0 => (r0.getString(0), r0.getString(1))).toSet
      assert(rows == Set(("a", "x")))
    } finally q.stop()
  }

  test("streaming update-mode count per key ≅ KTable count changelog (R11/R14)") {
    val input = MemoryStream[Long](ss, 2)
    val df = input.toDF().toDF("user_id")
    val counts = df.groupBy("user_id").count()
    val q = counts.writeStream.format("memory").queryName("cnt_t")
      .outputMode("update").start()
    try {
      input.addData(1L, 1L, 2L)
      q.processAllAvailable()
      input.addData(1L)
      q.processAllAvailable()
      // update mode emits a new row per changed key per batch; the latest
      // emission per key is the current table state (toStream semantics)
      val state = spark.table("cnt_t").groupBy("user_id")
        .agg(max("count").as("count")).orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(state == Seq((1L, 3L), (2L, 1L)))
    } finally q.stop()
  }

  test("contamination screen runs on a stream: stateless projection, append mode, exact scores") {
    val bench = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"))).toDF("doc_id", "text")
    val hashes = graft.operators.TextAnalysis.benchShingleHashes(bench, "text", 3)
    val input = MemoryStream[(Long, String)](ss, 2)
    val scored = graft.operators.TextAnalysis.contaminationStream(
      input.toDF().toDF("doc_id", "text"), hashes, "doc_id", "text", shingleSize = 3)
    val q = scored.writeStream.format("memory").queryName("contam_t")
      .outputMode("append").start()
    try {
      input.addData((10L, "the quick brown fox jumps over the lazy dog"),
        (11L, "completely different words entirely here now"))
      q.processAllAvailable()
      input.addData((12L, "the quick brown fox sat still today fine"))
      q.processAllAvailable()
      val rows = spark.table("contam_t")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
      assert(rows(10L) == 1.0 && rows(11L) == 0.0)
      assert(rows(12L) > 0.0 && rows(12L) < 1.0)
    } finally q.stop()
  }

  test("grouped top-k heap aggregates across streaming batches (update mode)") {
    // the TypedImperativeAggregate heap must merge streamed partials with
    // prior state exactly like batch partials — late high scores evict,
    // late low scores are ignored
    val input = MemoryStream[(Long, Double, Long)](ss, 2)
    val df = input.toDF().toDF("k", "score", "id")
    val top = df.groupBy("k")
      .agg(graft.functions.TopK.topk(col("score"), col("id"), 2).as("top"))
    val q = top.writeStream.format("memory").queryName("topk_t")
      .outputMode("update").start()
    try {
      input.addData((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.1, 12L))
      q.processAllAvailable()
      input.addData((1L, 0.7, 13L), (1L, 0.01, 14L)) // 0.7 evicts 0.5; 0.01 ignored
      q.processAllAvailable()
      val last = spark.table("topk_t").collect().last.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(last == Seq((0.9, 11L), (0.7, 13L)),
        s"streamed top-2 state wrong: $last")
    } finally q.stop()
  }

  test("Misra-Gries sketch accumulates across micro-batches in update mode (X21)") {
    val input = MemoryStream[String](ss, 2)
    val sk = input.toDF().toDF("item")
      .agg(graft.functions.FreqSketch.mgCandidates(col("item"), 4).as("cands"))
    val q = sk.writeStream.format("memory").queryName("mg_t")
      .outputMode("update").start()
    try {
      input.addData("a", "a", "b", "c")
      q.processAllAvailable()
      input.addData("a", "a", "b", "d", "e") // 'a' now dominant across batches
      q.processAllAvailable()
      val last = spark.table("mg_t").collect().last.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
      // 9 items, k=4: anything with count > 9/5 must be present; 'a' (4)
      // must lead and its residual count can only underestimate
      assert(last.nonEmpty && last.head._1 == "a" && last.head._2 <= 4L &&
        last.size <= 4, s"streamed MG summary wrong: $last")
      val asMap = last.toMap
      assert(asMap.contains("b"), s"count-2 item missing from $last") // 2 > 9/5
    } finally q.stop()
  }
}
