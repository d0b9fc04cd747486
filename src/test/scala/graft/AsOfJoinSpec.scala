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

  test("asOfSnapshot is row-identical to asOf, including null keys, both directions") {
    // asOf's Window.partitionBy groups null keys into ONE partition, so a
    // null-keyed event picks up null-keyed versions — asOfSnapshot joins
    // null-safely (<=>) to reproduce exactly that, per its documented
    // row-identity. A plain === here once silently diverged (review find).
    val events = spark.createDataFrame(Seq(
      (1L, Some(1L), t(15)), (2L, Some(2L), t(15)),
      (3L, None, t(15)), (4L, None, t(5))))
      .toDF("event_id", "k", "ts")
    val versions = spark.createDataFrame(Seq(
      (Some(1L), t(10), "v1"), (Some(1L), t(20), "v2"),
      (None: Option[Long], t(10), "n1"), (None: Option[Long], t(20), "n2")))
      .toDF("k", "vts", "payload")
    for (fwd <- Seq(false, true)) {
      val viaWindow =
        (if (fwd) AsOfJoin.asOfForward(events, versions, "k", "ts", "vts",
          Map("payload" -> "version"))
        else AsOfJoin.asOf(events, versions, "k", "ts", "vts",
          Map("payload" -> "version")))
          .orderBy("event_id").collect()
          .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
      val viaSnapshot = AsOfJoin.asOfSnapshot(events, versions, "k", "ts", "vts",
        Map("payload" -> "version"), forward = fwd)
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
      assert(viaSnapshot == viaWindow, s"forward=$fwd")
      // and the null-key rows actually matched something (not vacuous)
      val nullKeyHits = viaSnapshot.filter { case (id, _) => id >= 3L }
      assert(nullKeyHits.exists(_._2.isDefined), s"forward=$fwd null-key rows")
    }
  }

  test("forward as-of: earliest version at-or-after; null after last version") {
    val events = spark.createDataFrame(Seq(
      (1L, 1L, t(5)), (2L, 1L, t(15)), (3L, 1L, t(25)), (4L, 2L, t(40))))
      .toDF("event_id", "k", "ts")
    val versions = spark.createDataFrame(Seq(
      (1L, t(10), "v1"), (1L, t(20), "v2"), (2L, t(30), "w1")))
      .toDF("k", "vts", "payload")
    val out = AsOfJoin.asOfForward(events, versions, "k", "ts", "vts",
      Map("payload" -> "version"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, Some("v1")),   // next version after 5 is v1 at 10
      (2L, Some("v2")),   // next after 15 is v2 at 20
      (3L, None),         // no version after 25 for key 1
      (4L, None)))        // key 2's version is earlier (30 < 40)
    // same-timestamp right row matches (>= semantics)
    val tie = AsOfJoin.asOfForward(
      spark.createDataFrame(Seq((1L, 1L, t(10)))).toDF("event_id", "k", "ts"),
      spark.createDataFrame(Seq((1L, t(10), "v"))).toDF("k", "vts", "payload"),
      "k", "ts", "vts", Map("payload" -> "version"))
    assert(tie.head().getString(3) == "v")
  }

  test("forward as-of agrees with the theta-join argmin on real events") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    val s = ev.filter(col("event_type") === "signup").select("event_id", "user_id", "ts")
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("pu"), col("ts").as("pts")).agg(min(col("value")).as("pv"))
    val got = AsOfJoin.asOfForward(s, p.select(col("pu").as("user_id"), col("pts").as("ts"), col("pv")),
        "user_id", "ts", "ts", Map("pv" -> "next_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap
    val want = s.join(p, col("user_id") === col("pu") && col("pts") >= col("ts"), "left")
      .groupBy(col("event_id")).agg(min_by(col("pv"), col("pts")).as("nv"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got == want)
    assert(got.values.exists(_.nonEmpty) && got.values.exists(_.isEmpty))
  }

  test("a matched right row with a NULL payload wins over a farther row's value (both directions)") {
    // last(ignoreNulls) over bare payload columns would skip the nearest
    // row's null and surface the farther value — ASOF semantics (and the
    // DuckDB oracle) return the NEAREST row's null. The struct-tagged carry
    // must preserve it.
    val rows: Seq[(Long, java.sql.Timestamp, java.lang.Double)] =
      Seq((1L, t(10), 5.0), (1L, t(20), null), (1L, t(30), 7.0))
    val versions = spark.createDataFrame(rows).toDF("k", "vts", "payload")
    val back = AsOfJoin.asOf(
      spark.createDataFrame(Seq((1L, 1L, t(25)))).toDF("event_id", "k", "ts"),
      versions, "k", "ts", "vts", Map("payload" -> "v"))
    assert(back.head().isNullAt(3), "backward: nearest (t=20, null) must win over t=10's 5.0")
    val fwd = AsOfJoin.asOfForward(
      spark.createDataFrame(Seq((1L, 1L, t(15)))).toDF("event_id", "k", "ts"),
      versions, "k", "ts", "vts", Map("payload" -> "v"))
    assert(fwd.head().isNullAt(3), "forward: nearest (t=20, null) must win over t=30's 7.0")
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

  test("resample: epoch-aligned grid, forward fill, leading null, per-key span") {
    val obs = spark.createDataFrame(Seq(
      (1L, t(7), 10.0), (1L, t(22), 20.0), (1L, t(48), 30.0),
      (2L, t(31), 99.0)))
      .toDF("k", "ts", "value")
    val out = AsOfJoin.resample(obs, "k", "ts", Seq("value"), "15 minutes")
      .collect().map(r => ((r.getLong(0), r.getTimestamp(1)), Option(r.get(2)))).toMap
    // key 1: bucket(10:07) = 10:00; grid 10:00, 10:15, 10:30, 10:45 (≤ 10:48)
    // key 2: the single point 10:30 — 5 grid rows total
    assert(out.size == 5, s"grid rows: ${out.keys.toSeq.sorted.mkString(", ")}")
    assert(out((1L, t(0))) == None, "grid point before first observation must be null")
    assert(out((1L, t(15))) == Some(10.0), "10:15 carries the 10:07 observation")
    assert(out((1L, t(30))) == Some(20.0), "10:30 carries the 10:22 observation")
    assert(out((1L, t(45))) == Some(20.0), "10:45 still carries 10:22 (10:48 is later)")
    // key 2: bucket(10:31) = 10:30 only (span < one interval)
    assert(out((2L, t(30))) == None, "10:30 precedes the 10:31 observation")
    assert(out.keys.count(_._1 == 2L) == 1, "key 2's grid must not extend past its span")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.resample(obs, "k", "ts", Seq("value"), "0 seconds")
    }
    assert(e.getMessage.contains("positive"))
  }

  test("resample dense-grid guard: loud error past maxGridRowsPerKey, " +
      "identical result under it") {
    val obs = spark.createDataFrame(Seq(
      (1L, t(7), 10.0), (1L, t(48), 30.0), (2L, t(31), 99.0)))
      .toDF("k", "ts", "value")
    // key 1 spans 41 minutes: a 1-second grid wants ~2900 rows — a declared
    // bound of 100 must refuse BEFORE exploding, naming the grid size and
    // the sizing formula
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.resample(obs, "k", "ts", Seq("value"), "1 second",
        maxGridRowsPerKey = 100L)
    }
    assert(e.getMessage.contains("maxGridRowsPerKey") &&
      e.getMessage.contains("span / every"), e.getMessage)
    // a bound the grid fits under changes nothing: guarded == unguarded
    val guarded = AsOfJoin.resample(obs, "k", "ts", Seq("value"), "15 minutes",
      maxGridRowsPerKey = 10L).collect().toSeq
    val plain = AsOfJoin.resample(obs, "k", "ts", Seq("value"), "15 minutes")
      .collect().toSeq
    assert(guarded.toSet == plain.toSet && guarded.nonEmpty)
    // config path: the declared guard reaches the operator
    val spec = graft.config.PipelineSpec.fromJson(
      """{"id":"dense-guard","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"resample","idColumn":"user_id","timeColumn":"ts",
        |  "valueColumns":["value"],"every":"1 second",
        |  "maxGridRowsPerKey":10}],
        |"outputTopic":{"enabled":true,"name":"dense-out"}}""".stripMargin)
    val ev = intercept[IllegalArgumentException] {
      graft.pipeline.Interpreter.build(spark, spec,
        new graft.sources.ParquetSourceResolver(sf(), graft.config.TestdataCatalog))
        .collect()
    }
    assert(ev.getMessage.contains("maxGridRowsPerKey"))
    // declared guard must be positive
    intercept[IllegalArgumentException](graft.config.PipelineSpec.fromJson(
      """{"id":"bad","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"transform":[{"op":"resample","idColumn":"user_id","timeColumn":"ts",
        |  "valueColumns":["value"],"every":"1 second",
        |  "maxGridRowsPerKey":0}],
        |"outputTopic":{"enabled":true,"name":"x"}}""".stripMargin))
  }
}
