package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

class ScaleSpec extends SparkSuite {

  test("salted join equals plain join (same rows, skew split across salts)") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val p = spark.read.parquet(s"${sf()}/part.parquet")
    val plain = l.join(p, l("l_partkey") === p("p_partkey")).count()
    val salted = Scale.saltedJoin(l, p, "l_partkey", "p_partkey", saltFactor = 8).count()
    assert(salted == plain)
  }

  test("salted left join preserves unmatched left rows exactly once") {
    val l = spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (99L, "zz"))).toDF("k", "v")
    val r = spark.createDataFrame(Seq((1L, "x"), (2L, "y"))).toDF("rk", "w")
    val out = Scale.saltedJoin(l, r, "k", "rk", saltFactor = 4, joinType = "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("w").isNull).count() == 1)
  }

  test("bucketed join plans without an exchange (co-located, R-chain at scale)") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    for (t <- Seq("orders_b", "customer_b")) {
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val c = spark.read.parquet(s"${sf()}/customer.parquet")
    Scale.writeBucketed(o, "orders_b", "o_custkey", 4)
    Scale.writeBucketed(c, "customer_b", "c_custkey", 4)
    // disable broadcast so the join must pick the shuffle path — at real
    // scale neither side fits a broadcast; that's the case bucketing serves
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1000)}")
      assert(joined.count() ==
        o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("z-value kernel: bit interleave places each quantized bit at stride positions") {
    // mins 0 / maxs 3 at bits=2 quantize v to itself (floor(v/3*3)); for
    // (x, y): z = x0<<0 | y0<<1 | x1<<2 | y1<<3 — pin a few points
    val df = spark.createDataFrame(Seq((0L, 0L), (1L, 2L), (3L, 3L), (2L, 1L)))
      .toDF("x", "y")
      .withColumn("z", Scale.zValue(Seq(col("x"), col("y")), Seq(0.0, 0.0),
        Seq(3.0, 3.0), bits = 2))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L)
    assert(z((1L, 2L)) == 9L)  // x=01 -> bits 0; y=10 -> bit 3
    assert(z((3L, 3L)) == 15L)
    assert(z((2L, 1L)) == 6L)  // x=10 -> bit 2; y=01 -> bit 1
  }

  test("z-ordered layout prunes on EVERY clustered dim; single-sort only on its own") {
    // The property parquet footer pruning exploits is file-level min/max
    // disjointness — measure it directly: count files whose [min,max] box
    // intersects a band predicate, under (a) z-order on (user_id, value)
    // and (b) a plain sort by user_id. The plain sort is optimal for
    // user_id bands but CANNOT skip anything for a value band; z-order
    // skips most files for EITHER single-dim band — that is the multi-dim
    // claim, pinned on real data.
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select("event_id", "user_id", "value")
    val nFiles = 16
    val zDir = tempDir("graft_zorder")
    Scale.writeZOrdered(ev, zDir, Seq("user_id", "value"), numFiles = nFiles)
    val sDir = tempDir("graft_sorted")
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(sDir)
    // layout must not lose or duplicate rows
    assert(spark.read.parquet(zDir).count() == ev.count())
    def fileBoxes(dir: String): Seq[(Double, Double, Double, Double)] =
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
        .map(_.toString).filter(f => f.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f).agg(
            min(col("user_id").cast("double")), max(col("user_id").cast("double")),
            min(col("value").cast("double")), max(col("value").cast("double"))).head()
          (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        }
    // 10%-wide bands in the middle of each dim's range
    val st = ev.agg(min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("value").cast("double")), max(col("value").cast("double"))).head()
    def band(lo: Double, hi: Double) = (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo))
    val (uLo, uHi) = band(st.getDouble(0), st.getDouble(1))
    val (vLo, vHi) = band(st.getDouble(2), st.getDouble(3))
    val zB = fileBoxes(zDir); val sB = fileBoxes(sDir)
    // range partitioning may leave a couple of sampled ranges empty (the
    // sorted layout wrote 14 files on this fixture) — the claim is about
    // per-file boxes, not the exact file count
    assert(zB.size == nFiles && sB.size >= nFiles / 2)
    def hitU(b: (Double, Double, Double, Double)) = b._1 <= uHi && b._2 >= uLo
    def hitV(b: (Double, Double, Double, Double)) = b._3 <= vHi && b._4 >= vLo
    // the plain user_id sort: a value band hits EVERY file (no value
    // clustering at all) — the baseline z-order exists to beat
    assert(sB.count(hitV) == sB.size)
    // z-order: BOTH single-dim bands skip at least half the files
    assert(zB.count(hitU) <= nFiles / 2,
      s"user_id band hit ${zB.count(hitU)}/$nFiles z-ordered files")
    assert(zB.count(hitV) <= nFiles / 2,
      s"value band hit ${zB.count(hitV)}/$nFiles z-ordered files")
    // and the 2-dim box hits at most what either band alone hits
    val boxHits = zB.count(b => hitU(b) && hitV(b))
    assert(boxHits <= math.min(zB.count(hitU), zB.count(hitV)))
  }

  test("config-path sink layout: zOrderBy on the output topic prunes like writeZOrdered") {
    // the X27 layout declared on the SINK SPEC (OutputTopic.zOrderBy +
    // targetFileBytes) must deliver the same per-file box disjointness the
    // code-path test above pins — measured on the written topic data
    val out = tempDir("graft_spec_layout")
    val spec = graft.config.PipelineSpec.fromJson(
      """{"id":"layout-z","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"events-z",
        |  "zOrderBy":["user_id","value"],"targetFileBytes":4096}}""".stripMargin)
    val written = graft.sinks.PipelineRunner.runBatch(spark, spec,
      new graft.sources.ParquetSourceResolver(sf(), graft.config.TestdataCatalog), out)
    assert(written == Seq(s"$out/events-z/data"))
    val data = spark.read.parquet(written.head)
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    assert(data.count() == ev.count())
    // records still round-trip whole: the z-value never leaks into the JSON
    assert(data.columns.toSet == Set("key", "value"))
    val sample = data.select("value").head.getString(0)
    assert(sample.contains("\"user_id\"") && sample.contains("\"event_id\""))
    // per-file (user_id, value) boxes parsed back OUT of the JSON — both
    // single-dim bands must skip at least half the files
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(written.head))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    assert(files.size >= 4, s"targetFileBytes should yield several files, got ${files.size}")
    def parsed(f: String) = spark.read.parquet(f).select(
      from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL("user_id DOUBLE, value DOUBLE")).as("v"))
      .select(col("v.user_id").as("u"), col("v.value").as("w"))
    val boxes = files.map { f =>
      val r = parsed(f).agg(min("u"), max("u"), min("w"), max("w")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val st = ev.agg(min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("value").cast("double")), max(col("value").cast("double"))).head()
    def band(lo: Double, hi: Double) = (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo))
    val (uLo, uHi) = band(st.getDouble(0), st.getDouble(1))
    val (vLo, vHi) = band(st.getDouble(2), st.getDouble(3))
    val uHits = boxes.count(b => b._1 <= uHi && b._2 >= uLo)
    val vHits = boxes.count(b => b._3 <= vHi && b._4 >= vLo)
    assert(uHits <= files.size / 2, s"user_id band hit $uHits/${files.size}")
    assert(vHits <= files.size / 2, s"value band hit $vHits/${files.size}")
  }

  test("config-path sink layout: partitionBy writes directory-pruned topic data") {
    val out = tempDir("graft_spec_part")
    val spec = graft.config.PipelineSpec.fromJson(
      """{"id":"layout-p","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"events-p",
        |  "partitionBy":["event_type"]}}""".stripMargin)
    val written = graft.sinks.PipelineRunner.runBatch(spark, spec,
      new graft.sources.ParquetSourceResolver(sf(), graft.config.TestdataCatalog), out)
    val data = spark.read.parquet(written.head)
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    assert(data.count() == ev.count())
    // hive layout: event_type is a directory AND stays in the JSON value
    assert(data.columns.toSet == Set("key", "value", "event_type"))
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(written.head))
      .toArray.map(_.toString).count(_.contains("event_type=")) >= 2)
    assert(data.select("value").head.getString(0).contains("\"event_type\""))
    // a partition filter prunes at plan time, not by reading rows
    val prunedPlan = data.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters"))
    // validation: layout mutual exclusion + short zOrderBy are config errors
    intercept[IllegalArgumentException](graft.config.PipelineSpec.fromJson(
      """{"id":"bad","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"b","partitionBy":["a"],
        |  "zOrderBy":["x","y"]}}""".stripMargin).validate())
    intercept[IllegalArgumentException](graft.config.PipelineSpec.fromJson(
      """{"id":"bad2","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"b","zOrderBy":["x"]}}""".stripMargin)
      .validate())
    // partitionBy "value" would collide with the generated kafka-shape
    // sink columns — must be a clear config error, not a late
    // ambiguous-reference AnalysisException (the events fixture really
    // does have a column named "value")
    val collide = intercept[IllegalArgumentException](graft.config.PipelineSpec.fromJson(
      """{"id":"bad3","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"outputTopic":{"enabled":true,"name":"b","partitionBy":["value"]}}""".stripMargin))
    assert(collide.getMessage.contains("key/value"))
  }

  test("bloom-pruned join is bit-identical to the plain join (false positives die in the join)") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val o = spark.read.parquet(s"${sf()}/orders.parquet").filter(col("o_totalprice") > 400000)
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(l("l_orderkey"), l("l_linenumber"), o("o_totalprice"))
    val bloomed = Scale.bloomPrunedJoin(l, o, "l_orderkey", "o_orderkey", 100000)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
    assert(plain.count() > 0, "vacuous fixture: no rows survive the filter")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty,
      "bloom-pruned join diverged from the plain join")
  }

  test("bloom-pruned semi join equals plain left_semi; outer joins are rejected as unsound") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val o = spark.read.parquet(s"${sf()}/orders.parquet").filter(col("o_totalprice") > 400000)
    val semi = Scale.bloomPrunedJoin(l, o, "l_orderkey", "o_orderkey", 100000, "left_semi")
    val plainSemi = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_semi")
    assert(semi.count() == plainSemi.count())
    // pruning the probe side under an outer join would delete rows the
    // join must null-preserve — the operator must refuse, not corrupt
    val e = intercept[IllegalArgumentException] {
      Scale.bloomPrunedJoin(l, o, "l_orderkey", "o_orderkey", 100000, "left_outer")
    }
    assert(e.getMessage.contains("left_outer"))
  }

  test("bloom pruning filters the probe side BELOW its exchange (pre-shuffle, the scale point)") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val o = spark.read.parquet(s"${sf()}/orders.parquet").filter(col("o_totalprice") > 400000)
    // disable broadcast: at real scale both sides are fact-sized and the
    // join shuffles — exactly the case the bloom prune serves
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bloomPrunedJoin(l, o, "l_orderkey", "o_orderkey", 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"bloom filter missing:\n${plan.take(800)}")
      // the might_contain filter must sit UNDER the probe side's Exchange.
      // Plans print top-down (parent before child), and the probe side
      // prints first, so the first hashpartitioning exchange must precede
      // the filter in the text; a filter applied above the join (wrong)
      // would print before any exchange
      val exch = plan.indexOf("Exchange hashpartitioning")
      val mc = plan.indexOf("might_contain")
      assert(exch >= 0 && mc > exch,
        s"might_contain is not below the probe shuffle (exchange@$exch, filter@$mc):\n" +
          plan.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout: a partition-column filter prunes directories, not rows") {
    val dir = tempDir("graft_part")
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    graft.operators.Scale.writePartitioned(ev, dir, Seq("event_type"))
    val all = spark.read.parquet(dir)
    val one = all.filter(col("event_type") === "purchase")
    // the filter rides the scan's PartitionFilters (directory pruning at
    // file-listing time), never a row-level Filter over the full corpus
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"partition filter missing: ${scan.partitionFilters}")
    // and the scan actually selects ONE directory's files
    assert(scan.inputRDDs().nonEmpty)
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(selected.size == 1,
      s"expected 1 surviving partition dir, got ${selected.size}")
    // and the data survives the round trip (partition col restored from path)
    val want = ev.filter(col("event_type") === "purchase").count()
    assert(one.count() == want)
  }

  test("dynamic partition pruning fires on a join against a filtered dim") {
    val dir = tempDir("graft_dpp")
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    graft.operators.Scale.writePartitioned(ev, dir, Seq("event_type"))
    val fact = spark.read.parquet(dir)
    // dim filtered on the AGGREGATE value: a literal filter on the join key
    // itself (et = 'x') is inferred through the join constraint and pruned
    // STATICALLY — only a runtime-valued selection exercises DPP proper.
    val dim = ev.groupBy(col("event_type").as("et")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    // broadcast the dim: DPP's default reuseBroadcastOnly mode prunes by
    // reusing a broadcast exchange — a sort-merge dim would decline
    val joined = fact.join(broadcast(dim), col("event_type") === col("et"))
    val expect = ev.groupBy(col("event_type")).count()
      .filter(col("count") >= 2).agg(sum(col("count"))).head.getLong(0)
    assert(joined.count() == expect)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in plan:\n${plan.take(1500)}")
  }
}
