package graft

import org.apache.spark.sql.functions._

import graft.observe.{PlanAudit, RunMetrics}

/** Observability module pins: runtime metric capture really measures what
  * ran, and the plan auditor flags exactly the at-scale anti-patterns —
  * then the flagship sweep: EVERY registry query's physical plan passes
  * the audit with no warns beyond the per-query intentional whitelist
  * (the generalized, self-maintaining form of PlanSpec's hand pins).
  */
class ObserveSpec extends SparkSuite {

  test("RunMetrics: a shuffling aggregation reports shuffle bytes and tasks; a map-only scan reports none") {
    val shuffled = spark.range(0, 200000, 1, 4)
      .withColumn("k", col("id") % 100).groupBy("k").count()
    val (n, m) = RunMetrics.capture(spark, "shuffled") { shuffled.count() }
    assert(n == 100L)
    assert(m.tasks > 0 && m.stages >= 2, m.toJson)
    assert(m.shuffleReadBytes > 0 && m.shuffleWriteBytes > 0, m.toJson)
    assert(m.maxTaskMs >= m.p50TaskMs && m.skew >= 1.0, m.toJson)

    // count() itself exchanges its partial counts (~4 records), so the
    // map-only pin drives the plan through a noop write instead
    val mapOnly = spark.range(0, 200000, 1, 4).select(col("id") * 2)
    val (_, m2) = RunMetrics.capture(spark, "map_only") {
      mapOnly.write.format("noop").mode("overwrite").save()
    }
    assert(m2.tasks > 0, m2.toJson)
    assert(m2.shuffleReadBytes == 0 && m2.shuffleWriteBytes == 0 &&
      m2.spillDiskBytes == 0, m2.toJson)
  }

  test("PlanAudit: cartesian/nested-loop joins are flagged; an equi join is not") {
    val a = spark.range(0, 100).toDF("id")
    val b = spark.range(0, 100).toDF("id2")
    val cross = a.crossJoin(b)
    assert(PlanAudit.warns(cross).exists(_.rule == "nested_loop_join"),
      PlanAudit.audit(cross).mkString("\n"))
    val equi = a.join(b, a("id") === b("id2"))
    assert(!PlanAudit.warns(equi).exists(_.rule == "nested_loop_join"))
  }

  test("PlanAudit: exchange counting sees through the AQE wrapper (inputPlan predates exchange insertion)") {
    val shuffled = spark.range(0, 1000, 1, 4)
      .withColumn("k", col("id") % 7).groupBy("k").count()
    val n = PlanAudit.audit(shuffled)
      .find(_.rule == "exchanges").map(_.detail.toInt)
    assert(n.exists(_ >= 1), s"groupBy must report ≥1 exchange, got $n")
  }

  test("PlanAudit: a pushable filter that reached the scan passes; with pushdown disabled it is flagged") {
    val li = () => spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_quantity") < 10).select("l_orderkey")
    assert(!PlanAudit.warns(li()).exists(_.rule == "unpushed_filter"),
      PlanAudit.audit(li()).mkString("\n"))
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    try
      assert(PlanAudit.warns(li()).exists(_.rule == "unpushed_filter"),
        PlanAudit.audit(li()).mkString("\n"))
    finally spark.conf.set("spark.sql.parquet.filterPushdown", "true")
  }

  test("PlanAudit: a filter parquet cannot push (computed predicate) is NOT flagged") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(length(col("text")) > 100)
    assert(!PlanAudit.warns(docs).exists(_.rule == "unpushed_filter"),
      PlanAudit.audit(docs).mkString("\n"))
  }

  test("PlanAudit: a dim forced through a shuffle join against a 16x-bigger fact is flagged; the broadcast form passes") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val sup = spark.read.parquet(s"${sf()}/supplier.parquet")
    val forced = li.join(sup.hint("merge"), li("l_suppkey") === sup("s_suppkey"))
    assert(PlanAudit.warns(forced).exists(_.rule == "broadcastable_shuffle_join"),
      PlanAudit.audit(forced).mkString("\n"))
    val bcast = li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
    assert(PlanAudit.warns(bcast).isEmpty,
      PlanAudit.audit(bcast).mkString("\n"))
  }

  // Queries whose plans intentionally contain a whitelisted shape — each
  // entry names the rule and why it is the DESIGNED plan, not a regression.
  private val allowed: Map[String, Set[String]] = {
    // corpus × broadcast-queries top-k scans: the scored side is the whole
    // corpus on purpose; the broadcast side is k rows (PLANS.md, X3)
    val knnScan = Set("nested_loop_join")
    Map(
      "x3_knn_exact" -> knnScan,
      "x3_knn_quantized" -> knnScan,
      "x3_sql_knn" -> knnScan,
      "r28_spec_knn" -> knnScan,
      "r28_spec_knn_quantized" -> knnScan,
      // the stored-index quantized route: the same scan class, sketch
      // column read from the knn_index artifact
      "r44_spec_knn_index" -> knnScan,
      // the APPENDED quantized index searched through the same route
      // (postings now span two committed generations)
      "r47_spec_knn_append" -> knnScan,
      // the COMPACTED quantized index — same route again, postings folded
      // back into one generation by the pure-copy compactor
      "r49_spec_knn_compact" -> knnScan,
      // the TOMBSTONED quantized index — same route, live postings now
      // anti-joined against the broadcast takedown set
      "r51_spec_knn_delete" -> knnScan,
      // the ATTRIBUTE-FILTERED quantized index — same route, the filter
      // pushed into the posting scan before the candidate stage
      "r52_spec_knn_filtered" -> knnScan,
      // the MASS-TOMBSTONED quantized index (both anti-join routes:
      // shuffle past the broadcast bar, broadcast under it) — same
      // corpus × broadcast-query scan class downstream of the screen
      "r54_spec_knn_mass_delete" -> knnScan,
      "r54_spec_knn_mass_delete_bcast" -> knnScan,
      // the PER-CATEGORY routed search — the same quantized scan class,
      // over the label-3 sub-index's postings
      "r54_spec_knn_per_category" -> knnScan,
      // conjunction routing: the same sub-index scan class, residual
      // filter pushed into the sub's posting scan
      "r54_spec_knn_category_residual" -> knnScan,
      // the direct filtered exact route: the same corpus × broadcast-
      // query scan over the pre-filtered frame
      "r52_spec_knn_filtered_exact" -> knnScan,
      // the GLOBAL percentile monitor: a condition-form left join against
      // the ONE-row broadcast global baseline (the q11/q15 one-row cross)
      "r52_spec_quantile_monitor_global" -> Set("nested_loop_join"),
      // the GLOBAL batch percentile drift: the one-row x one-row
      // broadcast cross of the two global sketch rollups
      "r53_spec_drift_quantile_global" -> Set("nested_loop_join"),
      // one-row broadcast scalar crosses (corpus average / max-revenue row,
      // PLANS.md q11/q15) — a BNLJ against exactly one row is the designed
      // no-self-join shape
      "q11_important_stock" -> Set("nested_loop_join"),
      "q15_top_supplier" -> Set("nested_loop_join"),
      "q2_min_cost_supplier" -> Set("nested_loop_join"),
      // benchmark-shingle containment screens: arrays_overlap against a
      // broadcast eval set is a non-equi broadcast semi by design (X19)
      "x19_contamination" -> Set("nested_loop_join"),
      "x19_contamination_stream" -> Set("nested_loop_join"),
      "r23_spec_contamination" -> Set("nested_loop_join"),
      // more one-row scalar crosses: the corpus-average acctbal (q22) and
      // the doc-count IDF denominator (x5_tfidf) broadcast exactly one row
      "q22_no_orders" -> Set("nested_loop_join"),
      "x5_tfidf" -> Set("nested_loop_join"),
      // the salt-fanout side: dim rows crossed with the ≤16-row literal
      // salt table before the equi join (Scale.saltedJoin) — the cross IS
      // the skew mitigation, its output is |dim|·salts tiny rows
      "x13_salted_join" -> Set("nested_loop_join"),
      // the exact all-pairs cosine BASELINE is brute force by definition —
      // it exists as the oracle/recall reference for the bucketed paths
      // (x29_drift_heavy / r36_spec_drift_gate left this map in round 20:
      // heavyHitterDrift's totals now fold into the recount pass, so the
      // one-row crosses are gone from the plan)
      "x3_cosine_pairs_exact" -> Set("nested_loop_join"))
  }

  test("plan hygiene sweep: every registry query audits clean of unexpected warns (sf0.001)") {
    val failures = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val res = try {
        val ws = PlanAudit.warns(fn(spark, sf()))
          .filterNot(w => allowed.getOrElse(name, Set.empty).contains(w.rule))
        if (ws.isEmpty) None
        else Some(s"$name: ${ws.map(w => s"${w.rule} (${w.detail})").mkString("; ")}")
      } catch { case e: Throwable => Some(s"$name: audit error ${e.getMessage}") }
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
      res
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
