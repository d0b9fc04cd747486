package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accuracy harness for the approximate query surface (round-11 directive
  * #1): queries whose raw output an exact SQL oracle cannot hash-match by
  * nature (LSH/SimHash/ANN recall, HLL and centroid-sketch estimates,
  * partition-local packing, non-SQL fingerprints) emit a machine-checkable
  * accuracy contract into the correctness artifact instead of a bare
  * `no_oracle` row.
  *
  * Contract per query: a row set `(metric, scope, n_ref, bound, pass)`
  * where
  *  - `pass` is honestly measured IN SPARK (recall vs the exact sibling
  *    run in the same session, HLL error vs exact distinct, sketch rank
  *    error vs exact order statistics, packing invariants) — the oracle
  *    pins it to literal `true`, so any accuracy regression flips the row
  *    and the driver's hash compare goes red;
  *  - `n_ref` is a REAL oracle-checked quantity (the exact sibling's
  *    cardinality, exact distinct counts, cell counts) recomputed
  *    independently by DuckDB — the context that keeps the check from
  *    being a self-fulfilling constant;
  *  - `bound` is the declared accuracy bound, the same number the green
  *    test-suite pins use (OperatorsSpec / InterpreterSpec /
  *    SketchProperties);
  *  - the MEASURED value (recall, max relative error, rank deviation …)
  *    cannot be hash-compared against a static oracle, so [[graft.Verify]]
  *    writes it to `accuracy.json` beside the query outputs and to
  *    `bench_out/accuracy-<sf>.json`, and prints one `[accuracy]` line per
  *    metric.
  *
  * These checks are VERIFICATION-MAIN code: they may collect small result
  * sets (pair lists, per-cell summaries — thousands of rows) because they
  * run once per round in the correctness harness, never inside an
  * operator. Heavy reference computations (exact order statistics over
  * millions of rows) stay distributed: rank positions are computed with
  * conditional aggregates against the joined estimates, never by
  * collecting raw columns.
  */
object Accuracy {
  final case class Metric(metric: String, scope: String, value: Double,
      nRef: Long, bound: Double, pass: Boolean)

  type Check = (SparkSession, String) => Seq[Metric]

  /** The compared row shape (the parquet the driver hash-checks). */
  def summaryDf(spark: SparkSession, ms: Seq[Metric]): DataFrame = {
    import spark.implicits._
    ms.map(m => (m.metric, m.scope, m.nRef, m.bound, m.pass))
      .toDF("metric", "scope", "n_ref", "bound", "pass")
  }

  // ---------------------------------------------------------------- helpers

  private def events(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/events.parquet")
  private def documents(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def relErr(approx: Long, exact: Long): Double =
    if (exact == 0L) { if (approx == 0L) 0.0 else 1.0 }
    else math.abs(approx - exact).toDouble / exact

  /** HLL-style per-scope comparison: approximate distinct counts vs exact,
    * one metric row per scope, ±5% (the OperatorsSpec pin).
    */
  private def hllMetrics(metric: String, got: Map[String, Long],
      exact: Seq[(String, Long)]): Seq[Metric] =
    exact.map { case (scope, ex) =>
      val err = got.get(scope).map(relErr(_, ex)).getOrElse(1.0)
      Metric(metric, scope, err, ex, 0.05, got.contains(scope) && err <= 0.05)
    }

  /** Exact per-group distinct for the HLL references (countDistinct skips
    * nulls, matching both approx_count_distinct and the DataSketches path).
    */
  private def exactDistinctByType(spark: SparkSession, dir: String): Seq[(String, Long)] =
    events(spark, dir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Rank-position check for quantile-sketch estimates, fully distributed:
    * join each scope's estimates to the raw rows, count below/at-most with
    * conditional aggregates, and demand the estimate's rank sits within
    * `max(1.5, 0.01·n)` positions of q·n — the 1%-of-rank pin with the
    * ±1.5-position interpolation slack the windowed InterpreterSpec pin
    * uses for cells of a handful of rows. Returns (scope, n, maxDeviation,
    * allWithin).
    */
  private def rankDeviations(raw: DataFrame, joinKeys: Seq[String],
      valueCol: String, est: DataFrame, qs: Seq[(Double, String)])
      : Seq[(Seq[Any], Long, Double, Boolean)] = {
    val estKeyed = est.select(
      (joinKeys.map(col) ++ qs.map { case (_, c) => col(c) }): _*)
    val joined = raw.join(broadcast(estKeyed), joinKeys)
    val aggs = qs.zipWithIndex.flatMap { case ((_, c), i) => Seq(
      sum(when(col(valueCol) < col(c), 1L).otherwise(0L)).as(s"below$i"),
      sum(when(col(valueCol) <= col(c), 1L).otherwise(0L)).as(s"atMost$i")) } :+
      count(col(valueCol)).as("n")
    joined.groupBy(joinKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val n = r.getAs[Long]("n")
        val slack = math.max(1.5, 0.01 * n)
        val devs = qs.zipWithIndex.map { case ((q, _), i) =>
          val below = r.getAs[Long](s"below$i").toDouble
          val atMost = r.getAs[Long](s"atMost$i").toDouble
          val target = q * n
          math.max(0.0, math.max(below - target, target - atMost))
        }
        val within = devs.forall(_ <= slack)
        (joinKeys.map(r.getAs[Any]), n, devs.max, within)
      }.toSeq
  }

  // ------------------------------------------------------- sketch estimates

  private def checkApproxDistinct: Check = (spark, dir) => {
    val got = Queries.all("x6_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hllMetrics("hll_rel_err", got, exactDistinctByType(spark, dir))
  }

  private def checkSketchRollup: Check = (spark, dir) => {
    val got = Queries.all("x6_sketch_rollup")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = "__all__" ->
      events(spark, dir).agg(countDistinct(col("user_id"))).head.getLong(0)
    hllMetrics("hll_rel_err", got, exactDistinctByType(spark, dir) :+ global)
  }

  private def checkSpecDistinct: Check = (spark, dir) => {
    val got = Queries.all("r30_spec_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hllMetrics("hll_rel_err", got, exactDistinctByType(spark, dir))
  }

  /** Per-cell HLL vs exact, reported as ONE aggregated row: n_ref is the
    * oracle-checked cell count, pass demands EVERY cell within ±5%. `got`
    * and `exact` must share the cell-key columns plus n_distinct / ex_nd.
    */
  private def cellDistinctMetric(got: DataFrame, exact: DataFrame,
      cellKeys: Seq[String]): Seq[Metric] = {
    val cells = got.join(exact, cellKeys, "full_outer")
      .select(col("n_distinct"), col("ex_nd")).collect()
    val errs = cells.map { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) 1.0
      else relErr(r.getLong(0), r.getLong(1))
    }
    val nCells = cells.count(r => !r.isNullAt(1))
    Seq(Metric("hll_cells_within_bound", "__all__",
      if (errs.isEmpty) 1.0 else errs.max, nCells, 0.05,
      errs.nonEmpty && errs.forall(_ <= 0.05) && cells.length == nCells))
  }

  private def checkWindowDistinct: Check = (spark, dir) =>
    cellDistinctMetric(
      Queries.all("r32_spec_window_distinct")(spark, dir)
        .select(col("window_start"), col("event_type"), col("n_distinct")),
      events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("ex_nd")),
      Seq("window_start", "event_type"))

  private def checkSlidingDistinct: Check = (spark, dir) =>
    // exact reference cells via the same sliding window function (the
    // window ARITHMETIC itself is oracle-pinned by r33_spec_sliding_heavy,
    // and the DuckDB n_ref recomputes the cell count independently)
    cellDistinctMetric(
      Queries.all("r34_spec_sliding_distinct")(spark, dir)
        .select(col("window_start"), col("event_type"), col("n_distinct")),
      events(spark, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("__w"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("ex_nd"))
        .select(col("__w.start").as("window_start"), col("event_type"), col("ex_nd")),
      Seq("window_start", "event_type"))

  private def checkSketchDrift: Check = (spark, dir) => {
    // the declarative sketchPath drift route (r43): per-cell HLL estimates
    // on BOTH sides vs exact distinct counts, one aggregated row — the
    // same contract shape as the windowed sketch-table checks
    val got = Queries.all("r43_spec_drift_sketch")(spark, dir)
      .select(col("category"), col("old_value"), col("new_value"))
    val ev = events(spark, dir)
    val ex = ev.filter(col("user_id") < 8)
      .groupBy(col("event_type").cast("string").as("category"))
      .agg(countDistinct(col("user_id")).as("ex_old"))
      .join(ev.groupBy(col("event_type").cast("string").as("category"))
        .agg(countDistinct(col("user_id")).as("ex_new")),
        Seq("category"), "full_outer")
    val cells = got.join(ex, Seq("category"), "full_outer")
      .select("old_value", "new_value", "ex_old", "ex_new").collect()
    def exv(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i)
    val errs = cells.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) Seq(1.0) // cell missing from got
      else Seq(relErr(r.getDouble(0).toLong, exv(r, 2)),
        relErr(r.getDouble(1).toLong, exv(r, 3)))
    }
    val nCells = cells.count(r => !r.isNullAt(2) || !r.isNullAt(3))
    Seq(Metric("hll_cells_within_bound", "__all__",
      if (errs.isEmpty) 1.0 else errs.max, nCells, 0.05,
      errs.nonEmpty && errs.forall(_ <= 0.05) && cells.length == nCells))
  }

  private def checkSessionQuantile: Check = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val est = Queries.all("r34_spec_session_quantile")(spark, dir)
    // INDEPENDENT sessionization (lag/sum break walk — the same procedure
    // as the r33 session DuckDB oracle): a break where the inactivity gap
    // reaches 5 minutes, session start = min ts. Agreement of these cell
    // keys with the query's session_window starts cross-pins Spark's
    // session merge rule; the rank check then pins the sketch estimates.
    val w = Window.partitionBy("user_id").orderBy("ts")
    val raw = events(spark, dir).filter(col("user_id").isNotNull)
      .withColumn("__brk",
        // events.ts reads as TIMESTAMP_NTZ, which cannot cast straight to
        // double — go through an epoch-seconds expression instead
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts").cast("timestamp").cast("double") -
            lag(col("ts"), 1).over(w).cast("timestamp").cast("double") >= 300.0,
          1L).otherwise(0L))
      .withColumn("__sid", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("window_start",
        min(col("ts")).over(Window.partitionBy("user_id", "__sid")))
    val devs = rankDeviations(raw, Seq("window_start", "user_id"), "value",
      est, Seq(0.5 -> "p50", 0.9 -> "p90"))
    // the join keeps only cells BOTH sessionizations produced — demand full
    // agreement (est cells == independent walk cells == joined cells), so a
    // session_window merge divergence cannot silently drop cells from the
    // rank check
    val nWalkCells = raw.select("window_start", "user_id").distinct().count()
    val nEstCells = est.count()
    Seq(Metric("quantile_rank_slack_ratio", "__all__",
      if (devs.isEmpty) Double.NaN else devs.map(slackRatio).max, nWalkCells,
      1.0,
      devs.nonEmpty && devs.forall(_._4) &&
        devs.size.toLong == nWalkCells && nEstCells == nWalkCells))
  }

  private def checkWindowQuantile: Check = (spark, dir) => {
    val est = Queries.all("r32_spec_window_quantile")(spark, dir)
    val raw = events(spark, dir)
      .withColumn("window_start", date_trunc("hour", col("ts")))
    val devs = rankDeviations(raw, Seq("window_start", "event_type"), "value",
      est, Seq(0.5 -> "p50", 0.9 -> "p90"))
    val nCells = devs.size.toLong
    Seq(Metric("quantile_rank_slack_ratio", "__all__",
      if (devs.isEmpty) Double.NaN else devs.map(slackRatio).max, nCells, 1.0,
      devs.nonEmpty && devs.forall(_._4)))
  }

  /** Worst-cell rank deviation as a fraction of that cell's own slack
    * (max(1.5, 1% of cell rows) — the same per-cell bound `within` uses),
    * so the reported value and the reported bound (1.0) agree: before this
    * normalization the summary row showed the max ABSOLUTE deviation
    * against the 1.5-row floor, which read as value>bound with pass=true
    * on any cell big enough for the 1% term to govern.
    */
  private def slackRatio(d: (Seq[Any], Long, Double, Boolean)): Double =
    d._3 / math.max(1.5, 0.01 * d._2)

  /** Shared by the global quantile rollups: per-scope rank check over
    * events.value grouped by event_type, plus an optional global scope.
    */
  private def quantileRollupMetrics(spark: SparkSession, dir: String,
      queryName: String, withGlobal: Boolean): Seq[Metric] = {
    val est = Queries.all(queryName)(spark, dir)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val ev = events(spark, dir)
    val perType = rankDeviations(ev, Seq("event_type"), "value",
      est.filter(col("event_type") =!= "__all__"), qs)
      .map { case (keys, n, dev, ok) =>
        Metric("quantile_rank_err_positions", keys.head.toString, dev, n,
          math.max(1.5, 0.01 * n), ok)
      }
    val global =
      if (!withGlobal) Nil
      else {
        val g = rankDeviations(ev.withColumn("__g", lit("__all__")), Seq("__g"),
          "value", est.filter(col("event_type") === "__all__")
            .withColumn("__g", lit("__all__")), qs)
        g.map { case (_, n, dev, ok) =>
          Metric("quantile_rank_err_positions", "__all__", dev, n,
            math.max(1.5, 0.01 * n), ok)
        }
      }
    perType ++ global
  }

  private def checkQuantileRollup: Check = (spark, dir) =>
    quantileRollupMetrics(spark, dir, "x6_quantile_rollup", withGlobal = true)

  private def checkSpecQuantiles: Check = (spark, dir) =>
    quantileRollupMetrics(spark, dir, "r29_spec_quantiles", withGlobal = false)

  private def checkQuantileMerge: Check = (spark, dir) => {
    val est = Queries.all("x6_quantile_merge")(spark, dir)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("v"))
    val qs = Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")
    rankDeviations(li.withColumn("path", lit("direct"))
        .unionByName(li.withColumn("path", lit("two_level"))),
      Seq("path"), "v", est, qs)
      .map { case (keys, n, dev, ok) =>
        Metric("quantile_rank_err_positions", keys.head.toString, dev, n,
          math.max(1.5, 0.01 * n), ok)
      }
  }

  // --------------------------------------------------------- pair recall

  private def checkMinhashLsh: Check = (spark, dir) => {
    // the OperatorsSpec pin verbatim: every exact pair at j >= 0.9 must be
    // recalled by 32-band LSH at estimated j >= 0.7 (expected miss rate
    // (1 - 0.9^4)^32 ~ 1e-15 — subset is the design guarantee, not luck)
    val lsh = pairSet(Queries.all("x2_minhash_lsh")(spark, dir))
    val exact09 = pairSet(graft.operators.Dedup.jaccardPairs(
      documents(spark, dir), "doc_id", "text", shingleSize = 3, threshold = 0.9))
    val recall =
      if (exact09.isEmpty) 1.0
      else lsh.intersect(exact09).size.toDouble / exact09.size
    Seq(Metric("high_jaccard_pair_recall", "__all__", recall, exact09.size.toLong,
      1.0, exact09.nonEmpty && exact09.subsetOf(lsh)))
  }

  private def checkSimhash: Check = (spark, dir) => {
    // SimHash banding is EXACT w.r.t. its own contract (4 x 16-bit chunks:
    // hamming <= 3 forces at least one identical chunk, so no qualifying
    // pair can be missed) — the measurable claims are output soundness
    // (every emitted pair really is hamming <= maxHamming) and precision
    // against the exact word-jaccard pair set at 0.8. Since round 12 the
    // query is the VERIFIED form (candidates filtered by exact Jaccard >=
    // 0.8), so precision holds 1.0 structurally at EVERY corpus size — the
    // raw banding's precision decayed 0.97 -> 0.27 at sf1 because false
    // 64-bit collisions grow quadratically. The check still measures it
    // end-to-end rather than assuming it.
    val rows = Queries.all("x2_simhash")(spark, dir).collect()
    val maxHam = if (rows.isEmpty) 0L
      else rows.map(_.getAs[Number]("hamming").longValue()).max
    val nDocs = documents(spark, dir).count()
    val simPairs = rows.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    val exact08 = pairSet(graft.operators.Dedup.jaccardPairs(
      documents(spark, dir), "doc_id", "text", shingleSize = 3, threshold = 0.8))
    val precision =
      if (simPairs.isEmpty) 0.0
      else simPairs.intersect(exact08).size.toDouble / simPairs.size
    Seq(
      Metric("emitted_hamming_le_max", "__all__", maxHam.toDouble, nDocs, 3.0,
        rows.nonEmpty && maxHam <= 3L),
      Metric("precision_vs_exact_jaccard", "__all__", precision,
        exact08.size.toLong, 0.8, precision >= 0.8))
  }

  private def checkEmbedDup: Check = (spark, dir) => {
    // OperatorsSpec pin: candidates are cosine-verified so precision is 1
    // by construction (subset of the exact pair set), recall >= 0.9
    val lsh = pairSet(Queries.all("x2_embed_dup")(spark, dir))
    val exact = pairSet(Queries.all("x3_cosine_pairs_exact")(spark, dir))
    val inter = lsh.intersect(exact).size.toDouble
    val precision = if (lsh.isEmpty) 0.0 else inter / lsh.size
    val recall = if (exact.isEmpty) 0.0 else inter / exact.size
    Seq(
      Metric("pair_precision_vs_exact", "__all__", precision, exact.size.toLong,
        1.0, lsh.nonEmpty && lsh.subsetOf(exact)),
      Metric("pair_recall_vs_exact", "__all__", recall, exact.size.toLong,
        0.9, recall >= 0.9))
  }

  private def checkCollapseLsh: Check = (spark, dir) => {
    val lshSurv = Queries.all("x2_dedup_collapse_lsh")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactSurv = Queries.all("x2_dedup_collapse")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // SYMMETRIC agreement (|∩| / |∪|): under-merging — LSH missing dup
    // pairs leaves EXTRA survivors, the realistic recall-decay failure —
    // inflates the union and moves the metric, where the one-sided
    // |∩|/|exact| form would stay 1.0 forever (exact ⊆ lsh) and only ever
    // see over-merging
    val agree =
      if (exactSurv.isEmpty) 0.0
      else lshSurv.intersect(exactSurv).size.toDouble /
        lshSurv.union(exactSurv).size
    Seq(Metric("survivor_agreement_vs_exact", "__all__", agree,
      exactSurv.size.toLong, 0.98, agree >= 0.98))
  }

  private def annRecall(queryName: String): Check = (spark, dir) => {
    // recall@10 against the brute-force sibling (OperatorsSpec pins 0.85
    // for both IVF at nProbe=4 and LSH at 16 tables x 4 planes)
    val ann = Queries.all(queryName)(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Queries.all("x3_knn_exact")(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall =
      if (exact.isEmpty) 0.0 else ann.intersect(exact).size.toDouble / exact.size
    Seq(Metric("recall_at_10_vs_exact", "__all__", recall, exact.size.toLong,
      0.85, recall >= 0.85))
  }

  private def checkQuantileDrift: Check = (spark, dir) => {
    // the declarative quantilePath drift route (r45): each side's stored-
    // sketch estimates vs that side's exact order statistics, per cell —
    // the same ±1%-of-rank contract as every X26 row, old and new side
    // each reported as one aggregated metric
    val got = Queries.all("r45_spec_drift_quantile")(spark, dir)
    def estOf(valueCol: String): DataFrame =
      got.groupBy(col("category").as("event_type"))
        .agg(max(when(col("metric") === "p50", col(valueCol))).as("p50"),
          max(when(col("metric") === "p90", col(valueCol))).as("p90"))
    val ev = events(spark, dir)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90")
    def sideMetric(scope: String, raw0: DataFrame, est: DataFrame): Metric = {
      // NULL dims are excluded by the drift leg (and ignored by the
      // oracle's count(DISTINCT)) — exclude them here too (round-18 review)
      val raw = raw0.filter(col("event_type").isNotNull)
      val devs = rankDeviations(raw, Seq("event_type"), "value", est, qs)
      val nCells = raw.select("event_type").distinct().count()
      Metric("quantile_rank_slack_ratio", scope,
        if (devs.isEmpty) Double.NaN else devs.map(slackRatio).max, nCells,
        1.0, devs.nonEmpty && devs.forall(_._4) && devs.size.toLong == nCells)
    }
    Seq(
      sideMetric("old_side", ev.filter(col("user_id") < 8),
        estOf("old_value")),
      sideMetric("new_side", ev, estOf("new_value")))
  }

  private def checkQuantileDriftGlobal: Check = (spark, dir) => {
    // the BATCH quantilePath leg's GLOBAL (dims-empty) form (r53 — the
    // round-19 symmetry lift): one row per quantile between the two
    // crawls' one-row global rollups; each side within the X26
    // ±1%-of-rank bound of its own population's exact order statistics
    val got = Queries.all("r53_spec_drift_quantile_global")(spark, dir)
    val ev = events(spark, dir)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90")
    def estOf(valueCol: String): DataFrame =
      got.agg(max(when(col("metric") === "p50", col(valueCol))).as("p50"),
          max(when(col("metric") === "p90", col(valueCol))).as("p90"))
        .withColumn("__g", lit(1))
    def sideMetric(scope: String, raw: DataFrame, est: DataFrame): Metric = {
      val devs = rankDeviations(raw.withColumn("__g", lit(1)), Seq("__g"),
        "value", est, qs)
      Metric("quantile_rank_slack_ratio", scope,
        if (devs.isEmpty) Double.NaN else devs.map(slackRatio).max, 1L,
        1.0, devs.size == 1 && devs.forall(_._4))
    }
    val catNull = got.filter(col("category").isNotNull).count()
    Seq(
      sideMetric("old_side", ev.filter(col("user_id") < 8),
        estOf("old_value")),
      sideMetric("new_side", ev, estOf("new_value")),
      // the global form carries NULL category (the monitors' convention)
      Metric("category_is_null", "__all__", catNull.toDouble, 1L, 0.0,
        got.count() > 0 && catNull == 0))
  }

  private def checkQuantileMonitor: Check = (spark, dir) => {
    // the windowed quantilePath monitor (r48): the NEW side's per-(window,
    // event_type) cell estimates and the OLD side's stored-baseline
    // percentiles each sit within the X26 ±1%-of-rank bound of their own
    // population's exact order statistics
    val got = Queries.all("r48_spec_quantile_monitor")(spark, dir)
    // NULL dims are excluded by the monitor (the null-stratum convention) —
    // exclude them from the raw frames and cell counts too, or a fixture
    // with NULL event_type rows would false-fail the cells==devs pins
    // (round-18 review)
    val ev = events(spark, dir).filter(col("event_type").isNotNull)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90")
    val newEst = got.groupBy(col("window_start"),
        col("category").as("event_type"))
      .agg(max(when(col("metric") === "p50", col("new_value"))).as("p50"),
        max(when(col("metric") === "p90", col("new_value"))).as("p90"))
    val rawW = ev.withColumn("window_start", date_trunc("hour", col("ts")))
    val newDevs = rankDeviations(rawW, Seq("window_start", "event_type"),
      "value", newEst, qs)
    val nNewCells = rawW.select("window_start", "event_type")
      .distinct().count()
    // old estimates are constant per category across windows (max() just
    // picks the one value); a category absent from the baseline slice has
    // NULL old rows, which max() skips and the slice join never sees
    val oldEst = got.groupBy(col("category").as("event_type"))
      .agg(max(when(col("metric") === "p50", col("old_value"))).as("p50"),
        max(when(col("metric") === "p90", col("old_value"))).as("p90"))
    val oldRaw = ev.filter(col("user_id") < 8)
    val oldDevs = rankDeviations(oldRaw, Seq("event_type"), "value",
      oldEst, qs)
    val nOldCells = oldRaw.select("event_type").distinct().count()
    Seq(
      Metric("quantile_rank_slack_ratio", "old_side",
        if (oldDevs.isEmpty) Double.NaN else oldDevs.map(slackRatio).max,
        nOldCells, 1.0,
        oldDevs.nonEmpty && oldDevs.forall(_._4) &&
          oldDevs.size.toLong == nOldCells),
      Metric("quantile_rank_slack_ratio", "new_side",
        if (newDevs.isEmpty) Double.NaN else newDevs.map(slackRatio).max,
        nNewCells, 1.0,
        newDevs.nonEmpty && newDevs.forall(_._4) &&
          newDevs.size.toLong == nNewCells))
  }

  private def checkQuantileMonitorGlobal: Check = (spark, dir) => {
    // the GLOBAL (dims-empty) windowed percentile monitor (r52 — the
    // round-18 VERDICT #5 lift): cells are windows alone, the baseline is
    // the ONE-row global sketch rollup; both sides hold the X26
    // ±1%-of-rank contract against their populations' exact order
    // statistics. The global form has no null-stratum exclusion (there
    // is no stratum), so the raw frames are unfiltered.
    val got = Queries.all("r52_spec_quantile_monitor_global")(spark, dir)
    val ev = events(spark, dir)
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90")
    val newEst = got.groupBy(col("window_start"))
      .agg(max(when(col("metric") === "p50", col("new_value"))).as("p50"),
        max(when(col("metric") === "p90", col("new_value"))).as("p90"))
    val rawW = ev.withColumn("window_start", date_trunc("hour", col("ts")))
    val newDevs = rankDeviations(rawW, Seq("window_start"), "value",
      newEst, qs)
    val nNewCells = rawW.select("window_start").distinct().count()
    // ONE global old cell: attach via a constant key
    val oldEst = got.agg(
        max(when(col("metric") === "p50", col("old_value"))).as("p50"),
        max(when(col("metric") === "p90", col("old_value"))).as("p90"))
      .withColumn("__g", lit(1))
    val oldRaw = ev.filter(col("user_id") < 8).withColumn("__g", lit(1))
    val oldDevs = rankDeviations(oldRaw, Seq("__g"), "value", oldEst, qs)
    Seq(
      Metric("quantile_rank_slack_ratio", "old_side",
        if (oldDevs.isEmpty) Double.NaN else oldDevs.map(slackRatio).max,
        1L, 1.0, oldDevs.size == 1 && oldDevs.forall(_._4)),
      Metric("quantile_rank_slack_ratio", "new_side",
        if (newDevs.isEmpty) Double.NaN else newDevs.map(slackRatio).max,
        nNewCells, 1.0,
        newDevs.nonEmpty && newDevs.forall(_._4) &&
          newDevs.size.toLong == nNewCells))
  }

  private def checkKnnIndexStored: Check = (spark, dir) => {
    // the r44 stored-IVF contract: (1) the search against the STORED index
    // reproduces the rebuilt train-per-call path EXACTLY (every index
    // ingredient is deterministic — k-means sampling/seeding, cell
    // assignment, the heap tie-break), rank-for-rank; (2) recall@10 vs the
    // exact sibling holds the 0.85 x3 bound. n_ref is the exact sibling's
    // cardinality, recomputed independently by DuckDB.
    def ranked(df: DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val stored = ranked(Queries.all("r44_spec_knn_ivf_stored")(spark, dir))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val rebuilt = ranked(graft.operators.Similarity.ivfTopK(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
      nCells = Queries.ivfCellsFor(spark, dir), nProbe = 0, nAssign = 2))
    val exact = Queries.all("x3_knn_exact")(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val storedPairs = stored.map(t => (t._1, t._3))
    val agree =
      if (rebuilt.isEmpty) 0.0
      else stored.intersect(rebuilt).size.toDouble / stored.union(rebuilt).size
    val recall =
      if (exact.isEmpty) 0.0
      else storedPairs.intersect(exact).size.toDouble / exact.size
    Seq(
      Metric("stored_equals_rebuilt", "__all__", agree, exact.size.toLong,
        1.0, stored.nonEmpty && stored == rebuilt),
      Metric("recall_at_10_vs_exact", "__all__", recall, exact.size.toLong,
        0.85, recall >= 0.85))
  }

  private def ranked3(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def checkKnnLshStored: Check = (spark, dir) => {
    // the r47 stored-LSH contract, mirroring r44's ivf row: (1) the search
    // against the STORED index reproduces the hash-per-call path EXACTLY
    // (hyperplanes are seed-pinned and data-independent); (2) recall@10 vs
    // the exact sibling holds the 0.85 x3 bound; (3) the same exactness
    // survives INCREMENTAL maintenance — build-half + append-half ==
    // the full-corpus direct path (the r47 append contract's lsh member;
    // quantized's is the r47_spec_knn_append hash oracle, ivf's the
    // r47_spec_knn_ivf_append row).
    val stored = ranked3(Queries.all("r47_spec_knn_lsh_stored")(spark, dir))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = e.filter(col("vec_id") < 5)
    val rebuilt = ranked3(graft.operators.Similarity.lshTopK(
      e, q, "vec_id", "embedding", 10, dim = 64,
      nTables = 16, planesPerTable = 4))
    val exact = Queries.all("x3_knn_exact")(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree =
      if (rebuilt.isEmpty) 0.0
      else stored.intersect(rebuilt).size.toDouble / stored.union(rebuilt).size
    val storedPairs = stored.map(t => (t._1, t._3))
    val recall =
      if (exact.isEmpty) 0.0
      else storedPairs.intersect(exact).size.toDouble / exact.size
    val cut = (e.agg(max(col("vec_id"))).head.getLong(0) + 1L) / 2L
    val base = s"${Queries.artifactBase(dir)}/lsh_append_check"
    graft.operators.Similarity.buildIndex(e.filter(col("vec_id") < cut),
      "vec_id", "embedding", "lsh", base,
      nTables = 16, planesPerTable = 4, dim = 64)
    graft.operators.Similarity.appendIndex(e.filter(col("vec_id") >= cut),
      "vec_id", "embedding", base)
    val appended = ranked3(graft.operators.Similarity.indexedTopK(
      q, "vec_id", "embedding", 10, base))
    val aAgree =
      if (rebuilt.isEmpty) 0.0
      else appended.intersect(rebuilt).size.toDouble /
        appended.union(rebuilt).size
    Seq(
      Metric("stored_equals_rebuilt", "__all__", agree, exact.size.toLong,
        1.0, stored.nonEmpty && stored == rebuilt),
      Metric("recall_at_10_vs_exact", "__all__", recall, exact.size.toLong,
        0.85, recall >= 0.85),
      Metric("appended_equals_rebuilt", "__all__", aAgree, exact.size.toLong,
        1.0, appended.nonEmpty && appended == rebuilt))
  }

  private def checkKnnIvfAppend: Check = (spark, dir) => {
    // the r47 ivf append contract: the appended index keeps the ORIGINAL
    // half-corpus centroids (no retraining — the artifact's whole point),
    // so (1) at the default probe fraction recall@10 vs exact must still
    // hold the 0.85 contract (partial-probe recall is the one quantity
    // centroid quality can move), and (2) probing ALL cells must recover
    // the exact neighbor set EXACTLY (assignment covers every appended
    // row; a lost row would surface here regardless of centroid quality).
    val got = Queries.all("r47_spec_knn_ivf_append")(spark, dir)
    val gotPairs = got.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDf = Queries.all("x3_knn_exact")(spark, dir)
    val exact = exactDf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall =
      if (exact.isEmpty) 0.0
      else gotPairs.intersect(exact).size.toDouble / exact.size
    val base = s"${Queries.artifactBase(dir)}/knn_ivf_app"
    val meta = graft.operators.Similarity.readIndexMeta(spark, base)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val probedAll = ranked3(graft.operators.Similarity.indexedTopK(
      e.filter(col("vec_id") < 5), "vec_id", "embedding", 10, base,
      nProbe = meta.n_cells.get))
    val exactRanked = ranked3(exactDf)
    val fullAgree =
      if (exactRanked.isEmpty) 0.0
      else probedAll.intersect(exactRanked).size.toDouble /
        probedAll.union(exactRanked).size
    Seq(
      Metric("recall_at_10_vs_exact", "ivf_appended", recall,
        exact.size.toLong, 0.85, recall >= 0.85),
      Metric("probed_all_equals_exact", "__all__", fullAgree,
        exact.size.toLong, 1.0,
        probedAll.nonEmpty && probedAll == exactRanked))
  }

  private def checkKnnIvfDelete: Check = (spark, dir) => {
    // the r51 ivf deletion contract: the tombstoned index keeps its
    // trained centroids (nothing is retrained or rewritten), so (1)
    // recall@10 vs the exact-MINUS-DELETED oracle holds the 0.85 bound at
    // the default probe fraction, (2) NO deleted id ever surfaces — the
    // hard correctness half: a ghost neighbor is a takedown violation,
    // not a recall miss — and (3) probing ALL cells recovers the
    // exact-minus-deleted set EXACTLY (the anti-join loses nothing else).
    val gotRanked = ranked3(Queries.all("r51_spec_knn_ivf_delete")(spark, dir))
    val gotPairs = gotRanked.map(t => (t._1, t._3))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = e.filter(col("vec_id") < 5)
    val exactRanked = ranked3(graft.operators.Similarity.bruteForceTopK(
      e.filter(col("vec_id") % 10 =!= 7), q, "vec_id", "embedding", 10))
    val exact = exactRanked.map(t => (t._1, t._3))
    val recall =
      if (exact.isEmpty) 0.0
      else gotPairs.intersect(exact).size.toDouble / exact.size
    val ghosts = gotPairs.count(_._2 % 10 == 7)
    val base = s"${Queries.artifactBase(dir)}/knn_del_ivf"
    val meta = graft.operators.Similarity.readIndexMeta(spark, base)
    val probedAll = ranked3(graft.operators.Similarity.indexedTopK(
      q, "vec_id", "embedding", 10, base, nProbe = meta.n_cells.get))
    val fullAgree =
      if (exactRanked.isEmpty) 0.0
      else probedAll.intersect(exactRanked).size.toDouble /
        probedAll.union(exactRanked).size
    Seq(
      Metric("recall_at_10_vs_exact", "ivf_deleted", recall,
        exact.size.toLong, 0.85, recall >= 0.85),
      Metric("no_deleted_neighbors", "__all__", ghosts.toDouble,
        exact.size.toLong, 0.0, gotRanked.nonEmpty && ghosts == 0),
      Metric("probed_all_equals_exact", "__all__", fullAgree,
        exact.size.toLong, 1.0,
        probedAll.nonEmpty && probedAll == exactRanked))
  }

  private def checkKnnFiltered: Check = (spark, dir) => {
    // the r52 filtered-ivf contract: candidateFilter runs INSIDE the
    // candidate stage with nProbe widened by 1/selectivity, so (1) every
    // query still returns a FULL k (the k contract — the whole point of
    // filtering inside rather than post-filtering the results), (2) no
    // filtered-out neighbor leaks, (3) recall@10 vs the FILTERED-corpus
    // exact oracle holds the 0.85 bound, and (4) probing all cells
    // recovers the filtered exact set exactly.
    val got = Queries.all("r52_spec_knn_filtered_ivf")(spark, dir)
    val gotRanked = ranked3(got)
    val gotPairs = gotRanked.map(t => (t._1, t._3))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val q = e.filter(col("vec_id") < 5)
    val exactRanked = ranked3(graft.operators.Similarity.bruteForceTopK(
      e.filter(col("label") < 4), q, "vec_id", "embedding", 10))
    val exact = exactRanked.map(t => (t._1, t._3))
    val recall =
      if (exact.isEmpty) 0.0
      else gotPairs.intersect(exact).size.toDouble / exact.size
    val allowed = e.filter(col("label") < 4).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val leaks = gotPairs.count { case (_, n) => !allowed.contains(n) }
    val perQueryFullK = gotRanked.groupBy(_._1).forall(_._2.size == 10)
    val base = s"${Queries.artifactBase(dir)}/knn_attr_ivf"
    val meta = graft.operators.Similarity.readIndexMeta(spark, base)
    val probedAll = ranked3(graft.operators.Similarity.indexedTopK(
      q, "vec_id", "embedding", 10, base, nProbe = meta.n_cells.get,
      candidateFilter = Some("label < 4")))
    val fullAgree =
      if (exactRanked.isEmpty) 0.0
      else probedAll.intersect(exactRanked).size.toDouble /
        probedAll.union(exactRanked).size
    Seq(
      Metric("recall_at_10_vs_exact", "ivf_filtered", recall,
        exact.size.toLong, 0.85, recall >= 0.85),
      Metric("k_contract_full_results", "__all__",
        if (perQueryFullK) 1.0 else 0.0, exact.size.toLong, 1.0,
        gotRanked.nonEmpty && perQueryFullK),
      Metric("no_filtered_out_neighbors", "__all__", leaks.toDouble,
        exact.size.toLong, 0.0, gotRanked.nonEmpty && leaks == 0),
      Metric("probed_all_equals_exact", "__all__", fullAgree,
        exact.size.toLong, 1.0,
        probedAll.nonEmpty && probedAll == exactRanked))
  }

  private def checkKnnFilteredLsh: Check = (spark, dir) => {
    // the filtered-search family's lsh member (r53): lsh has no
    // query-time widening dial, so the contract is STRUCTURAL instead of
    // a recall bound — hyperplanes are data-independent, so the filtered
    // STORED route must equal lshTopK over the FILTERED corpus
    // bit-exactly (same buckets, same heap tie-break), and no
    // filtered-out neighbor may leak. Recall vs the filtered exact oracle
    // is thereby exactly the plain-lsh recall ON that sub-corpus — the
    // documented bucket-thinning trade, not an extra loss.
    val gotRanked = ranked3(Queries.all("r53_spec_knn_filtered_lsh")(spark, dir))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val q = e.filter(col("vec_id") < 5)
    val rebuilt = ranked3(graft.operators.Similarity.lshTopK(
      e.filter(col("label") < 4), q, "vec_id", "embedding", 10, dim = 64,
      nTables = 16, planesPerTable = 4))
    val agree =
      if (rebuilt.isEmpty) 0.0
      else gotRanked.intersect(rebuilt).size.toDouble /
        gotRanked.union(rebuilt).size
    val allowed = e.filter(col("label") < 4).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val leaks = gotRanked.count { case (_, _, n) => !allowed.contains(n) }
    // n_ref is the filtered EXACT top-k cardinality (the r52 oracle's
    // count — SQL-recomputable), not the lsh result count (bucket misses
    // make that data-dependent in a way DuckDB cannot mirror)
    val exactN = ranked3(graft.operators.Similarity.bruteForceTopK(
      e.filter(col("label") < 4), q, "vec_id", "embedding", 10)).size.toLong
    Seq(
      Metric("filtered_stored_equals_filtered_rebuilt", "__all__", agree,
        exactN, 1.0, gotRanked.nonEmpty && gotRanked == rebuilt),
      Metric("no_filtered_out_neighbors", "__all__", leaks.toDouble,
        exactN, 0.0, gotRanked.nonEmpty && leaks == 0))
  }

  // ------------------------------------------------- packing / fingerprint

  private def packMetrics(queryName: String): Check = (spark, dir) => {
    val pk = Queries.all(queryName)(spark, dir)
      .select("doc_id", "chunk_id", "n_chunk_tokens", "pack_id", "pack_slot")
    val nChunks = Queries.all("x5_chunks")(spark, dir).count()
    val assigned = pk.count()
    val distinctAssigned = pk.select("doc_id", "chunk_id").distinct().count()
    val perPack = pk.groupBy("pack_id").agg(
      sum(col("n_chunk_tokens")).cast("long").as("toks"),
      count(lit(1)).as("n"),
      min(col("pack_slot")).cast("long").as("lo"),
      max(col("pack_slot")).cast("long").as("hi"))
      .collect()
    val budget = 256.0
    val overBudgetMulti = perPack.count(r =>
      r.getAs[Long]("toks") > budget && r.getAs[Long]("n") > 1)
    val contiguous = perPack.count(r =>
      r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    val maxN = if (perPack.isEmpty) 0L else perPack.map(_.getAs[Long]("n")).max
    Seq(
      Metric("chunks_packed_exactly_once", "__all__",
        if (nChunks == 0) 0.0 else distinctAssigned.toDouble / nChunks, nChunks,
        1.0, assigned == nChunks && distinctAssigned == nChunks && nChunks > 0),
      Metric("packs_within_budget", "__all__",
        if (perPack.isEmpty) 0.0 else perPack.map(_.getAs[Long]("toks")).max.toDouble,
        nChunks, budget, perPack.nonEmpty && overBudgetMulti == 0),
      Metric("slots_contiguous", "__all__",
        if (perPack.isEmpty) 0.0 else contiguous.toDouble / perPack.length,
        nChunks, 1.0, perPack.nonEmpty && contiguous == perPack.length),
      Metric("multi_chunk_packs_exist", "__all__", maxN.toDouble, nChunks,
        2.0, maxN >= 2L))
  }

  private def checkFingerprint: Check = (spark, dir) => {
    val f = Queries.all("x5_fingerprint")(spark, dir)
    val nDocs = f.count()
    val nulls = f.filter(col("fingerprint").isNull).count()
    val joined = documents(spark, dir).select(col("doc_id"), col("text"))
      .join(f, "doc_id")
    val agg = joined.agg(
      countDistinct(col("text")).as("nTexts"),
      countDistinct(col("text"), col("fingerprint")).as("nTextFp"),
      countDistinct(col("fingerprint")).as("nFps")).head
    val (nTexts, nTextFp, nFps) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    // nTextFp > nTexts would mean one text got two fingerprints (broken
    // determinism); nFps < nTexts means distinct texts collided
    val collisionRate =
      if (nTexts == 0) 1.0 else (nTexts - nFps).toDouble / nTexts
    Seq(
      Metric("fingerprint_non_null", "__all__", nulls.toDouble, nDocs, 0.0,
        nDocs > 0 && nulls == 0),
      Metric("distinct_text_collision_rate", "__all__", collisionRate, nTexts,
        0.01, nTextFp == nTexts && collisionRate <= 0.01))
  }

  // ---------------------------------------------------------------- registry

  /** Every no-oracle query name → its accuracy check. Names must be keys of
    * [[Queries.all]]; [[Verify]] substitutes the summary for the raw dump.
    */
  val checks: Map[String, Check] = Map(
    "x6_approx_distinct" -> checkApproxDistinct,
    "x6_sketch_rollup" -> checkSketchRollup,
    "r30_spec_distinct" -> checkSpecDistinct,
    "r32_spec_window_distinct" -> checkWindowDistinct,
    "r32_spec_window_quantile" -> checkWindowQuantile,
    "r34_spec_sliding_distinct" -> checkSlidingDistinct,
    "r34_spec_session_quantile" -> checkSessionQuantile,
    "r43_spec_drift_sketch" -> checkSketchDrift,
    "x6_quantile_rollup" -> checkQuantileRollup,
    "r29_spec_quantiles" -> checkSpecQuantiles,
    "x6_quantile_merge" -> checkQuantileMerge,
    "x2_minhash_lsh" -> checkMinhashLsh,
    "x2_simhash" -> checkSimhash,
    "x2_embed_dup" -> checkEmbedDup,
    "x2_dedup_collapse_lsh" -> checkCollapseLsh,
    "x3_ann_ivf" -> annRecall("x3_ann_ivf"),
    "x3_ann_lsh" -> annRecall("x3_ann_lsh"),
    "r44_spec_knn_ivf_stored" -> checkKnnIndexStored,
    "r47_spec_knn_lsh_stored" -> checkKnnLshStored,
    "r47_spec_knn_ivf_append" -> checkKnnIvfAppend,
    "r51_spec_knn_ivf_delete" -> checkKnnIvfDelete,
    "r52_spec_knn_filtered_ivf" -> checkKnnFiltered,
    "r53_spec_knn_filtered_lsh" -> checkKnnFilteredLsh,
    "r45_spec_drift_quantile" -> checkQuantileDrift,
    "r53_spec_drift_quantile_global" -> checkQuantileDriftGlobal,
    "r48_spec_quantile_monitor" -> checkQuantileMonitor,
    "r52_spec_quantile_monitor_global" -> checkQuantileMonitorGlobal,
    "x5_pack" -> packMetrics("x5_pack"),
    "r31_spec_pack" -> packMetrics("r31_spec_pack"),
    "x5_fingerprint" -> checkFingerprint)

  // ---------------------------------------------------------------- oracles

  private def countOf(sql: String): String =
    s"(SELECT count(*) FROM (${sql}) __t)"

  private val hllByTypeSql =
    """SELECT 'hll_rel_err' AS metric, event_type AS scope,
      |       count(DISTINCT user_id) AS n_ref,
      |       CAST(0.05 AS DOUBLE) AS bound, true AS pass
      |FROM events GROUP BY event_type""".stripMargin

  private val quantileByTypeSql =
    """SELECT 'quantile_rank_err_positions' AS metric, event_type AS scope,
      |       count(value) AS n_ref,
      |       CAST(greatest(1.5, 0.01 * count(value)) AS DOUBLE) AS bound,
      |       true AS pass
      |FROM events GROUP BY event_type""".stripMargin

  private val windowCellsSql =
    """(SELECT count(*) FROM (SELECT DISTINCT
      |  date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
      |  FROM events) __c)""".stripMargin

  /** DuckDB oracles for the accuracy rows: `pass` is the literal `true`
    * the measured flag must equal; `n_ref` is genuinely recomputed (exact
    * sibling cardinalities via the existing exact-query SQL, exact distinct
    * counts, cell counts).
    */
  lazy val oracles: Map[String, String] = Map(
    "x6_approx_distinct" -> hllByTypeSql,
    "r30_spec_distinct" -> hllByTypeSql,
    "x6_sketch_rollup" ->
      (hllByTypeSql +
        """
          |UNION ALL
          |SELECT 'hll_rel_err', '__all__', count(DISTINCT user_id),
          |       CAST(0.05 AS DOUBLE), true
          |FROM events""".stripMargin),
    "r32_spec_window_distinct" ->
      s"""SELECT 'hll_cells_within_bound' AS metric, '__all__' AS scope,
         |       $windowCellsSql AS n_ref,
         |       CAST(0.05 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    // sketchPath drift cells: one per distinct event_type present on
    // either side — the old side is the user_id<8 slice, a subset, so the
    // union of sides is every event_type in the table
    "r43_spec_drift_sketch" ->
      """SELECT 'hll_cells_within_bound' AS metric, '__all__' AS scope,
        |  (SELECT count(DISTINCT event_type) FROM events) AS n_ref,
        |  CAST(0.05 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    "r32_spec_window_quantile" ->
      s"""SELECT 'quantile_rank_slack_ratio' AS metric, '__all__' AS scope,
         |       $windowCellsSql AS n_ref,
         |       CAST(1.0 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    // sliding cells: each event's 4 epoch-anchored window starts (the same
    // expansion as the r33_spec_sliding_heavy oracle), distinct with dims
    "r34_spec_sliding_distinct" ->
      """SELECT 'hll_cells_within_bound' AS metric, '__all__' AS scope,
        |  (SELECT count(*) FROM (
        |    SELECT DISTINCT
        |      time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |        - INTERVAL (s.i * 15) MINUTE, event_type
        |    FROM events, (SELECT unnest([0, 1, 2, 3]) AS i) s) __c) AS n_ref,
        |  CAST(0.05 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    // session cells: the same lag/sum gap-break walk as the r33 session
    // oracle, counted per (user, session)
    "r34_spec_session_quantile" ->
      """SELECT 'quantile_rank_slack_ratio' AS metric, '__all__' AS scope,
        |  (SELECT count(*) FROM (
        |    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t
        |               FROM events WHERE user_id IS NOT NULL),
        |    m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |                 OR t - lag(t) OVER w >= INTERVAL '5 minutes'
        |               THEN 1 ELSE 0 END AS brk
        |          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |    s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id
        |            ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |    SELECT DISTINCT user_id, sid FROM s) __c) AS n_ref,
        |  CAST(1.0 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    "x6_quantile_rollup" ->
      (quantileByTypeSql +
        """
          |UNION ALL
          |SELECT 'quantile_rank_err_positions', '__all__', count(value),
          |       CAST(greatest(1.5, 0.01 * count(value)) AS DOUBLE), true
          |FROM events""".stripMargin),
    "r29_spec_quantiles" -> quantileByTypeSql,
    "x6_quantile_merge" ->
      """SELECT 'quantile_rank_err_positions' AS metric, p.scope AS scope,
        |       (SELECT count(l_extendedprice) FROM lineitem) AS n_ref,
        |       CAST(greatest(1.5,
        |         0.01 * (SELECT count(l_extendedprice) FROM lineitem))
        |         AS DOUBLE) AS bound,
        |       true AS pass
        |FROM (SELECT unnest(['direct', 'two_level']) AS scope) p""".stripMargin,
    "x2_minhash_lsh" ->
      s"""SELECT 'high_jaccard_pair_recall' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x2_jaccard_pairs")
                .replace("jaccard >= 0.8", "jaccard >= 0.9"))} AS n_ref,
         |  CAST(1.0 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    "x2_simhash" ->
      s"""SELECT 'emitted_hamming_le_max' AS metric, '__all__' AS scope,
         |  (SELECT count(*) FROM documents) AS n_ref,
         |  CAST(3.0 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'precision_vs_exact_jaccard', '__all__',
         |  ${countOf(Queries.oracles("x2_jaccard_pairs"))},
         |  CAST(0.8 AS DOUBLE), true""".stripMargin,
    "x2_embed_dup" ->
      s"""SELECT 'pair_precision_vs_exact' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x3_cosine_pairs_exact"))} AS n_ref,
         |  CAST(1.0 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'pair_recall_vs_exact', '__all__',
         |  ${countOf(Queries.oracles("x3_cosine_pairs_exact"))},
         |  CAST(0.9 AS DOUBLE), true""".stripMargin,
    "x2_dedup_collapse_lsh" ->
      s"""SELECT 'survivor_agreement_vs_exact' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x2_dedup_collapse"))} AS n_ref,
         |  CAST(0.98 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    "x3_ann_ivf" ->
      s"""SELECT 'recall_at_10_vs_exact' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x3_knn_exact"))} AS n_ref,
         |  CAST(0.85 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    "x3_ann_lsh" ->
      s"""SELECT 'recall_at_10_vs_exact' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x3_knn_exact"))} AS n_ref,
         |  CAST(0.85 AS DOUBLE) AS bound, true AS pass""".stripMargin,
    // quantilePath drift sides: n_ref is each side's exact distinct cell
    // count (old side = the user_id<8 slice standing in for crawl N)
    "r45_spec_drift_quantile" ->
      """SELECT 'quantile_rank_slack_ratio' AS metric, 'old_side' AS scope,
        |  (SELECT count(DISTINCT event_type) FROM events
        |   WHERE user_id < 8) AS n_ref,
        |  CAST(1.0 AS DOUBLE) AS bound, true AS pass
        |UNION ALL
        |SELECT 'quantile_rank_slack_ratio', 'new_side',
        |  (SELECT count(DISTINCT event_type) FROM events),
        |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    // windowed quantilePath monitor cells: old side = the slice's distinct
    // categories, new side = distinct (hour, event_type) window cells
    "r48_spec_quantile_monitor" ->
      """SELECT 'quantile_rank_slack_ratio' AS metric, 'old_side' AS scope,
        |  (SELECT count(DISTINCT event_type) FROM events
        |   WHERE user_id < 8) AS n_ref,
        |  CAST(1.0 AS DOUBLE) AS bound, true AS pass
        |UNION ALL
        |SELECT 'quantile_rank_slack_ratio', 'new_side',
        |  (SELECT count(*) FROM (SELECT DISTINCT
        |     date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
        |     FROM events WHERE event_type IS NOT NULL) __c),
        |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    // the GLOBAL batch percentile drift: exactly one cell per side, plus
    // the NULL-category convention pin
    "r53_spec_drift_quantile_global" ->
      """SELECT 'quantile_rank_slack_ratio' AS metric, 'old_side' AS scope,
        |  1 AS n_ref, CAST(1.0 AS DOUBLE) AS bound, true AS pass
        |UNION ALL
        |SELECT 'quantile_rank_slack_ratio', 'new_side',
        |  1, CAST(1.0 AS DOUBLE), true
        |UNION ALL
        |SELECT 'category_is_null', '__all__',
        |  1, CAST(0.0 AS DOUBLE), true""".stripMargin,
    // the GLOBAL windowed percentile monitor: one old-side cell (the
    // whole baseline slice), one new-side cell per distinct event hour
    "r52_spec_quantile_monitor_global" ->
      """SELECT 'quantile_rank_slack_ratio' AS metric, 'old_side' AS scope,
        |  1 AS n_ref, CAST(1.0 AS DOUBLE) AS bound, true AS pass
        |UNION ALL
        |SELECT 'quantile_rank_slack_ratio', 'new_side',
        |  (SELECT count(DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |   FROM events),
        |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    "r44_spec_knn_ivf_stored" ->
      s"""SELECT 'stored_equals_rebuilt' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x3_knn_exact"))} AS n_ref,
         |  CAST(1.0 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'recall_at_10_vs_exact', '__all__',
         |  ${countOf(Queries.oracles("x3_knn_exact"))},
         |  CAST(0.85 AS DOUBLE), true""".stripMargin,
    "r47_spec_knn_lsh_stored" ->
      s"""SELECT 'stored_equals_rebuilt' AS metric, '__all__' AS scope,
         |  ${countOf(Queries.oracles("x3_knn_exact"))} AS n_ref,
         |  CAST(1.0 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'recall_at_10_vs_exact', '__all__',
         |  ${countOf(Queries.oracles("x3_knn_exact"))},
         |  CAST(0.85 AS DOUBLE), true
         |UNION ALL
         |SELECT 'appended_equals_rebuilt', '__all__',
         |  ${countOf(Queries.oracles("x3_knn_exact"))},
         |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    "r47_spec_knn_ivf_append" ->
      s"""SELECT 'recall_at_10_vs_exact' AS metric, 'ivf_appended' AS scope,
         |  ${countOf(Queries.oracles("x3_knn_exact"))} AS n_ref,
         |  CAST(0.85 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'probed_all_equals_exact', '__all__',
         |  ${countOf(Queries.oracles("x3_knn_exact"))},
         |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    "r51_spec_knn_ivf_delete" ->
      s"""SELECT 'recall_at_10_vs_exact' AS metric, 'ivf_deleted' AS scope,
         |  ${countOf(Queries.oracles("r51_spec_knn_delete"))} AS n_ref,
         |  CAST(0.85 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'no_deleted_neighbors', '__all__',
         |  ${countOf(Queries.oracles("r51_spec_knn_delete"))},
         |  CAST(0.0 AS DOUBLE), true
         |UNION ALL
         |SELECT 'probed_all_equals_exact', '__all__',
         |  ${countOf(Queries.oracles("r51_spec_knn_delete"))},
         |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    "r52_spec_knn_filtered_ivf" ->
      s"""SELECT 'recall_at_10_vs_exact' AS metric, 'ivf_filtered' AS scope,
         |  ${countOf(Queries.oracles("r52_spec_knn_filtered"))} AS n_ref,
         |  CAST(0.85 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'k_contract_full_results', '__all__',
         |  ${countOf(Queries.oracles("r52_spec_knn_filtered"))},
         |  CAST(1.0 AS DOUBLE), true
         |UNION ALL
         |SELECT 'no_filtered_out_neighbors', '__all__',
         |  ${countOf(Queries.oracles("r52_spec_knn_filtered"))},
         |  CAST(0.0 AS DOUBLE), true
         |UNION ALL
         |SELECT 'probed_all_equals_exact', '__all__',
         |  ${countOf(Queries.oracles("r52_spec_knn_filtered"))},
         |  CAST(1.0 AS DOUBLE), true""".stripMargin,
    "r53_spec_knn_filtered_lsh" ->
      s"""SELECT 'filtered_stored_equals_filtered_rebuilt' AS metric,
         |  '__all__' AS scope,
         |  ${countOf(Queries.oracles("r52_spec_knn_filtered"))} AS n_ref,
         |  CAST(1.0 AS DOUBLE) AS bound, true AS pass
         |UNION ALL
         |SELECT 'no_filtered_out_neighbors', '__all__',
         |  ${countOf(Queries.oracles("r52_spec_knn_filtered"))},
         |  CAST(0.0 AS DOUBLE), true""".stripMargin,
    "x5_pack" -> packOracle,
    "r31_spec_pack" -> packOracle,
    "x5_fingerprint" ->
      """SELECT 'fingerprint_non_null' AS metric, '__all__' AS scope,
        |       count(*) AS n_ref, CAST(0.0 AS DOUBLE) AS bound, true AS pass
        |FROM documents
        |UNION ALL
        |SELECT 'distinct_text_collision_rate', '__all__',
        |       count(DISTINCT text), CAST(0.01 AS DOUBLE), true
        |FROM documents""".stripMargin)

  private lazy val packOracle: String =
    s"""SELECT m.metric AS metric, '__all__' AS scope,
       |  ${countOf(Queries.oracles("x5_chunks"))} AS n_ref,
       |  CAST(m.bound AS DOUBLE) AS bound, true AS pass
       |FROM (SELECT unnest(['chunks_packed_exactly_once',
       |               'packs_within_budget', 'slots_contiguous',
       |               'multi_chunk_packs_exist']) AS metric,
       |             unnest([1.0, 256.0, 1.0, 2.0]) AS bound) m""".stripMargin
}
