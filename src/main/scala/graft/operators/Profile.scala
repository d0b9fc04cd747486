package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: per-column non-null and distinct counts in ONE pass —
  * the data-quality summary a pipeline runs before/after every ingest or
  * transform stage (null-rate regressions and key-cardinality drift are the
  * two cheapest early warnings a corpus pipeline has).
  *
  * All columns aggregate in a single `agg` call: Catalyst plans the multiple
  * DISTINCT aggregates as one Expand (×columns row multiplication) over a
  * single scan — at 100 TB, one pass with a k× expand beats k passes, and
  * the aggregation itself is partial (map-side combined) per expanded
  * group. For profile-only-roughly needs, `approxDistinct = true` swaps
  * count_distinct for HLL approx_count_distinct, which removes the Expand
  * entirely (all sketches ride one ObjectHashAggregate).
  */
object Profile {

  /** Long-form profile: one row per column — (col_name, n_non_null,
    * n_distinct). Deterministic (exact counts) unless `approxDistinct`.
    */
  def columnStats(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    require(cols.distinct == cols,
      s"columnStats column list has duplicates: ${cols.diff(cols.distinct).distinct}")
    val aggs = cols.flatMap { c =>
      val nd = if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__nn_$c").as("n_non_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** Exact heavy hitters over a high-cardinality string column: every item
    * occurring in at least `minFraction` of the non-null rows, with its
    * exact count — result identical to
    * `groupBy(item).count().filter(cnt >= ceil(f*n))`, but never paying that
    * query's exchange. Two passes:
    *
    *  1. ONE global Misra–Gries aggregate ([[graft.functions.FreqSketch]],
    *     k = ceil(slack/minFraction) counters) + the row count in the same
    *     agg — map-side state and shuffle are < 2k rows per partition (the
    *     sketch's compaction trigger — see FreqSketch), vs the plain
    *     groupBy's one-row-per-DISTINCT-item exchange (a mostly unique key
    *     space compresses 0% map-side at 100 TB).
    *  2. Exact recount of the ≤ k candidates only: broadcast hash join
    *     (candidate list is tiny by construction) + partial-aggregated
    *     count, threshold filter on `ceil(minFraction · n)`.
    *
    * Exactness: MG guarantees every item with count > n/(k+1) survives the
    * sketch; `slack >= 2` makes n/(k+1) < minFraction·n/2, so the candidate
    * set is a superset of the true hitters and the recount+filter returns
    * exactly them. Columns: (item, cnt).
    */
  def heavyHitters(df: DataFrame, itemCol: String, minFraction: Double,
      slack: Int = 2): DataFrame = {
    val k = sketchSize(minFraction, slack)
    val sk = df.agg(
      graft.functions.FreqSketch.mgCandidates(col(itemCol), k).as("__cands"),
      count(col(itemCol)).as("__n"))
    recount(df.select(col(itemCol).as("__item")), sk, minFraction)
  }

  /** [[heavyHitters]] over an array-of-strings column (one array per row,
    * e.g. per-document token lists): identical result to exploding first,
    * but the sketch pass pays its per-row aggregation cost once per ARRAY
    * instead of once per item — on document-shaped corpora that is the
    * difference between the sketch being ~4× slower than the naive groupBy
    * it exists to replace and ~an order of magnitude cheaper (the recount
    * pass still explodes, but only into a broadcast-pruned count).
    */
  def heavyHittersFromArrays(df: DataFrame, arrayCol: String, minFraction: Double,
      slack: Int = 2): DataFrame = {
    val k = sketchSize(minFraction, slack)
    // n = non-null items across arrays — exactly what the sketch ingests
    val nItems = sum(when(col(arrayCol).isNull, 0)
      .otherwise(size(filter(col(arrayCol), _.isNotNull)))).cast("long")
    val sk = df.agg(
      graft.functions.FreqSketch.mgCandidatesArr(col(arrayCol), k).as("__cands"),
      coalesce(nItems, lit(0L)).as("__n"))
    recount(df.select(explode(col(arrayCol)).as("__item")), sk, minFraction)
  }

  /** Pre-aggregated distinct-count sketch table (the OLAP cube pattern for
    * 100 TB): ONE pass over the raw data builds a DataSketches HLL sketch
    * per dimension cell; every later "distinct items across slice X" query
    * unions the stored sketches ([[rollupDistinct]]) instead of rescanning
    * raw data — sketches are mergeable, so any dimension subset rolls up
    * correctly. Store the result (e.g. partitioned by a date dim) and the
    * raw scan never repeats.
    */
  def distinctSketches(df: DataFrame, dims: Seq[String], itemCol: String): DataFrame = {
    require(dims.nonEmpty, "distinctSketches needs at least one dimension")
    df.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(itemCol)).as("sketch"),
        count(col(itemCol)).as("n_rows"))
  }

  /** Roll a sketch table up to a dimension subset (empty = global): unions
    * the per-cell sketches and estimates — never touches raw data. Error is
    * the HLL bound (~1.6% at the default lgConfigK=12), pinned ±5% in tests.
    */
  def rollupDistinct(sketches: DataFrame, keepDims: Seq[String]): DataFrame =
    if (keepDims.isEmpty)
      sketches.agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_distinct"),
        sum(col("n_rows")).as("n_rows"))
    else
      sketches.groupBy(keepDims.map(col): _*)
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_distinct"),
          sum(col("n_rows")).as("n_rows"))

  /** Per-cell mergeable QUANTILE sketch table — the percentile analogue of
    * [[distinctSketches]]: one raw scan builds a storable
    * (dims..., qsketch, n_rows) table; any dimension-subset percentile
    * question is then answered from the stored sketches
    * ([[rollupQuantiles]]) without touching raw data again. Spark ships
    * this pattern for distinct counts (`hll_sketch_agg`) but its own
    * `percentile_approx` summary never materializes as a column — at
    * 100 TB that difference is one scan vs one scan PER slice question.
    */
  def quantileSketches(df: DataFrame, dims: Seq[String], valueCol: String,
      maxCentroids: Int = 256): DataFrame = {
    // dims may be empty: the GLOBAL one-row sketch table (the baseline of
    // the global windowed percentile monitor)
    df.groupBy(dims.map(col): _*)
      .agg(graft.functions.QuantileSketch.sketch(
          col(valueCol).cast("double"), maxCentroids).as("qsketch"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Roll a quantile-sketch table up to a dimension subset (empty = global)
    * and estimate the requested quantiles — never touches raw data. One
    * output column per quantile, named p50/p90/p99-style from the fraction.
    * Rank resolution is ~1/maxCentroids per sketch plus one compression of
    * smearing for the merge (±1% of rank at the default 256, pinned in
    * tests against exact percentiles).
    */
  def rollupQuantiles(sketches: DataFrame, keepDims: Seq[String],
      quantiles: Seq[Double], maxCentroids: Int = 256): DataFrame = {
    require(quantiles.nonEmpty, "rollupQuantiles needs at least one quantile")
    val est = graft.functions.QuantileSketch.mergeEstimate(
      col("qsketch"), quantiles, maxCentroids).as("__est")
    val agged =
      if (keepDims.isEmpty) sketches.agg(est, sum(col("n_rows")).as("n_rows"))
      else sketches.groupBy(keepDims.map(col): _*)
        .agg(est, sum(col("n_rows")).as("n_rows"))
    val qCols = quantiles.zipWithIndex.map { case (q, i) =>
      col("__est").getItem(i).as(graft.functions.QuantileSketch.colName(q))
    }
    agged.select(keepDims.map(col) ++ qCols :+ col("n_rows"): _*)
  }

  private[operators] def sketchSize(minFraction: Double, slack: Int): Int = {
    require(minFraction > 0 && minFraction <= 1,
      s"minFraction must be in (0, 1], got $minFraction")
    require(slack >= 2, s"slack must be >= 2 for the superset guarantee, got $slack")
    val k = math.ceil(slack / minFraction)
    // a useful sketch is thousands of counters; tens of millions means the
    // fraction is so small a plain groupBy would be cheaper — reject rather
    // than materialize a buffer that defeats the bounded-state premise
    require(k <= 16 * 1024 * 1024,
      s"minFraction $minFraction needs $k counters — too small for a sketch; use groupBy")
    math.max(1, k.toInt)
  }

  /** Exact phase 2: broadcast the ≤ k candidates against the item stream,
    * count, and keep those meeting the threshold. `items` is a one-column
    * (`__item`) frame; null items drop in the equi-join, matching the
    * sketch's null skip.
    */
  private def recount(items: DataFrame, sk: DataFrame, minFraction: Double): DataFrame = {
    val cands = sk.select(explode(col("__cands")).as("__c"), col("__n"))
      .select(col("__c._1").as("__cand"), col("__n"))
    items.join(broadcast(cands), col("__item") === col("__cand"))
      .groupBy(col("__item").as("item"), col("__n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= ceil(lit(minFraction) * col("__n")))
      .select(col("item"), col("cnt"))
  }
}
