package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch: equi-weight centroids (a t-digest without the
  * tail-biased scale function — uniform rank resolution keeps the math
  * simple and the merge associative-enough for rollups).
  *
  * A sketch is a value-SORTED `array<struct<_1: mean, _2: weight>>` of at
  * most `maxCentroids` centroids. Compression sorts buffered points and
  * greedily packs adjacent ones into weight-budget `ceil(total/maxCentroids)`
  * buckets, replacing each bucket with its weighted mean. Rank resolution is
  * therefore ~1/maxCentroids per sketch (±0.4% of rank at the default 256),
  * and each merge level can add at most one budget of smearing — in
  * practice the x6 rollup pins ±1% of rank against exact percentiles.
  *
  * Why it exists: Spark's `percentile_approx` is a complete-mode aggregate —
  * its summary never materializes as a storable column, so a 100 TB corpus
  * must be rescanned for every new slice question. This sketch is a COLUMN:
  * build a per-cell sketch table once (one raw scan), store it, and answer
  * any dimension-subset percentile question by merging |cells| sketch rows
  * ([[graft.operators.Profile.rollupQuantiles]]) — the same stored-artifact
  * pattern as the HLL distinct-count table (`hll_sketch_agg` / x6_sketch
  * _rollup), which Spark ships for counts but not for quantiles.
  */
class QuantileSketchAggregator(maxCentroids: Int)
    extends Aggregator[Double, Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(maxCentroids >= 2, s"maxCentroids must be >= 2, got $maxCentroids")

  override def zero: Seq[(Double, Long)] = Vector.empty

  // appends until 4x the cap, then compresses — O(1) amortized per row,
  // same amortization discipline as TopKAggregator
  override def reduce(b: Seq[(Double, Long)], v: Double): Seq[(Double, Long)] = {
    val appended = b :+ ((v, 1L))
    if (appended.size >= 4 * maxCentroids)
      QuantileSketch.compress(appended, maxCentroids)
    else appended
  }

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b1 ++ b2, maxCentroids)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b, maxCentroids)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Merges STORED sketches and re-emits the merged sketch — the rollup step
  * that writes a COARSER sketch table (e.g. daily cells → a monthly table)
  * without estimating yet.
  */
class QuantileResketchAggregator(maxCentroids: Int)
    extends Aggregator[Seq[(Double, Long)], Seq[(Double, Long)], Seq[(Double, Long)]] {
  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(b: Seq[(Double, Long)], s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b ++ s, maxCentroids)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b1 ++ b2, maxCentroids)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b, maxCentroids)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Merges STORED sketches (the rollup side: input rows are sketch columns,
  * not raw values) and evaluates the requested quantiles from the merged
  * sketch — the terminal estimate step.
  */
class QuantileMergeAggregator(maxCentroids: Int, quantiles: Seq[Double])
    extends Aggregator[Seq[(Double, Long)], Seq[(Double, Long)], Seq[Double]] {
  require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0, 1], got $quantiles")

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(b: Seq[(Double, Long)], s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b ++ s, maxCentroids)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    QuantileSketch.compress(b1 ++ b2, maxCentroids)
  override def finish(b: Seq[(Double, Long)]): Seq[Double] =
    quantiles.map(QuantileSketch.estimate(QuantileSketch.compress(b, maxCentroids), _))
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object QuantileSketch {

  /** Pack a centroid multiset into at most `maxCentroids` equi-weight
    * buckets (weighted means, value-sorted). Stable: already-small inputs
    * are only re-sorted, never smeared.
    */
  private[graft] def compress(b: Seq[(Double, Long)], maxCentroids: Int): Seq[(Double, Long)] = {
    val sorted = b.sortBy(c => (c._1, c._2))
    if (sorted.size <= maxCentroids) sorted
    else {
      val total = sorted.iterator.map(_._2).sum
      val budget = math.max(1L, (total + maxCentroids - 1) / maxCentroids)
      val out = new ArrayBuffer[(Double, Long)](maxCentroids + 1)
      var sum = 0.0; var w = 0L
      sorted.foreach { case (m, cw) =>
        if (w > 0 && w + cw > budget) { out += ((sum / w, w)); sum = 0.0; w = 0L }
        sum += m * cw; w += cw
      }
      if (w > 0) out += ((sum / w, w))
      out.toSeq
    }
  }

  /** Estimate the q-quantile from a sorted centroid sketch: each centroid's
    * mass sits at its mean (position = cumulative-before + w/2 in rank
    * space), linear interpolation between adjacent means, clamped to the
    * extreme means outside them.
    */
  private[graft] def estimate(cs: Seq[(Double, Long)], q: Double): Double = {
    if (cs.isEmpty) return Double.NaN
    val total = cs.iterator.map(_._2).sum.toDouble
    val target = q * total
    var cum = 0L
    var prevPos = Double.NegativeInfinity
    var prevMean = cs.head._1
    cs.foreach { case (m, w) =>
      val pos = cum + w / 2.0
      if (target <= pos)
        return if (prevPos.isNegInfinity || pos == prevPos) m
        else prevMean + (m - prevMean) * (target - prevPos) / (pos - prevPos)
      cum += w; prevPos = pos; prevMean = m
    }
    cs.last._1
  }

  private def sketchEnc: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  /** Aggregate raw doubles into a storable sketch column
    * (`array<struct<_1: mean, _2: weight>>`, value-sorted).
    */
  def sketch(value: Column, maxCentroids: Int = 256): Column =
    udaf(new QuantileSketchAggregator(maxCentroids), Encoders.scalaDouble)
      .apply(value)

  /** Merge stored sketch columns into one coarser sketch (rollup WITHOUT
    * estimating — for writing a coarser sketch table).
    */
  def mergeSketches(sketchCol: Column, maxCentroids: Int = 256): Column =
    udaf(new QuantileResketchAggregator(maxCentroids), sketchEnc).apply(sketchCol)

  /** Merge stored sketch columns and evaluate `quantiles` from the merged
    * sketch — one array<double> per group, aligned with `quantiles`.
    */
  def mergeEstimate(sketchCol: Column, quantiles: Seq[Double],
      maxCentroids: Int = 256): Column =
    udaf(new QuantileMergeAggregator(maxCentroids, quantiles), sketchEnc)
      .apply(sketchCol)
}
