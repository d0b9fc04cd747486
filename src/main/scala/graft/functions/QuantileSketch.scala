package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

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
/** Growable centroid buffer for the NATIVE build aggregate: plain appends
  * until 4× the cap, then one kernel compression — O(1) amortized per row
  * with no per-row encoder work (see [[QuantileSketchBuild]]).
  */
final class QSketchBuffer(val maxCentroids: Int) {
  // starts at the default capacity and grows: one buffer lives per GROUP
  // inside hash aggregation, and a high-cardinality build (one sketch per
  // order key: 150k+ cells) with the old 4×cap pre-size allocated the
  // full-buffer worst case — 8 KB of empty tuple slots — for every group
  // whose true occupancy is a handful of rows
  var items = new ArrayBuffer[(Double, Long)]()
  def add(v: Double): Unit = {
    items += ((v, 1L))
    if (items.size >= 4 * maxCentroids) compressNow()
  }
  def addCentroid(m: Double, w: Long): Unit = {
    items += ((m, w))
    if (items.size >= 4 * maxCentroids) compressNow()
  }
  def mergeIn(other: QSketchBuffer): Unit = {
    items ++= other.items
    compressNow()
  }
  def compressNow(): Unit = {
    val packed = QuantileSketch.compress(items.toSeq, maxCentroids)
    items = new ArrayBuffer[(Double, Long)](packed.size)
    items ++= packed
  }
}

object QSketchBuffer {
  /** ONE wire format for both aggregates' shuffle buffers (build and
    * merge previously carried verbatim copies — a drift between them
    * would silently corrupt shuffled partials between the two operators).
    */
  private[functions] def serialize(b: QSketchBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.items.size)
    bb.putInt(b.items.size)
    b.items.foreach { case (m, w) => bb.putDouble(m); bb.putLong(w) }
    bb.array()
  }

  private[functions] def deserialize(bytes: Array[Byte],
      maxCentroids: Int): QSketchBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new QSketchBuffer(maxCentroids)
    var i = 0
    while (i < n) { b.items += ((bb.getDouble, bb.getLong)); i += 1 }
    b
  }
}

/** The BUILD aggregate as a native Catalyst [[TypedImperativeAggregate]] —
  * the hot path (one call per raw row at 100 TB). The `udaf(Aggregator)`
  * wrapper costs ~15 µs/row in encoder traffic (measured: the sketch build
  * over 100k rows ran 5× slower than Spark's own exact percentile);
  * this form touches the input row directly and appends to a mutable
  * buffer — same centroid arithmetic (the shared
  * [[QuantileSketch.compress]] kernel), an order of magnitude less
  * per-row overhead. Nulls are skipped (standard aggregate semantics).
  *
  * Output schema keeps the tuple-encoder field names (`_1` mean,
  * `_2` weight) so stored sketch tables read back into the Scala-side
  * merge aggregators unchanged.
  */
case class QuantileSketchBuild(child: Expression, maxCentroids: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(maxCentroids >= 2, s"maxCentroids must be >= 2, got $maxCentroids")

  override def prettyName: String = "quantile_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): QSketchBuffer =
    new QSketchBuffer(maxCentroids)

  override def update(b: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    b.mergeIn(other); b
  }

  override def eval(b: QSketchBuffer): Any = {
    val cs = QuantileSketch.compress(b.items.toSeq, maxCentroids)
    new GenericArrayData(cs.map { case (m, w) =>
      InternalRow(m, w): Any }.toArray)
  }

  override def serialize(b: QSketchBuffer): Array[Byte] =
    QSketchBuffer.serialize(b)

  override def deserialize(bytes: Array[Byte]): QSketchBuffer =
    QSketchBuffer.deserialize(bytes, maxCentroids)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchBuild =
    copy(child = c)
}

/** Merge-side aggregate over STORED sketches (input rows are sketch
  * columns, not raw values) as a native [[TypedImperativeAggregate]] —
  * the same port the build side got ([[QuantileSketchBuild]]): a ≥100k-cell
  * rollup calls this once per CELL, and the former `udaf(Aggregator)`
  * wrapper paid encoder traffic (deserialize the full centroid array into
  * Scala tuples, re-encode the buffer) on every one of those calls. This
  * form reads the centroid structs straight off the `ArrayData` and
  * appends into the shared mutable [[QSketchBuffer]].
  *
  * `quantiles` empty → RESKETCH mode: emit the merged sketch itself (the
  * step that writes a coarser sketch table, e.g. daily → monthly, without
  * estimating). Non-empty → terminal ESTIMATE mode: emit one
  * `array<double>` aligned with `quantiles`.
  */
case class QuantileSketchMerge(child: Expression, maxCentroids: Int,
    quantiles: Seq[Double] = Nil,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(maxCentroids >= 2, s"maxCentroids must be >= 2, got $maxCentroids")
  require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0, 1], got $quantiles")

  override def prettyName: String =
    if (quantiles.isEmpty) "quantile_resketch" else "quantile_merge_estimate"
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (quantiles.isEmpty) ArrayType(StructType(Seq(
      StructField("_1", DoubleType, nullable = false),
      StructField("_2", LongType, nullable = false))), containsNull = false)
    else ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QSketchBuffer =
    new QSketchBuffer(maxCentroids)

  override def update(b: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val c = arr.getStruct(i, 2)
        b.addCentroid(c.getDouble(0), c.getLong(1))
        i += 1
      }
    }
    b
  }

  override def merge(b: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    b.mergeIn(other); b
  }

  override def eval(b: QSketchBuffer): Any = {
    val cs = QuantileSketch.compress(b.items.toSeq, maxCentroids)
    if (quantiles.isEmpty)
      new GenericArrayData(cs.map { case (m, w) => InternalRow(m, w): Any }.toArray)
    else
      new GenericArrayData(quantiles.map(QuantileSketch.estimate(cs, _)).toArray)
  }

  override def serialize(b: QSketchBuffer): Array[Byte] =
    QSketchBuffer.serialize(b)

  override def deserialize(bytes: Array[Byte]): QSketchBuffer =
    QSketchBuffer.deserialize(bytes, maxCentroids)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchMerge =
    copy(child = c)
}

object QuantileSketch {

  /** Pack a centroid multiset into ~`maxCentroids` equi-weight buckets
    * (weighted means, value-sorted). Stable: already-small inputs are
    * only re-sorted, never smeared.
    *
    * Size bound: a bucket flushes when the NEXT centroid would overflow
    * the weight budget, so an input whose centroid weights sit near the
    * budget (a merge of already-compressed sketches) can emit up to
    * ~2 × maxCentroids buckets (each flushed bucket holds > budget/2,
    * so count < 2·total/budget). The overshoot only ADDS resolution —
    * estimates get finer, never coarser — at ≤ 2× the declared storage;
    * splitting an input centroid to hit the cap exactly would smear
    * genuine value plateaus across buckets (the heavy-tie rank bug the
    * allEq branch below exists to prevent), so the cap stays soft.
    */
  private[graft] def compress(b: Seq[(Double, Long)], maxCentroids: Int): Seq[(Double, Long)] = {
    val sorted = b.sortBy(c => (c._1, c._2))
    if (sorted.size <= maxCentroids) sorted
    else {
      val total = sorted.iterator.map(_._2).sum
      val budget = math.max(1L, (total + maxCentroids - 1) / maxCentroids)
      val out = new ArrayBuffer[(Double, Long)](maxCentroids + 1)
      // A bucket whose points all share one value must emit EXACTLY that
      // value: sum(v*w)/w drifts an ulp (48.95*3/3 = 48.95000000000001),
      // and on heavy-tie data one ulp above a plateau moves the estimate
      // past the whole plateau's rank mass (caught by the sf3 accuracy
      // sweep: r32 windowed p50 off by a full 30-row tie run).
      var sum = 0.0; var w = 0L
      var firstM = 0.0; var allEq = true
      def flush(): Unit = { out += ((if (allEq) firstM else sum / w, w)) }
      sorted.foreach { case (m, cw) =>
        if (w > 0 && w + cw > budget) { flush(); sum = 0.0; w = 0L; allEq = true }
        if (w == 0L) firstM = m else if (m != firstM) allEq = false
        sum += m * cw; w += cw
      }
      if (w > 0) flush()
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

  /** Output-column name for a quantile fraction — p50 / p99 / p99_9 (the
    * fraction's digits, '.' as '_'). Decimal arithmetic because q*100 in
    * doubles turns 0.9 into 90.00000000000001. ONE implementation shared
    * by every emitter (Profile.rollupQuantiles, the windowed rollup) so
    * stream-built, batch-built and rolled-up tables can never diverge in
    * column names.
    */
  def colName(q: Double): String =
    "p" + (BigDecimal(q) * 100).underlying.stripTrailingZeros
      .toPlainString.replace(".", "_")

  /** Aggregate raw doubles into a storable sketch column
    * (`array<struct<_1: mean, _2: weight>>`, value-sorted) — the native
    * [[QuantileSketchBuild]] aggregate (hot path: one call per raw row).
    */
  def sketch(value: Column, maxCentroids: Int = 256): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      QuantileSketchBuild(
        org.apache.spark.sql.graftbridge.Bridge.expression(value.cast("double")),
        maxCentroids).toAggregateExpression())

  /** Merge stored sketch columns into one coarser sketch (rollup WITHOUT
    * estimating — for writing a coarser sketch table). Native
    * [[QuantileSketchMerge]] in resketch mode: one call per stored cell.
    */
  def mergeSketches(sketchCol: Column, maxCentroids: Int = 256): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      QuantileSketchMerge(
        org.apache.spark.sql.graftbridge.Bridge.expression(sketchCol),
        maxCentroids).toAggregateExpression())

  /** Merge stored sketch columns and evaluate `quantiles` from the merged
    * sketch — one array<double> per group, aligned with `quantiles`.
    * Native [[QuantileSketchMerge]] in estimate mode.
    */
  def mergeEstimate(sketchCol: Column, quantiles: Seq[Double],
      maxCentroids: Int = 256): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      QuantileSketchMerge(
        org.apache.spark.sql.graftbridge.Bridge.expression(sketchCol),
        maxCentroids, quantiles).toAggregateExpression())

  /** SCALAR quantile estimates from ONE stored sketch value (no
    * aggregation) — one array<double> per ROW, aligned with `quantiles`.
    * Used where the sketch column is already one-per-cell (the windowed
    * streaming rollup emission), so this evaluates once per emitted CELL,
    * never once per raw row — a Scala udf is fine at that cardinality and
    * keeps the interpolation kernel shared with the aggregate forms.
    */
  def estimateSketch(sketchCol: Column, quantiles: Seq[Double]): Column = {
    val qs = quantiles.toIndexedSeq
    val f = org.apache.spark.sql.functions.udf {
      (cs: Seq[org.apache.spark.sql.Row]) =>
        if (cs == null) qs.map(_ => Double.NaN)
        else {
          val centroids = cs.map(r => (r.getDouble(0), r.getLong(1)))
          qs.map(estimate(centroids, _))
        }
    }
    f(sketchCol)
  }
}
