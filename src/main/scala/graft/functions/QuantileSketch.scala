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
  // paired primitive arrays — the former ArrayBuffer[(Double, Long)] boxed
  // one tuple per RAW VALUE on the build hot path and one per centroid on
  // the merge path. Starts small and grows: one buffer lives per GROUP
  // inside hash aggregation, and a high-cardinality build (one sketch per
  // order key: 150k+ cells) must not pre-allocate the 4×cap worst case.
  private[functions] var means = new Array[Double](16)
  private[functions] var weights = new Array[Long](16)
  private[functions] var n = 0

  private def ensure(extra: Int): Unit = {
    val need = n + extra
    if (need > means.length) {
      val cap = math.max(means.length * 2, need)
      means = java.util.Arrays.copyOf(means, cap)
      weights = java.util.Arrays.copyOf(weights, cap)
    }
  }

  def add(v: Double): Unit = addCentroid(v, 1L)

  def addCentroid(m: Double, w: Long): Unit = {
    ensure(1)
    means(n) = m; weights(n) = w; n += 1
    if (n >= 4 * maxCentroids) compressNow()
  }

  def mergeIn(other: QSketchBuffer): Unit = {
    ensure(other.n)
    System.arraycopy(other.means, 0, means, n, other.n)
    System.arraycopy(other.weights, 0, weights, n, other.n)
    n += other.n
    compressNow()
  }

  def compressNow(): Unit =
    n = QuantileSketch.compressInPlace(means, weights, n, maxCentroids)

  /** The buffer's centroids as the tuple Seq the shared estimate/compress
    * kernels consume — built only at EVAL time (once per finished group),
    * never per row.
    */
  private[functions] def toPairs: Seq[(Double, Long)] = {
    val out = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { out += ((means(i), weights(i))); i += 1 }
    out.toSeq
  }
}

object QSketchBuffer {
  /** ONE wire format for both aggregates' shuffle buffers (build and
    * merge previously carried verbatim copies — a drift between them
    * would silently corrupt shuffled partials between the two operators).
    */
  private[functions] def serialize(b: QSketchBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.means(i)); bb.putLong(b.weights(i)); i += 1 }
    bb.array()
  }

  private[functions] def deserialize(bytes: Array[Byte],
      maxCentroids: Int): QSketchBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val b = new QSketchBuffer(maxCentroids)
    b.means = new Array[Double](math.max(1, m))
    b.weights = new Array[Long](math.max(1, m))
    var i = 0
    while (i < m) { b.means(i) = bb.getDouble; b.weights(i) = bb.getLong; i += 1 }
    b.n = m
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
    val cs = QuantileSketch.compress(b.toPairs, maxCentroids)
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
    val cs = QuantileSketch.compress(b.toPairs, maxCentroids)
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
    val ms = new Array[Double](b.size)
    val ws = new Array[Long](b.size)
    var i = 0
    b.foreach { case (m, w) => ms(i) = m; ws(i) = w; i += 1 }
    val out = compressInPlace(ms, ws, b.size, maxCentroids)
    val res = new ArrayBuffer[(Double, Long)](out)
    i = 0
    while (i < out) { res += ((ms(i), ws(i))); i += 1 }
    res.toSeq
  }

  /** The ONE pack kernel, over paired primitive arrays IN PLACE (the write
    * pointer always trails the read pointer — every emitted bucket consumes
    * at least one input centroid). Returns the packed length. The tuple-Seq
    * [[compress]] delegates here, so the two forms can never drift.
    */
  private[graft] def compressInPlace(means: Array[Double], weights: Array[Long],
      n: Int, maxCentroids: Int): Int = {
    PairSort.centroid.sort(means, weights, n)
    if (n <= maxCentroids) n
    else {
      var total = 0L
      var i = 0
      while (i < n) { total += weights(i); i += 1 }
      val budget = math.max(1L, (total + maxCentroids - 1) / maxCentroids)
      // A bucket whose points all share one value must emit EXACTLY that
      // value: sum(v*w)/w drifts an ulp (48.95*3/3 = 48.95000000000001),
      // and on heavy-tie data one ulp above a plateau moves the estimate
      // past the whole plateau's rank mass (caught by the sf3 accuracy
      // sweep: r32 windowed p50 off by a full 30-row tie run).
      var out = 0
      var sum = 0.0; var w = 0L
      var firstM = 0.0; var allEq = true
      def flush(): Unit = {
        means(out) = if (allEq) firstM else sum / w
        weights(out) = w
        out += 1
      }
      i = 0
      while (i < n) {
        val m = means(i); val cw = weights(i)
        if (w > 0 && w + cw > budget) { flush(); sum = 0.0; w = 0L; allEq = true }
        if (w == 0L) firstM = m else if (m != firstM) allEq = false
        sum += m * cw; w += cw
        i += 1
      }
      if (w > 0) flush()
      out
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
