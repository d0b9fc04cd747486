package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k aggregate: keeps the k best (score desc, id asc) pairs with
  * map-side partial aggregation. Compared to the window-function form
  * (`row_number() over (partition by q order by score desc)`), which must
  * shuffle and sort EVERY scored row, this shuffles at most k rows per map
  * partition per group — the difference between O(corpus) and O(k·partitions)
  * exchange volume for a 100 TB ANN sweep.
  *
  * Buffer is an amortized-trimmed array: appends until 4k, then compacts to
  * k, so per-row cost is O(1) amortized and merge is O(k log k).
  *
  * `distinctPairs = true` collapses exact-duplicate (score, id) pairs at
  * every compaction — for inputs where one logical item may be scored
  * several times with an identical score (IVF multiple assignment surfaces
  * a neighbor once per shared probed cell). This keeps dedup INSIDE the
  * partial aggregate: no pre-aggregation dropDuplicates exchange over the
  * corpus-sized scored relation. Sound because an evicted pair had ≥ k
  * distinct better pairs already buffered (which never leave), so a later
  * duplicate of it can never re-enter the true top-k.
  *
  * Implemented as a native Catalyst [[TypedImperativeAggregate]] — the same
  * port the quantile sketch got ([[QuantileSketchBuild]]): this aggregate
  * runs once per SCORED CORPUS ROW on every knn search path, and the former
  * `udaf(Aggregator)` wrapper paid the encoder boundary (InternalRow →
  * Scala tuple deserialization, immutable `Seq :+` buffer copies) on each
  * of those calls. This form reads the two child columns straight off the
  * input row and appends to one mutable buffer; the trim/finish kernels are
  * unchanged, so the surviving multiset — and therefore every result row —
  * is identical.
  */
final class TopKBuffer(val k: Int, val distinctPairs: Boolean) {
  // starts empty and grows: a buffer per group lives inside hash
  // aggregation, so pre-sizing to the 4k trim bound would allocate the
  // worst case for every group up front
  var items = new ArrayBuffer[(Double, Long)]()

  def add(score: Double, id: Long): Unit = {
    items += ((score, id))
    if (items.size >= 4 * k) items = TopKBuffer.trim(items, k, distinctPairs)
  }

  def mergeIn(other: TopKBuffer): Unit = {
    items ++= other.items
    items = TopKBuffer.trim(items, k, distinctPairs)
  }

  /** Final ordered top-k (score desc, id asc), duplicates collapsed only in
    * distinct-pairs mode.
    */
  def result(): Seq[(Double, Long)] = {
    val d = if (distinctPairs) items.distinct else items
    d.sorted(TopKBuffer.ord).take(k).toSeq
  }
}

object TopKBuffer {
  /** (score desc, id asc) — NaN scores order last (Scala's total Double
    * order), exactly as the previous Aggregator form did.
    */
  val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](p => (-p._1, p._2))

  /** Compaction: dedup exact pairs (distinct mode), then keep the k best.
    * A ≤k survivor set is kept unsorted — only the SET matters mid-stream;
    * [[TopKBuffer.result]] imposes the final order.
    */
  private[functions] def trim(b: ArrayBuffer[(Double, Long)], k: Int,
      distinctPairs: Boolean): ArrayBuffer[(Double, Long)] = {
    val d = if (distinctPairs) b.distinct else b
    if (d.size <= k) d else d.sorted(ord).take(k)
  }
}

/** Native top-k aggregate expression; `TopK.topk` / `TopK.topkDistinct`
  * are the Column-level entry points.
  */
case class TopKAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
    distinctPairs: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(k >= 1, s"top-k size k must be >= 1, got $k")

  override def prettyName: String =
    if (distinctPairs) "topk_distinct" else "topk"
  override def nullable: Boolean = false
  // tuple-encoder field names (_1 score, _2 id) preserved from the previous
  // Aggregator form so every consumer's `col("top")(0)("_2")` access and
  // stored artifact reads are unchanged
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false))), containsNull = false)
  override def left: Expression = scoreExpr
  override def right: Expression = idExpr
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint) inputs, got (${s.sql}, ${i.sql})")
    }

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, distinctPairs)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val i = idExpr.eval(input)
      if (i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    b.mergeIn(other); b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.result().map { case (s, i) =>
      InternalRow(s, i): Any }.toArray)

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.items.size)
    bb.putInt(b.items.size)
    b.items.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k, distinctPairs)
    var i = 0
    while (i < n) { b.items += ((bb.getDouble, bb.getLong)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAgg =
    copy(scoreExpr = l, idExpr = r)
}

object TopK {
  private def agg(score: Column, id: Column, k: Int, distinct: Boolean): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TopKAgg(
        org.apache.spark.sql.graftbridge.Bridge.expression(score.cast("double")),
        org.apache.spark.sql.graftbridge.Bridge.expression(id.cast("long")),
        k, distinct).toAggregateExpression())

  /** Column function: top-k of (score, id) structs per group.
    * Result: array<struct<_1: score, _2: id>> ordered best-first.
    */
  def topk(score: Column, id: Column, k: Int): Column =
    agg(score, id, k, distinct = false)

  /** topk over inputs that may repeat a (score, id) pair exactly (e.g. IVF
    * multi-assignment): duplicates collapse inside the partial aggregate.
    */
  def topkDistinct(score: Column, id: Column, k: Int): Column =
    agg(score, id, k, distinct = true)
}
