package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact top-k aggregator: keeps the k best (score desc, id asc) pairs with
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
  */
class TopKAggregator(k: Int, distinctPairs: Boolean = false)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](p => (-p._1, p._2))

  private def dedup(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (distinctPairs) b.distinct else b

  private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val d = dedup(b)
    if (d.size <= k) d else d.sorted(ord).take(k)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    val appended = b :+ a
    if (appended.size >= 4 * k) trim(appended) else appended
  }
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    dedup(b).sorted(ord).take(k)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** Column function: top-k of (score, id) structs per group.
    * Result: array<struct<_1: score, _2: id>> ordered best-first.
    */
  def topk(score: Column, id: Column, k: Int): Column = {
    implicit val inputEnc: Encoder[(Double, Long)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)
    udaf(new TopKAggregator(k), inputEnc).apply(score, id)
  }

  /** topk over inputs that may repeat a (score, id) pair exactly (e.g. IVF
    * multi-assignment): duplicates collapse inside the partial aggregate.
    */
  def topkDistinct(score: Column, id: Column, k: Int): Column = {
    implicit val inputEnc: Encoder[(Double, Long)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)
    udaf(new TopKAggregator(k, distinctPairs = true), inputEnc).apply(score, id)
  }
}
