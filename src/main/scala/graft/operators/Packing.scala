package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Sequence packing: assign token-counted rows (chunks) to fixed-budget bins
  * — the step that turns a chunked corpus into dense training examples
  * instead of one padded example per chunk.
  *
  * Greedy sequential first-fit WITHIN each partition, rows visited in
  * `orderCols` order: a row joins the current bin unless it would overflow
  * `budget`, in which case a new bin opens (an over-budget row gets a bin of
  * its own — truncation is the tokenizer's job, not the packer's). This is
  * the rare operator that is genuinely per-partition imperative logic
  * (running bin state), hence `mapPartitions` — the documented last resort,
  * used deliberately: bins never cross partitions, so packing needs NO
  * shuffle at all, and the efficiency loss is at most one under-filled bin
  * per partition (negligible against 100 TB partition counts; repartition
  * upstream if input partitions are pathologically tiny).
  *
  * Deterministic for a fixed input partitioning: pack ids are
  * (partitionId << 32 | localBin) and rows are sorted within partitions
  * before packing.
  */
object Packing {

  /** Append `pack_id` (long, globally unique) and `pack_slot` (int, 0-based
    * position within the pack) to `df`.
    *
    * @param nTokensCol integer/long column with each row's token count
    * @param budget     max total tokens per pack
    * @param orderCols  within-partition visit order (determinism)
    */
  def pack(df: DataFrame, nTokensCol: String, budget: Long,
      orderCols: Seq[String]): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val sorted = df.sortWithinPartitions(orderCols.map(col): _*)
    val nIdx = sorted.schema.fieldIndex(nTokensCol)
    val outSchema = sorted.schema
      .add("pack_id", LongType, nullable = false)
      .add("pack_slot", IntegerType, nullable = false)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var bin = -1L
      var used = 0L
      var slot = 0
      it.map { r =>
        val n = r.get(nIdx) match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long    => l.longValue()
          case other => throw new IllegalArgumentException(
            s"$nTokensCol must be integral, got $other")
        }
        if (bin < 0 || used + n > budget) { bin += 1; used = 0L; slot = 0 }
        used += n
        val out = Row.fromSeq(r.toSeq :+ ((pid << 32) | bin) :+ slot)
        slot += 1
        out
      }
    }(Encoders.row(outSchema))
  }
}
