package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.Bridge

/** Column surface over Spark's native bloom-filter sketch expressions —
  * the same `BloomFilterAggregate` / `BloomFilterMightContain` pair the
  * optimizer's automatic runtime row-level filtering injects, exposed for
  * EXPLICIT pre-shuffle pruning (see `Scale.bloomPrunedJoin`). Both are
  * codegen'd Catalyst expressions; keys are fed as xxhash64 longs on both
  * the build and probe side, exactly as the built-in runtime filter does.
  */
object BloomFunctions {

  /** Aggregate the (hashed) key column into one serialized bloom filter.
    * `expectedItems` sizes the filter (bits follow Spark's 8×items
    * heuristic). NOTE: `BloomFilterAggregate` clamps the request to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
    * (defaults 4M items / 64M bits) INSIDE the expression, regardless of
    * who builds it — asking for 100M items silently yields a 4M-item
    * filter whose false-positive rate saturates and the prune stops
    * pruning (results stay correct; the win evaporates). Raise those two
    * confs alongside `expectedItems` when the build side is that large.
    */
  def bloom_agg(key: Column, expectedItems: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)), expectedItems).toAggregateExpression())

  /** True when the bloom filter may contain the key; false only when the
    * key is definitely absent (one-sided error — safe for pruning).
    */
  def might_contain(bloom: Column, key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom), Bridge.expression(xxhash64(key))))
}
