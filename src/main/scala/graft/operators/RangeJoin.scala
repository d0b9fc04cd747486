package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match each left POINT `ts` to the right INTERVALS
  * `[start, end]` that contain it (plus optional equi-keys) — the "which
  * campaign/session/outage window was this event inside" join.
  *
  * Spark has no native range-join strategy: the direct `ts BETWEEN start AND
  * end` theta-join plans as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * work and a single-task bottleneck (or an OOM) once neither side fits in a
  * broadcast. The scalable form BUCKETIZES time: each point maps to exactly
  * one bucket of `bucketWidthSec`; each interval explodes to every bucket it
  * overlaps; the join is then an EQUI hash join on (bucket, keys…) refined
  * by the exact containment predicate. This is the standard composition of
  * public primitives for the problem (what Flink's interval join and
  * Databricks' range-join hint do natively).
  *
  * Shuffle volume: |points| + Σ⌈len/width⌉ fixed-width interval rows — pick
  * `bucketWidthSec` near the TYPICAL interval length so each interval lands
  * in O(1) buckets. Each (point, interval) match emits exactly once because
  * a point owns exactly one bucket — no post-join dedup exchange.
  *
  * At 100 TB: both sides shuffle on (bucket, keys…), which distributes as
  * well as the data does; a pathological interval spanning the whole
  * timeline explodes to timeline/width rows — cap interval length upstream
  * or raise the width (documented trade, same class as the LSH bucket cap).
  */
object RangeJoin {

  /** @param points        left side; `ts` must be a TimestampType column
    * @param intervals     right side; `start`/`end` TimestampType columns,
    *                      intervals CLOSED on both ends (BETWEEN semantics)
    * @param ts            point timestamp column name
    * @param start         interval start column name
    * @param end           interval end column name
    * @param bucketWidthSec time-bucket width in seconds
    * @param keys          extra equi-key column names present on both sides
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, ts: String,
      start: String, end: String, bucketWidthSec: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val w = bucketWidthSec * 1000000L
    def bucketOf(c: Column): Column = floor(unix_micros(c) / w)
    val p = points.withColumn("__bucket", bucketOf(col(ts)))
    // degenerate end < start intervals produce an empty sequence → dropped
    // by explode, matching the zero rows BETWEEN would match
    val iv = intervals
      .withColumn("__bucket",
        explode(when(col(end) >= col(start),
          sequence(bucketOf(col(start)), bucketOf(col(end))))
          .otherwise(array())))
    p.join(iv, Seq("__bucket") ++ keys)
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__bucket")
  }
}
