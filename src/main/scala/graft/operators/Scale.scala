package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-aware joins and bucketed co-located joins — the
  * knobs a 100 TB deployment reaches for when the default shuffle hash join
  * hits a hot key or a repeated join key.
  */
object Scale {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a random
    * salt in [0, saltFactor); the small side is replicated once per salt.
    * Shuffle partitions for a hot key are split saltFactor ways.
    *
    * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
    * default here) covers sort-merge joins automatically; explicit salting
    * remains the tool when the skew is extreme (one key ≫ one executor) or
    * the join must be a shuffled hash join.
    *
    * Salt is derived from a hash of all left columns, NOT rand(): retries of
    * a failed task must re-produce the same salt or shuffle retry semantics
    * break (rand() in a join key is also non-deterministic across stage
    * retries — a correctness bug at scale, not just a style point).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val salts = small.sparkSession.range(saltFactor).toDF("__salt")
      .select(col("__salt").cast("int"))
    val replicated = small.crossJoin(broadcast(salts))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Bloom-filter pre-shuffle join pruning (the manual form of Spark's
    * runtime row-level filtering): build a bloom filter over the build
    * side's join keys, hand it to every probe task as a scalar subquery,
    * and filter the probe side BEFORE its exchange — at 100 TB the win is fact rows that never enter
    * the shuffle (when the build side is selective, most of them). False
    * positives pass the bloom and are dropped by the real join, so the
    * result is bit-identical to the plain join; the filter's one-sided
    * error only ever lets extra rows THROUGH to the join, never removes a
    * matching row.
    *
    * Restricted to inner/left_semi: under a left-outer join pruning the
    * probe side would delete rows the join must preserve with nulls.
    * The build side is evaluated twice (bloom aggregation + the join
    * itself) — the pattern's standing cost, paid only when the probe-side
    * exchange dominates, which is exactly when to reach for it. Spark's
    * own InjectRuntimeFilter does this automatically within one query when
    * thresholds allow; the explicit operator covers the cases it declines
    * (pre-computed frames, thresholds, or a filter reused across queries).
    */
  def bloomPrunedJoin(large: DataFrame, small: DataFrame, leftKey: String,
      rightKey: String, expectedItems: Long,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_semi").contains(joinType),
      s"bloom pruning drops probe-side rows; '$joinType' join would lose them " +
        "(only inner and left_semi are sound)")
    // might_contain requires its bloom input to be a constant or scalar
    // subquery (it is bound once per task, not per row) — Dataset.scalar()
    // is the supported way to hand it one
    val bloom = small.agg(
      graft.functions.BloomFunctions.bloom_agg(col(rightKey), expectedItems)
        .as("__bloom")).scalar()
    val pruned = large.filter(
      graft.functions.BloomFunctions.might_contain(bloom, col(leftKey)))
    pruned.join(small, pruned(leftKey) === small(rightKey), joinType)
  }

  /** Write both sides bucketed by the join key so the subsequent join is
    * shuffle-free (co-located, like Kafka Streams' co-partitioned topics).
    * Requires a session catalog (saveAsTable); numBuckets must match on both
    * sides — the Kafka analogue of "same partition count on both topics".
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two pre-bucketed tables; with matching bucket specs Catalyst plans
    * a SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Hive-style partitioned layout: one directory per partition-column value,
    * so a filter on the partition column prunes whole directories at plan
    * time (PartitionFilters — zero data files of other partitions are even
    * LISTED) and a join against a filtered dim prunes them at RUNTIME via
    * dynamic partition pruning. At 100 TB this is the single biggest scan
    * lever a layout choice buys: a date-partitioned fact read with a
    * one-week filter scans a week, not the corpus. Partition columns should
    * be low-cardinality (date, source, lang) — per-value directories of a
    * high-cardinality key produce a small-files catastrophe instead.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
