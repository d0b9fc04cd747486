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

  /** Morton (z-order) interleave of 2+ numeric columns, as a Column — the
    * clustering key for [[writeZOrdered]]. Each column is quantized to
    * `bits` levels by LINEAR min/max scaling (the mins/maxes come from one
    * tiny agg pass in writeZOrdered); bit i of every quantized column maps
    * to bit i*n+idx of the z-value, so files sorted by z-value are
    * rectangles in the multi-dim space and parquet min/max footer stats
    * prune on EVERY clustered column, not just a leading sort key.
    *
    * The whole thing is a fold of shiftleft/bitand expressions — one
    * codegen'd projection, no UDF. Linear quantization is skew-sensitive
    * (a heavy value crowds its bucket); for skewed clustering keys quantize
    * upstream (e.g. rank or log transform) before calling.
    */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least two columns (one = plain sort)")
    require(n * bits <= 63, s"$n cols x $bits bits overflow a signed long")
    val quantized = cols.zipWithIndex.map { case (c, i) =>
      val lo = mins(i); val hi = maxs(i)
      val span = if (hi > lo) hi - lo else 1.0
      // clamp into [0, 2^bits - 1]; nulls sort first (quantize to 0)
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((coalesce(c.cast("double"), lit(lo)) - lo) / span * ((1L << bits) - 1))
          .cast("long")))
    }
    (0 until bits).flatMap { b =>
      quantized.zipWithIndex.map { case (q, i) =>
        shiftleft(q.bitwiseAND(lit(1L << b)), b * (n - 1) + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order-clustered parquet layout: quantize the clustering columns
    * (one agg pass for min/max), range-partition by the interleaved
    * z-value into `numFiles` files, sort within each. A conjunctive range
    * predicate over ANY subset of the clustered columns then skips most
    * files on parquet footer min/max alone — the multi-dimensional
    * counterpart of writePartitioned's directory pruning, for columns too
    * high-cardinality to partition by. ScaleSpec pins the actual skip rate
    * on a 2-dim box query.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit =
    zCluster(df, zCols, numFiles, bits).write.mode("overwrite").parquet(path)

  /** The z-clustering transform shared by [[writeZOrdered]], the
    * spec-driven sink layout (BatchSink.write zOrderBy) and snapshot
    * compaction (BatchSink.compactSnapshot zOrderCols): one tiny min/max
    * agg over `df`, the Morton interleave, range-partition + sort on it,
    * z-column dropped. ONE implementation so the quantization and
    * null-placement conventions cannot drift between call sites.
    */
  def zCluster(df: DataFrame, zCols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val aggExprs = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val mins = zCols.indices.map(i => Option(stats.get(2 * i))
      .fold(0.0)(_.asInstanceOf[Double]))
    val maxs = zCols.indices.map(i => Option(stats.get(2 * i + 1))
      .fold(0.0)(_.asInstanceOf[Double]))
    df.withColumn("__graft_z", zValue(zCols.map(col), mins, maxs, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }
}
