package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap shared by Verify / Bench / tests — the R20 analogue
  * (KafkaStreamsConfig.java:31-47): one place for engine configuration.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Allow shuffled-hash join where its size conditions hold instead of
      // always sorting both sides (optimization-guide §3.1/§9): the planner
      // still gates the choice on the build side fitting a per-partition
      // hash map, so this is a strictly-cheaper plan when taken and a no-op
      // when not. The AQE threshold additionally rewrites an already-
      // planned sort-merge join to shuffled-hash at runtime when every
      // post-shuffle partition is under the advisory size — measured
      // partition sizes, not estimates, so it scales with the data rather
      // than the local core count. MEASURED at sf1 (round 22, plans/r22/
      // shj_ab_sf1.txt + the *_sf1_shj_{on,off}.txt executed plans): the
      // rewrite fires on q5_nation_revenue (2.4 -> 1.9-2.1 s) and
      // x13_salted_join (min 4.0 -> 3.8 s, dodging a 17 s SMJ straggler);
      // joins whose sides stay large keep SMJ.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.ui.enabled", "false")
      // Producers have shipped events.ts as BOTH parquet TIMESTAMP(NANOS)
      // and TIMESTAMP(MICROS) across dump generations. Spark's reader rejects
      // NANOS outright, so read it as raw long nanos; Sources.fixNanos then
      // dispatches on the arriving type (long-nanos / timestamp / ntz) and
      // normalizes to session-TZ micros at the source boundary. This flag is
      // inert when the file is already MICROS.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  // Default parallelism matches the driver environment contract (local[32]);
  // SPARK_GRAFT_CPUS overrides. shuffle.partitions tracks the core count —
  // 200 default partitions on a 32-thread single node is pure scheduling
  // overhead at these scales.
  def get(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
