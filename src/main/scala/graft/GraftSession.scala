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
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
      // read as raw long nanos and floor-convert at the source boundary
      // (ParquetSourceResolver.fixNanos).
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
