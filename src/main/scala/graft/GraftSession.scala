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
