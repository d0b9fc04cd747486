package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries/oracles live in [[Queries]]; session bootstrap in [[GraftSession]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the full config path: JSON PipelineSpec → Interpreter →
    * three-hop join chain (SURVEY §2A R9).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.r09JoinChainMulti(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Exact queries come from [[Queries.oracles]];
    * approximate queries (LSH/ANN/sketch/packing) are covered by their
    * [[Accuracy]] contracts — [[Verify]] dumps the accuracy summary row
    * set for those names, and [[Accuracy.oracles]] recomputes its
    * reference columns and pins `pass = true`, so every declared query is
    * machine-checked by the driver's hash compare.
    */
  def oracleSql: Map[String, String] = Queries.oracles ++ Accuracy.oracles
}
