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
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate LSH/ANN variants, non-SQL hashes) → rows-only check.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
