package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: per-column non-null and distinct counts in ONE pass —
  * the data-quality summary a pipeline runs before/after every ingest or
  * transform stage (null-rate regressions and key-cardinality drift are the
  * two cheapest early warnings a corpus pipeline has).
  *
  * All columns aggregate in a single `agg` call: Catalyst plans the multiple
  * DISTINCT aggregates as one Expand (×columns row multiplication) over a
  * single scan — at 100 TB, one pass with a k× expand beats k passes, and
  * the aggregation itself is partial (map-side combined) per expanded
  * group. For profile-only-roughly needs, `approxDistinct = true` swaps
  * count_distinct for HLL approx_count_distinct, which removes the Expand
  * entirely (all sketches ride one ObjectHashAggregate).
  */
object Profile {

  /** Long-form profile: one row per column — (col_name, n_non_null,
    * n_distinct). Deterministic (exact counts) unless `approxDistinct`.
    */
  def columnStats(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    require(cols.distinct == cols,
      s"columnStats column list has duplicates: ${cols.diff(cols.distinct).distinct}")
    val aggs = cols.flatMap { c =>
      val nd = if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__nn_$c").as("n_non_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
