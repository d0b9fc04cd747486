package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal/point-in-time) join: each left record picks up the latest
  * right record with `rightTs <= leftTs` for the same key — the versioned-
  * KTable / stream⋈temporal-table enrichment semantics (what a changelog
  * join means when the dimension has history, not just a current snapshot).
  *
  * Implementation is the scalable union form, not a range join:
  * tag both sides, union, then one `partitionBy(key) orderBy(ts, side)`
  * window with `last(value, ignoreNulls)` carries the most recent right
  * payload forward onto each left row. Exactly ONE shuffle+sort by key —
  * a per-key merge — versus the O(left × right-versions) blowup of the
  * naive `leftTs >= rightTs` theta-join + argmax. Right rows sort before
  * left rows on ts ties (side 0 < 1), so a same-timestamp update is
  * visible to the event at that timestamp (ASOF >= semantics).
  */
object AsOfJoin {

  /** @param left      stream side
    * @param right     versioned (changelog) side
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on left
    * @param rightTs   version-time column on right
    * @param payload   right columns to carry onto left rows (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .select(Seq(col("__side"), col("__ts"), col(key).as("__key")) ++
        leftCols.map(col) ++ payload.values.toSeq.map(o => lit(null).as(s"__p_$o")): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .withColumn("__ts", col(rightTs))
      .select(Seq(col("__side"), col("__ts"), col(key).as("__key")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map { case (src, out) => col(src).as(s"__p_$out") }.toSeq: _*)
    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.values.toSeq.foldLeft(unioned) { (df, out) =>
      df.withColumn(out, last(col(s"__p_$out"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.values.toSeq.map(col): _*)
  }
}
