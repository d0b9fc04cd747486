package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic: approx_count_distinct rsd cost/error trade at an SF. */
object ProbeHll {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val ev = spark.read.parquet(s"$dir/events.parquet")
    for (rsd <- Seq(0.05, 0.02, 0.01); i <- 1 to 2) {
      val t0 = System.nanoTime()
      ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("a"))
        .write.format("noop").mode("overwrite").save()
      println(f"[hll] rsd=$rsd run=$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (rsd <- Seq(0.02, 0.01)) {
      val est = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      est.foreach { case (k, v) =>
        println(f"[hll] rsd=$rsd $k err=${math.abs(v.toDouble - exact(k)) / exact(k)}%.4f")
      }
    }
    spark.stop()
  }
}
