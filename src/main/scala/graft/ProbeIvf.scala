package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off recall probe for the IVF nAssign tuning (dev tool, not a query). */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nAssign <- Seq(1, 2, 3); nProbe <- Seq(4, 8)) {
      val ann = Similarity.ivfTopK(e, q, "vec_id", "embedding", 10, 16, nProbe, nAssign)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.intersect(ann).size.toDouble / exact.size
      println(f"[ivf] nAssign=$nAssign nProbe=$nProbe recall=$recall%.3f")
    }
    spark.stop()
  }
}
