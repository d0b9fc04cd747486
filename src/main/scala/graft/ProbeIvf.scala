package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev diagnostic (not an operator): sweep IVF (nCells, nProbe, nAssign)
  * against exact top-10 recall on an SF's embeddings — the measurement the
  * auto-sizing rule (Similarity.ivfTopK, round-12) was tuned from.
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val n = e.count()
    val q = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = math.min(1024, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
    val cellChoices = Seq(16, auto / 2, auto, auto * 2).distinct.filter(_ >= 2)
    for (nCells <- cellChoices; frac <- Seq(8, 4, 3, 2); nAssign <- Seq(1, 2)) {
      val nProbe = math.max(4, nCells / frac)
      val t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(e, q, "vec_id", "embedding", 10, nCells, nProbe, nAssign)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = exact.intersect(ann).size.toDouble / exact.size
      println(f"[ivf] n=$n nCells=$nCells nProbe=$nProbe nAssign=$nAssign " +
        f"recall=$recall%.3f ${secs}%.1fs")
    }
    spark.stop()
  }
}
