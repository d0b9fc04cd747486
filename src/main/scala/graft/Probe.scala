package graft
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("16")
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for ((l, b) <- Seq((16, 4), (24, 5), (32, 5), (24, 4))) {
      val t0 = System.nanoTime()
      val n = Dedup.embeddingCosinePairs(e, "vec_id", "embedding", 64, l, b, 0.4).count()
      println(f"[probe] L=$l b=$b -> $n pairs (exact 59) in ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
