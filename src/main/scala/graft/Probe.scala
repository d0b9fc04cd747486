package graft
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 128, 32, 0.7).count()
    println(s"[probe] minhash pairs: $n")
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    println(s"[probe] jaccard pairs: $j")
    spark.stop()
  }
}
