package graft
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warm")(docs.count())
    t("langid 1")(docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l")).filter(col("l") =!= "zz").count())
    t("langid 2")(docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l")).filter(col("l") =!= "zz").count())
    // components
    val toks = TextAnalysis.tokens(lower(col("text")))
    t("toks only")(docs.select(size(toks).as("s")).agg(sum("s")).head())
    val f1 = size(filter(toks, x => x.isin(TextAnalysis.langMarkers.head._2: _*)))
    t("one filter")(docs.select(f1.as("s")).agg(sum("s")).head())
    val han = length(col("text")) - length(regexp_replace(col("text"), "[\\u4e00-\\u9fa5]", ""))
    t("han regex")(docs.select(han.as("s")).agg(sum("s")).head())
    spark.stop()
  }
}
