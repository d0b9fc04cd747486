package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("r03_global_join", "q1_agg", "r09_join_chain_multi", "x2_minhash_lsh",
        "r02_table_latest", "x3_knn_exact")) {
      println(s"========== $n ==========")
      println(Queries.all(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
