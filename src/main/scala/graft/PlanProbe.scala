package graft

/** Ad-hoc plan dump: `runMain graft.PlanProbe <sfDir> <query...>` prints the
  * formatted plan of the named [[Queries]] entries — the inner dev loop for
  * plan-shape work (PLANS.md evidence, PlanSpec pins).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("r03_global_join", "q1_agg", "r09_join_chain_multi", "x2_minhash_lsh",
        "r02_table_latest", "x3_knn_exact", "x2_embed_dup", "r08_table_table_left",
        "x12_group_topk", "x2_jaccard_capped", "x2_jaccard_pairs",
        "x15_range_join", "q4_order_priority", "x16_profile")
    for (n <- names) {
      println(s"========== $n ==========")
      println(Queries.all(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
