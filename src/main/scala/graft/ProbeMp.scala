package graft

import org.apache.spark.sql.functions._

/** Multi-probe LSH calibration harness (dev/ops tool, run ad hoc — the
  * measurement behind the probeBoost constant and the (b, T, L) defaults in
  * [[graft.operators.Dedup.embeddingCosinePairs]]'s auto-sizer).
  *
  * For each declared (planesPerTable, nProbes, nTables) geometry, runs the
  * pair operator over the given SF's embeddings at the x2_embed_dup
  * threshold (0.4), measures wall time and recall against the exact
  * brute-force pair set, and prints one line per config. An `auto` config
  * exercises whatever the sizer itself picks.
  *
  * usage: runMain graft.ProbeMp [sfDir] [b,T,L b,T,L ... | auto]
  */
object ProbeMp {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata_sf1")
    val configs: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("auto", "9,0,146", "12,2,76", "12,3,93", "11,2,76", "13,2,186")
    val spark = GraftSession.get()
    val threshold = 0.4
    val exact = Queries.all("x3_cosine_pairs_exact")(spark, dir)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    System.err.println(s"[probe-mp] $dir exact pairs at >= $threshold: ${exact.size}")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    configs.foreach { cfg =>
      val t0 = System.nanoTime()
      val df =
        if (cfg == "auto")
          graft.operators.Dedup.embeddingCosinePairs(e, "vec_id", "embedding",
            dim = 64, nTables = 24, planesPerTable = 4, threshold = threshold,
            maxTables = 256)
        else {
          val Array(b, t, l) = cfg.split(",").map(_.trim.toInt)
          graft.operators.Dedup.embeddingCosinePairs(e, "vec_id", "embedding",
            dim = 64, nTables = l, planesPerTable = b, threshold = threshold,
            autoSize = false, nProbes = t)
        }
      val found = df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall =
        if (exact.isEmpty) 0.0
        else found.intersect(exact).size.toDouble / exact.size
      System.err.println(f"[probe-mp] cfg=$cfg%-12s wall=$secs%6.1fs " +
        f"found=${found.size}%8d recall=$recall%.4f")
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
    }
    spark.stop()
  }
}
