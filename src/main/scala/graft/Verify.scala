package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // dev loop: an optional third arg "q1_agg,x2_simhash" dumps only those
    // queries (unknown names fail loudly). The driver passes two args, so
    // round artifacts always cover the full set.
    val (sfDir, outDir, only) = args match {
      case Array(sf, out) => (sf, out, None)
      case Array(sf, out, names) =>
        val set = names.split(',').map(_.trim).filter(_.nonEmpty).toSet
        val unknown = set.diff(SparkEntry.queries.keySet)
        require(unknown.isEmpty,
          s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
        (sf, out, Some(set))
      case _ => sys.error("usage: Verify <sfDir> <outDir> [query,query,...]")
    }
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries persist their sketch stages (LSH self-join reuse); release
      // between queries so 40+ runs in one JVM don't stack caches
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
