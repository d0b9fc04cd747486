package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * APPROXIMATE queries (the [[Accuracy.checks]] registry — LSH/ANN recall,
  * HLL and quantile-sketch estimates, packing, fingerprints) dump their
  * accuracy-contract summary `(metric, scope, n_ref, bound, pass)` instead
  * of the raw approximate rows, which no exact SQL oracle can hash-match
  * by nature (round-11 directive #1): `pass` is measured in Spark against
  * the exact sibling and pinned `true` by the oracle, `n_ref` is genuinely
  * recomputed by DuckDB. The measured values land in `<outDir>/accuracy
  * .json`, `bench_out/accuracy-<sf>.json`, and one `[accuracy]` stderr
  * line per metric. The raw approximate outputs still execute — the checks
  * compute recall/error FROM them — and stay benchmarked unchanged through
  * [[Bench]], which reads [[SparkEntry.queries]] directly.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // dev loop: an optional third arg "q1_agg,x2_simhash" dumps only those
    // queries (unknown names fail loudly). The driver passes two args, so
    // round artifacts always cover the full set.
    // dev loop: "--resume" as the third arg skips queries whose dump dir
    // already holds a _SUCCESS marker — a wall-clock-limited big-SF sweep
    // continues instead of restarting (partial dirs from a killed write
    // have no _SUCCESS and re-run)
    val (sfDir, outDir, only) = args match {
      case Array(sf, out) => (sf, out, None)
      case Array(sf, out, "--resume") =>
        val done = SparkEntry.queries.keySet.filter(n =>
          Files.exists(Paths.get(s"$out/$n/_SUCCESS")))
        System.err.println(s"[verify] resume: skipping ${done.size} completed")
        (sf, out, Some(SparkEntry.queries.keySet.diff(done)))
      case Array(sf, out, names) =>
        val set = names.split(',').map(_.trim).filter(_.nonEmpty).toSet
        val unknown = set.diff(SparkEntry.queries.keySet)
        require(unknown.isEmpty,
          s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
        (sf, out, Some(set))
      case _ => sys.error("usage: Verify <sfDir> <outDir> [--resume | query,query,...]")
    }
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    val accuracyLog =
      scala.collection.mutable.ArrayBuffer.empty[(String, Accuracy.Metric)]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        Accuracy.checks.get(name) match {
          case Some(check) =>
            val ms = check(spark, sfDir)
            require(ms.nonEmpty, s"$name: accuracy check produced no metrics")
            Accuracy.summaryDf(spark, ms).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            ms.foreach { m =>
              accuracyLog += name -> m
              System.err.println(f"[accuracy] $name ${m.metric}(${m.scope}) " +
                f"value=${m.value}%.6f bound=${m.bound} n_ref=${m.nRef} " +
                s"pass=${m.pass}")
            }
          case None =>
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
        }
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
    def q(s: String): String = JsonText.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // measured accuracy values (the part of the contract a static SQL
    // oracle cannot hash-check): durable copies beside the dump AND in the
    // repo's bench_out (the driver's outDir is ephemeral; bench_out is the
    // committed evidence trail). Locale.ROOT — a comma-decimal locale
    // would emit unparseable JSON.
    def fmt(d: Double) =
      if (d.isNaN) "null"
      else String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    // A SUBSET run (--resume or an explicit name list) must not clobber the
    // durable accuracy evidence with only the queries it re-ran: merge the
    // fresh entries over the existing file's (the file is self-authored
    // single-line `"name": [...]` pairs — the regex split matches exactly
    // what the writer below emits; entry arrays never nest brackets).
    val fresh: Map[String, String] = accuracyLog.groupBy(_._1)
      .map { case (name, ms) =>
        name -> ("[" + ms.map { case (_, m) =>
          s"""{"metric":${q(m.metric)},"scope":${q(m.scope)},""" +
            s""""value":${fmt(m.value)},"n_ref":${m.nRef},""" +
            s""""bound":${fmt(m.bound)},"pass":${m.pass}}"""
        }.mkString(",") + "]")
      }
    def existingEntries(p: java.nio.file.Path): Map[String, String] =
      if (only.isDefined && Files.exists(p)) {
        val parsed = scala.util.Try {
          val content = Files.readString(p)
          val entry = """"([A-Za-z0-9_]+)": (\[[^\]]*\])""".r
          val m = entry.findAllMatchIn(content)
            .map(m => m.group(1) -> m.group(2)).toMap
          (m, content.trim.nonEmpty)
        }
        parsed match {
          // a non-empty file from which ZERO entries parse means format
          // drift (or a read error below) — a silent Map.empty here would
          // let a subset run quietly drop every prior entry from the
          // durable evidence file, so make the drop loud
          case scala.util.Success((m, nonEmpty)) =>
            if (m.isEmpty && nonEmpty) System.err.println(
              s"[verify] WARNING: $p exists but no accuracy entries parsed " +
                "— format drift? prior evidence will NOT be merged")
            m
          case scala.util.Failure(e) =>
            System.err.println(
              s"[verify] WARNING: could not read $p (${e.getMessage}) " +
                "— prior accuracy evidence will NOT be merged")
            Map.empty
        }
      } else Map.empty
    // an accuracy query ATTEMPTED this run that produced no metrics FAILED
    // — its stale entry must drop from the evidence (a visible gap), not
    // survive as yesterday's pass=true
    val attempted = SparkEntry.queries.keySet
      .filter(n => only.forall(_.contains(n)))
      .intersect(Accuracy.checks.keySet)
    val failedAttempts = attempted.diff(fresh.keySet)
    // each destination merges over ITS OWN existing content — a dev subset
    // run with a fresh outDir must still not shrink the committed
    // bench_out evidence file
    def writeMerged(p: java.nio.file.Path): Unit = {
      val merged = (existingEntries(p) -- failedAttempts) ++ fresh
      if (merged.nonEmpty)
        Files.writeString(p, merged.toSeq.sortBy(_._1)
          .map { case (name, arr) => s"${q(name)}: $arr" }
          .mkString("{", ",", "}"))
    }
    writeMerged(Paths.get(s"$outDir/accuracy.json"))
    val benchOut = Paths.get("bench_out")
    if (Files.isDirectory(benchOut))
      writeMerged(benchOut.resolve(
        s"accuracy-${Paths.get(sfDir).getFileName}.json"))
    spark.stop()
  }
}
