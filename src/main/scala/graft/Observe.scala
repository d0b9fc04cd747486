package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.observe.{PlanAudit, RunMetrics}

/** Observability sweep (dev/ops tool, run ad hoc): executes every declared
  * query once at the given SF with [[graft.observe.RunMetrics]] capture and
  * [[graft.observe.PlanAudit]], and writes one JSON file mapping query →
  * runtime counters (shuffle bytes, spill, task skew) + plan findings.
  *
  * This is the artifact a capacity planner reads before a big run: which
  * queries shuffle how much per unit of input, whether anything spills at
  * this SF (spill at sf0.1 on 128 GiB means certain spill at 100 TB), and
  * whether any plan drifted into a flagged shape. The per-round BENCH
  * artifact stays pure wall-clock ([[Bench]]); this sweep is the deeper
  * diagnostic behind it.
  *
  * usage: runMain graft.Observe [sfDir] [outJson]
  *   defaults: sfDir = SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01,
  *             outJson = bench_out/observe-<sfBasename>.json
  */
object Observe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val base = Paths.get(sfDir).getFileName.toString
    val out = args.lift(1).getOrElse(s"bench_out/observe-$base.json")
    val spark = GraftSession.get()

    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val line = try {
        val df = fn(spark, sfDir)
        val findings = PlanAudit.audit(df)
        val (n, m) = RunMetrics.capture(spark, name) {
          df.queryExecution.toRdd.count() // full plan, no result transfer
        }
        val fJson = findings.map(_.toJson).mkString("[", ",", "]")
        System.err.println(f"[observe] $name rows=$n wall=${m.wallMs}ms " +
          f"shufR=${m.shuffleReadBytes} spill=${m.spillDiskBytes} skew=${m.skew}%.1f " +
          s"warns=${findings.count(_.severity == "warn")}")
        s"""${JsonText.quote(name)}:{"rows":$n,"metrics":${m.toJson},"audit":$fJson}"""
      } catch { case e: Throwable =>
        System.err.println(s"[observe] $name failed: ${e.getMessage}")
        // truncate BEFORE escaping (a cut mid-escape-sequence dangles a
        // backslash); the shared escaper covers quotes/backslashes and the
        // control chars AnalysisException messages routinely carry
        val msg = JsonText.quote(
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        s"""${JsonText.quote(name)}:{"error":$msg}"""
      }
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
      line
    }

    // sfDir is a user-supplied path — quote it like the error branch does,
    // so a directory containing a quote/backslash can't corrupt the artifact
    val json = s"""{"sf":${JsonText.quote(sfDir)},${entries.mkString(",")}}"""
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"[observe] wrote $out (${entries.size} queries)")
  }
}
