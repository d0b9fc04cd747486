package graft

/** Scaling-exponent probe: times the heaviest declared queries at two scale
  * factors in ONE JVM and reports the per-query ratio.
  *
  * The per-round bench (graft.Bench) measures sf0.1 only; every 100 TB
  * design claim beyond that rests on plan-shape audits (no cartesians,
  * bounded collects, banded LSH candidates). A super-linear tail — a
  * posting-list cap mis-sized for denser corpora, an LSH bucket whose
  * occupancy makes the verify step quadratic — is invisible at 600k rows.
  * This main runs the ~10 highest-floor queries against sf0.1 AND an
  * sf1-shaped directory (scripts/gen_sf1.py tiles sf0.1 tenfold with
  * per-tile-disjoint shingle/embedding spaces, so candidate density per
  * tile is exactly sf0.1's and the LINEAR expectation is ~10x), then
  * writes bench_out/scaling.json with both times and the ratio.
  *
  * Methodology mirrors Bench: warm once at sf0.001 (Catalyst/codegen
  * compile out of the measurement), noop-sink writes (full plan runs,
  * nothing lands on disk), clearCache + dedup-registry drain between runs,
  * and the MIN across runs is reported (ambient contention only ever
  * inflates; the scaling question needs each side's truth, not its noise).
  */
object ScalingBench {

  /** The 10 highest-floor queries of round 8 (the judge's directive), plus
    * a second tier covering every sketch/candidate family with FIXED
    * geometry — the risk class the embed-LSH 239× finding exposed (a
    * bucket space that does not grow with the corpus makes occupancy ∝ n
    * and within-bucket pairs ∝ n²): minhash banding (int64 bucket space —
    * expected safe), simhash pigeonhole (4 × 16-bit chunks — fixed 65536
    * buckets per chunk), the LSH collapse composition, and the TF-IDF
    * vocabulary join.
    */
  val Heavy: Seq[String] = Seq(
    "x2_jaccard_char",
    "r22_spec_training",
    "x14_training_pipeline",
    "x2_jaccard_pairs",
    "x2_jaccard_capped",
    // round-17 addition: the cap-diagnostics twin (dropped-posting
    // accounting rides the same df-capped join) — closes the X2 family's
    // sf10 table next to x2_jaccard_capped
    "x2_capped_buckets",
    "x2_embed_dup",
    "x2_dedup_collapse",
    "q21_sole_blame",
    "q2_min_cost_supplier",
    "x20_resample",
    "x2_minhash_lsh",
    "x2_simhash",
    "x2_dedup_collapse_lsh",
    "x5_tfidf",
    // round-9 additions: the quantile-sketch table (partial typed agg —
    // linear by construction, measured to keep it honest) and the exact
    // knn scan (corpus × fixed query set — the broadcast-cross class whose
    // cost must scale with the corpus side only)
    "x6_quantile_rollup",
    "x3_knn_exact",
    // round-11 additions: the native merge-side rollup (cells grow 10×
    // with the corpus — the merge loop must stay linear in cells) and the
    // windowed sketch/top-k family (same cell grid, 10× rows per cell —
    // the per-cell state path must stay linear in rows)
    "x6_quantile_merge",
    "r32_spec_window_topk",
    "r32_spec_window_heavy",
    "r32_spec_window_distinct",
    "r32_spec_window_quantile",
    // the sliding form multiplies cells by every/slide (4× here) and the
    // session form carries per-(user, session) merge state — both must
    // still scale linearly in rows
    "r33_spec_sliding_heavy",
    "r33_spec_session_topk",
    // round-12 additions: the sketch family's sliding/session forms (r34) —
    // sliding multiplies HLL cells 4×, session carries one centroid sketch
    // per (user, session); both must stay linear in rows like their
    // tumbling siblings
    "r34_spec_sliding_distinct",
    "r34_spec_session_quantile",
    // round-12 addition: auto-sized IVF grows the cell grid ∝ √n and must
    // stay ~linear (x2_simhash — now the verified pipeline — and
    // x2_embed_dup — raised table budget — are already in the tiers above)
    "x3_ann_ivf",
    // round-12 addition: the 10×-denser resample grid — its OUTPUT grows
    // ~10× with the corpus like x20_resample's, so the expected ratio is
    // ~data_ratio; a super-linear ratio here would mean the per-key
    // sequence explode has a cost term beyond its output volume
    "x20_resample_dense",
    // round-15 additions: embedding drift (global + grouped) — the design
    // claim is "one scan per side, ≤ (groups ×) dim-row exchange", so the
    // ratio must track the scan (~data_ratio) with no join/state term
    "x29_embed_drift",
    "x29_embed_drift_group",
    // round-16 additions: the remaining drift legs with bounded-exchange
    // claims — histogram (≤ nBins+2 rows per side) and heavy-hitter (≤ k
    // candidate rows + one broadcast-pruned recount per side); both must
    // track the scan like the embedding legs
    "x29_drift_hist",
    "x29_drift_heavy",
    // round-16 addition: the windowed summary-artifact build — cells are
    // (day × dim), so the claim is scan-bound like the drift legs
    "x29_embed_summary_window",
    // round-17 additions: the windowed drift MONITOR (one VectorSumAgg
    // buffer per day cell + literal baseline — must track the scan like
    // the summary build it replaces) and the quantilePath drift route
    // (two sketch passes + a ≤ cells-row rollup join — scan-bound)
    "x29_windowed_drift",
    "r45_spec_drift_quantile",
    // round-18 additions: the stored-index SEARCH half alone (round-17
    // directive #4 — the DPP claim's own rung: the registry r44 row times
    // build+search together, so this probe pre-builds the artifact
    // UNTIMED and times only the probe join; cost must track
    // nProbe/nCells of the index, i.e. ≲ data ratio), the incremental
    // append loop (build-half + append-half + search — the maintenance
    // path whose directory-local write must track the appended volume),
    // and the two new windowed monitors (one stateful agg + broadcast
    // baseline join each — scan-bound like the embedding monitor)
    "r44_knn_ivf_search_only",
    "r47_spec_knn_append",
    "r48_spec_scalar_monitor",
    "r48_spec_quantile_monitor",
    // round-18 second-half additions: the full compaction lifecycle
    // (build third + append two thirds + FOLD + search — the fold is a
    // posting rewrite, so the row must track total index bytes, i.e.
    // ≈ data ratio), and the batch stored scalar leg (one frame summary
    // + a KB-artifact full-outer join — scan-bound)
    "r49_spec_knn_compact",
    "r49_spec_drift_stats",
    // round-19 additions: the deletion lifecycle — the knn rows time
    // build + tombstone-commit + anti-joined search (the delete itself is
    // O(takedown) + one id-column scan, so the row tracks the BUILD's
    // cost class); the shingle row times publish + retract + screen
    "r51_spec_knn_delete",
    "r51_spec_knn_ivf_delete",
    "r51_spec_shingle_retract",
    // attribute-filtered search: build-with-attributes + the filtered
    // candidate scan (the filter prunes the posting scan, so the search
    // half should track the FILTERED volume)
    "r52_spec_knn_filtered",
    "r52_spec_knn_filtered_ivf",
    // the global (dims-empty) percentile monitor: one sketch cell per
    // window + a one-row broadcast baseline — scan-bound like the
    // grouped monitor
    "r52_spec_quantile_monitor_global",
    // the global batch percentile drift: one sketch per side, one-row
    // cross — scan-bound like the grouped r45 row
    "r53_spec_drift_quantile_global",
    // the filtered lsh search: build-with-attributes + the thinned
    // bucket scan (the filter prunes the posting scan)
    "r53_spec_knn_filtered_lsh",
    // round-20 additions: the MASS-deletion lifecycle (build + one
    // 40%-of-corpus tombstone commit + the size-aware anti-joined
    // search) through the forced-shuffle route — the broadcast twin
    // shares the cost class, so only the shuffle row rides the rungs
    "r54_spec_knn_mass_delete",
    // the per-category family: V sub-index builds (each a pushed-down
    // category scan) + the ROUTED search (sub-corpus scan only) — the
    // build half dominates and should track total corpus bytes × ~2
    // (top index + the category partition of the same rows)
    "r54_spec_knn_per_category",
    // the shingle-history compaction lifecycle (publish + append + FOLD +
    // screen — the fold is a full artifact rewrite, so the row must track
    // total history bytes ≈ data ratio, like the knn compactor)
    "r50_spec_shingle_compact",
    // round-17 addition: the incremental-screen LOOP — by the fixture-
    // rebuild discipline the timed query REBUILDS the shingle artifact
    // each call, so this row measures publish (history tokenize + write)
    // PLUS the screen (new-batch tokenize + cross-set prefix join), both
    // of which must track the data; a regression isolated to the screen's
    // join hides behind the publish term here — the screen path's own
    // linearity rides the same prefixVerifiedPairs machinery that
    // x2_jaccard_pairs scales above
    "r46_spec_incremental_screen")

  def main(args: Array[String]): Unit = {
    val sfSmall = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sfBig = args.lift(1).getOrElse("testdata_sf1")
    // optional args 3-5 parameterize a NON-default rung (e.g. sf1 -> sf3
    // for a three-point curve): the artifact's side labels, its filename,
    // and the data ratio between the two dirs. Defaults preserve the
    // canonical sf0.1 -> sf1 artifact exactly.
    val labelSmall = args.lift(2).getOrElse("sf0.1")
    val labelBig = args.lift(3).getOrElse("sf1")
    val artifactName = args.lift(4).getOrElse("scaling.json")
    // Double: the sf3 -> sf10 rung's ratio is 10/3 (the tiled dirs hold
    // 30 and 100 sf0.1 tiles)
    val dataRatio = args.lift(5).map(_.toDouble).getOrElse(10.0)
    val warmDir = "/root/testdata/sf0.001"
    val runsSmall = 3
    val runsBig = 2 // big runs are ~10x the wall clock; 2 suffice for a min
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sfBig)),
      s"big SF dir $sfBig missing — run scripts/gen_sf1.py first")
    val only = sys.env.get("SPARK_GRAFT_SCALING_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.get()
    // Non-registry probes: (prepare, run) pairs — prepare is UNTIMED (it
    // builds the stored artifact once per dir at "crawl time"), run is the
    // timed leg. r44_knn_ivf_search_only isolates the stored-index SEARCH
    // half: the registry r44 row builds AND searches in one query for the
    // correctness contract, so its ratio mixes the build's corpus scan
    // into the number; this probe's ratio is the query-time story alone.
    val prepared = scala.collection.mutable.Set.empty[(String, String)]
    val extraProbes: Map[String, (String => Unit,
        String => org.apache.spark.sql.DataFrame)] = Map(
      "r44_knn_ivf_search_only" -> ((
        (dir: String) => {
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
            .selectExpr("vec_id", "cast(embedding as array<double>) as embedding")
          graft.operators.Similarity.buildIndex(e, "vec_id", "embedding",
            "ivf", s"${Queries.artifactBase(dir)}/scaling_ivf",
            nCells = Queries.ivfCellsFor(spark, dir), nAssign = 2)
          ()
        },
        (dir: String) => {
          val q = spark.read.parquet(s"$dir/embeddings.parquet")
            .filter("vec_id < 5")
            .selectExpr("vec_id", "cast(embedding as array<double>) as embedding")
          graft.operators.Similarity.indexedTopK(q, "vec_id", "embedding",
            10, s"${Queries.artifactBase(dir)}/scaling_ivf")
        })))
    def timeOnce(name: String, dir: String): Double = {
      val fn: String => org.apache.spark.sql.DataFrame =
        extraProbes.get(name) match {
          case Some((prepare, run)) =>
            if (prepared.add((name, dir))) prepare(dir)
            run
          case None => d => SparkEntry.queries(name)(spark, d)
        }
      val t0 = System.nanoTime()
      fn(dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
      secs
    }
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val out = java.nio.file.Paths.get("bench_out")
    java.nio.file.Files.createDirectories(out)
    val scalingPath = out.resolve(artifactName)
    // merge over the existing artifact (same discipline as the bench floor
    // file): a focused SPARK_GRAFT_SCALING_ONLY re-measure refines its
    // queries without dropping everyone else's numbers
    val existing: Map[String, (Double, Double, Double)] =
      if (!java.nio.file.Files.exists(scalingPath)) Map.empty
      else {
        val content = java.nio.file.Files.readString(scalingPath)
        val parsed = (""""([A-Za-z0-9_]+)":\{"""" +
          java.util.regex.Pattern.quote(labelSmall) +
          """":([0-9.eE+-]+),"""" + java.util.regex.Pattern.quote(labelBig) +
          """":([0-9.eE+-]+),"ratio":([0-9.eE+-]+)\}""").r
          .findAllMatchIn(content)
          .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble,
            m.group(4).toDouble)).toMap
        // the merge regex is parameterized on THIS run's labels: pointed at
        // an artifact written under different labels it matches nothing and
        // the rewrite below would silently drop every prior query's numbers
        if (parsed.isEmpty && content.contains("\"queries\":{\""))
          System.err.println(
            s"[scaling] WARNING: $scalingPath has query entries but none " +
              s"matched labels ($labelSmall/$labelBig) — prior numbers " +
              "will NOT be merged (label mismatch?)")
        parsed
      }
    var merged = existing
    def writeArtifact(): String = {
      // stable presentation: the Heavy declaration order, extras appended
      val order = Heavy.filter(merged.contains) ++
        merged.keys.filterNot(Heavy.contains).toSeq.sorted
      val body = order.map { n =>
        val (s, b, r) = merged(n)
        s""""$n":{"$labelSmall":${fmt(s)},"$labelBig":${fmt(b)},"ratio":${fmt(r)}}"""
      }.mkString("{", ",", "}")
      val worst = if (merged.isEmpty) 0.0 else merged.values.map(_._3).max
      val json = s"""{"metric":"scaling","small":"$sfSmall","big":"$sfBig",""" +
        s""""data_ratio":${fmt(dataRatio)},"worst_ratio":${fmt(worst)},"queries":$body}"""
      java.nio.file.Files.write(scalingPath,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      json
    }
    // One query's blow-up (an sf1 OOM is exactly the pathology this probe
    // hunts) must not discard the sweep: each query is fenced, and the
    // artifact is rewritten after every measurement, so the multi-minute
    // sf1 timings already banked survive both a thrown query and a dead
    // JVM. A failed query logs to stderr and keeps its prior entry, if any.
    Heavy.filter(q => only.forall(_.contains(q))).foreach { name =>
      try {
        try { timeOnce(name, warmDir); () } catch { case _: Throwable => () }
        val small = (1 to runsSmall).map(_ => timeOnce(name, sfSmall)).min
        System.err.println(f"[scaling] $name $labelSmall%s best $small%.2f s")
        val big = (1 to runsBig).map(_ => timeOnce(name, sfBig)).min
        val ratio = big / math.max(small, 1e-9)
        System.err.println(f"[scaling] $name $labelBig%s best $big%.2f s — ratio $ratio%.1fx")
        merged += name -> (small, big, ratio)
        writeArtifact()
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[scaling] $name FAILED (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}) — continuing; prior entry, if any, retained")
          spark.catalog.clearCache()
          graft.operators.Dedup.releaseInternalCaches()
      }
    }
    println(writeArtifact())
    spark.stop()
  }
}
