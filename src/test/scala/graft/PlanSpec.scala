package graft

/** Plan-shape assertions: the 100 TB posture is a property of the physical
  * plan, not of small-data results — these tests pin the plan shapes that
  * matter at scale so a refactor can't silently regress them.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    Queries.all(name)(spark, sf("sf0.001")).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("global (GlobalKTable) join is a broadcast-hash join, never a shuffle (R3)") {
    val p = plan("r03_global_join")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("flagship agg has map-side partial aggregation and scan-level filter pushdown (q1)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "missing partial aggregation")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"),
      "filter not pushed to parquet scan")
  }

  test("latest-per-key table view partial-aggregates before the exchange (R2)") {
    val p = plan("r02_table_latest")
    assert(p.contains("partial_max_by"), "latest-per-key must map-side combine")
    assert(!p.contains("Window"), "must not use the sort-all-rows window form")
  }

  test("join chain stays hash-joined end to end — no nested-loop fallback (R9)") {
    val p = plan("r09_join_chain_multi")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(600))
  }

  test("minhash LSH candidate join is an equi hash join; sketches never ride the band shuffle (X2)") {
    val p = plan("x2_minhash_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "LSH candidate join fell back to nested-loop")
  }

  test("LSH self-joins read the sketch stage from cache on BOTH sides (X2)") {
    // Spark does not reuse a derived frame's plan across self-join sides;
    // the round-1 plans computed every sketch twice. The banded frames are
    // persisted now — both join inputs must be InMemoryRelation scans.
    // (x2_embed_dup left this pin in round 13: its broadcast-verify branch
    // deliberately does NOT cache — see the next test.)
    for (q <- Seq("x2_simhash")) {
      val p = plan(q)
      val hits = "InMemoryTableScan".r.findAllIn(p).size
      assert(hits >= 2, s"$q: expected both self-join sides cached, found $hits cache scans")
      spark.catalog.clearCache() // don't leak the 43-query suite's caches
    }
  }

  test("embedding-LSH broadcast branch: shuffled self-join, broadcast verify, no cache (X2, round 13)") {
    // The round-13 discipline for the ≤-broadcast-budget regime: the
    // sketch is cheap enough to recompute per self-join side (no
    // InMemoryRelation — the 22M-row cache write cost more than every
    // recompute it saved), the self-join is PINNED shuffled (without the
    // hint Catalyst broadcast the whole exploded banded frame off the tiny
    // parquet-scan size estimate — measured 45 s vs 3 s at sf1), and the
    // exact-cosine verify is two BroadcastHashJoins against the vector
    // table applied BEFORE the pair dedup, so raw candidates never cross
    // an exchange.
    val p = plan("x2_embed_dup")
    assert(!p.contains("InMemoryTableScan"),
      "broadcast branch should recompute the sketch, not cache it")
    assert("SortMergeJoin".r.findAllIn(p).size >= 1,
      s"banded self-join must stay a shuffle join:\n${p.take(800)}")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"verify stage must be two broadcast hash joins:\n${p.take(800)}")
    spark.catalog.clearCache()
  }

  test("minhash LSH: banded self-join cached both sides; final plan rejoins a materialized candidate set (X2)") {
    // minhashLshPairs eagerly checkpoints the candidate pairs and releases
    // the banded cache before returning — so the cache pin is asserted on
    // the LAZY candidate plan (both self-join sides InMemoryTableScan), and
    // the final plan is pinned to rejoin signatures against the materialized
    // RDD, never re-running the band shuffle.
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128)
    val (banded, lazyCands) = graft.operators.Dedup.minhashCandidates(sigs, 128, 32)
    val candPlan = lazyCands.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val hits = "InMemoryTableScan".r.findAllIn(candPlan).size
    assert(hits >= 2, s"expected both band self-join sides cached, found $hits")
    banded.unpersist(true)
    val p = plan("x2_minhash_lsh")
    assert(p.contains("Scan ExistingRDD"),
      s"candidate set not checkpoint-backed in final plan:\n${p.take(400)}")
    spark.catalog.clearCache()
  }

  test("embedding drift folds all metrics off ONE pass per snapshot (X29)") {
    // the regression this pins: a union of "derived rows + an aggregate
    // over the same frame" replans the shared subtree (histogramDrift hit
    // exactly this in round 15 — both snapshots scanned twice, AQE did
    // not reuse the exchange). The single collect_list fold keeps the
    // whole report at one parquet scan per side; grouped form identical.
    for (q <- Seq("x29_embed_drift", "x29_embed_drift_group")) {
      val p = plan(q)
      // count the FormattedMode detail headers "(n) Scan parquet" — the
      // tree section prints every node a second time as "Scan parquet (n)"
      val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
      assert(scans == 2, s"$q should scan each snapshot exactly once, " +
        s"got $scans scans")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plans a cross:\n${p.take(400)}")
      // map-side combine must collapse the posexplode inflation before
      // the exchange: partial aggregation on the per-dimension sums
      assert(p.contains("partial_sum"), s"$q missing map-side combine")
    }
  }

  test("CC collapse rounds run over materialized edges, not the pairs DAG (X2)") {
    // componentsFromPairs localCheckpoints pairs/edges/labels: the returned
    // label frame's lineage must bottom out in materialized RDD scans with
    // no parquet re-scan — the round-1 shape re-executed the whole Jaccard
    // self-join every propagation round (35s of a 72s bench).
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
    // localCcMaxPairs = 0 forces the DISTRIBUTED loop — this test pins that
    // path's plan shape (the hybrid driver path has no plan to pin)
    val comps = graft.operators.Dedup.componentsFromPairs(pairs, localCcMaxPairs = 0)
    val p = comps.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"labels not checkpoint-backed:\n${p.take(400)}")
    assert(!p.contains("Scan parquet"),
      "CC labels still re-execute the pair-generation DAG from the scan")
    spark.catalog.clearCache()
  }

  test("capped jaccard reads the rebuilt sorted-array frame from cache on all consumers (X2)") {
    // the filtered-universe (id, sh, n) frame feeds both prefix-posting
    // sides AND both verification joins — uncached each consumer re-runs
    // the explode, hot-set anti join, and collect_list rebuild; the persist
    // is load-bearing
    val p = plan("x2_jaccard_capped")
    val hits = "InMemoryTableScan".r.findAllIn(p).size
    assert(hits >= 3, s"expected the rebuilt-array cache on the prefix and " +
      s"verify consumers, found $hits cache scans")
    assert(p.contains("slice(sh"), "capped branch lost the prefix filter")
    spark.catalog.clearCache()
  }

  test("exact jaccard indexes only prefix shingles and verifies candidates with sorted_intersect_count (X2)") {
    // Prefix filtering is the uncapped branch's scale lever: the posting
    // explode must slice the sorted shingle array (never explode the whole
    // set), the candidate self-join must stay an equi hash join, and the
    // final similarity must come from exact intersection verification —
    // the allocation-free sorted_intersect_count merge (round 22; it
    // replaced size(array_intersect)) — not a full posting-count groupBy
    // over all shared shingles.
    val p = plan("x2_jaccard_pairs")
    assert(p.contains("slice(sh"), "posting explode is not prefix-sliced")
    assert(p.contains("sorted_intersect_count"), "candidate verification missing")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "jaccard join fell back to nested-loop")
  }

  test("grouped top-k partial-aggregates the heap; never the sort-all-rows window form (x12)") {
    val p = plan("x12_group_topk")
    assert(p.contains("partial_topk"),
      "top-k heap must map-side combine before the exchange")
    assert(!p.contains("Window"), "grouped top-k fell back to a window sort")
  }

  test("quantile-sketch build partial-aggregates map-side; rollup never rescans raw data (x6)") {
    val p = plan("x6_quantile_rollup")
    // the build must combine BEFORE the exchange — at 100 TB the shuffle
    // carries |cells| byte-packed sketch buffers, never raw values
    assert(p.contains("partial_quantile_sketch"),
      "sketch build must map-side combine before the exchange")
    assert(!p.contains("Window"), "sketch rollup fell back to a window sort")
    // percentile estimation happens on stored sketch rows only: both
    // rollups read the cached sketch table, not the raw events
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "rollups must read the stored sketch table, not rescan raw data")
  }

  test("windowed top-k / rollups partial-aggregate under the window grouping (r32)") {
    // the windowed forms must keep the same map-side-combine shape as
    // their global siblings — the window column is just one more group key,
    // never an excuse for a Window sort or a raw-row exchange
    val pt = plan("r32_spec_window_topk")
    assert(pt.contains("partial_topk"),
      "windowed top-k heap must map-side combine before the exchange")
    assert(!pt.contains("Window"), "windowed top-k fell back to a window sort")
    val pd = plan("r32_spec_window_distinct")
    assert(pd.contains("partial_hll_sketch_agg"),
      "windowed HLL build must map-side combine before the exchange")
    val pq = plan("r32_spec_window_quantile")
    assert(pq.contains("partial_quantile_sketch"),
      "windowed quantile build must map-side combine before the exchange")
  }

  test("native merge aggregate partial-combines the 150k-cell rollup (x6_quantile_merge)") {
    val p = plan("x6_quantile_merge")
    // both merge shapes (terminal estimate + bucketed resketch) must
    // partial-aggregate over CELLS map-side — the exchange carries merged
    // sketch buffers, never the full cell set to one partition
    assert(p.contains("partial_quantile_merge_estimate"),
      "merge-estimate must map-side combine over cells")
    assert(p.contains("partial_quantile_resketch"),
      "resketch level must map-side combine over cells")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "both merge paths must read the stored cell table, not rebuild it")
  }

  test("bucketed range join plans as an equi hash join, never the BETWEEN nested loop (x15)") {
    // the whole point of the bucketization: the containment predicate rides
    // an equi join on (bucket, key) as a post-join filter
    val p = plan("x15_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to nested-loop:\n${p.take(500)}")
  }

  test("semi join stays a hash semi join (q4)") {
    val p = plan("q4_order_priority")
    val semiIsHash = Seq("BroadcastHashJoin LeftSemi", "ShuffledHashJoin LeftSemi",
      "SortMergeJoin LeftSemi").exists(p.contains)
    assert(semiIsHash, s"semi join not a hash/merge join:\n${p.take(500)}")
  }

  test("anti join plans as a hash anti join, never NOT-IN nested loop (q22)") {
    // the 1-row scalar-aggregate broadcast cross IS a BNLJ by design; the
    // pin is that the ANTI join itself stays a hash/merge equi join
    val p = plan("q22_no_orders")
    val antiIsHash = Seq("BroadcastHashJoin LeftAnti", "ShuffledHashJoin LeftAnti",
      "SortMergeJoin LeftAnti").exists(p.contains)
    assert(antiIsHash, s"anti join not a hash/merge join:\n${p.take(500)}")
    assert(!p.contains("BroadcastNestedLoopJoin LeftAnti"),
      "anti join fell back to nested loop")
  }

  test("salted join's key join stays an equi hash/merge join (x13)") {
    // the 8-row salt replication cross is a BNLJ by design; the pin is the
    // (key, salt) join itself
    val p = plan("x13_salted_join")
    val mainIsEqui = Seq("BroadcastHashJoin Inner", "ShuffledHashJoin Inner",
      "SortMergeJoin Inner").exists(p.contains)
    assert(mainIsEqui, s"salted key join not an equi join:\n${p.take(500)}")
  }

  test("plan sweep: NO query plans a nested-loop or cartesian join except the documented crosses") {
    // The global 100 TB guard: an accidental BroadcastNestedLoopJoin is the
    // classic silent scale-killer (a refactor drops an equi-key and the
    // query still passes at sf0.001). Every BNLJ below is a deliberate,
    // bounded cross:
    //   q22_no_orders         1-row scalar-aggregate broadcast cross
    //   q11_important_stock   1-row corpus-average broadcast cross
    //   x5_tfidf              1-row corpus-count (idf denominator) cross
    //   x13_salted_join       k-row salt-replication cross
    //   x3_knn_exact          corpus × broadcast-query-set scan (exact path)
    //   x3_knn_quantized      same scan on the int8 sketch (exact re-rank)
    //   x3_sql_knn            same, via the SQL surface
    //   r28_spec_knn          the x3_knn_exact scan declared from JSON
    //   r28_spec_knn_quantized  the x3_knn_quantized scan from JSON
    //   x3_cosine_pairs_exact intentional all-pairs oracle twin
    //   x2_jaccard_char       1-row broadcast hot-shingle-set cross
    //                         (array_except rebuild; guarded by
    //                         Dedup.MaxBroadcastHotSet)
    //   x29_drift_heavy       two 1-row per-side-total broadcast crosses
    //   r36_spec_drift_gate   same crosses through the config path
    //   (x29_drift_hist needs NO cross: its totals and bin rows both come
    //    off one collect_list'd aggregate row)
    // (x29_drift_heavy / r36_spec_drift_gate left this list in round 20:
    // heavyHitterDrift's per-side totals now fold into the recount pass —
    // a window sum over the tiny counts frame — so the one-row broadcast
    // crosses are gone from the plan entirely)
    val allowedBnlj = Set("q22_no_orders", "q11_important_stock", "x5_tfidf",
      "x13_salted_join",
      // x3_ann_ivf left this list in round 13: centroid assignment and
      // query probing now go through the NearestCells reference-object
      // expression (map-side projections, no join at all)
      "x3_knn_exact", "x3_knn_quantized", "x3_sql_knn",
      "r28_spec_knn", "r28_spec_knn_quantized",
      // the stored-index quantized route: the same corpus-sized × broadcast-
      // query-set not-equal scan as x3_knn_quantized, reading the int8
      // sketch from the knn_index artifact instead of quantizing per call
      "r44_spec_knn_index",
      // the APPENDED quantized index searched through the same route —
      // identical not-equal candidate scan, postings now spanning two
      // committed generations
      "r47_spec_knn_append",
      // the COMPACTED quantized index: the same not-equal candidate scan
      // over the folded single-generation postings
      "r49_spec_knn_compact",
      // the TOMBSTONED quantized index: the same candidate scan with the
      // broadcast takedown anti-join applied to the live postings
      "r51_spec_knn_delete",
      // the ATTRIBUTE-FILTERED routes: the same candidate scan over the
      // filter-pruned postings (stored) / pre-filtered frame (direct)
      "r52_spec_knn_filtered", "r52_spec_knn_filtered_exact",
      // the GLOBAL percentile monitor attaches its ONE-row broadcast
      // baseline via a condition-form left join (the q11/q15 one-row
      // cross shape — a BNLJ against exactly one row)
      "r52_spec_quantile_monitor_global",
      // the GLOBAL batch percentile drift: a one-row x one-row broadcast
      // cross of the two global rollups — the same sanctioned shape
      "r53_spec_drift_quantile_global",
      // the MASS-TOMBSTONED quantized index (shuffle and broadcast
      // anti-join routes) and the PER-CATEGORY routed search: the same
      // candidate scan class downstream of the tombstone screen / over
      // the sub-index's postings
      "r54_spec_knn_mass_delete", "r54_spec_knn_mass_delete_bcast",
      "r54_spec_knn_per_category", "r54_spec_knn_category_residual",
      "x3_cosine_pairs_exact", "x2_jaccard_char")
    // one planning pass per query: record who plans a BNLJ, then derive
    // both the offender list and the whitelist-staleness check from it
    // (re-planning the whitelisted queries would re-run their eager work
    // and leak their registered caches)
    val bnljByQuery = Queries.all.keys.toSeq.sorted.map { name =>
      val p = plan(name)
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
      (name, p.contains("BroadcastNestedLoopJoin"), p.contains("CartesianProduct"))
    }
    val offenders = bnljByQuery.collect {
      case (name, bnlj, cart) if (bnlj && !allowedBnlj.contains(name)) || cart => name
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian joins in: $offenders")
    // the whitelist must not rot: entries that no longer plan a BNLJ should
    // be removed so the guard stays tight
    val stale = allowedBnlj -- bnljByQuery.collect { case (n, true, _) => n }.toSet
    assert(stale.isEmpty, s"whitelisted queries no longer plan a BNLJ: $stale")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val df = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), s"scan reads pruned columns: $readSchema")
  }
}
