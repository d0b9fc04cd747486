package graft

// TEMPORARY phase probe for round 22 — deleted before round close.
// Times individual phases of the heavy bench chains with the noop sink
// (guide §1.4) so the per-verb cost is visible. Not part of the driver
// contract; never run by Bench/Verify.

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object R22Probe {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()


  private def concurrently(tasks: (() => Unit)*): Unit = {
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = tasks.map { t =>
      val th = new Thread(() => {
        try t() catch { case e: Throwable => failure.compareAndSet(null, e) }
      })
      th.start(); th
    }
    threads.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }

  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val what = sys.env.getOrElse("R22_PROBE", "all")

    def clear(): Unit = {
      spark.catalog.clearCache()
      graft.operators.Dedup.releaseInternalCaches()
    }

    if (what == "all" || what.contains("jaccard")) {
      // ---- jaccardPairs phase split (x2_jaccard_pairs shape) ----
      for (rnd <- 1 to 2) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val sh = docs.select(col("doc_id").as("id"),
            graft.functions.HashFunctions.hashed_shingles(
              graft.operators.TextAnalysis.tokens(col("text")), 3).as("sh"))
          .withColumn("n", size(col("sh")))
          .withColumn("sh", array_sort(col("sh")))
        t(s"jacc r$rnd: shingle+sort frame (noop)") { noop(sh) }
        val sorted = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t(s"jacc r$rnd: materialize persisted frame") { sorted.count() }
        val threshold = 0.8
        val prefixLen =
          (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int") + lit(1))
        def pre(f: DataFrame) = f.select(col("id"), col("n"),
          explode(slice(col("sh"), lit(1), prefixLen)).as("h"))
        val cands = pre(sorted).as("a").join(pre(sorted).as("b"),
            col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
              greatest(col("a.n"), col("b.n")) * threshold <=
                least(col("a.n"), col("b.n")) + lit(1e-9))
          .select(col("a.id").as("id1"), col("b.id").as("id2"))
          .dropDuplicates("id1", "id2")
        t(s"jacc r$rnd: candidate join (noop)") { noop(cands) }
        val s1 = sorted.select(col("id").as("id1"), col("sh").as("sh1"), col("n").as("n1"))
        val s2 = sorted.select(col("id").as("id2"), col("sh").as("sh2"), col("n").as("n2"))
        val verified = cands.join(s1, "id1").join(s2, "id2")
          .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("n1") + col("n2") - col("inter")))
          .filter(col("jaccard") >= threshold)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        t(s"jacc r$rnd: + verification (noop)") { noop(verified) }
        clear()
        t(s"jacc r$rnd: full query (noop)") { noop(Queries.x2JaccardPairs(spark, dir)) }
        clear()
        t(s"char r$rnd: full x2_jaccard_char (noop)") { noop(Queries.x2JaccardChar(spark, dir)) }
        clear()
      }
    }

    if (what.contains("vjacc")) {
      // isolate the verification stage's cost components
      for (rnd <- 1 to 3) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val sorted = docs.select(col("doc_id").as("id"),
            graft.functions.HashFunctions.hashed_shingles(
              graft.operators.TextAnalysis.tokens(col("text")), 3).as("sh"))
          .withColumn("n", size(col("sh")))
          .withColumn("sh", array_sort(col("sh")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sorted.count()
        val threshold = 0.8
        val prefixLen =
          (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int") + lit(1))
        def pre(f: DataFrame) = f.select(col("id"), col("n"),
          explode(slice(col("sh"), lit(1), prefixLen)).as("h"))
        val cands = pre(sorted).as("a").join(pre(sorted).as("b"),
            col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
              greatest(col("a.n"), col("b.n")) * threshold <=
                least(col("a.n"), col("b.n")) + lit(1e-9))
          .select(col("a.id").as("id1"), col("b.id").as("id2"))
          .dropDuplicates("id1", "id2")
        val candsP = cands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t(s"vjacc r$rnd: candidates (count=${candsP.count()})") { () }
        val s1 = sorted.select(col("id").as("id1"), col("sh").as("sh1"), col("n").as("n1"))
        val s2 = sorted.select(col("id").as("id2"), col("sh").as("sh2"), col("n").as("n2"))
        t(s"vjacc r$rnd: verify joins, lit intersect") {
          noop(candsP.join(s1, "id1").join(s2, "id2")
            .withColumn("inter", lit(1))
            .select(col("id1"), col("id2"), col("inter")))
        }
        t(s"vjacc r$rnd: verify joins, array_intersect") {
          noop(candsP.join(s1, "id1").join(s2, "id2")
            .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
            .select(col("id1"), col("id2"), col("inter")))
        }
        t(s"vjacc r$rnd: verify joins, sorted_intersect_count") {
          noop(candsP.join(s1, "id1").join(s2, "id2")
            .withColumn("inter", graft.functions.HashFunctions
              .sorted_intersect_count(col("sh1"), col("sh2")))
            .select(col("id1"), col("id2"), col("inter")))
        }
        val fin = candsP.join(s1, "id1").join(s2, "id2")
          .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
          .select(col("id1"), col("id2"), col("inter"))
        noop(fin)
        if (rnd == 1) println(fin.queryExecution.executedPlan.toString.take(4000))
        clear()
      }
    }

    if (what.contains("shj")) {
      // A/B the shuffled-hash posture (preferSortMergeJoin=false +
      // adaptive.maxShuffledHashJoinLocalMapThreshold=64m) on join-heavy
      // queries at sf1: does the rewrite fire, and does it win?
      val names = Seq("q9_product_profit", "q18_large_orders", "q21_sole_blame",
        "q5_nation_revenue", "r03_global_join", "x13_salted_join",
        "r09_join_chain_multi", "q7_nation_volume")
      def setPosture(shj: Boolean): Unit = {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", (!shj).toString)
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
          if (shj) "64m" else "0")
      }
      for (rnd <- 1 to 3; shj <- Seq(false, true)) {
        setPosture(shj)
        for (nm <- names) {
          val df = Queries.all(nm)(spark, dir)
          val t0 = System.nanoTime()
          noop(df)
          val secs = (System.nanoTime() - t0) / 1e9
          val plan = df.queryExecution.executedPlan.toString
          val nSHJ = "ShuffledHashJoin".r.findAllIn(plan).size
          val nSMJ = "SortMergeJoin".r.findAllIn(plan).size
          println(f"[probe] shj r$rnd ${if (shj) "SHJ-on " else "SHJ-off"} " +
            f"$nm%-24s $secs%7.3f s  shj=$nSHJ smj=$nSMJ")
          clear()
        }
      }
    }

    if (what.contains("shjplan")) {
      // dump the FINAL (post-AQE) executed plans of the two rewrite
      // winners at sf1, one file per posture — plans/r22 evidence
      for ((nm, shj) <- Seq(("q5_nation_revenue", false), ("q5_nation_revenue", true),
          ("x13_salted_join", false), ("x13_salted_join", true))) {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", (!shj).toString)
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
          if (shj) "64m" else "0")
        val df = Queries.all(nm)(spark, dir)
        noop(df)
        val suffix = if (shj) "shj_on" else "shj_off"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r22/${nm}_sf1_$suffix.txt"),
          df.queryExecution.executedPlan.toString)
        clear()
      }
    }

    if (what == "all" || what.contains("knn")) {
      // ---- knn delete chain phase split (r51_spec_knn_delete shape) ----
      val base = Queries.artifactBase(dir)
      for (rnd <- 1 to 2) {
        t(s"knn-del r$rnd: fixtures (takedown + build)") {
          concurrently(
            () => spark.read.parquet(s"$dir/embeddings.parquet")
              .filter(col("vec_id") % 10 === 7).select(col("vec_id"))
              .write.mode("overwrite").parquet(s"$base/takedown_probe.parquet"),
            () => {
              val e = spark.read.parquet(s"$dir/embeddings.parquet")
              noop(graft.operators.Similarity.buildIndex(
                e.select(col("vec_id").as("id"), col("embedding").as("vec")),
                "id", "vec", "quantized", s"$base/knn_del_probe"))
            })
        }
        t(s"knn-del r$rnd: delete verb") {
          noop(graft.operators.Similarity.deleteIndex(
            spark.read.parquet(s"$base/takedown_probe.parquet"),
            "vec_id", s"$base/knn_del_probe"))
        }
        t(s"knn-del r$rnd: search") {
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          noop(graft.operators.Similarity.indexedTopK(
            e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
              col("embedding").as("qvec")),
            "qid", "qvec", 10, s"$base/knn_del_probe", refine = 4))
        }
        clear()
      }
      // compact chain (r49 shape): build + 2 appends + compact + search
      for (rnd <- 1 to 2) {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        val hi = e.agg(max(col("vec_id"))).head.getLong(0) + 1L
        val (c1, c2) = (hi / 3L, 2L * hi / 3L)
        t(s"knn-cmp r$rnd: build (1/3)") {
          noop(graft.operators.Similarity.buildIndex(
            e.filter(col("vec_id") < c1).select(col("vec_id").as("id"),
              col("embedding").as("vec")),
            "id", "vec", "quantized", s"$base/knn_cmp_probe"))
        }
        t(s"knn-cmp r$rnd: append b") {
          noop(graft.operators.Similarity.appendIndex(
            e.filter(col("vec_id") >= c1 && col("vec_id") < c2)
              .select(col("vec_id").as("id"), col("embedding").as("vec")),
            "id", "vec", s"$base/knn_cmp_probe"))
        }
        t(s"knn-cmp r$rnd: append c") {
          noop(graft.operators.Similarity.appendIndex(
            e.filter(col("vec_id") >= c2)
              .select(col("vec_id").as("id"), col("embedding").as("vec")),
            "id", "vec", s"$base/knn_cmp_probe"))
        }
        t(s"knn-cmp r$rnd: compact") {
          noop(graft.operators.Similarity.compactIndex(spark, s"$base/knn_cmp_probe"))
        }
        t(s"knn-cmp r$rnd: search") {
          noop(graft.operators.Similarity.indexedTopK(
            e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
              col("embedding").as("qvec")),
            "qid", "qvec", 10, s"$base/knn_cmp_probe", refine = 4))
        }
        clear()
      }
    }

    if (what == "all" || what.contains("shingle")) {
      val base = Queries.artifactBase(dir)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val hi = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
      val (c1, c2) = (hi * 3L / 5L, hi * 4L / 5L)
      for (rnd <- 1 to 2) {
        t(s"shg-cmp r$rnd: fixtures (3 writes)") {
          concurrently(
            () => graft.operators.Dedup.shingleIndex(
                docs.filter(col("doc_id") < c1), "doc_id", "text", 3)
              .write.mode("overwrite").parquet(s"$base/probe_shingles.parquet"),
            () => docs.filter(col("doc_id") >= c1 && col("doc_id") < c2)
              .write.mode("overwrite").parquet(s"$base/probe_docs_mid.parquet"),
            () => docs.filter(col("doc_id") >= c2)
              .write.mode("overwrite").parquet(s"$base/probe_docs_new.parquet"))
        }
        def fromBase(json: String): DataFrame =
          pipeline.Interpreter.values(pipeline.Interpreter.build(spark,
            graft.config.PipelineSpec.fromJson(json),
            new graft.sources.ParquetSourceResolver(base, graft.config.TestdataCatalog)))
        t(s"shg-cmp r$rnd: append verb") {
          noop(fromBase(
            s"""{"id":"probe-append","processingMode":"SIMPLE_STREAM",
               |"sourceTopic":{"name":"probe_docs_mid","keyClass":"java.lang.Long"},
               |"transform":[{"op":"shingle_index_append","column":"text",
               |  "idColumn":"doc_id","shingleSize":3,
               |  "historyPath":"$base/probe_shingles.parquet"}],
               |"outputTopic":{"enabled":true,"name":"probe-append-rep"}}""".stripMargin))
        }
        t(s"shg-cmp r$rnd: compact verb") {
          noop(fromBase(
            s"""{"id":"probe-compact","processingMode":"SIMPLE_STREAM",
               |"sourceTopic":{"name":"probe_docs_mid","keyClass":"java.lang.Long"},
               |"transform":[{"op":"shingle_index_compact",
               |  "historyPath":"$base/probe_shingles.parquet"}],
               |"outputTopic":{"enabled":true,"name":"probe-compact-rep"}}""".stripMargin))
        }
        t(s"shg-cmp r$rnd: screen verb") {
          noop(fromBase(
            s"""{"id":"probe-screen","processingMode":"SIMPLE_STREAM",
               |"sourceTopic":{"name":"probe_docs_new","keyClass":"java.lang.Long"},
               |"transform":[{"op":"dedup_near","method":"jaccard",
               |  "column":"text","idColumn":"doc_id",
               |  "shingleSize":3,"threshold":0.8,
               |  "historyPath":"$base/probe_shingles.parquet"}],
               |"outputTopic":{"enabled":true,"name":"probe-screen-out"}}""".stripMargin)
            .select("doc_id", "lang", "source", "n_chars"))
        }
        clear()
        // retract shape (r51): history + takedown + screen
        t(s"shg-rt r$rnd: fixtures (3 writes)") {
          concurrently(
            () => graft.operators.Dedup.shingleIndex(
                docs.filter(col("doc_id") < c2), "doc_id", "text", 3)
              .write.mode("overwrite").parquet(s"$base/probe_sh_rt.parquet"),
            () => docs.filter(col("doc_id") < c2 && col("doc_id") % 3 === 0)
              .select(col("doc_id"))
              .write.mode("overwrite").parquet(s"$base/probe_takedown.parquet"),
            () => docs.filter(col("doc_id") >= c2)
              .write.mode("overwrite").parquet(s"$base/probe_docs_rt.parquet"))
        }
        t(s"shg-rt r$rnd: retract verb") {
          noop(fromBase(
            s"""{"id":"probe-retract","processingMode":"SIMPLE_STREAM",
               |"sourceTopic":{"name":"probe_takedown","keyClass":"java.lang.Long"},
               |"transform":[{"op":"shingle_index_retract","idColumn":"doc_id",
               |  "historyPath":"$base/probe_sh_rt.parquet"}],
               |"outputTopic":{"enabled":true,"name":"probe-retract-rep"}}""".stripMargin))
        }
        t(s"shg-rt r$rnd: screen verb") {
          noop(fromBase(
            s"""{"id":"probe-screen-rt","processingMode":"SIMPLE_STREAM",
               |"sourceTopic":{"name":"probe_docs_rt","keyClass":"java.lang.Long"},
               |"transform":[{"op":"dedup_near","method":"jaccard",
               |  "column":"text","idColumn":"doc_id",
               |  "shingleSize":3,"threshold":0.8,
               |  "historyPath":"$base/probe_sh_rt.parquet"}],
               |"outputTopic":{"enabled":true,"name":"probe-screen-rt-out"}}""".stripMargin)
            .select("doc_id", "lang", "source", "n_chars"))
        }
        clear()
      }
    }

    if (what == "all" || what.contains("training")) {
      for (rnd <- 1 to 2) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val m = graft.operators.TextAnalysis.qualityMetrics(col("text")).toMap
        val filtered = docs.filter(m("n_tokens") >= 12 && round(m("avg_token_len"), 6).between(2.0, 12.0)).select("doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t(s"train r$rnd: quality filter (materialize)") { filtered.count() }
        val pairs = graft.operators.Dedup.jaccardPairs(filtered, "doc_id", "text",
          shingleSize = 3, threshold = 0.8)
        t(s"train r$rnd: + jaccard pairs (noop)") { noop(pairs) }
        val kept = graft.operators.Dedup.keepRepresentatives(filtered, "doc_id", pairs)
        t(s"train r$rnd: + keepReps (noop)") { noop(kept) }
        val chunks = graft.operators.TextAnalysis.chunk(kept, "doc_id", "text",
          size = 40, stride = 30)
        t(s"train r$rnd: + chunk (noop)") { noop(chunks) }
        clear()
        t(s"train r$rnd: full x14 (noop)") { noop(Queries.x14TrainingPipeline(spark, dir)) }
        clear()
        t(s"train r$rnd: full r22_spec_training (noop)") {
          noop(Queries.r22SpecTraining(spark, dir))
        }
        clear()
      }
    }
    spark.stop()
  }
}
