package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2B X3).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against the
  *    full corpus; one pass, no shuffle of the corpus itself. The correctness
  *    oracle, and at 100 TB still the right plan when queries ≪ corpus: the
  *    corpus is scanned once, map-side, and only (query, k) heads survive.
  *  - [[ivfTopK]] — IVF-style: partition the corpus into Voronoi cells around
  *    coarse centroids, probe only the closest `nProbe` cells per query
  *    (inverted-file indexing per Jégou et al. 2011, "Product quantization
  *    for nearest neighbor search" — coarse quantizer only, no PQ codes).
  *    Trades recall for a ~nProbe/nCells scan fraction.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. `queries` is expected
    * to be small (it is broadcast); ties break on neighbor id ascending for
    * determinism. Self-matches (same id) are excluded.
    *
    * The per-query top-k is a partial-aggregating [[graft.functions.TopK]]
    * heap, NOT a window sort: the corpus-sized scored relation never crosses
    * an exchange — each map partition ships at most k rows per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosine_sim(col("qv"), col("cv")))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rank0", "p")))
      .select(col("query_id"), (col("rank0") + 1).cast("int").as("rank"),
        col("p._2").as("neighbor_id"), col("p._1").as("cos"))
  }

  /** IVF (inverted-file) ANN: assign corpus vectors to their nearest coarse
    * centroid (map-side, centroids broadcast), then for each query scan only
    * the `nProbe` nearest cells. Centroids are taken deterministically from
    * the corpus (`id % step == 0` sample) — a stand-in for k-means that keeps
    * the pipeline fully deterministic; swap in trained centroids at will.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // Deterministic coarse centroids: first nCells corpus vectors by id order.
    // Collected to the driver — bounded at nCells rows, NOT a data-dependent
    // collect — so cell assignment below is a pure map-side expression over
    // the corpus: the 100 TB scan acquires its cell id with zero shuffles.
    val centroids: Array[(Long, Array[Double])] = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    def distTo(vec: Column, p: Array[Double]): Column =
      VectorFunctions.l2_dist(vec, array(p.map(lit): _*).cast("array<double>"))

    // argmin over the centroid literals, array-based: build the distance
    // vector once and index it — NOT a when/otherwise fold, which doubles
    // the expression tree per centroid (2^n nodes) and stalls codegen.
    // Ties → first (lowest-id) centroid, since array_position finds the
    // first occurrence and centroids are id-ordered.
    val cellIds = array(centroids.map(c0 => lit(c0._1)): _*)
    def nearestCell(vec: Column): Column = {
      val dists = array(centroids.map(c0 => distTo(vec, c0._2)): _*)
      element_at(cellIds, array_position(dists, array_min(dists)).cast("int"))
    }

    val assigned = c.withColumn("cell", nearestCell(col("cv")))

    // Query-side probing: queries are small; explode query × centroid and
    // rank to the nProbe closest cells.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val centroidDf = q.sparkSession.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")
    val probedScored = q.join(broadcast(centroidDf))
      .withColumn("d", VectorFunctions.l2_dist(col("qv"), col("centroid")))
    val wp = Window.partitionBy(col("query_id")).orderBy(col("d").asc, col("cell").asc)
    val probed = probedScored.withColumn("cr", row_number().over(wp))
      .filter(col("cr") <= nProbe).select(col("query_id"), col("qv"), col("cell"))

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosine_sim(col("qv"), col("cv")))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rank0", "p")))
      .select(col("query_id"), (col("rank0") + 1).cast("int").as("rank"),
        col("p._2").as("neighbor_id"), col("p._1").as("cos"))
  }

  /** All-pairs similarity above a threshold via hyperplane LSH (delegates to
    * Dedup.embeddingCosinePairs — same machinery, different intent).
    */
  def similarPairs(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double): DataFrame =
    Dedup.embeddingCosinePairs(emb, idCol, vecCol, dim, threshold = threshold)
}
