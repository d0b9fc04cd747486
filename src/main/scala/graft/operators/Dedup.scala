package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions}

/** Deduplication operators for LLM-data pipelines (SURVEY §2B X1/X2):
  * exact, exact-Jaccard, MinHash-LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale posture (the 100 TB contract):
  *  - exact dedup is one hash-partial-aggregated shuffle on the dedup key;
  *  - sketches (minhash/simhash) are computed map-side per row (native
  *    expressions, no shingle explosion into the exchange);
  *  - candidate generation shuffles only (id, band-key) pairs — tiny rows —
  *    and never materializes the O(n²) cross product;
  *  - verification joins only candidate pairs back to their sketches/sets.
  */
object Dedup {

  /** Exact dedup keeping a deterministic representative per duplicate group:
    * min tie-break column wins (X1). One shuffle, map-side combined.
    */
  def exact(df: DataFrame, dupCols: Seq[String], tieBreak: String): DataFrame = {
    val valueCols = df.columns.filterNot(c => dupCols.contains(c)).toSeq
    df.groupBy(dupCols.map(col): _*)
      .agg(min_by(struct(valueCols.map(col): _*), col(tieBreak)).as("__rep"))
      .select(dupCols.map(col) ++ valueCols.map(c => col(s"__rep.$c").as(c)): _*)
  }

  /** All pairs (id1 < id2) with exact Jaccard similarity ≥ threshold over
    * word shingles, via an inverted-index join: explode *distinct* shingles,
    * self-join the postings, count common shingles per pair, then
    * |∩| / (|a|+|b|-|∩|). No LSH approximation — this is the oracle-exact
    * variant; at extreme scale prefer [[minhashLshPairs]], which bounds the
    * explode to `bands` rows per doc instead of one per shingle.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, threshold: Double): DataFrame = {
    // Shingle identity is a 64-bit hash composed from per-token hashes —
    // the shingle string is never materialized, and the posting rows that
    // cross the exchange are fixed-width (id, n, hash) triples. At corpus
    // scale the shingle text never leaves the scan task. 64-bit collisions
    // are ~(|shingles|²/2⁶⁵) — negligible (and why hash(), which is 32-bit
    // murmur3, is NOT used here: at 10⁹ shingles it WOULD collide).
    val sh = docs
      .select(col(idCol).as("id"),
        HashFunctions.hashed_shingles(TextAnalysis.tokens(col(textCol)), shingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
    val posts = sh.select(col("id"), col("n"), explode(col("sh")).as("h"))
    val a = posts.as("a"); val b = posts.as("b")
    val common = a.join(b, col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("inter"))
    common
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash + LSH banding near-dup candidates, verified by signature-estimated
    * Jaccard (X2 scale path). MinHash resemblance estimation per Broder (1997,
    * "On the resemblance and containment of documents"); banding scheme per
    * Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3. `numHashes = bands * rowsPerBand`. Docs sharing
    * ≥1 identical band land in one bucket; each doc contributes exactly
    * `bands` shuffle rows regardless of length.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sigs = docs.select(col(idCol).as("id"),
      HashFunctions.minhash_from_hashes(
        HashFunctions.hashed_shingles(TextAnalysis.tokens(col(textCol)), shingleSize),
        numHashes).as("sig"))
    // Candidate generation shuffles ONLY (id, band, bucket) triples — the
    // 128-long signature never rides through the self-join exchange. The
    // signatures come back via two narrow hash joins on the (deduped, tiny)
    // candidate set. This is the shape that holds at 100 TB: bucket rows are
    // 20 bytes regardless of document size.
    val banded = sigs.select(col("id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("sig"))
      .select(col("id"), col("band"),
        hash(col("band"), expr(s"slice(sig, band * $r + 1, $r)")).as("bucket"))
    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .dropDuplicates("id1", "id2")
    val s1 = sigs.select(col("id").as("id1"), col("sig").as("sig1"))
    val s2 = sigs.select(col("id").as("id2"), col("sig").as("sig2"))
    cands.join(s1, "id1").join(s2, "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** SimHash near-dup: 64-bit sketch, pigeonhole banding into 4×16-bit chunks
    * (Hamming distance ≤ 3 ⇒ at least one chunk identical), Hamming-verified.
    * Charikar (2002, "Similarity estimation techniques from rounding
    * algorithms"); chunk-pigeonhole candidate scheme per Manku et al. (2007,
    * "Detecting near-duplicates for web crawling").
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      HashFunctions.simhash64(TextAnalysis.tokens(col(textCol))).as("sim"))
    val banded = sh.select(col("id"), col("sim"),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("bucket",
        expr("shiftrightunsigned(sim, chunk * 16)").bitwiseAND(lit(0xFFFFL)))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        HashFunctions.hamming64(col("a.sim"), col("b.sim")).as("hamming"))
      .dropDuplicates("id1", "id2")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup via multi-table random-hyperplane (sign) LSH,
    * cosine-verified. OR-amplification: `nTables` independent tables of
    * `planesPerTable` hyperplanes each — a pair collides if it shares ANY
    * table's bucket, so recall at target cosine c is
    * 1 − (1 − (1 − θ(c)/π)^b)^L instead of the single-table (1 − θ/π)^b
    * (random-hyperplane collision probability, Charikar 2002; multi-table
    * OR-amplification per Indyk–Motwani 1998).
    * Candidate rows through the shuffle are (id, table, bucket) — vectors
    * rejoin only on the deduped candidate set (same discipline as MinHash).
    * Hyperplanes derive deterministically from `seed`.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, nTables: Int = 16, planesPerTable: Int = 4,
      threshold: Double = 0.95, seed: Long = 42L): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val tables = (0 until nTables).map { t =>
      hyperplanes(dim, planesPerTable, seed + t * 7919)
    }
    val bucketArr = array(tables.map(p => signBucket(col("v"), p)): _*)
    val banded = e.select(col("id"), posexplode(bucketArr).as(Seq("tbl", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b, col("a.tbl") === col("b.tbl") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .dropDuplicates("id1", "id2")
    cands
      .join(e.select(col("id").as("id1"), col("v").as("v1")), "id1")
      .join(e.select(col("id").as("id2"), col("v").as("v2")), "id2")
      .select(col("id1"), col("id2"),
        VectorFunctions.cosine_sim(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Collapse near-duplicate PAIRS into clusters and keep one representative
    * per cluster (the min id) — the "connected-components keep-one" step that
    * turns pair detection into an actual dedup (SURVEY §2B X2).
    *
    * Min-label propagation over the (symmetric) edge list: every node starts
    * labeled with its own id; each round, a node's label becomes the min of
    * its own and its neighbors'; converges in O(cluster diameter) rounds.
    * Each round is two hash joins + one partial-aggregated groupBy — no
    * driver-side data, only a bounded driver loop with an early-exit
    * convergence check (dup clusters are shallow: diameter ≤ ~log n in
    * practice, and `maxIters` caps pathological chains).
    */
  def componentsFromPairs(pairs: DataFrame, maxIters: Int = 15): DataFrame = {
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("comp", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id0")).agg(min(col("comp")).as("ncomp"))
      val updated = labels.join(neighborMin, labels("id") === col("id0"), "left_outer")
        .select(col("id"), least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .cache()
      val changed = updated.join(labels.withColumnRenamed("comp", "old"), "id")
        .filter(col("comp") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Drop all but one representative per near-dup cluster: rows whose id is
    * a cluster's min label survive; rows not in any pair survive untouched.
    */
  def keepRepresentatives(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = componentsFromPairs(pairs)
    val losers = comps.filter(col("id") =!= col("comp")).select(col("id").as("__loser"))
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /** Deterministic pseudo-random unit hyperplanes (driver-side, tiny). */
  private[operators] def hyperplanes(dim: Int, n: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(n) {
      val v = Array.fill(dim)(rng.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
  }

  /** Pack sign(v·p_i) bits into an int bucket id. */
  private[operators] def signBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = VectorFunctions.vec_dot(vec,
        array(p.map(x => lit(x)).toSeq: _*).cast("array<double>"))
      when(dot >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
