package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection (X2's streaming path): MinHash-LSH
  * candidate pairs across micro-batches, with the LSH bucket index held in
  * Structured Streaming keyed state.
  *
  * Shape: each incoming doc is sketched map-side (the same
  * `minhash_signature` native expression as the batch path) and exploded to
  * its `bands` (band, bucket) keys; `flatMapGroupsWithState` keyed by
  * (band, bucket) keeps the signatures previously seen in that bucket and
  * emits an estimated-Jaccard-verified DIRECTED match (arriving doc →
  * prior doc) for every new⇆prior collision at or above `threshold`
  * ([[nearDupMatches]]; [[nearDupPairs]] is the undirected normalized
  * view). A doc arriving in a later batch is therefore
  * checked against the WHOLE streamed history (bounded by TTL/cap), not
  * just its own micro-batch — the semantics a corpus-ingest dedup needs.
  *
  * 100 TB posture and its knobs:
  *  - state size ∝ occupied buckets × min(occupants, `maxBucketDocs`) ×
  *    (8 + 8·numHashes) bytes, sharded by Spark's state store across
  *    executors (RocksDB provider for large state — see DEPLOY.md);
  *  - `maxBucketDocs` is the streaming form of [[Dedup.capBuckets]]: a
  *    degenerate bucket stops absorbing new signatures at the cap (first
  *    `cap` docs by arrival win; later members still pair through their
  *    OTHER bands — the same documented recall trade as the batch cap);
  *  - `stateTtl` expires buckets idle longer than the TTL (processing-time),
  *    bounding state for unbounded streams; 0 keeps state forever (backstop:
  *    the cap still bounds each bucket).
  *
  * Output notes: a pair colliding in several bands emits once per colliding
  * band (same as the batch candidate stream before its dropDuplicates — an
  * exchange Spark forbids downstream of arbitrary stateful ops in the same
  * query anyway); sinks needing exactly-once pairs dedup in their own query
  * or batch step. [[nearDupMatches]] rows are DIRECTED — (arriving doc,
  * prior doc), no id-order guarantee; only [[nearDupPairs]] normalizes to
  * id1 < id2. Within a batch, bucket members are processed in ascending id
  * order, so same-batch pairs and cap admission are deterministic.
  */
object StreamingDedup {

  /** TTL-bounded streaming exact dedup: keep the FIRST arrival per distinct
    * `dupColumns` group, suppress later duplicates, and FORGET a group after
    * `stateTtl` of inactivity (idle TTL — any arrival, emitted or
    * suppressed, refreshes it). A duplicate arriving after expiry re-emits:
    * that is the deal a bounded-state dedup makes, in exchange for state
    * ∝ groups ACTIVE within the TTL instead of every group ever seen (the
    * unbounded `Dedup.exact` streaming form's commitment).
    *
    * Emission is Append (each emitted row is final — first arrival wins),
    * unlike the unbounded form's per-group changelog in Update mode. Within
    * a micro-batch the min-`tieBreak` row of the group wins
    * (deterministic); across batches arrival order decides, so the two
    * forms converge when arrival follows tieBreak order.
    */
  def exactFirstArrival(df: DataFrame, dupColumns: Seq[String], tieBreak: String,
      stateTtl: String): DataFrame = {
    require(dupColumns.nonEmpty, "exactFirstArrival requires dupColumns")
    require(Option(stateTtl).exists(_.trim.nonEmpty),
      "exactFirstArrival requires a stateTtl (use Dedup.exact for the " +
        "unbounded history-wide form)")
    // tieBreak is only read inside the per-group lambda (row.getAs), so a
    // typo would otherwise start the query cleanly and kill it on the
    // first non-empty group's executor task — fail at START time like
    // every other streaming entry point's column check
    require(df.columns.contains(tieBreak),
      s"exactFirstArrival tieBreak '$tieBreak' is not a column of the " +
        s"frame (columns: ${df.columns.mkString(", ")})")
    import org.apache.spark.sql.Row
    implicit val strEnc = org.apache.spark.sql.Encoders.STRING
    implicit val boolEnc = org.apache.spark.sql.Encoders.scalaBoolean
    // group key as canonical JSON of the dup columns — deterministic across
    // partitions/batches, null-safe (struct fields keep their slot)
    val keyed = df.withColumn("__dupkey",
      to_json(struct(dupColumns.map(col): _*)))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(keyed.schema))
    // nulls-last Comparable ordering over the tieBreak value — the same
    // min-tieBreak winner rule as Dedup.exact, per micro-batch
    val tieOrd: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _)    => 1
        case (_, null)    => -1
        case (x, y)       => x.asInstanceOf[Comparable[Any]].compareTo(y)
      }
    }
    keyed.groupByKey(_.getAs[String]("__dupkey"))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            // the group function being invoked at all is what lets the TTL
            // refresh — setTimeoutDuration does it; the suppressed rows'
            // iterator need not (and should not) be consumed
            state.setTimeoutDuration(stateTtl)
            Iterator.empty
          } else {
            val winner = rows.minBy(_.getAs[Any](tieBreak))(tieOrd)
            state.update(true)
            state.setTimeoutDuration(stateTtl)
            Iterator.single(winner)
          }
      }
      .drop("__dupkey")
  }

  /** One doc's membership in one LSH bucket. */
  private[streaming] case class BandRow(band: Int, bucket: Long, id: Long, sig: Array[Long])

  /** A signature remembered in bucket state. */
  private[streaming] case class SeenDoc(id: Long, sig: Array[Long])

  /** A verified candidate pair (est. Jaccard from signature agreement). */
  case class NearDupPair(id1: Long, id2: Long, estJaccard: Double)

  /** A DIRECTED match: the arriving doc `id` collided with the previously
    * seen `dupOf`. The direction is what an ingest-dedup consumer needs
    * (`id` is the redundant new arrival; `dupOf` its prior); [[NearDupPair]]
    * is the same stream normalized to id1 < id2.
    */
  case class NearDupMatch(id: Long, dupOf: Long, estJaccard: Double)

  /** Undirected pair view of [[nearDupMatches]] (id1 < id2). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5, maxBucketDocs: Int = 64,
      stateTtl: String = null): Dataset[NearDupPair] = {
    val ss = docs.sparkSession
    import ss.implicits._
    nearDupMatches(docs, idCol, textCol, shingleSize, numHashes, bands,
      threshold, maxBucketDocs, stateTtl)
      .map(m => NearDupPair(math.min(m.id, m.dupOf), math.max(m.id, m.dupOf),
        m.estJaccard))
  }

  /** @param docs       streaming (or batch) frame with `idCol` (long) and `textCol`
    * @param threshold  minimum signature-estimated Jaccard to emit
    * @param maxBucketDocs cap on signatures remembered per bucket (skew guard)
    * @param stateTtl   e.g. "2 hours": drop buckets idle that long; null/empty = keep forever
    */
  def nearDupMatches(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5, maxBucketDocs: Int = 64,
      stateTtl: String = null): Dataset[NearDupMatch] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    require(maxBucketDocs > 0, "maxBucketDocs must be positive")
    val ss = docs.sparkSession
    import ss.implicits._
    val r = numHashes / bands
    // identical sketch + banding arithmetic to Dedup.minhashCandidates —
    // a batch backfill and the streaming ingest land in the SAME buckets.
    // Null-text docs yield a NULL sig; unlike the batch path (where
    // explode(null) drops them) the banded select here explodes a constant
    // sequence, so they would ride through as sig=null rows, poison bucket
    // state, and NPE on the next comparison — filter them out up front.
    val banded = Dedup.minhashSignatures(docs, idCol, textCol, shingleSize, numHashes)
      .filter(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("band").cast("int").as("band"),
        hash(col("band"), expr(s"slice(sig, band * $r + 1, $r)")).cast("long").as("bucket"),
        col("id"), col("sig"))
      .as[BandRow]
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    // NoTimeout unless a TTL is actually requested: declaring
    // ProcessingTimeTimeout makes the engine schedule continuous no-data
    // batches to evaluate timers — a busy-loop (thousands of empty commits
    // per minute) when nothing ever times out
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[Seq[SeenDoc], NearDupMatch](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state: GroupState[Seq[SeenDoc]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(Seq.empty)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupMatch]
            // ascending id: same-batch pair emission and cap admission are
            // order-independent of Spark's group iteration
            rows.toSeq.sortBy(_.id).foreach { row =>
              // a redelivered id (at-least-once replay, same-batch dup) must
              // neither re-pair against history nor burn a second cap slot —
              // its signature is identical on replay, so skipping is safe
              val replay = seen.exists(_.id == row.id)
              if (!replay) {
                seen.foreach { prior =>
                  if (prior.sig.length == row.sig.length) {
                    var agree = 0; var i = 0
                    while (i < row.sig.length) {
                      if (row.sig(i) == prior.sig(i)) agree += 1
                      i += 1
                    }
                    val est = agree.toDouble / numHashes
                    if (est >= threshold)
                      out += NearDupMatch(row.id, prior.id, est)
                  }
                }
                if (seen.size < maxBucketDocs) seen = seen :+ SeenDoc(row.id, row.sig)
              }
            }
            state.update(seen)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
