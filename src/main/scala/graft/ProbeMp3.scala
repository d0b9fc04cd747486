package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions, VectorTable}
import graft.operators.Dedup

/** A/B wall-clock probe for the embed-dup broadcast-branch verify: the
  * SHIPPED two-BroadcastHashJoin exact-cosine verify vs a fused
  * [[graft.functions.PairCosine]] reference-object lookup, over the SAME
  * multi-probe candidate stream — plus a result-equality check. This is
  * the measurement record behind the round-13 decision to KEEP the join
  * form; the fused path and two other shapes were built, measured, and
  * rejected.
  *
  * Probe geometry (b=13, T=3, L=93, ~500M raw candidates, sf3, quiet,
  * end-to-end leg incl. the shared banded build): join-verify 20–25 s,
  * fused 17–19 s, identical 825,718-pair output — the fused form LOOKS
  * ~3 s faster here because the probe builds its [[VectorTable]] once
  * outside the timed legs while each join leg rebuilds its two broadcasts.
  * At the OPERATOR level (auto-sized b=12/T=4/L=41, table collected inside
  * the construction like a real caller), the order reverses: join form
  * 14.4 s min vs fused 16.1 s min at sf3. Root cause of the wrong
  * hypothesis: with a DENSE long id key, Spark's broadcast side is a
  * LongHashedRelation — the per-candidate probe is a primitive dense-array
  * index and codegen reads vector elements straight from the broadcast's
  * packed bytes (zero row copies between the two joins) — so the join
  * verify was already at the fused form's cost, and the fused form's
  * single-threaded driver collect (~1–2 s vs the executor-parallel
  * broadcast build it replaces) is a pure regression.
  *
  * Two more REJECTED shapes, measured at the probe geometry:
  *  - collect_list per bucket + a pair-emitting Generator (candidates
  *    never materialize as rows): 37–45 s — collect_list's
  *    ObjectHashAggregate falls back to sort-based aggregation past 128
  *    in-memory groups (~700k bucket groups here), costing more than the
  *    SortMergeJoin it replaced;
  *  - groupByKey + flatMapGroups with the in-bucket pair loop (one shuffle
  *    instead of two): 16–18 s — tied; the typed-API encode/decode eats
  *    the exchange it saves.
  * Conclusion: the leg is bounded by the banded build+shuffle and the
  * irreducible per-candidate cosine; none of the alternative verify
  * shapes beats the broadcast-join form a real caller gets today.
  *
  * usage: runMain graft.ProbeMp3 [sfDir] [b] [T] [L]
  */
object ProbeMp3 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata_sf3")
    val b = args.lift(1).map(_.toInt).getOrElse(13)
    val t = args.lift(2).map(_.toInt).getOrElse(3)
    val l = args.lift(3).map(_.toInt).getOrElse(93)
    val spark = GraftSession.get()
    val threshold = 0.4
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe-mp3] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
      r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val planes: Seq[Seq[Double]] = (0 until l).flatMap { tt =>
      Dedup.hyperplanes(64, b, 42L + tt * 7919).map(_.toSeq)
    }
    val stride = 1 + t
    val banded = e.select(col("id"),
        posexplode(VectorFunctions.sign_buckets_multiprobe(col("v"), planes, b, t))
          .as(Seq("pos", "bucket")))
      .select(col("id"), (col("pos") / lit(stride)).cast("int").as("tbl"), col("bucket"))
    val a = banded.as("a"); val bb = banded.hint("shuffle_merge").as("b")
    val candsRaw = a.join(bb, col("a.tbl") === col("b.tbl") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    val joinVerify = candsRaw
      .join(broadcast(e.select(col("id").as("id1"), col("v").as("v1"))), "id1")
      .join(broadcast(e.select(col("id").as("id2"), col("v").as("v2"))), "id2")
      .select(col("id1"), col("id2"),
        VectorFunctions.cosine_sim(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id1", "id2")
    val table = timed("table collect+build") {
      VectorTable(e.collect().map { r =>
        val vec = r.getSeq[Any](1).iterator.map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
        (r.getLong(0), vec)
      })
    }
    val fusedVerify = candsRaw
      .select(col("id1"), col("id2"),
        VectorFunctions.pair_cosine(col("id1"), col("id2"), table).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id1", "id2")
    for (round <- 1 to 2) {
      timed(s"join-verify count r$round")(joinVerify.count())
      timed(s"fused-verify count r$round")(fusedVerify.count())
    }
    val nj = joinVerify.count()
    val diff = joinVerify.select("id1", "id2")
      .exceptAll(fusedVerify.select("id1", "id2")).count() +
      fusedVerify.select("id1", "id2")
        .exceptAll(joinVerify.select("id1", "id2")).count()
    System.err.println(s"[probe-mp3] pairs=$nj symmetric-diff=$diff " +
      (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    spark.stop()
  }
}
