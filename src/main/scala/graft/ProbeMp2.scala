package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions
import graft.operators.Dedup

/** Stage-by-stage wall profile of the multi-probe embedding-LSH pair
  * pipeline (dev/ops tool): times the banded build, the raw candidate
  * join, the dedup exchange, and the verify join separately for one
  * declared geometry — the measurement behind the round-13 candidate-path
  * ordering decision.
  *
  * usage: runMain graft.ProbeMp2 [sfDir] [b] [T] [L]
  */
object ProbeMp2 {
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
      System.err.println(f"[probe-mp2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("banded build+count")(banded.count())
    val est = timed("occupancy estPairs") {
      val r = banded.groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - lit(1)) / lit(2)).cast("long")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    System.err.println(s"[probe-mp2] estPairs=$est")
    val a = banded.as("a"); val bb = banded.as("b")
    val candsRaw = a.join(bb, col("a.tbl") === col("b.tbl") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    timed("raw candidate join count")(candsRaw.count())
    val dedupParts = math.max(32L, math.min(4096L, est / 2000000L)).toInt
    val deduped = candsRaw.repartition(dedupParts, col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
    timed("repartition+dedup count")(deduped.count())
    val dedupedPlain = candsRaw.dropDuplicates("id1", "id2")
    timed("plain dropDuplicates count")(dedupedPlain.count())
    val verified = deduped
      .join(broadcast(e.select(col("id").as("id1"), col("v").as("v1"))), "id1")
      .join(broadcast(e.select(col("id").as("id2"), col("v").as("v2"))), "id2")
      .select(col("id1"), col("id2"),
        VectorFunctions.cosine_sim(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
    timed("verify join count")(verified.count())
    // verify-before-dedup ordering: map-side cosine on RAW candidates,
    // then dedup only the survivors
    val verifyFirst = candsRaw
      .join(broadcast(e.select(col("id").as("id1"), col("v").as("v1"))), "id1")
      .join(broadcast(e.select(col("id").as("id2"), col("v").as("v2"))), "id2")
      .select(col("id1"), col("id2"),
        VectorFunctions.cosine_sim(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id1", "id2")
    timed("verify-first total count")(verifyFirst.count())
    banded.unpersist()
    spark.stop()
  }
}
