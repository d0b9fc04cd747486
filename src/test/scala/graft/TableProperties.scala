package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.sources.Tables

/** Property-style checks of the KTable materialization (R2): the Spark
  * latest-per-key view must equal a naive per-key reduce over arbitrary
  * changelogs, including duplicate keys, duplicate order values (tie-break),
  * and single-row keys.
  */
class TableProperties extends SparkSuite {

  private val changelogGen: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.chooseNum(1, 200)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 20L)     // few keys → many duplicates
      ts <- Gen.chooseNum(0L, 50L)    // coarse ts → ties likely
      id <- Gen.chooseNum(0L, 1000L)  // tie-break
      v <- Gen.alphaStr.map(_.take(5))
    } yield (k, ts, id, v))
  } yield rows

  test("latest-per-key equals the naive per-key max over random changelogs") {
    val seeds = org.scalacheck.rng.Seed(42L)
    var s = seeds
    for (_ <- 1 to 20) {
      val rows = changelogGen.apply(Gen.Parameters.default, s).get
      s = s.next
      val df = spark.createDataFrame(rows).toDF("k", "ts", "id", "v")
      val got = Tables.latestPerKey(df, Seq("k"), Seq("ts", "id"))
        .select("k", "ts", "id", "v").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val expected = rows.groupBy(_._1).map { case (k, g) =>
        val (_, ts, id, v) = g.maxBy(r => (r._2, r._3, r._4))
        // note: the naive max must tie-break on the SAME columns the view
        // uses — if (ts, id) has duplicates with different v, the winner is
        // undefined; restrict comparison to keys with a unique (ts, id) max
        k -> (ts, id, v)
      }
      val uniqueMax = rows.groupBy(_._1).collect {
        case (k, g) if g.count(r => (r._2, r._3) == { val m = g.maxBy(x => (x._2, x._3)); (m._2, m._3) }) == 1 => k
      }.toSet
      for (k <- uniqueMax) {
        assert(got(k)._1 == expected(k)._1 && got(k)._2 == expected(k)._2,
          s"key $k: got ${got(k)}, expected ${expected(k)}")
      }
      assert(got.keySet == rows.map(_._1).toSet)
    }
  }
}
