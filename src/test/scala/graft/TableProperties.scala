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

  test("streaming latest-per-key: composite keys with separator-ish content never collide") {
    // ["a b","c"] vs ["a","b c"] (and ';'/':'-laden values) must stay
    // distinct groups — the round-1 encoding joined parts with a separator
    // a key value could contain.
    val rows = Seq(
      ("a b", "c", 1L, "v1"), ("a", "b c", 2L, "v2"),
      ("x;1:", "y", 3L, "v3"), ("x", ";1:y", 4L, "v4"),
      ("a b", "c", 5L, "v5"))
    val df = spark.createDataFrame(rows).toDF("k1", "k2", "ord", "v")
    val got = graft.streaming.StreamingTables.latestPerKey(df, Seq("k1", "k2"), Seq("ord"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getString(3))).toMap
    assert(got.size == 4, s"collided groups: $got")
    assert(got(("a b", "c")) == "v5" && got(("a", "b c")) == "v2" &&
      got(("x;1:", "y")) == "v3" && got(("x", ";1:y")) == "v4")
  }

  test("streaming latest-per-key: null order values lose deterministically (nulls first)") {
    val rows: Seq[(Long, java.lang.Long, String)] =
      Seq((1L, null, "null-first"), (1L, 5L, "winner"), (1L, null, "null-late"),
        (2L, null, "only-null-a"), (2L, null, "only-null-b"))
    val df = spark.createDataFrame(rows).toDF("k", "ord", "v")
    val got = graft.streaming.StreamingTables.latestPerKey(df, Seq("k"), Seq("ord"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got(1L) == "winner") // any non-null order beats every null
    // all-null group: SOME row wins (arrival-order semantics, like a
    // changelog with no usable order) — the fix is that nulls can no longer
    // beat a real order value, not that ties become ordered.
    assert(Set("only-null-a", "only-null-b").contains(got(2L)))
  }

  test("streaming latest-per-key: null KEY values are distinct from the string \"null\"") {
    val rows: Seq[(java.lang.Long, Long, String)] =
      Seq((null, 1L, "null-key"), (4L, 2L, "four"))
    val df = spark.createDataFrame(rows).toDF("k", "ord", "v")
      .withColumn("k", org.apache.spark.sql.functions.col("k").cast("string"))
    val withLiteral = df.union(
      spark.createDataFrame(Seq(("null", 3L, "literal-null-string"))).toDF("k", "ord", "v"))
    val got = graft.streaming.StreamingTables.latestPerKey(withLiteral, Seq("k"), Seq("ord"))
      .collect().map(r => (Option(r.getString(0)), r.getString(2))).toMap
    assert(got.size == 3)
    assert(got(None) == "null-key" && got(Some("null")) == "literal-null-string")
  }

  test("history view: contiguous validity intervals per key, open-ended current version") {
    val rows = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (2L, 5L, "x"))
    val df = spark.createDataFrame(rows).toDF("k", "ord", "v")
    val h = Tables.historyPerKey(df, Seq("k"), "ord")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(h == Seq(
      (1L, 10L, "a", 10L, Some(20L)),
      (1L, 20L, "b", 20L, Some(30L)),
      (1L, 30L, "c", 30L, None),
      (2L, 5L, "x", 5L, None)))
    // every version survives (auditability) and the point-in-time lookup at
    // T=25 for key 1 resolves through the interval predicate to "b"
    assert(h.size == rows.size)
    val at25 = h.filter(r => r._1 == 1L && r._4 <= 25L && r._5.forall(_ > 25L))
    assert(at25.map(_._3) == Seq("b"))
    // and the latest view equals the open-ended history rows
    val latest = Tables.latestPerKey(df, Seq("k"), Seq("ord"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(latest == h.filter(_._5.isEmpty).map(r => (r._1, r._3)).toSet)
  }
}
