package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

class ScaleSpec extends SparkSuite {

  test("salted join equals plain join (same rows, skew split across salts)") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val p = spark.read.parquet(s"${sf()}/part.parquet")
    val plain = l.join(p, l("l_partkey") === p("p_partkey")).count()
    val salted = Scale.saltedJoin(l, p, "l_partkey", "p_partkey", saltFactor = 8).count()
    assert(salted == plain)
  }

  test("salted left join preserves unmatched left rows exactly once") {
    val l = spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (99L, "zz"))).toDF("k", "v")
    val r = spark.createDataFrame(Seq((1L, "x"), (2L, "y"))).toDF("rk", "w")
    val out = Scale.saltedJoin(l, r, "k", "rk", saltFactor = 4, joinType = "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("w").isNull).count() == 1)
  }

  test("bucketed join plans without an exchange (co-located, R-chain at scale)") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    for (t <- Seq("orders_b", "customer_b")) {
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val c = spark.read.parquet(s"${sf()}/customer.parquet")
    Scale.writeBucketed(o, "orders_b", "o_custkey", 4)
    Scale.writeBucketed(c, "customer_b", "c_custkey", 4)
    // disable broadcast so the join must pick the shuffle path — at real
    // scale neither side fits a broadcast; that's the case bucketing serves
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1000)}")
      assert(joined.count() ==
        o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
