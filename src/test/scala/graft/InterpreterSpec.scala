package graft

import org.apache.spark.sql.functions._

import graft.config.PipelineSpec

class InterpreterSpec extends SparkSuite {

  test("PipelineSpec JSON parse fills defaults and tolerates unknown fields") {
    val spec = PipelineSpec.fromJson(
      """{"id":"x","processingMode":"SIMPLE_STREAM",
        |"sourceTopic":{"name":"events"},
        |"someFutureField":123}""".stripMargin)
    assert(spec.sourceTopic.keyClass == "java.lang.String")
    assert(spec.joinOperations.isEmpty)
    assert(spec.outputTopic.isEmpty)
  }

  test("JOIN_CHAIN without joinOperations is a build-time error (ref :96-101)") {
    intercept[IllegalArgumentException] {
      PipelineSpec.fromJson(
        """{"id":"bad","processingMode":"JOIN_CHAIN",
          |"sourceTopic":{"name":"orders"}}""".stripMargin)
    }
  }

  test("simple stream is an identity copy") {
    val out = Queries.r01SimpleStream(spark, sf())
    val src = spark.read.parquet(s"${sf()}/events.parquet")
    assert(out.count() == src.count())
    assert(out.columns.toSet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("inner join chain matches a hand-built join") {
    val out = Queries.r05JoinChainInner(spark, sf())
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val c = spark.read.parquet(s"${sf()}/customer.parquet")
    val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
    assert(out.count() == expected)
    assert(out.columns.toSeq == Seq("order_id", "total", "customer_name", "segment"))
  }

  test("missing declared field (c_phone) yields an all-null typed column — warn-and-null") {
    val out = Queries.r06JoinChainLeftNull(spark, sf())
    assert(out.filter(col("phone").isNotNull).count() == 0)
    assert(out.schema("phone").dataType.typeName == "string")
    // every declared output column is always present (DynamicPojoValueJoiner.java:62)
    assert(out.columns.toSeq == Seq("order_id", "total", "customer_name", "phone", "nation"))
  }

  test("left join preserves left rows; inner is a subset of left (multiset)") {
    val left = Queries.r06JoinChainLeftNull(spark, sf()).count()
    val o = spark.read.parquet(s"${sf()}/orders.parquet").count()
    assert(left == o) // all custkeys resolve in the synthetic data
  }

  test("AGGREGATION count matches groupBy") {
    val out = Queries.r11CountAgg(spark, sf())
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    val expected = ev.groupBy("user_id").count()
    assert(out.count() == expected.count())
    val got = out.orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = expected.orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(exp))
  }

  test("unknown processing mode rejected") {
    intercept[IllegalArgumentException] {
      PipelineSpec.fromJson(
        """{"id":"bad","processingMode":"NOPE","sourceTopic":{"name":"events"}}""")
    }
  }
}
