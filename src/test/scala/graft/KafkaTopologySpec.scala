package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

import graft.config.{PipelineSpec, SchemaCatalog, TopicConfig, TopicSchema}
import graft.streaming.{KafkaSourceResolver, StreamRunner}

/** The production Kafka join-chain path, minus the broker: a resolver
  * subclass swaps ONLY the raw-record transport (MemoryStream / in-memory
  * batch frames shaped exactly like Kafka records: binary key/value +
  * timestamp/offset) while every downstream piece — JSON decode, the
  * latest-per-key table snapshot, the Interpreter's stream–static join,
  * Append-mode start — is the real KafkaSourceResolver topology.
  *
  * Regression: the round-1 table() built a mapGroupsWithState view, which
  * Spark forbids upstream of a join in an Append-mode query — this exact
  * start() threw AnalysisException.
  */
class KafkaTopologySpec extends SparkSuite {

  private val ss = spark
  import ss.implicits._

  private object TestCatalog extends SchemaCatalog {
    private val entries = Map(
      "orders_t"   -> TopicSchema(None, Seq("o_orderkey"), Nil),
      "customer_t" -> TopicSchema(None, Seq("c_custkey"), Nil))
    override def get(topic: String): Option[TopicSchema] = entries.get(topic)
  }

  private val schemas = Map(
    "orders_t"   -> StructType.fromDDL("o_orderkey BIGINT, o_custkey BIGINT"),
    "customer_t" -> StructType.fromDDL("c_custkey BIGINT, c_name STRING"))

  private class TestKafkaResolver(streamRaw: Map[String, DataFrame],
      batchRaw: Map[String, DataFrame])
    extends KafkaSourceResolver("broker-not-used:9092", TestCatalog, schemas) {
    override protected def rawStream(spark: SparkSession, topic: TopicConfig): DataFrame =
      streamRaw(topic.name)
    override protected def rawBatch(spark: SparkSession, topic: TopicConfig): DataFrame =
      batchRaw(topic.name)
  }

  private def record(key: String, value: String, offset: Long) =
    (key.getBytes("UTF-8"), value.getBytes("UTF-8"),
      new java.sql.Timestamp(1700000000000L + offset), offset)

  test("JOIN_CHAIN starts and joins through KafkaSourceResolver (stream-static, Append)") {
    val ordersIn = MemoryStream[(Array[Byte], Array[Byte], java.sql.Timestamp, Long)](ss, 2)
    ordersIn.addData(
      record("1", """{"o_orderkey":1,"o_custkey":10}""", 0L),
      record("2", """{"o_orderkey":2,"o_custkey":11}""", 1L),
      record("3", """{"o_orderkey":3,"o_custkey":99}""", 2L)) // no such customer
    // customer changelog with a superseded row for key 10: the table
    // snapshot must be latest-per-key (offset order), so order 1 joins to
    // the NEW name.
    val customerRaw = Seq(
      record("10", """{"c_custkey":10,"c_name":"old-name"}""", 0L),
      record("10", """{"c_custkey":10,"c_name":"new-name"}""", 1L),
      record("11", """{"c_custkey":11,"c_name":"bob"}""", 2L))
      .toDF("key", "value", "timestamp", "offset")

    val resolver = new TestKafkaResolver(
      streamRaw = Map("orders_t" -> ordersIn.toDF().toDF("key", "value", "timestamp", "offset")),
      batchRaw = Map("customer_t" -> customerRaw))

    val spec = PipelineSpec.fromJson(
      """{"id":"kafka-join-chain","processingMode":"JOIN_CHAIN",
        |"sourceTopic":{"name":"orders_t","keyClass":"java.lang.Long"},
        |"joinOperations":[{"id":"cust","type":"INNER_JOIN",
        |  "initialSourceIsStream":true,
        |  "primaryKeyExtraction":{"source":"VALUE","fieldName":"o_custkey"},
        |  "enrichmentTopic":{"name":"customer_t","keyClass":"java.lang.Long"},
        |  "outputFieldsMapping":[
        |    {"source":"LEFT","sourceFieldName":"o_orderkey","outputFieldName":"order_id"},
        |    {"source":"RIGHT","sourceFieldName":"c_name","outputFieldName":"customer_name"}]}],
        |"outputTopic":{"enabled":true,"name":"out_t"}}""".stripMargin)

    val q = StreamRunner.startMemory(spark, spec, resolver, "kafka_join_t")
    try {
      q.processAllAvailable()
      val got = spark.table("kafka_join_t")
        .select("order_id", "customer_name").orderBy("order_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "new-name"), (2L, "bob")), s"got $got")
    } finally q.stop()
  }

  test("table() is a batch snapshot (stream-static joinable), not a streaming frame") {
    val customerRaw = Seq(record("10", """{"c_custkey":10,"c_name":"x"}""", 0L))
      .toDF("key", "value", "timestamp", "offset")
    val resolver = new TestKafkaResolver(Map.empty, Map("customer_t" -> customerRaw))
    val t = resolver.table(spark, TopicConfig("customer_t"))
    assert(!t.isStreaming)
    assert(t.columns.contains("c_name"))
  }
}
