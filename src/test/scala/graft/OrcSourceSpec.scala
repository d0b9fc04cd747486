package graft

import graft.config.{PipelineSpec, TestdataCatalog, TopicConfig}
import graft.pipeline.Interpreter
import graft.sources.{OrcSourceResolver, ParquetSourceResolver}

/** ORC topic dumps must replay existing specs identically to the parquet
  * source — resolver swapped, nothing else (fourth interchange format next
  * to parquet, JSONL and CSV; ORC is self-describing so no declared-schema
  * map is involved).
  */
class OrcSourceSpec extends SparkSuite {

  private def dumpTopics(topics: Seq[String]): String = {
    val tmp = tempDir("graft-orc")
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    topics.foreach { t =>
      pq.stream(spark, TopicConfig(t))
        .coalesce(1).write.mode("overwrite").orc(s"$tmp/$t.orc")
    }
    tmp
  }

  test("ORC dump replays a JOIN_CHAIN spec identically to the parquet source") {
    val tmp = dumpTopics(Seq("orders", "customer"))
    val or = new OrcSourceResolver(tmp, TestdataCatalog)
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val spec = PipelineSpec.fromJson(
      """{"id":"orders-enrich-orc","processingMode":"JOIN_CHAIN",
        |"sourceTopic":{"name":"orders","keyClass":"java.lang.Long"},
        |"joinOperations":[{"id":"customer-step","type":"INNER_JOIN",
        |  "initialSourceIsStream":true,
        |  "primaryKeyExtraction":{"source":"VALUE","fieldName":"o_custkey"},
        |  "enrichmentTopic":{"name":"customer","keyClass":"java.lang.Long"},
        |  "outputFieldsMapping":[
        |    {"source":"LEFT","sourceFieldName":"o_orderkey","outputFieldName":"orderkey"},
        |    {"source":"RIGHT","sourceFieldName":"c_mktsegment","outputFieldName":"segment"}]}],
        |"outputTopic":{"enabled":true,"name":"o"}}""".stripMargin)
    def run(r: graft.sources.SourceResolver) =
      Interpreter.build(spark, spec, r)
        .orderBy("orderkey").collect().toSeq
    val viaOrc = run(or)
    assert(viaOrc.nonEmpty && viaOrc == run(pq))
  }

  test("ORC table view applies the same latest-per-key convention (timestamps round-trip)") {
    val tmp = dumpTopics(Seq("events"))
    val or = new OrcSourceResolver(tmp, TestdataCatalog)
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val viaOrc = or.table(spark, TopicConfig("events"))
      .orderBy("event_id").collect().toSeq
    val viaPq = pq.table(spark, TopicConfig("events"))
      .orderBy("event_id").collect().toSeq
    assert(viaOrc.nonEmpty && viaOrc == viaPq)
  }

  test("ORC scan pushes filters and prunes columns like parquet (scale posture)") {
    // the columnar promises the resolver is FOR: a predicate + projection
    // must reach the ORC scan (PushedFilters + pruned ReadSchema), or a
    // 100 TB archive replay reads every byte of every column
    val tmp = dumpTopics(Seq("events"))
    val or = new OrcSourceResolver(tmp, TestdataCatalog)
    val df = or.stream(spark, TopicConfig("events"))
      .filter(org.apache.spark.sql.functions.col("user_id") === 7L)
      .select("event_id", "user_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, "no FileSourceScanExec for the ORC read")
    assert(scan.get.dataFilters.nonEmpty,
      "user_id predicate was not pushed into the ORC scan")
    val readCols = scan.get.requiredSchema.fieldNames.toSet
    assert(readCols == Set("event_id", "user_id"),
      s"ORC scan reads $readCols — column pruning lost")
  }
}
