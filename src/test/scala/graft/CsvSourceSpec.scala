package graft

import graft.config.{PipelineSpec, TestdataCatalog, TopicConfig}
import graft.pipeline.Interpreter
import graft.sources.{CsvSourceResolver, JsonSourceResolver, ParquetSourceResolver}

/** Headered CSV topic dumps must replay existing specs identically to the
  * parquet source — resolver swapped, nothing else (same contract as
  * [[JsonSourceSpec]], third interchange format).
  */
class CsvSourceSpec extends SparkSuite {

  private def dumpTopics(topics: Seq[String]): (String, Map[String, org.apache.spark.sql.types.StructType]) = {
    val tmp = tempDir("graft-csv")
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val schemas = topics.map { t =>
      val df = pq.stream(spark, TopicConfig(t))
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", JsonSourceResolver.TimestampFormat)
        .csv(s"$tmp/$t.csv")
      t -> df.schema
    }.toMap
    (tmp, schemas)
  }

  test("CSV dump replays a JOIN_CHAIN spec identically to the parquet source") {
    val (tmp, schemas) = dumpTopics(Seq("orders", "customer"))
    val cr = new CsvSourceResolver(tmp, TestdataCatalog, schemas)
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val spec = PipelineSpec.fromJson(
      """{"id":"orders-enrich-csv","processingMode":"JOIN_CHAIN",
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
    assert(run(cr).nonEmpty && run(cr) == run(pq))
  }

  test("CSV table view applies the same latest-per-key convention (timestamps round-trip)") {
    val (tmp, schemas) = dumpTopics(Seq("events"))
    val cr = new CsvSourceResolver(tmp, TestdataCatalog, schemas)
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val viaCsv = cr.table(spark, TopicConfig("events"))
      .orderBy("event_id").collect().toSeq
    val viaPq = pq.table(spark, TopicConfig("events"))
      .orderBy("event_id").collect().toSeq
    assert(viaCsv.nonEmpty && viaCsv == viaPq)
  }

  test("undeclared CSV topic schema is a build-time error, not silent inference") {
    val cr = new CsvSourceResolver("/nonexistent", TestdataCatalog, Map.empty)
    val e = intercept[IllegalArgumentException](cr.stream(spark, TopicConfig("events")))
    assert(e.getMessage.contains("no schema declared"))
  }

  test("lenient read: malformed CSV fields become typed nulls (PERMISSIVE)") {
    val tmp = tempDirPath("graft-csv-lenient")
    java.nio.file.Files.write(tmp.resolve("t.csv"),
      """id,v
        |1,7
        |2,notanumber""".stripMargin.getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT")
    val cr = new CsvSourceResolver(tmp.toString, TestdataCatalog, Map("t" -> schema))
    val rows = cr.stream(spark, TopicConfig("t")).orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    assert(rows == Seq((1L, Some(7L)), (2L, None)))
  }
}
