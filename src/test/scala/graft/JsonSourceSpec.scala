package graft

import org.apache.spark.sql.functions._

import graft.config.{PipelineSpec, TestdataCatalog, TopicConfig}
import graft.pipeline.Interpreter
import graft.sources.{JsonSourceResolver, ParquetSourceResolver}

/** The migration-path source: a JSONL topic dump must replay existing specs
  * byte-identically to the parquet source — resolver swapped, nothing else.
  */
class JsonSourceSpec extends SparkSuite {

  private def dumpTopics(topics: Seq[String]): (String, Map[String, org.apache.spark.sql.types.StructType]) = {
    val tmp = tempDir("graft-jsonl")
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val schemas = topics.map { t =>
      val df = pq.stream(spark, TopicConfig(t))
      df.coalesce(1).write.mode("overwrite")
        .option("timestampFormat", JsonSourceResolver.TimestampFormat)
        .json(s"$tmp/$t.jsonl")
      t -> df.schema
    }.toMap
    (tmp, schemas)
  }

  test("JSONL dump replays an AGGREGATION spec identically to the parquet source") {
    val (tmp, schemas) = dumpTopics(Seq("events"))
    val jr = new JsonSourceResolver(tmp, TestdataCatalog, schemas)
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val spec = PipelineSpec.fromJson(
      """{"id":"events-per-user-json","processingMode":"AGGREGATION",
        |"sourceTopic":{"name":"events","keyClass":"java.lang.Long"},
        |"groupByKeyExtraction":{"source":"VALUE","fieldName":"user_id"},
        |"groupByKeyType":"java.lang.Long",
        |"stateStoreName":"s","outputTopic":{"enabled":true,"name":"o"}}""".stripMargin)
    def run(r: graft.sources.SourceResolver) =
      Interpreter.build(spark, spec, r)
        .orderBy(Interpreter.KeyCol).collect().toSeq
    assert(run(jr).nonEmpty && run(jr) == run(pq))
  }

  test("JSONL table view applies the same latest-per-key convention (timestamps round-trip)") {
    val (tmp, schemas) = dumpTopics(Seq("events"))
    val jr = new JsonSourceResolver(tmp, TestdataCatalog, schemas)
    val pq = new ParquetSourceResolver(sf(), TestdataCatalog)
    val viaJson = jr.table(spark, TopicConfig("events"))
      .orderBy("event_id").collect().toSeq
    val viaPq = pq.table(spark, TopicConfig("events"))
      .orderBy("event_id").collect().toSeq
    assert(viaJson.nonEmpty && viaJson == viaPq)
  }

  test("undeclared JSON topic schema is a build-time error, not silent inference") {
    val jr = new JsonSourceResolver("/nonexistent", TestdataCatalog, Map.empty)
    val e = intercept[IllegalArgumentException](jr.stream(spark, TopicConfig("events")))
    assert(e.getMessage.contains("no schema declared"))
  }

  test("lenient read: missing fields in a JSONL record become typed nulls") {
    val tmp = tempDirPath("graft-jsonl-lenient")
    java.nio.file.Files.write(tmp.resolve("t.jsonl"),
      """{"id": 1, "v": "a"}
        |{"id": 2}""".stripMargin.getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val jr = new JsonSourceResolver(tmp.toString, TestdataCatalog, Map("t" -> schema))
    val rows = jr.stream(spark, TopicConfig("t")).orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq((1L, Some("a")), (2L, None)))
  }
}
