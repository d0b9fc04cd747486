package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.pipeline.Interpreter
import graft.sources.ParquetSourceResolver

/** Join-chain algebra invariants from SURVEY §5.4 — checked over generated
  * spec variations rather than one fixture.
  */
class InterpreterProperties extends SparkSuite {

  private def spec(joinType: String, mappings: Seq[(String, String, String)]): PipelineSpec =
    PipelineSpec(
      id = s"prop-$joinType-${mappings.size}",
      processingMode = ProcessingMode.JoinChain,
      sourceTopic = TopicConfig("orders", "java.lang.Long"),
      joinOperations = Seq(JoinOp(
        id = "s1", `type` = joinType, initialSourceIsStream = true,
        primaryKeyExtraction = Some(KeyExtraction("VALUE", Some("o_custkey"))),
        enrichmentTopic = TopicConfig("customer", "java.lang.Long"),
        outputFieldsMapping = mappings.map { case (s, f, o) => FieldMapping(s, f, o) })))

  private def run(s: PipelineSpec) =
    Interpreter.values(Interpreter.build(spark, s,
      new ParquetSourceResolver(sf(), TestdataCatalog)))

  private val mappingPool = Seq(
    ("LEFT", "o_orderkey", "a"), ("LEFT", "o_totalprice", "b"),
    ("LEFT", "o_orderstatus", "c"), ("RIGHT", "c_name", "d"),
    ("RIGHT", "c_acctbal", "e"), ("RIGHT", "missing_field", "f"))

  test("declared output schema is preserved for every mapping subset (R10)") {
    for (n <- 1 to mappingPool.size) {
      val m = mappingPool.take(n)
      val out = run(spec(JoinType.Inner, m))
      assert(out.columns.toSeq == m.map(_._3),
        s"schema mismatch for ${m.map(_._3)}")
    }
  }

  test("inner join rows ⊆ left join rows (multiset) for any mapping") {
    val m = mappingPool.take(4)
    val inner = run(spec(JoinType.Inner, m))
    val left = run(spec(JoinType.Left, m))
    assert(inner.count() <= left.count())
    // inner = left minus null-right rows for this data (all keys resolve)
    assert(inner.exceptAll(left).count() == 0)
  }

  test("missing declared fields are null-typed columns, never dropped") {
    val out = run(spec(JoinType.Left, Seq(("RIGHT", "missing_field", "f"),
      ("LEFT", "also_missing", "g"), ("LEFT", "o_orderkey", "h"))))
    assert(out.columns.toSeq == Seq("f", "g", "h"))
    assert(out.filter(col("f").isNotNull || col("g").isNotNull).count() == 0)
  }

  test("projection idempotence: re-selecting the declared schema is a no-op") {
    val m = mappingPool.take(3)
    val out = run(spec(JoinType.Inner, m))
    val reselected = out.select(m.map(x => col(x._3)): _*)
    assert(reselected.schema == out.schema)
    assert(reselected.exceptAll(out).count() == 0 && out.exceptAll(reselected).count() == 0)
  }
}
