package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.config.{SchemaCatalog, TopicConfig, TopicSchema}
import graft.sources.ParquetSourceResolver

/** Source-boundary timestamp normalization (Sources.fixNanos).
  *
  * The driver has regenerated `events.parquet` with `ts` as BOTH parquet
  * TIMESTAMP(NANOS) (older dumps; Spark reads it as raw long nanos under
  * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) (current
  * dumps; arrives as TIMESTAMP or TIMESTAMP_NTZ). A schema-on-read engine
  * must produce identical session-TZ micros TimestampType values from every
  * encoding, through the SAME resolver code path.
  */
class SourcesSpec extends SparkSuite {
  private val catalog: SchemaCatalog = new SchemaCatalog {
    override def get(topic: String): Option[TopicSchema] =
      Some(TopicSchema(None, Seq("event_id"), Nil, Seq("ts")))
  }

  // (event_id, micros-since-epoch). 1_700_000_000_123_456 µs ≈ 2023-11-14,
  // with sub-millisecond digits so a millis-precision bug can't hide.
  private val rows = Seq((1L, 1700000000123456L), (2L, 1700000003999999L))

  private def readThroughResolver(dir: String): DataFrame = {
    val r = new ParquetSourceResolver(dir, catalog)
    r.stream(spark, TopicConfig("events"))
  }

  private def collectTs(df: DataFrame): Seq[Long] = {
    assert(df.schema("ts").dataType === TimestampType,
      s"resolver must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.orderBy("event_id").collect().toSeq
      .map(r => r.getAs[Timestamp]("ts"))
      .map(t => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L) // micros since epoch
  }

  test("one code path reads events.ts written as int64-nanos AND as timestamp[us]") {
    // Encoding A: raw int64 nanos — what TIMESTAMP(NANOS) files look like
    // to Spark under nanosAsLong=true.
    val nanosDir = tempDir("graft_src_nanos")
    spark.createDataFrame(rows.map { case (id, us) => (id, us * 1000L) }).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // Encoding B: real TIMESTAMP(MICROS) column (the regenerated testdata).
    val microsDir = tempDir("graft_src_micros")
    spark.createDataFrame(rows).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    val fromNanos  = collectTs(readThroughResolver(nanosDir))
    val fromMicros = collectTs(readThroughResolver(microsDir))
    assert(fromNanos === rows.map(_._2))
    assert(fromMicros === rows.map(_._2))
    assert(fromNanos === fromMicros)
  }

  test("timestamp_ntz events.ts normalizes to the same instants (session TZ = UTC)") {
    val ntzDir = tempDir("graft_src_ntz")
    spark.createDataFrame(rows).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    // confirm the fixture really is NTZ on disk before claiming coverage
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assume(raw.schema("ts").dataType === TimestampNTZType,
      "parquet reader did not surface NTZ; fixture inconclusive")
    assert(collectTs(readThroughResolver(ntzDir)) === rows.map(_._2))
  }

  test("a declared timestamp column arriving as an unconvertible type fails loudly") {
    val badDir = tempDir("graft_src_bad")
    spark.createDataFrame(Seq((1L, "not-a-time"))).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$badDir/events.parquet")
    val e = intercept[IllegalArgumentException](readThroughResolver(badDir))
    assert(e.getMessage.contains("events") && e.getMessage.contains("ts"))
  }

  test("live testdata events.ts reads clean through the resolver at sf0.001") {
    val df = readThroughResolver(sf())
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }
}
