package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Encoders, Row}

import graft.config.{SchemaCatalog, TopicConfig}
import graft.sources.SourceResolver

/** Structured Streaming execution layer (BASELINE.json `spark_approach`):
  * Kafka source/sink adapters, changelog-table state, and watermarked
  * windowed aggregation (SURVEY §2B X6).
  *
  * The same `Interpreter` runs over this resolver — a pipeline spec doesn't
  * know whether it executes batch (parquet, the correctness oracle) or
  * streaming. Batch `groupBy(key).count()` ⇔ streaming update-mode count with
  * state in the checkpoint (≅ the reference's `Materialized.as(stateStoreName)`
  * RocksDB store, DynamicTopologyBuilder.java:203-221).
  */
class KafkaSourceResolver(bootstrapServers: String, val catalog: SchemaCatalog,
    schemas: Map[String, StructType]) extends SourceResolver {

  /** Raw Kafka record frame (key/value binary + timestamp/offset), streaming.
    * Overridable so the join topology is testable without broker/connector
    * jars — a test subclass swaps the transport, never the topology.
    */
  protected def rawStream(spark: SparkSession, topic: TopicConfig): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic.name)
      .option("startingOffsets", "earliest")
      .load()

  /** Raw record frame as a bounded batch read (earliest..latest at plan
    * execution time) — the table-side snapshot source.
    */
  protected def rawBatch(spark: SparkSession, topic: TopicConfig): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic.name)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** Kafka record → typed columns. JSON value decoded through `from_json` —
    * the reference's lenient Jackson posture (SerdeFactory.java:30: unknown
    * fields dropped, missing → null).
    */
  private def decode(raw: DataFrame, topic: TopicConfig): DataFrame = {
    val schema = schemas.getOrElse(topic.name,
      throw new IllegalArgumentException(s"no schema registered for topic ${topic.name}"))
    raw.select(col("key").cast("string").as("__kafka_key"),
        from_json(col("value").cast("string"), schema).as("v"),
        col("timestamp").as("__ingest_ts"), col("offset").as("__offset"))
      .select(col("__kafka_key") +: col("__ingest_ts") +: col("__offset") +:
        schema.fieldNames.toSeq.map(f => col(s"v.$f")): _*)
  }

  /** KStream analogue (R1): topic → append stream. */
  override def stream(spark: SparkSession, topic: TopicConfig): DataFrame =
    decode(rawStream(spark, topic), topic)

  /** KTable analogue (R2): latest-per-key view as a bounded batch SNAPSHOT,
    * so a stream ⋈ table chain plans as Spark's stream–static join — the
    * KStream⋈KTable enrichment shape. Structured Streaming re-executes the
    * static side every micro-batch, so the view refreshes with at most one
    * trigger of staleness (the KTable's eventual-consistency contract).
    *
    * Deliberately NOT the mapGroupsWithState formulation
    * ([[StreamingTables.latestPerKey]], still available for update-mode
    * standalone views): Spark forbids stateful operators downstream of
    * mapGroupsWithState and JOIN_CHAIN runs in Append mode, so that shape
    * threw AnalysisException the moment a join chain started on it.
    */
  override def table(spark: SparkSession, topic: TopicConfig): DataFrame =
    graft.sources.Tables.latestPerKey(decode(rawBatch(spark, topic), topic),
      catalog.keyOf(topic.name), Seq("__offset"))
}

object StreamingTables {

  /** Streaming last-write-wins per key — the KTable materialization
    * (KTableRegistry.java:41-50) on Structured Streaming state. Emits the
    * current winner per key on every update (update output mode), keyed state
    * bounded at one row per key (≅ a compacted changelog topic).
    *
    * Implementation: `groupByKey` over the record key + `mapGroupsWithState`
    * keeping the max-(order) row. RocksDB state store config recommended in
    * production (`spark.sql.streaming.stateStore.providerClass`).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "latestPerKey needs keys and order columns")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val ordIdx = order.map(schema.fieldIndex)
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.STRING
    implicit val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.row(schema))

    // Length-prefixed composite-key encoding: no separator can collide with
    // key content (["a b","c"] vs ["a","b c"]) and nulls are distinct from
    // the literal string "null".
    def encodeKey(r: Row): String = {
      val sb = new StringBuilder
      keyIdx.foreach { i =>
        val v = r.get(i)
        if (v == null) sb.append("N;")
        else { val s = v.toString; sb.append(s.length).append(':').append(s).append(';') }
      }
      sb.toString
    }

    def ordKey(r: Row): Seq[Any] = ordIdx.map(r.get)
    def later(a: Row, b: Row): Row = {
      // lexicographic compare over the order columns; nulls order FIRST
      // (lose to any value — matching SQL NULLS FIRST under max_by), and
      // equal/incomparable values deterministically keep the earlier row.
      val cmp = ordKey(a).zip(ordKey(b)).iterator.map {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case (x: Comparable[Any] @unchecked, y) => x.compareTo(y)
        case _ => 0
      }.find(_ != 0).getOrElse(0)
      if (cmp >= 0) a else b
    }

    df.groupByKey(encodeKey _)
      .mapGroupsWithState[Row, Row](GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          val incoming = rows.reduce(later)
          val winner = if (state.exists) later(state.get, incoming) else incoming
          state.update(winner)
          winner
      }
  }

  /** Stream–stream equi-join with watermark-bounded state on both sides —
    * the join type the reference declares but leaves absent ("add OUTER if
    * needed", AggregationDefinition.java:42-46), done the only way that's
    * safe unbounded: both sides watermarked and the join condition carrying
    * a time-range constraint so state for expired intervals is evicted.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      watermark: String, maxDelay: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) - org.apache.spark.sql.functions.expr(s"INTERVAL $maxDelay") &&
        r(rightTs) <= l(leftTs) + org.apache.spark.sql.functions.expr(s"INTERVAL $maxDelay"),
      joinType)
  }

  /** Streaming exact dedup (X1 streaming form): first-write-wins per key with
    * watermark-bounded state — the only dedup that's safe on an unbounded
    * stream (state for keys older than the watermark is evicted, so memory is
    * proportional to the watermark window, not the stream history).
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked tumbling-window aggregation (X6) — the scale-correct shape
    * for the reference's AGGREGATION mode on an unbounded stream: state is
    * evicted past the watermark instead of growing per key forever.
    */
  def windowedCounts(df: DataFrame, tsCol: String, watermark: String,
      windowLen: String, groupCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("count"))
      .select(col("window.start").as("window_start") +: groupCols.map(col) :+ col("count"): _*)
}

/** Sink side (R15/R18): Kafka topic writer for streaming pipelines. */
object KafkaSink {
  /** `to(topic, Produced.with(...))` analogue (DynamicTopologyBuilder.java:61-74):
    * key cast to string, value serialized as JSON of all remaining columns.
    */
  def start(df: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String, outputMode: OutputMode = OutputMode.Update()): StreamingQuery =
    graft.pipeline.Interpreter.toKafkaShape(df)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
