package graft.config

import org.apache.spark.sql.types._

/** Schema + key catalog — the Spark-native equivalent of the reference's
  * SchemaService (service/SchemaService.java:19-55), which maps topic name →
  * value-class FQCN for reflective serde resolution. Here a topic maps to a
  * `StructType` (columns) plus the key column(s) and the changelog ordering
  * columns that define "latest" for KTable views (last-write-wins,
  * KTableRegistry.java:48; FIXTURES.md §C convention).
  */
case class TopicSchema(
    schema: Option[StructType],   // None → infer from source (generic-JSON path)
    keyColumns: Seq[String],      // record key — the Kafka message key analogue
    orderColumns: Seq[String],    // changelog order (offset/ingest-ts analogue)
    // Columns DECLARED as timestamps whose physical encoding may vary across
    // dump generations — producers have shipped both parquet TIMESTAMP(NANOS)
    // and TIMESTAMP(MICROS). Sources.fixNanos dispatches on the arriving type
    // (long-nanos under spark.sql.legacy.parquet.nanosAsLong / timestamp /
    // timestamp_ntz) and normalizes to session-TZ microsecond TimestampType
    // at the source boundary — the same floor DuckDB applies casting
    // TIMESTAMP_NS → TIMESTAMP, keeping oracles exact.
    nanosTimestampColumns: Seq[String] = Nil)

trait SchemaCatalog {
  def get(topic: String): Option[TopicSchema]
  def keyOf(topic: String): Seq[String] =
    get(topic).map(_.keyColumns).getOrElse(Nil)
  def orderOf(topic: String): Seq[String] =
    get(topic).map(_.orderColumns).getOrElse(Nil)
  def nanosColumnsOf(topic: String): Seq[String] =
    get(topic).map(_.nanosTimestampColumns).getOrElse(Nil)
}

/** Catalog for the driver-provisioned TPC-H-ish testdata (TESTDATA.md).
  * Schemas come from the parquet footers at read time (so `schema = None`);
  * the catalog contributes key/order conventions.
  */
object TestdataCatalog extends SchemaCatalog {
  private val entries: Map[String, TopicSchema] = Map(
    "region"     -> TopicSchema(None, Seq("r_regionkey"), Nil),
    "nation"     -> TopicSchema(None, Seq("n_nationkey"), Nil),
    "customer"   -> TopicSchema(None, Seq("c_custkey"), Nil),
    "supplier"   -> TopicSchema(None, Seq("s_suppkey"), Nil),
    "part"       -> TopicSchema(None, Seq("p_partkey"), Nil),
    "orders"     -> TopicSchema(None, Seq("o_orderkey"), Nil),
    "lineitem"   -> TopicSchema(None, Seq("l_orderkey", "l_linenumber"), Nil),
    // events is the changelog-shaped table: keyed by user_id when used as a
    // KTable, ordered by (ts, event_id) — FIXTURES.md §C.
    "events"     -> TopicSchema(None, Seq("event_id"), Seq("ts", "event_id"), Seq("ts")),
    "documents"  -> TopicSchema(None, Seq("doc_id"), Nil),
    "embeddings" -> TopicSchema(None, Seq("vec_id"), Nil)
  )
  override def get(topic: String): Option[TopicSchema] = entries.get(topic)
}
