package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2B X4): image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample operator shapes a training-data
  * pipeline needs.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB (see [[decodeStub]]).
  * Everything around it — schema convention, batch iteration shape,
  * partitioning, per-frame explosion — is real Spark plumbing, exercised by
  * tests, and is exactly what a real codec would plug into (swap the stub
  * for an `mapPartitions`/Pandas-UDF decode over the same columns).
  */
object Multimodal {

  /** Canonical multimodal schema convention: payload + typed metadata.
    * Pointer-style media (URI into object storage) uses `media_uri` instead of
    * inline bytes — at 100 TB you ship pointers through shuffles, not blobs.
    */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** Wrap a text-bearing table into the multimodal shape (test harness: the
    * container has no media files, so payloads are synthesized from text —
    * deterministic, schema-faithful).
    */
  def asBlobTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        (length(col(textCol)).cast("long") * 10L).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  /** STUB decode kernel: deterministic per-payload features computed with
    * codegen'd built-ins (byte length + md5 content hash). A real deployment
    * replaces this with an actual decoder over the same (payload, meta)
    * columns — the signature, null posture, and partition behavior stay.
    */
  def decodeStub(payload: Column): Column = struct(
    length(payload).cast("long").as("n_bytes"),
    md5(payload).as("content_hash"),
    crc32(payload).as("checksum"))

  /** Feature-extraction pass: media table → per-media features (map-only). */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.mime").as("mime"),
        decodeStub(col("payload")).as("f"))
      .select(col("media_id"), col("mime"), col("f.n_bytes").as("n_bytes"),
        col("f.content_hash").as("content_hash"), col("f.checksum").as("checksum"))

  /** STUB resize: re-encodes the payload to a target resolution. The real
    * operator maps binary → binary with updated metadata; the stub transform
    * is a deterministic truncation-by-ratio so tests can assert the
    * byte-length and metadata contract without a codec.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val keepBytes = greatest(lit(1L),
      least(length(col("payload")).cast("long"),
        (length(col("payload")).cast("long") * lit(targetW.toLong * targetH) /
          greatest((w * h).cast("long"), lit(1L)))))
    media.select(col("media_id"),
      col("payload").substr(lit(1), keepBytes.cast("int")).as("payload"),
      struct(col("meta.mime").as("mime"),
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.codec").as("codec")).as("meta"))
  }

  /** Partition-iterator decode: the shape a REAL codec plugs into. A decoder
    * holds per-executor state (native contexts, model weights, GPU handles)
    * that must be initialized once per partition, not per row —
    * `mapPartitions` is the Scala-side equivalent of the Python
    * `mapInPandas` batch-UDF pattern for this. The decode kernel here is the
    * same deterministic STUB as [[decodeStub]]; swap `decodeBytes` for a real
    * library call and nothing else changes.
    */
  def extractFeaturesPartitioned(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("content_hash", StringType)))
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      // per-partition init happens HERE (e.g., codec context); stub: an MD5
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val mime = r.getStruct(metaIdx).getAs[String]("mime")
        md.reset()
        val hash = md.digest(payload).map("%02x".format(_)).mkString
        Row(r.getLong(idIdx), mime, payload.length.toLong, hash)
      }
    }
  }

  /** Frame-sampling shape for video-ish payloads: one output row per sampled
    * frame index at the given stride over the (stubbed) duration. The explode
    * is the real operator; the per-frame decode is the stub.
    */
  def sampleFrames(media: DataFrame, strideMs: Long): DataFrame =
    media.select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(strideMs))).as("frame_ts_ms"),
        col("payload"))
      .select(col("media_id"), col("frame_ts_ms"),
        // STUB frame feature: content hash salted by the frame timestamp —
        // stands in for "decode frame at ts".
        crc32(concat(col("payload"), encode(col("frame_ts_ms").cast("string"), "UTF-8")))
          .as("frame_checksum"))
}
