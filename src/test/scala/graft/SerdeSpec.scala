package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Serde boundary semantics (R16/R17): the reference is lenient on unknown
  * fields (SerdeFactory.java:30) but THROWS on malformed payloads
  * (JsonStringToObjectMapper.java:46-55, SerdeFactory.java:208). Spark's
  * from_json is lenient-by-default (malformed → null); FAILFAST restores the
  * reference's strict posture where fidelity matters.
  */
class SerdeSpec extends SparkSuite {

  private val schema = StructType.fromDDL("k INT")

  test("lenient mode: malformed JSON → null row, unknown fields ignored, missing → null") {
    val df = spark.createDataFrame(Seq(
      (1L, """{"k": 5, "unknown": "x"}"""), // unknown field ignored
      (2L, """{"other": 1}"""),             // missing declared field → null
      (3L, """not json at all"""))).toDF("id", "js")
    val out = df.select(col("id"), from_json(col("js"), schema).getField("k").as("k"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) None else Some(r.getInt(1))).toSeq
    assert(out == Seq(Some(5), None, None))
  }

  test("FAILFAST mode throws on malformed input (reference strict posture)") {
    val df = spark.createDataFrame(Seq((1L, """{"k": bad"""))).toDF("id", "js")
    val strict = df.select(from_json(col("js"), schema,
      Map("mode" -> "FAILFAST").asInstanceOf[Map[String, String]]).as("v"))
    val e = intercept[org.apache.spark.SparkException] { strict.collect() }
    assert(e.getMessage.contains("MALFORMED_RECORD") || e.getMessage.contains("FAILFAST")
      || Option(e.getCause).exists(c => c.getMessage.contains("Malformed")
        || c.getMessage.contains("MALFORMED")))
  }

  test("every registered SQL function evaluates through spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
        |  l2_dist(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |  size(minhash_signature(array('a','b'))) AS mh,
        |  size(hashed_shingles(array('a','b','c','d'))) AS hs,
        |  size(minhash_from_hashes(array(1L, 2L))) AS mfh,
        |  simhash64(array('a','b')) AS sh,
        |  hamming64(0L, 255L) AS hd,
        |  doc_fingerprint('abc') AS fp""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 11.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - 5.0) < 1e-12)
    assert(row.getInt(3) == 128 && row.getInt(4) == 2 && row.getInt(5) == 128)
    assert(row.getInt(7) == 8)
    assert(!row.isNullAt(6) && !row.isNullAt(8))
  }
}
