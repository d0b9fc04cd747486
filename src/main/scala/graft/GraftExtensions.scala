package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)")`
  * works and the functions are usable from pure-SQL pipelines.
  *
  * Attach via `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or call [[GraftFunctions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          builder))
    }
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "vec_dot" -> (es => DotProduct(es(0), es(1))),
    "l2_dist" -> (es => L2Distance(es(0), es(1))),
    "minhash_signature" -> (es => MinHashSignature(es.head, 128, 42L)),
    "hashed_shingles" -> (es => HashedShingles(es.head, 3, 42L)),
    "minhash_from_hashes" -> (es => MinHashFromHashes(es.head, 128)),
    "simhash64" -> (es => SimHash64(es.head, 42L)),
    "hamming64" -> (es => HammingDistance64(es(0), es(1))),
    "doc_fingerprint" -> (es => RollingFingerprint(es.head))
  )

  /** Register all engine functions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
