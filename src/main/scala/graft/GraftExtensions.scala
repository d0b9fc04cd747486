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
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  /** Arity gate: a call like `minhash_signature(toks, 64)` must either honor
    * the 64 or fail loudly — silently applying the hard-coded default was a
    * wrong-results trap. Optional trailing arguments must be integer
    * literals (they parameterize the expression itself, not per-row data).
    */
  private def checkArity(name: String, es: Seq[Expression], min: Int, max: Int): Unit =
    if (es.length < min || es.length > max) {
      val want = if (min == max) s"$min" else s"$min to $max"
      throw new IllegalArgumentException(
        s"$name expects $want argument(s), got ${es.length}")
    }

  private def litLong(name: String, e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType)   => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer parameter, got ${other.sql}")
  }

  private def optInt(name: String, es: Seq[Expression], i: Int, default: Int): Int =
    if (es.length > i) {
      val v = litLong(name, es(i))
      // bounds-checked: 4294967296 silently truncating to 0 hashes would be
      // exactly the silent-wrong-parameter trap arity validation closes
      if (v < 1 || v > Int.MaxValue) throw new IllegalArgumentException(
        s"$name parameter ${i + 1} must be in [1, ${Int.MaxValue}], got $v")
      v.toInt
    } else default
  private def optLong(name: String, es: Seq[Expression], i: Int, default: Long): Long =
    if (es.length > i) litLong(name, es(i)) else default

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => { checkArity("cosine_sim", es, 2, 2)
      CosineSimilarity(es(0), es(1)) }),
    "vec_dot" -> (es => { checkArity("vec_dot", es, 2, 2)
      DotProduct(es(0), es(1)) }),
    "l2_dist" -> (es => { checkArity("l2_dist", es, 2, 2)
      L2Distance(es(0), es(1)) }),
    "minhash_signature" -> (es => { checkArity("minhash_signature", es, 1, 3)
      MinHashSignature(es.head, optInt("minhash_signature", es, 1, 128),
        optLong("minhash_signature", es, 2, 42L)) }),
    "hashed_shingles" -> (es => { checkArity("hashed_shingles", es, 1, 3)
      HashedShingles(es.head, optInt("hashed_shingles", es, 1, 3),
        optLong("hashed_shingles", es, 2, 42L)) }),
    "minhash_from_hashes" -> (es => { checkArity("minhash_from_hashes", es, 1, 2)
      MinHashFromHashes(es.head, optInt("minhash_from_hashes", es, 1, 128)) }),
    "simhash64" -> (es => { checkArity("simhash64", es, 1, 2)
      SimHash64(es.head, optLong("simhash64", es, 1, 42L)) }),
    "hamming64" -> (es => { checkArity("hamming64", es, 2, 2)
      HammingDistance64(es(0), es(1)) }),
    "doc_fingerprint" -> (es => { checkArity("doc_fingerprint", es, 1, 1)
      RollingFingerprint(es.head) }),
    "quantize_vec" -> (es => { checkArity("quantize_vec", es, 1, 1)
      QuantizeVec(es.head) }),
    "quantized_cos" -> (es => { checkArity("quantized_cos", es, 2, 2)
      QuantizedCosine(es(0), es(1)) }),
    // expands to the same chained RegExpReplace the Column API builds, so
    // SQL pipelines scrub identically to graft.operators.TextAnalysis.redactPii
    "redact_pii" -> (es => { checkArity("redact_pii", es, 1, 1)
      graft.operators.TextAnalysis.PiiRules.foldLeft(es.head) { case (e, (pat, tok)) =>
        org.apache.spark.sql.catalyst.expressions.RegExpReplace(e, Literal(pat), Literal(tok))
      } })
  )

  /** Register all engine functions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
