package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-marker scorer for langId (SURVEY §2B X5).
  *
  * Returns `array<int>` of length `markers.length + 1`: per-marker-set
  * lowercase-token hit counts, then a Han-script (U+4E00–U+9FA5) character
  * count in the last slot. Token semantics match `split(trim(lower(text)),
  * "\\s+")` + set membership (the oracle's regexp_split formulation):
  * ASCII-whitespace-delimited tokens, compared lowercased. Lowercasing
  * mirrors `lower()` exactly — ASCII fast path char-wise, otherwise the
  * full-string case mapping (UTF8String.toLowerCase does the same), so
  * one-to-many mappings like U+0130 behave identically to the
  * compositional form this replaces.
  *
  * The compositional form cost 4 full tokenizations + a regex replace per
  * row (one per marker-set `filter` plus the Han `regexp_replace`) — the
  * dominant map cost of x5_lang_id. One scan of the string does all five
  * counts; the marker sets ride along as a codegen reference object.
  */
case class LangScores(child: Expression, markers: Seq[Seq[String]])
  extends UnaryExpression {
  override def prettyName: String = "lang_scores"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }

  // token → marker-set index; sets are disjoint by construction
  // (TextAnalysis.langMarkers), so one map suffices. markers is Seq (not
  // Array) for structural case-class equality → semanticEquals/cache reuse.
  @transient private lazy val lookup: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    markers.zipWithIndex.foreach { case (ws, i) => ws.foreach(w => m.put(w, i)) }
    m
  }

  /** Single scan: ASCII-whitespace token boundaries (the Java-regex \s set:
    * space, \t, \n, \u000B, \f, \r), marker lookup on each boundary, Han
    * chars counted in the same pass.
    */
  def score(s: UTF8String): GenericArrayData = {
    val raw = s.toString
    // lower() parity: char-wise only when all-ASCII; otherwise the
    // full-string mapping handles one-to-many lowercasing correctly
    var ascii = true
    var k = 0
    while (ascii && k < raw.length) { if (raw.charAt(k) >= 0x80) ascii = false; k += 1 }
    val str = if (ascii) raw else raw.toLowerCase()
    val counts = new Array[Int](markers.length + 1)
    val buf = new java.lang.StringBuilder(16)
    var i = 0
    val n = str.length
    while (i <= n) {
      val c = if (i == n) ' ' else str.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (isWs) {
        if (buf.length > 0) {
          val idx = lookup.get(buf.toString)
          if (idx != null) counts(idx.intValue()) += 1
          buf.setLength(0)
        }
      } else {
        if (c >= '\u4e00' && c <= '\u9fa5') counts(markers.length) += 1
        buf.append(if (ascii && c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any = score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langScorer", this, classOf[LangScores].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.score($v);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  def lang_scores(text: Column, markers: Seq[Seq[String]]): Column =
    Bridge.column(LangScores(Bridge.expression(text), markers))
}
