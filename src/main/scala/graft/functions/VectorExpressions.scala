package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector similarity (SURVEY §2B X3).
  *
  * These are `Expression`s with `doGenCode` (not Scala UDFs) so the similarity
  * computation stays inside whole-stage codegen: no boxing of the
  * Array[Float], no Encoder round-trip per row — on a 100 TB ANN sweep the
  * UDF tax would dominate the scan.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // all vector expressions return null on a dimension mismatch regardless of
  // child nullability — without this override a non-nullable input column
  // makes the planner decode the bogus "non-null" slot and crash
  // (EXPRESSION_DECODING_FAILED), and codegen's `isNull = true` writes to a
  // constant
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  protected def elemPrim(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "Float"
    case _                       => "Double"
  }
}

/** Dot product of two float/double vectors; null if lengths differ. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val la = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val rb = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
      var s = 0.0; var i = 0; val n = a.numElements()
      while (i < n) {
        val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y; i += 1
      }
      s
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val gl = s"get${elemPrim(left.dataType)}"; val gr = s"get${elemPrim(right.dataType)}"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.$gl($i)) * ((double) $b.$gr($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; null if lengths differ, 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val la = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val rb = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = a.numElements()
      while (i < n) {
        val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val gl = s"get${elemPrim(left.dataType)}"; val gr = s"get${elemPrim(right.dataType)}"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$gl($i); double $y = (double) $b.$gr($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / Math.sqrt($na * $nb);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 (Euclidean) distance; null if lengths differ. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_dist"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val la = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val rb = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
      var s = 0.0; var i = 0; val n = a.numElements()
      while (i < n) {
        val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
        val d = x - y; s += d * d; i += 1
      }
      math.sqrt(s)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val gl = s"get${elemPrim(left.dataType)}"; val gr = s"get${elemPrim(right.dataType)}"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ((double) $a.$gl($i)) - ((double) $b.$gr($i));
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = Math.sqrt($s);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Multi-table sign-LSH bucket assignment in ONE expression node: for each
  * of the `planes.length / planesPerTable` tables, packs sign(v·p_i) bits
  * into an int bucket id and returns the per-table bucket array.
  *
  * The hyperplane matrix rides along as a codegen reference object, NOT as
  * literal children — the compositional form (nTables × planesPerTable
  * `vec_dot`s against array literals) put thousands of literal nodes into
  * the plan, and Catalyst analysis + janino compilation of that tree cost
  * multiple seconds per query before a single row moved. One node keeps
  * the whole LSH sketch inside whole-stage codegen at O(1) plan size.
  */
case class SignBuckets(child: Expression, planes: Seq[Seq[Double]],
    planesPerTable: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.nonEmpty && planes.length % planesPerTable == 0,
    "planes must divide evenly into tables")
  // bucket ids pack one bit per plane into an Int: past 31 planes the
  // 1 << j shifts wrap mod 32 and plane j aliases plane j-32 SILENTLY —
  // fail fast instead of corrupting buckets
  require(planesPerTable >= 1 && planesPerTable <= 31,
    "planesPerTable must be in [1, 31] (Int bucket packing)")
  override def prettyName: String = "sign_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // dimension mismatch → null regardless of child nullability (see
  // VectorBinaryExpression.nullable)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.sql}")
    }
  // hoisted: these kernels read it once or twice PER VECTOR ELEMENT on
  // the generated-code hot path — a dataType pattern-match per
  // multiply-add would cost a virtual call + cast millions of times per
  // task; the child's type is fixed for the expression's lifetime
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // planes is Seq (not Array) so case-class equality is structural — two
  // identically-parameterized SignBuckets are semanticEquals, keeping
  // CacheManager/ReuseExchange/CSE matching intact. The hot loop uses this
  // array view.
  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != mat(0).length) return null
    val nTables = mat.length / planesPerTable
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0; var j = 0
      while (j < planesPerTable) {
        val p = mat(t * planesPerTable + j)
        var s = 0.0; var i = 0
        while (i < n) {
          s += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
          i += 1
        }
        if (s >= 0) b |= (1 << j)
        j += 1
      }
      out(t) = b; t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", this.mat, "double[][]")
    val get = s"get${if (isFloat) "Float" else "Double"}"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val nt = ctx.freshName("nt")
      val out = ctx.freshName("out"); val t = ctx.freshName("t")
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |if ($n != $mat[0].length) { ${ev.isNull} = true; } else {
         |  int $nt = $mat.length / $planesPerTable;
         |  int[] $out = new int[$nt];
         |  for (int $t = 0; $t < $nt; $t++) {
         |    int $b = 0;
         |    for (int $j = 0; $j < $planesPerTable; $j++) {
         |      double[] $p = $mat[$t * $planesPerTable + $j];
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $s += ((double) $v.$get($i)) * $p[$i];
         |      }
         |      if ($s >= 0) $b |= (1 << $j);
         |    }
         |    $out[$t] = $b;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric per-vector int8 scalar quantization: float/double vector →
  * struct(scale FLOAT, norm FLOAT, q BINARY), one byte per dimension —
  * 4× smaller than float32 in storage, cache, and shuffle. `scale` is
  * max|v|/127 (so q_i = round(v_i/scale) ∈ [-127,127]); `norm` is the
  * EXACT L2 norm, kept so [[QuantizedCosine]] divides by true magnitudes
  * and its only error source is the int8 rounding of the dot product.
  */
case class QuantizeVec(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "quantize_vec"
  override def dataType: DataType = QuantizeVec.quantizedType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.sql}")
    }
  // hoisted: these kernels read it once or twice PER VECTOR ELEMENT on
  // the generated-code hot path — a dataType pattern-match per
  // multiply-add would cost a virtual call + cast millions of times per
  // task; the child's type is fixed for the expression's lifetime
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // shared by eval and generated code via addReferenceObj — one body, no
  // duplicated quantization arithmetic to drift
  def quantize(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0; var sumSq = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      sumSq += x * x
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        q(i) = math.max(-127, math.min(127, math.round(x / scale))).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale.toFloat, math.sqrt(sumSq).toFloat, q))
  }

  override def nullSafeEval(input: Any): Any = quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("quantizer", this, classOf[QuantizeVec].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.quantize($v);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeVec {
  val quantizedType: StructType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("norm", FloatType, nullable = false),
    StructField("q", BinaryType, nullable = false)))
}

/** Approximate cosine over two [[QuantizeVec]] structs: the int8 dot
  * product accumulates in a long (no overflow below 2^46 dims), then
  * rescales by both quantization scales and divides by the EXACT stored
  * norms. Per-element error is bounded by the two rounding half-steps —
  * ≲1.6e-2 absolute on unit vectors — which is why callers re-rank a
  * widened candidate set with the exact cosine. Zero-norm or
  * dimension-mismatched inputs → null.
  */
case class QuantizedCosine(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "quantized_cos"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // structural match, nullability ignored: parquet read-back forces struct
    // fields nullable (file sources apply asNullable), and the documented
    // store-then-score flow (`Similarity.quantized` at ingest, scoring
    // later) must accept its own round-tripped column
    def ok(dt: DataType) = dt match {
      case s: StructType =>
        s.fields.map(f => (f.name, f.dataType)).toSeq ==
          QuantizeVec.quantizedType.fields.map(f => (f.name, f.dataType)).toSeq
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two quantize_vec structs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  def score(a: InternalRow, b: InternalRow): Any = {
    val na = a.getFloat(1); val nb = b.getFloat(1)
    val qa = a.getBinary(2); val qb = b.getBinary(2)
    if (na == 0f || nb == 0f || qa.length != qb.length) return null
    var acc = 0L; var i = 0
    while (i < qa.length) { acc += qa(i) * qb(i); i += 1 }
    (a.getFloat(0).toDouble * b.getFloat(0).toDouble * acc) /
      (na.toDouble * nb.toDouble)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    score(l.asInstanceOf[InternalRow], r.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("qcos", this, classOf[QuantizedCosine].getName)
    // freshName: two quantized_cos calls over non-nullable inputs can land
    // in ONE generated scope (nullSafeExec only braces nullable children) —
    // a fixed local name would fail janino and drop to interpreted eval
    val r = ctx.freshName("qcosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |Object $r = $self.score($a, $b);
       |if ($r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) $r).doubleValue(); }
     """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Multi-probe sign-LSH bucket assignment (Lu et al., VLDB 2007 adapted to
  * hyperplane LSH): for each table, emits the main bucket PLUS the
  * `nProbes` neighbor buckets reached by flipping the hyperplane bits with
  * the smallest |margin| (|v·p| — the bits most likely to differ for a true
  * near neighbor, since a close pair disagrees on a plane only when one of
  * them lies near it). Probing neighbor buckets raises the per-table
  * collision probability so the table count L can stay near its floor
  * instead of growing with the corpus — the lever that tames the measured
  * superlinear x2_embed_dup wall (L ∝ n^0.66 at threshold 0.4 without it).
  *
  * Output layout: flat array<int> of length nTables·(1+nProbes); element
  * t·(1+nProbes)+k is table t's k-th probe bucket (k=0 the main bucket,
  * then flips by ascending |margin|, ties on lower plane index). Consumers
  * posexplode and derive (tbl = pos / (1+nProbes), isMain = pos %
  * (1+nProbes) == 0); with nProbes=0 this is exactly [[SignBuckets]].
  *
  * Same reference-object/codegen discipline as SignBuckets: the plane
  * matrix is ONE plan node, margins are computed once per row, and the
  * flip selection is nProbes passes over the per-table margin array
  * (nProbes ≤ 6 in practice).
  */
case class SignBucketsMultiProbe(child: Expression, planes: Seq[Seq[Double]],
    planesPerTable: Int, nProbes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.nonEmpty && planes.length % planesPerTable == 0,
    "planes must divide evenly into tables")
  // same Int-packing bound as SignBuckets — bit 32 would alias bit 0
  require(planesPerTable >= 1 && planesPerTable <= 31,
    "planesPerTable must be in [1, 31] (Int bucket packing)")
  require(nProbes >= 0 && nProbes <= planesPerTable,
    "nProbes must be in [0, planesPerTable]")
  override def prettyName: String = "sign_buckets_multiprobe"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.sql}")
    }
  // hoisted: these kernels read it once or twice PER VECTOR ELEMENT on
  // the generated-code hot path — a dataType pattern-match per
  // multiply-add would cost a virtual call + cast millions of times per
  // task; the child's type is fixed for the expression's lifetime
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray

  /** Per-row kernel (called from generated code via a reference object). */
  def buckets(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n != mat(0).length) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
      i += 1
    }
    val nTables = mat.length / planesPerTable
    val stride = 1 + nProbes
    val out = new Array[Int](nTables * stride)
    val margin = new Array[Double](planesPerTable)
    val flipped = new Array[Boolean](planesPerTable)
    var t = 0
    while (t < nTables) {
      var main = 0
      var j = 0
      while (j < planesPerTable) {
        val p = mat(t * planesPerTable + j)
        var s = 0.0; var i2 = 0
        while (i2 < n) { s += v(i2) * p(i2); i2 += 1 }
        if (s >= 0) main |= (1 << j)
        margin(j) = math.abs(s)
        j += 1
      }
      out(t * stride) = main
      java.util.Arrays.fill(flipped, false)
      var k = 0
      while (k < nProbes) {
        var best = -1; var bm = Double.MaxValue
        var j2 = 0
        while (j2 < planesPerTable) {
          if (!flipped(j2) && margin(j2) < bm) { bm = margin(j2); best = j2 }
          j2 += 1
        }
        if (best < 0) {
          // all remaining margins NaN (a NaN vector component poisons every
          // dot product) — flip the first unflipped bit so one bad row
          // degrades deterministically instead of crashing the job
          var j3 = 0
          while (best < 0 && j3 < planesPerTable) {
            if (!flipped(j3)) best = j3; j3 += 1
          }
        }
        flipped(best) = true
        out(t * stride + 1 + k) = main ^ (1 << best)
        k += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("multiProbe", this,
      classOf[SignBucketsMultiProbe].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $self.buckets($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nAssign`-nearest coarse-centroid assignment in ONE expression node: for
  * a vector row, scans the centroid matrix (a codegen reference object, like
  * [[SignBuckets]]' planes) and returns the `nAssign` nearest cell ids by L2
  * distance, nearest first, ties broken on lower cell id.
  *
  * This replaces the literal-array formulation of IVF assignment
  * (`array(l2_dist(v, array(lit…)), …)` — nCells × dim literal nodes): at
  * 245 cells × 64 dims that plan carried ~16k literal nodes, blew past
  * janino's method limits into interpreted eval, and made assignment wall
  * time scale with PLAN size, not FLOPs (the measured x3_ann_ivf 4.8× at 3×
  * data). Here the plan cost is O(1) nodes and the per-row cost is the
  * honest nCells·dim multiply-adds in a tight primitive loop, executed via
  * one reference-object call from generated code. Distances are compared as
  * squared L2 (same ordering, no sqrt).
  *
  * `centroids` is Seq-of-Seq so case-class equality is structural —
  * identically-parameterized NearestCells are semanticEquals (CSE / cache /
  * exchange reuse), the same reasoning as SignBuckets.
  *
  * Returns null on a dimension mismatch with the centroid matrix.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], nAssign: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nAssign >= 1 && nAssign <= centroids.length,
    "nAssign must be in [1, centroids.length]")
  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.sql}")
    }
  // hoisted: these kernels read it once or twice PER VECTOR ELEMENT on
  // the generated-code hot path — a dataType pattern-match per
  // multiply-add would cost a virtual call + cast millions of times per
  // task; the child's type is fixed for the expression's lifetime
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val mat: Array[Array[Double]] = centroids.map(_.toArray).toArray

  /** The per-row kernel, called from generated code via a reference object.
    * Selection is nAssign passes over the distance array (nAssign ≤ 4 in
    * practice; O(cells·nAssign) beats a full sort for small nAssign).
    */
  def assign(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n != mat(0).length) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
      i += 1
    }
    val k = mat.length
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val p = mat(c)
      var s = 0.0; var j = 0
      while (j < n) { val d = v(j) - p(j); s += d * d; j += 1 }
      d2(c) = s; c += 1
    }
    val out = new Array[Long](nAssign)
    val taken = new Array[Boolean](k)
    var a = 0
    while (a < nAssign) {
      var best = -1; var bd = Double.MaxValue
      var j = 0
      while (j < k) {
        if (!taken(j) && d2(j) < bd) { bd = d2(j); best = j }
        j += 1
      }
      if (best < 0) {
        // every remaining distance is NaN or >= MaxValue (e.g. a NaN
        // component poisons all d2) — fall back to the first untaken cell
        // so a single bad vector degrades deterministically instead of
        // crashing the job (the pre-round-13 literal-array argmin also
        // tolerated NaN)
        var j2 = 0
        while (best < 0 && j2 < k) { if (!taken(j2)) best = j2; j2 += 1 }
      }
      taken(best) = true
      out(a) = best.toLong
      a += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $self.assign($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/* Round-20 prune: the driver-built VectorTable + fused PairCosine
 * expression (a rejected alternative to the embed-dup verify's two
 * BroadcastHashJoins) lived here as probe-only code since round 13.
 * The measured decision they recorded: Spark's LongHashedRelation
 * broadcast probe on a dense long key is already a primitive array
 * index with zero-copy packed-byte vector reads, and the driver-side
 * single-threaded table collect costs more than the executor-parallel
 * broadcast build it would replace — so the operator keeps the join
 * form, and the fused form (bit-identical cosine kernel, symmetric
 * diff pinned at 0 before removal) was deleted with the Probe* mains.
 */

/** Mutable elementwise-sum state for [[VectorSumAgg]]: a dense double
  * array grown to the widest vector seen (posexplode semantics — each
  * vector contributes to the indices it has); null until the first
  * non-null input, which is how an all-null group evals to null instead
  * of a zero vector.
  */
final class VecSumBuffer(var sums: Array[Double]) {
  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val len = v.numElements()
    if (sums == null) sums = new Array[Double](len)
    else if (len > sums.length) sums = java.util.Arrays.copyOf(sums, len)
    var i = 0
    while (i < len) {
      // null ELEMENTS skip their index — exactly posexplode + sum(v)
      // semantics (sum skips nulls); without the guard the behavior
      // forked by physical row format (GenericArrayData NPE'd,
      // UnsafeArrayData silently added 0.0)
      if (!v.isNullAt(i))
        sums(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
  }
  def mergeIn(o: VecSumBuffer): Unit =
    if (o.sums != null) {
      if (sums == null) sums = o.sums.clone()
      else {
        if (o.sums.length > sums.length)
          sums = java.util.Arrays.copyOf(sums, o.sums.length)
        var i = 0
        while (i < o.sums.length) { sums(i) += o.sums(i); i += 1 }
      }
    }
}

/** Per-dimension elementwise SUM of an array column as ONE native
  * [[org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate]]
  * — the aggregate that lets the windowed drift monitor (X29 streaming
  * form) be a SINGLE stateful aggregation per (window, stratum) cell:
  * Spark refuses chained streaming aggregations, so the dim-row
  * posexplode shape (groupBy window,stratum,i, then a second fold across
  * dims) cannot stream; this folds the whole vector straight into cell
  * state. State per cell = dim doubles (+8 bytes), exactly the artifact
  * row the cell emits. Null inputs are skipped; vectors of differing
  * length contribute to the indices they have (posexplode semantics —
  * callers filter to clean uniform vectors anyway, the embedding-column
  * contract). Same update/merge/serialize skeleton as
  * [[QuantileSketchBuild]].
  */
case class VectorSumAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[VecSumBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "vec_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.sql}")
    }
  // hoisted: these kernels read it once or twice PER VECTOR ELEMENT on
  // the generated-code hot path — a dataType pattern-match per
  // multiply-add would cost a virtual call + cast millions of times per
  // task; the child's type is fixed for the expression's lifetime
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer(null)

  override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], isFloat)
    b
  }

  override def merge(b: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    b.mergeIn(other); b
  }

  override def eval(b: VecSumBuffer): Any =
    if (b.sums == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(b.sums)

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val len = if (b.sums == null) -1 else b.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * math.max(0, len))
    bb.putInt(len)
    if (len > 0) b.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val len = bb.getInt
    if (len < 0) new VecSumBuffer(null)
    else {
      val a = new Array[Double](len)
      var i = 0
      while (i < len) { a(i) = bb.getDouble; i += 1 }
      new VecSumBuffer(a)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSumAgg =
    copy(child = c)
}

object VectorFunctions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)
  def vec_dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def cosine_sim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def l2_dist(a: Column, b: Column): Column = c(L2Distance(e(a), e(b)))
  def sign_buckets(v: Column, planes: Seq[Seq[Double]], planesPerTable: Int): Column =
    c(SignBuckets(e(v), planes, planesPerTable))
  def sign_buckets_multiprobe(v: Column, planes: Seq[Seq[Double]],
      planesPerTable: Int, nProbes: Int): Column =
    c(SignBucketsMultiProbe(e(v), planes, planesPerTable, nProbes))
  def nearest_cells(v: Column, centroids: Seq[Seq[Double]], nAssign: Int): Column =
    c(NearestCells(e(v), centroids, nAssign))
  def quantize_vec(v: Column): Column = c(QuantizeVec(e(v)))
  def quantized_cos(a: Column, b: Column): Column = c(QuantizedCosine(e(a), e(b)))
  def vec_sum(v: Column): Column =
    c(VectorSumAgg(e(v)).toAggregateExpression())
}
