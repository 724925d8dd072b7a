package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Distance kernels as native Catalyst expressions with whole-stage codegen.
  *
  * The reference computes these with NumPy BLAS over a contiguous float32
  * matrix (reference parallel_search.py:105-134, vectordb_optimized.py:669-676).
  * The Spark-native analog is a primitive-array loop inside generated Java —
  * no boxing, no UDF serialization, fused into the surrounding
  * WholeStageCodegen stage. Accumulation is double-precision in index order
  * so results are reproducible and match a straightforward SQL oracle.
  *
  * All kernels accept ARRAY<FLOAT> or ARRAY<DOUBLE> children (mixed is fine)
  * and return DOUBLE.
  */
abstract class VectorBinaryKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>/ARRAY<DOUBLE> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline protected final def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java accessor snippet for codegen. */
  protected final def acc(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double)$v.getFloat($i)" else s"$v.getDouble($i)"
}

/** 1 - dot(a,b)/(|a||b|); zero-norm input => distance 1.0
  * (reference parallel_search.py:119-126). */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "cosine_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val fa = elemIsFloat(left); val fb = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, fa); val y = get(b, i, fb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fa = elemIsFloat(left); val fb = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${acc(a, i, fa)}; double $y = ${acc(b, i, fb)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 1.0
         |  : 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean distance sqrt(sum((a-b)^2)) (reference parallel_search.py:127-132). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val fa = elemIsFloat(left); val fb = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, i, fa) - get(b, i, fb); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fa = elemIsFloat(left); val fb = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${acc(a, i, fa)} - ${acc(b, i, fb)};
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product sum(a*b). Inner-product *distance* is its negation
  * (reference parallel_search.py:133-134). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val fa = elemIsFloat(left); val fb = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, fa) * get(b, i, fb); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fa = elemIsFloat(left); val fb = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += ${acc(a, i, fa)} * ${acc(b, i, fb)}; }
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2-normalize a float/double array; zero vector passes through unchanged
  * (reference vectordb.py:738-739 normalizes inputs the same way). Returns
  * ARRAY<DOUBLE> so downstream arithmetic is precision-stable. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"l2_normalize requires ARRAY<FLOAT>/ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0; var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x; s += x * x; i += 1
    }
    if (s > 0.0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0; while (i < n) { out(i) *= inv; i += 1 }
    }
    new GenericArrayData(out)
  }

  // Interpreted eval only; normalization sits off the per-pair hot loop
  // (applied once per row, not per candidate pair).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("l2norm", this, classOf[L2Normalize].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two packed-bit BINARY values: popcount(a XOR b)
  * (reference quantization.py:356-374 does XOR + popcount on packed uint8). */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_distance"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hamming_distance requires BINARY inputs")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]; val b = r.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var s = 0; var i = 0
    while (i < n) { s += Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pack an ARRAY<INT>/ARRAY<BOOLEAN> of 0/1 bit flags into BINARY, MSB-first
  * per byte — same layout as numpy packbits used by the reference
  * (quantization.py:329-350). */
case class PackBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | BooleanType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_bits requires ARRAY<INT> or ARRAY<BOOLEAN>, got ${other.simpleString}")
    }

  private def isBool: Boolean = child.dataType match {
    case ArrayType(BooleanType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val bit = if (isBool) { if (a.getBoolean(i)) 1 else 0 } else a.getInt(i)
      if (bit != 0) out(i / 8) = (out(i / 8) | (0x80 >>> (i % 8))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("packbits", this, classOf[PackBits].getName)
      s"${ev.value} = (byte[]) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IEEE 754 half-precision conversion kernels for the fp16 at-rest codec
  * (reference binary_persistence.py:347-349 compress_vectors: none | fp16 |
  * int8 — int8 is the SQ path, this is the fp16 rung: 2 bytes/dim, ~no
  * recall loss at embedding magnitudes).
  *
  * Float -> half uses ROUND-HALF-TO-EVEN on the half grid, the IEEE
  * default (numpy's astype(float16) behavior). The arithmetic is done in
  * exact double steps (power-of-two grid spacing), so a SQL oracle can
  * replay decode(encode(x)) with plain floor/CASE arithmetic and match
  * bit-for-bit — the q16/q17 stance for SQ. */
object Fp16 {
  /** Round a float to IEEE half, returned as the raw 16-bit pattern.
    * All arithmetic exact: |f| as double is exact, the grid spacing is a
    * power of two, the quotient keeps the full mantissa, and rint is
    * round-half-even. */
  def floatToHalf(f: Float): Short = {
    if (java.lang.Float.isNaN(f)) return 0x7e00.toShort
    val sign = if ((java.lang.Float.floatToRawIntBits(f) & 0x80000000) != 0) 0x8000 else 0
    val a = math.abs(f).toDouble
    if (a == 0.0) return sign.toShort
    if (a >= 65520.0) return (sign | 0x7c00).toShort // rounds past max half -> inf
    var e = math.getExponent(a)
    if (e < -14) e = -14 // subnormal half grid
    val scale = java.lang.Math.scalb(1.0, e - 10) // grid spacing 2^(e-10)
    var q = java.lang.Math.rint(a / scale).toInt // exact quotient, RNE
    if (q == 2048) { q = 1024; e += 1 } // rounding carried into the next binade
    val bits =
      if (q < 1024) sign | q // subnormal (e == -14)
      else sign | ((e + 15) << 10) | (q - 1024)
    bits.toShort
  }

  /** Exact value of a half bit pattern (half values are exact in float). */
  def halfToFloat(h: Short): Float = {
    val u = h & 0xffff
    val sign = if ((u & 0x8000) != 0) -1.0 else 1.0
    val exp = (u >>> 10) & 0x1f
    val mant = u & 0x3ff
    if (exp == 0x1f)
      return if (mant != 0) Float.NaN
      else (sign * Double.PositiveInfinity).toFloat
    val v =
      if (exp == 0) mant * java.lang.Math.scalb(1.0, -24)
      else (1024 + mant) * java.lang.Math.scalb(1.0, exp - 25)
    (sign * v).toFloat
  }
}

/** ARRAY<FLOAT/DOUBLE> -> BINARY, 2 bytes per element, little-endian IEEE
  * half. Halves the at-rest footprint vs float32 with ~2^-11 relative
  * rounding error — the cheap middle rung between raw floats and SQ int8. */
case class Fp16Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fp16_encode"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fp16_encode requires ARRAY<FLOAT>/ARRAY<DOUBLE>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i) else a.getDouble(i).toFloat
      val h = Fp16.floatToHalf(x)
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  // Interpreted body behind a codegen call — encode runs once per row at
  // write time, never in a per-pair hot loop.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("fp16enc", this, classOf[Fp16Encode].getName)
      s"${ev.value} = (byte[]) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BINARY (little-endian halves) -> ARRAY<FLOAT>. */
case class Fp16Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fp16_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fp16_decode requires BINARY, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val n = b.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val h = ((b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)).toShort
      out(i) = Fp16.halfToFloat(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("fp16dec", this, classOf[Fp16Decode].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level API for the vector kernels. */
object vector {
  def cosineDistance(a: Column, b: Column): Column =
    Bridge.column(CosineDistance(Bridge.expression(a), Bridge.expression(b)))
  def l2Distance(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  /** Negated inner product, so that smaller == closer for every metric. */
  def ipDistance(a: Column, b: Column): Column = -dotProduct(a, b)
  def l2Normalize(a: Column): Column = Bridge.column(L2Normalize(Bridge.expression(a)))
  def hammingDistance(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))
  def packBits(a: Column): Column = Bridge.column(PackBits(Bridge.expression(a)))
  def fp16Encode(a: Column): Column = Bridge.column(Fp16Encode(Bridge.expression(a)))
  def fp16Decode(a: Column): Column = Bridge.column(Fp16Decode(Bridge.expression(a)))

  /** Distance column for a metric name (cosine | l2 | ip), mirroring the
    * reference's metric enum (vectordb.py:59-62). */
  def distance(metric: String, a: Column, b: Column): Column = metric match {
    case "cosine" => cosineDistance(a, b)
    case "l2" => l2Distance(a, b)
    case "ip" => ipDistance(a, b)
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Register SQL names for the kernels on a session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_distance", es => CosineDistance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("hamming_distance", es => HammingDistance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("pack_bits", es => PackBits(es.head), "built-in")
    reg.createOrReplaceTempFunction("fp16_encode", es => Fp16Encode(es.head), "built-in")
    reg.createOrReplaceTempFunction("fp16_decode", es => Fp16Decode(es.head), "built-in")
  }
}
