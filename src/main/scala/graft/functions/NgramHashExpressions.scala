package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-n-gram hashing as native per-row kernels.
  *
  * The dedup paths (minhash LSH, duplicate spans) key every n-gram by a
  * hash. Building the n-gram STRING first (`concat_ws` over token slices,
  * then md5/xxhash64 the ~25 B result) was the 1M-rung CPU bound; a
  * higher-order-function rewrite (transform/aggregate lambdas over token
  * hash arrays) removed the strings but replaced them with Catalyst's
  * INTERPRETED per-element lambda machinery and measured ~15% SLOWER on a
  * matched-floor interleaved A/B; a matched kernel probe then showed the
  * per-row hash CPU itself is NOT the bound (md5 is block-based: a 7-byte
  * token costs the same one block as a 25-byte shingle) — the bound is
  * the RELATION machinery around it. These expressions therefore compute
  * per-DOCUMENT results in one tight primitive loop per row (hash each
  * token once, combine windows arithmetically), which lets the operators
  * above drop the exploded shingle relation entirely where the result is
  * a per-document function (the minhash signature). The eval is a single
  * virtual call per ROW from the surrounding WholeStageCodegen stage (the
  * [[L2Normalize]] array-returning pattern).
  *
  * Hash domains (LOCKED to the q28/q29/q94 oracle derivations):
  *  - per-token h64 = XXH64(utf8 bytes, seed 42) — identical to Spark's
  *    builtin `xxhash64(token)`;
  *  - window h64 key = the builtin varargs chain `xxhash64(t_i..t_{i+n-1})`
  *    over the token hashes (seed 42, each value folded with the running
  *    hash as seed) — internal join/distinct key, ~2^-64 collisions;
  *  - window signature h = fold `acc = (acc * sigMul + md5_32(token)) %
  *    sigMod` — replayed verbatim in BIGINT arithmetic by the DuckDB
  *    oracles (md5 is the one hash every engine computes identically);
  *    every intermediate stays below 2^52 for sigMod ~2^31, sigMul ~2^20.
  */
private[graft] object NgramHashKernels {
  private val XxSeed = 42L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value — exactly
    * [[TextAnalysis.md5Hash32]]'s `conv(substring(md5(...), 1, 8), 16, 10)`. */
  def md5Hash32(s: UTF8String): Long = {
    val d = md5.get(); d.reset()
    val out = d.digest(s.getBytes)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }

  /** Spark-builtin-identical xxhash64 of a string (seed 42). */
  def xx64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, XxSeed)

  /** Order-preserving window keys, one per 1-based start position — the
    * builtin chain `xxhash64(th(i), ..., th(i+n-1))`, NO distinct. */
  def ngramKeys64(tokens: ArrayData, n: Int): ArrayData = {
    val k = tokens.numElements()
    val cnt = k - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](k)
    var i = 0
    while (i < k) { th(i) = xx64(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var h = XxSeed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The FULL minhash signature of one document in one loop: for every
    * n-token window compute the signature-domain hash hs (the mod-sigMod
    * md5-token fold) and fold it through every permutation
    * `(a(p)*hs + b(p)) % sigMod`, keeping per-permutation minima. Returns
    * NULL for a windowless document — callers either coalesce to the
    * sentinel (signature surface) or let generators skip the row
    * (banding). Returning null instead of a sentinel array matters for
    * the LSH plan: a sentinel would need a post-hoc Filter on the derived
    * column, and predicate pushdown substitutes the alias — the kernel
    * would run TWICE per row (measured +30% on the interleaved A/B).
    *
    * When (a, b) are arithmetic progressions (the [[graft.operators.Dedup]]
    * permutation families: a_i = 1+2i, b_i = 7919i, both wrap-free for
    * ~2^31 moduli at 32 hashes), each permutation value is the previous
    * plus a per-window constant mod sigMod — one branchy add per
    * permutation instead of a 64-bit multiply+mod, ~3x less arithmetic in
    * the hot loop. Falls back to the general multiply+mod otherwise. */
  def minhashSignature(tokens: ArrayData, n: Int, sigMul: Long, sigMod: Long,
                       a: Array[Long], b: Array[Long]): ArrayData = {
    val k = tokens.numElements()
    val cnt = k - (n - 1)
    if (cnt <= 0) return null
    val nh = a.length
    val out = Array.fill(nh)(sigMod)
    val affine = nh > 1 && {
      val da = a(1) - a(0); val db = b(1) - b(0)
      var p = 2; var ok = da >= 0 && db >= 0 && a.last < sigMod && b.last < sigMod
      while (ok && p < nh) {
        ok = a(p) - a(p - 1) == da && b(p) - b(p - 1) == db; p += 1
      }
      ok
    }
    val tm = new Array[Long](k)
    var i = 0
    while (i < k) { tm(i) = md5Hash32(tokens.getUTF8String(i)); i += 1 }
    i = 0
    while (i < cnt) {
      var hs = 0L
      var j = 0
      while (j < n) { hs = (hs * sigMul + tm(i + j)) % sigMod; j += 1 }
      if (affine) {
        var v = (a(0) * hs + b(0)) % sigMod
        val t = ((a(1) - a(0)) * hs + (b(1) - b(0))) % sigMod
        var p = 0
        while (p < nh) {
          if (v < out(p)) out(p) = v
          v += t
          if (v >= sigMod) v -= sigMod
          p += 1
        }
      } else {
        var p = 0
        while (p < nh) {
          val v = (a(p) * hs + b(p)) % sigMod
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] abstract class TokenArrayKernel extends UnaryExpression {
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<STRING> tokens, got ${other.simpleString}")
    }

  // Interpreted eval only (the L2Normalize pattern): the surrounding stage
  // stays in whole-stage codegen; this is one virtual call per row whose
  // body is a primitive loop.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("kernel", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);"
    })
}

/** First 60 md5 bits as a long — [[TextAnalysis.md5Hash60]]'s
  * `conv(substr(md5(x), 1, 15), 16, 10)` without materializing the 32-char
  * hex string: 15 hex nibbles = bytes 0–6 big-endian, then the high nibble
  * of byte 7. */
private[graft] object Md5Kernels {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Hash60(s: UTF8String): Long = {
    val dg = md5.get(); dg.reset()
    val d = dg.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** `long` md5-32 of a string — identical to the
  * `conv(substring(md5(cast binary), 1, 8), 16, 10)` Catalyst chain it
  * replaces (r14: the chain built a 32-char hex string and parsed 8 chars
  * back per value; the kernel reads 4 digest bytes). The md5 DOMAIN is
  * oracle-load-bearing (q95/q98 replay it in SQL) — only the computation
  * route changed. */
case class Md5Hash32Expr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_hash32"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires STRING, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    NgramHashKernels.md5Hash32(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("kernel", this, getClass.getName)
      s"${ev.value} = (Long) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `long` md5-60 twin of [[Md5Hash32Expr]] (the simhash sketch domain). */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_hash60"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires STRING, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    Md5Kernels.md5Hash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("kernel", this, getClass.getName)
      s"${ev.value} = (Long) $expr.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `array<long>` of [[NgramHashKernels.ngramKeys64]] window keys. */
case class TokenNgramKeys64(child: Expression, n: Int) extends TokenArrayKernel {
  require(n >= 1, s"n-gram order must be >= 1: $n")
  override def prettyName: String = "token_ngram_keys64"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NgramHashKernels.ngramKeys64(v.asInstanceOf[ArrayData], n)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `array<long>` minhash signature of [[NgramHashKernels.minhashSignature]]
  * (all-`sigMod` sentinel for windowless documents). */
case class MinhashSignatureExpr(child: Expression, n: Int, sigMul: Long,
                                sigMod: Long, a: Seq[Long], b: Seq[Long])
  extends TokenArrayKernel {
  require(n >= 1, s"shingle order must be >= 1: $n")
  require(a.nonEmpty && a.length == b.length, "permutation arrays must align")
  require(sigMod > 1 && sigMul > 0 &&
    (sigMod - 1) * sigMul + (1L << 32) < (1L << 62),
    s"signature fold ($sigMul, $sigMod) must not overflow 64-bit arithmetic")
  require(a.forall(x => x > 0 && x * (sigMod - 1) + (sigMod - 1) < (1L << 62)),
    "permutation multipliers must not overflow 64-bit arithmetic")
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null also for WINDOWLESS (non-null) token arrays — see the kernel's
  // pushdown rationale
  override def nullable: Boolean = true

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(v: Any): Any =
    NgramHashKernels.minhashSignature(v.asInstanceOf[ArrayData], n, sigMul, sigMod, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("kernel", this, getClass.getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
