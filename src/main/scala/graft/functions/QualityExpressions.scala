package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heuristic quality score as ONE per-row kernel (r14, guide §1.2 "per-task
  * work" / §4 "prefer native code for bulk per-row logic").
  *
  * The column-algebra form ([[TextAnalysis.qualityScore]]'s pre-r14 body)
  * evaluated THREE regex passes over the text (split for tokens, a
  * character-class regexp_replace for the punctuation count, plus lower())
  * and three interpreted higher-order lambdas (transform+aggregate for mean
  * word length, filter+array_contains for stopword hits) per row — and the
  * operators that gate on quality evaluate the expression on BOTH sides of
  * their threshold join (percentileGate probes + threshold), so every
  * curation pass paid it twice. This kernel computes the identical double
  * in two code-point sweeps (original text for the punctuation/char counts,
  * lowercased text for tokens) with zero regex and zero per-element lambda
  * dispatch.
  *
  * BIT-EXACT CONTRACT (the q25/q104/q106/q108/q111/q139 oracles replay the
  * formula in SQL): every intermediate reproduces the Catalyst expression
  * tree it replaces —
  *  - nChars = `length(text)` = code-point count;
  *  - tokens = `filter(split(lower(text), SplitClass), _ != "")` — maximal
  *    runs of [a-z0-9_À-ɏ一-鿿] over the SAME
  *    UTF8String.toLowerCase the Lower expression calls;
  *  - meanWordLen = int token-length sum cast to double, / nToks;
  *  - punct = code points of the ORIGINAL text outside
  *    [A-Za-z0-9 \t\n\r\f\x0B] (what the regexp_replace left behind);
  *  - stopword hits = exact string equality against the 10-word en list;
  *  - the final combination uses the identical operation order
  *    (((len*0.3 + wl*0.2) + punct*0.3) + sw*0.2), so every double matches
  *    bit for bit. The trailing round(…, 6) stays OUTSIDE the kernel, in
  *    [[TextAnalysis.qualityScore]], unchanged.
  * QualityKernelSpec asserts kernel == legacy column algebra over the real
  * corpus and adversarial edge cases.
  */
private[graft] object QualityScoreKernel {
  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextAnalysis.stopwords("en").foreach(s.add)
    s
  }

  @inline private def isTokenChar(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == '_' ||
      (cp >= 0xC0 && cp <= 0x24F) || (cp >= 0x4E00 && cp <= 0x9FFF)

  @inline private def isKeptChar(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= '0' && cp <= '9') || cp == ' ' || cp == '\t' || cp == '\n' ||
      cp == '\r' || cp == '\f' || cp == 0x0B

  def score(text: UTF8String): Double = {
    val orig = text.toString
    val nChars = text.numChars().toDouble
    // punctuation sweep over the ORIGINAL text
    var punctN = 0L
    var i = 0
    while (i < orig.length) {
      val cp = orig.codePointAt(i)
      if (!isKeptChar(cp)) punctN += 1
      i += Character.charCount(cp)
    }
    // token sweep over the LOWERCASED text (same lowercase as Catalyst Lower)
    val low = text.toLowerCase.toString
    var nToks = 0L
    var sumLen = 0L   // token lengths in code points (the `length(t)` sum)
    var swHits = 0L
    i = 0
    var runStart = -1
    var runLen = 0
    def closeRun(endIdx: Int): Unit = {
      if (runStart >= 0) {
        nToks += 1
        sumLen += runLen
        if (runLen <= 4 && Stopwords.contains(low.substring(runStart, endIdx)))
          swHits += 1
        runStart = -1
        runLen = 0
      }
    }
    while (i < low.length) {
      val cp = low.codePointAt(i)
      if (isTokenChar(cp)) {
        if (runStart < 0) runStart = i
        runLen += 1
      } else closeRun(i)
      i += Character.charCount(cp)
    }
    closeRun(low.length)

    val nToksD = nToks.toDouble
    val meanWordLen = if (nToksD > 0) sumLen.toDouble / nToksD else 0.0
    val punctRatio = if (nChars > 0) punctN.toDouble / nChars else 1.0
    val swRatio = if (nToksD > 0) swHits.toDouble / nToksD else 0.0
    val lenScore = math.min(nChars / 500.0, 1.0)
    val wordLenScore = 1.0 - math.min(math.abs(meanWordLen - 5.0) / 5.0, 1.0)
    val punctScore = 1.0 - math.min(punctRatio * 4.0, 1.0)
    val swScore = math.min(swRatio * 4.0, 1.0)
    lenScore * 0.3 + wordLenScore * 0.2 + punctScore * 0.3 + swScore * 0.2
  }
}

/** `double` quality score of a string column — [[QualityScoreKernel]].
  * Interpreted eval from the surrounding codegen stage (one virtual call
  * per row whose body is two primitive sweeps — the TokenArrayKernel
  * stance). */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quality_score_kernel"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  /** NULL text scores 0.3 — NOT null. The column algebra this kernel
    * replaces propagates null through every branch EXCEPT
    * `least(null / 500.0, 1.0)`: Catalyst Least ignores nulls, so the
    * length clamp becomes 1.0 while the three `when(...).otherwise`
    * branches take their zero arms — total 1.0*0.3 = 0.3 exactly. A
    * nullIntolerant kernel would silently change the score of null-text
    * rows, and gates compare `score >= threshold`, where null and 0.3
    * disagree for thresholds <= 0.3. */
  private val NullScore = 0.3

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NullScore
    else QualityScoreKernel.score(v.asInstanceOf[UTF8String])
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires STRING, got ${other.simpleString}")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = ${c.isNull} ? 0.3
          : graft.functions.QualityScoreKernel.score(${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
