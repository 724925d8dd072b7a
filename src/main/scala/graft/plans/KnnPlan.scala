package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Fused top-k similarity search as a first-class Catalyst operator — the
  * (c)-tier extension from the build rules: LogicalPlan + Strategy +
  * SparkPlan, registered through GraftExtensions.
  *
  * The composed form (crossJoin + distance Project + top-k aggregate)
  * materializes one joined row per (query, corpus) pair before the
  * aggregator discards all but k of them. This operator walks each corpus
  * partition ONCE, scores every row against the (small, plan-embedded)
  * query batch, and keeps bounded per-query heaps — emitting exactly
  * Q*k rows per partition. It is the reference's chunked parallel search
  * (`_search_chunk` + `_merge_top_k`, parallel_search.py:137-156, 313-368)
  * as a physical plan: the final per-query merge is a downstream
  * Q*k-row aggregation, identical partial/final structure.
  *
  * At cluster scale the wins compound: no Q*N row materialization, no
  * codegen'd-join boundary, and the emitted volume per partition is
  * constant in partition size.
  */
final case class KnnTopK(child: LogicalPlan,
                         queries: Array[(Long, Array[Float])],
                         k: Int, metric: String,
                         idOrdinal: Int, vecOrdinal: Int) extends UnaryNode {
  override val output: Seq[Attribute] = KnnTopK.output
  override protected def withNewChildInternal(c: LogicalPlan): KnnTopK = copy(child = c)
}

object KnnTopK {
  val output: Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("neighbor_id", LongType, nullable = false)(),
    AttributeReference("dist", DoubleType, nullable = false)())
}

final case class KnnTopKExec(child: SparkPlan,
                             queries: Array[(Long, Array[Float])],
                             k: Int, metric: String,
                             idOrdinal: Int, vecOrdinal: Int) extends UnaryExecNode {
  override def output: Seq[Attribute] = KnnTopK.output
  override protected def withNewChildInternal(c: SparkPlan): KnnTopKExec = copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val qs = queries
    val kk = k
    val m = metric
    val (idOrd, vecOrd) = (idOrdinal, vecOrdinal)
    child.execute().mapPartitions { iter =>
      // hoist per-query invariants: the vectors as primitive arrays and,
      // for cosine, sqrt of each query norm (the per-pair formula then
      // reuses sqrt(na)*sqrt(nb) in the same order as the codegen kernel,
      // so results stay bit-identical to the composed plan)
      val mcode = m match { case "cosine" => 0; case "l2" => 1; case "ip" => 2
        case other => throw new IllegalArgumentException(s"metric $other") }
      val qVecs: Array[Array[Float]] = qs.map(_._2)
      val qSqrtNorm: Array[Double] = qVecs.map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        math.sqrt(s)
      }
      // one bounded max-heap per query: worst candidate on top
      val heaps = Array.fill(qs.length)(
        new java.util.PriorityQueue[(Long, Double)](kk + 1,
          (a: (Long, Double), b: (Long, Double)) => {
            val c = java.lang.Double.compare(b._2, a._2)
            if (c != 0) c else java.lang.Long.compare(b._1, a._1)
          }))
      // one scratch buffer per partition: copying each row's vector into it
      // keeps the query loops on float[] (JIT-friendly, no ArrayData virtual
      // dispatch) WITHOUT allocating a fresh array per row — at 1M rows the
      // per-row toFloatArray() was ~0.5 GB of garbage per batch
      var scratch = new Array[Float](0)
      while (iter.hasNext) {
        val row = iter.next()
        val cid = row.getLong(idOrd)
        val arr = row.getArray(vecOrd)
        val vlen = arr.numElements()
        if (scratch.length < vlen) scratch = new Array[Float](vlen)
        val varr = scratch
        var ci = 0
        while (ci < vlen) { varr(ci) = arr.getFloat(ci); ci += 1 }
        val rowSqrtNorm = if (mcode == 0) {
          var s = 0.0; var i = 0
          while (i < vlen) { s += varr(i).toDouble * varr(i); i += 1 }
          math.sqrt(s)
        } else 0.0
        @inline def push(j: Int, d: Double): Unit = {
          val h = heaps(j)
          if (h.size < kk) h.add((cid, d))
          else {
            val worst = h.peek()
            if (d < worst._2 || (d == worst._2 && cid < worst._1)) {
              h.poll(); h.add((cid, d))
            }
          }
        }
        @inline def cosFin(j: Int, dot: Double): Unit = {
          val denom = rowSqrtNorm * qSqrtNorm(j)
          push(j, if (denom == 0.0) 1.0 else 1.0 - dot / denom)
        }
        var qi = 0
        // 4-query blocks: one pass over the row vector drives four
        // INDEPENDENT accumulator chains, overlapping the FP-add latency
        // a single dot product is bound by (a lone chain leaves the FPU
        // mostly idle). Each query's own accumulation order is unchanged,
        // so distances stay bit-identical to the one-query-at-a-time
        // path (and to the composed codegen plan). Blocks require equal
        // query dims — the scalar tail handles stragglers/mixed dims.
        while (qi + 4 <= qs.length && {
            val l = qVecs(qi).length
            qVecs(qi + 1).length == l && qVecs(qi + 2).length == l &&
              qVecs(qi + 3).length == l
          }) {
          val q0 = qVecs(qi); val q1 = qVecs(qi + 1)
          val q2 = qVecs(qi + 2); val q3 = qVecs(qi + 3)
          val n = math.min(vlen, q0.length)
          (mcode: @annotation.switch) match {
            case 0 =>
              var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
              var i = 0
              while (i < n) {
                val v = varr(i).toDouble
                d0 += v * q0(i); d1 += v * q1(i); d2 += v * q2(i); d3 += v * q3(i)
                i += 1
              }
              cosFin(qi, d0); cosFin(qi + 1, d1); cosFin(qi + 2, d2); cosFin(qi + 3, d3)
            case 1 =>
              var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
              var i = 0
              while (i < n) {
                val v = varr(i)
                val f0 = v - q0(i); s0 += f0.toDouble * f0
                val f1 = v - q1(i); s1 += f1.toDouble * f1
                val f2 = v - q2(i); s2 += f2.toDouble * f2
                val f3 = v - q3(i); s3 += f3.toDouble * f3
                i += 1
              }
              push(qi, math.sqrt(s0)); push(qi + 1, math.sqrt(s1))
              push(qi + 2, math.sqrt(s2)); push(qi + 3, math.sqrt(s3))
            case _ => // ip
              var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
              var i = 0
              while (i < n) {
                val v = varr(i).toDouble
                s0 += v * q0(i); s1 += v * q1(i); s2 += v * q2(i); s3 += v * q3(i)
                i += 1
              }
              push(qi, -s0); push(qi + 1, -s1); push(qi + 2, -s2); push(qi + 3, -s3)
          }
          qi += 4
        }
        while (qi < qs.length) {
          val q = qVecs(qi)
          val n = math.min(vlen, q.length)
          val d = (mcode: @annotation.switch) match {
            case 0 =>
              var dot = 0.0; var i = 0
              while (i < n) { dot += varr(i).toDouble * q(i); i += 1 }
              val denom = rowSqrtNorm * qSqrtNorm(qi)
              if (denom == 0.0) 1.0 else 1.0 - dot / denom
            case 1 =>
              var s = 0.0; var i = 0
              while (i < n) { val df = varr(i) - q(i); s += df.toDouble * df; i += 1 }
              math.sqrt(s)
            case _ => // ip
              var s = 0.0; var i = 0
              while (i < n) { s += varr(i).toDouble * q(i); i += 1 }
              -s
          }
          push(qi, d)
          qi += 1
        }
      }
      val proj = UnsafeProjection.create(KnnTopK.output.map(_.dataType).toArray)
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qs(qi)._1
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
        while (!h.isEmpty) buf += h.poll()
        buf.iterator.map { case (cid, d) =>
          out.update(0, qid); out.update(1, cid); out.update(2, d)
          proj(out).copy(): InternalRow
        }
      }
    }
  }
}

object KnnTopKExec {
  /** Same kernels as graft.functions.VectorExpressions, duplicated here as
    * tight loops over InternalRow ArrayData (no Column plumbing). */
  def distance(metric: String, a: ArrayData, q: Array[Float]): Double = {
    val n = math.min(a.numElements(), q.length)
    metric match {
      case "cosine" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = a.getFloat(i).toDouble; val y = q(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      case "l2" =>
        var s = 0.0; var i = 0
        while (i < n) { val d = a.getFloat(i) - q(i); s += d.toDouble * d; i += 1 }
        math.sqrt(s)
      case "ip" =>
        var s = 0.0; var i = 0
        while (i < n) { s += a.getFloat(i).toDouble * q(i); i += 1 }
        -s
      case other => throw new IllegalArgumentException(s"metric $other")
    }
  }
}

/** Planner strategy turning the logical KnnTopK into its exec node. */
object KnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnTopK(child, qs, k, metric, idOrd, vecOrd) =>
      KnnTopKExec(planLater(child), qs, k, metric, idOrd, vecOrd) :: Nil
    case _ => Nil
  }
}
