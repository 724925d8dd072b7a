package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Embedding pooling: collapse a group of vectors to their elementwise
  * mean — chunk embeddings to a document embedding, member embeddings to a
  * cluster centroid.
  *
  * The aggregation is a typed `Aggregator` whose buffer is one
  * dim-length double array + a count, so pooling is a single shuffle with
  * map-side partial aggregation: each partition reduces its rows to one
  * buffer per group before anything moves, and the exchange carries
  * |groups| x (dim+1) doubles — never the vectors themselves. (The
  * alternative posexplode formulation shuffles |rows| x dim scalar rows
  * and needs a second shuffle to reassemble arrays.)
  *
  * Accumulation is double-precision regardless of input width (float32
  * embeddings don't lose mass to float summation), in index order within
  * each partition. Null vectors are skipped; a group of only-null vectors
  * pools to null; mismatched dimensions inside a group fail loudly.
  */
object Pooling {

  private class MeanVec extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

    def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
      if (v == null) b
      else {
        val s = if (b._2 == 0L) new Array[Double](v.length) else b._1
        require(s.length == v.length,
          s"meanPool: dimension mismatch within a group (${s.length} vs ${v.length})")
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        (s, b._2 + 1)
      }
    }

    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._2 == 0L) y
      else if (y._2 == 0L) x
      else {
        require(x._1.length == y._1.length,
          s"meanPool: dimension mismatch within a group (${x._1.length} vs ${y._1.length})")
        val s = x._1
        var i = 0
        while (i < s.length) { s(i) += y._1(i); i += 1 }
        (s, x._2 + y._2)
      }
    }

    def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) null
      else {
        val out = new Array[Double](b._1.length)
        var i = 0
        while (i < out.length) { out(i) = b._1(i) / b._2; i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }

    def bufferEncoder: ExpressionEncoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: ExpressionEncoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** (groupCol, centroid: array<double>) — one row per group. Accepts any
    * numeric array column; floats widen to double exactly. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(udaf(new MeanVec, ExpressionEncoder[Seq[Double]]())(
        col(vecCol).cast("array<double>")).as("centroid"))
}
