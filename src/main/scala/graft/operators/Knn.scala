package graft.operators

import graft.functions.vector
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder}

import scala.collection.mutable.ArrayBuffer

/** Exact batch k-nearest-neighbor similarity join.
  *
  * Semantics of the reference's hot path `Collection.search` / batch GEMM
  * search (reference vectordb.py:495-561, parallel_search.py:246-311): for
  * each query vector, the k closest corpus vectors under cosine / l2 / ip,
  * with an optional metadata pre-filter.
  *
  * Scale design (the part the reference cannot do — it is single-machine):
  *  - queries are broadcast (Q is small relative to corpus); the corpus is
  *    NEVER shuffled in full.
  *  - per-partition the distance kernel runs inside whole-stage codegen
  *    (graft.functions.CosineDistance et al).
  *  - top-k is a bounded typed Aggregator, so the map side reduces every
  *    partition to at most Q*k rows before the single shuffle — the same
  *    partial/final merge the reference hand-rolls in `_merge_top_k`
  *    (parallel_search.py:137-156, 313-368), but distributed. A window
  *    row_number over the cross join would shuffle Q*N rows instead; at
  *    100 TB that is the difference between a Q*k-row shuffle and an
  *    N-row-times-Q one.
  *  - the metadata filter is applied BEFORE the join, so it pushes down to
  *    the parquet scan (no k*10 over-fetch heuristic needed, cf.
  *    vectordb.py:519-521).
  */
object Knn {

  case class Neighbor(id: Long, dist: Double)

  /** Bounded top-k accumulator: keeps at most `pruneFactor*k` candidates
    * unsorted, pruning to k (by (dist, id) asc) when it overflows. */
  class TopKAggregator(k: Int) extends Aggregator[Neighbor, ArrayBuffer[Neighbor], Seq[Neighbor]] {
    private val cap = math.max(4 * k, 64)

    private def prune(b: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] = {
      val kept = b.sortInPlaceBy(n => (n.dist, n.id)).take(k)
      kept
    }

    override def zero: ArrayBuffer[Neighbor] = new ArrayBuffer[Neighbor](k + 1)
    override def reduce(b: ArrayBuffer[Neighbor], a: Neighbor): ArrayBuffer[Neighbor] = {
      b += a
      if (b.length > cap) prune(b) else b
    }
    override def merge(x: ArrayBuffer[Neighbor], y: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] = {
      x ++= y
      if (x.length > cap) prune(x) else x
    }
    override def finish(b: ArrayBuffer[Neighbor]): Seq[Neighbor] =
      b.sortInPlaceBy(n => (n.dist, n.id)).take(k).toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Neighbor]] =
      org.apache.spark.sql.Encoders.kryo[ArrayBuffer[Neighbor]]
    override def outputEncoder: Encoder[Seq[Neighbor]] = ExpressionEncoder[Seq[Neighbor]]()
  }

  /** Contrastive hard-negative mining: for each anchor (a query row
    * carrying its label), the k NEAREST corpus rows with a DIFFERENT
    * label — the highest-loss negatives an embedding/contrastive trainer
    * wants (in-batch random negatives are mostly easy; the informative
    * ones sit just across the decision boundary, which is exactly
    * "nearest with another label"). Same broadcast + bounded-top-k shape
    * as [[knnJoin]]; the label exclusion rides the broadcast join
    * condition because it is PER-ANCHOR — no static corpus pre-filter can
    * express it — and the corpus still never shuffles. Label comparison
    * is null-safe: a null-labeled anchor excludes only null-labeled rows.
    * Returns (queryId, rank, neighbor_id, dist). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    metric: String = "cosine",
                    queryId: String = "query_id", queryVec: String = "query_vec",
                    queryLabel: String = "query_label",
                    corpusId: String = "id", corpusVec: String = "vec",
                    corpusLabel: String = "label"): DataFrame =
    broadcastTopK(
      corpus.select(col(corpusId).cast("long").as("_cid"),
        col(corpusVec).as("_cvec"), col(corpusLabel).as("_clab")),
      queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec"),
        col(queryLabel).as("_qlab")),
      k, metric, queryId,
      pairFilter = Some(!(col("_clab") <=> col("_qlab"))))

  /** Shared broadcast top-k core of [[knnJoin]] / [[hardNegatives]]: the
    * corpus crossed with the broadcast query batch (optionally filtered
    * by a per-PAIR predicate over the prefixed columns), distances
    * scored, k kept per query by the bounded aggregator, unpacked to
    * (queryId, rank, neighbor_id, dist). One place owns the cast policy,
    * tie-breaking and output schema for both entry points. */
  private def broadcastTopK(corpusSide: DataFrame, querySide: DataFrame,
                            k: Int, metric: String, queryId: String,
                            pairFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val topk = udaf(new TopKAggregator(k), ExpressionEncoder[Neighbor]())
    val crossed = corpusSide.crossJoin(broadcast(querySide))
    pairFilter.map(crossed.where).getOrElse(crossed)
      .select(col("_qid"), col("_cid"),
        vector.distance(metric, col("_cvec"), col("_qvec")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId),
        (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"),
        col("_n.dist").as("dist"))
  }

  /** Batch kNN join: one row (query_id, rank, id, dist) per neighbor.
    *
    * @param queries DataFrame with (queryId, queryVec) columns; assumed small
    *                enough to broadcast (the reference's batch search makes
    *                the same assumption: the Q x N GEMM keeps Q in memory).
    * @param corpus  DataFrame with (corpusId: Long, corpusVec) columns.
    * @param filter  optional metadata pre-filter on corpus columns.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int,
              metric: String = "cosine",
              queryId: String = "query_id", queryVec: String = "query_vec",
              corpusId: String = "id", corpusVec: String = "vec",
              filter: Option[Filter] = None): DataFrame = {
    val filtered = filter.map(f => corpus.where(f.compile)).getOrElse(corpus)
    broadcastTopK(
      filtered.select(col(corpusId).cast("long").as("_cid"),
        col(corpusVec).as("_cvec")),
      queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec")),
      k, metric, queryId, pairFilter = None)
  }

  case class NeighborS(id: String, dist: Double)

  /** String-id twin of [[TopKAggregator]] — same bounded partial/final
    * merge, for corpora keyed by a natural string id (the client facade).
    * Avoids any hash surrogate: two distinct ids can never collide. */
  class TopKAggregatorS(k: Int) extends Aggregator[NeighborS, ArrayBuffer[NeighborS], Seq[NeighborS]] {
    private val cap = math.max(4 * k, 64)
    private def prune(b: ArrayBuffer[NeighborS]): ArrayBuffer[NeighborS] =
      b.sortInPlaceBy(n => (n.dist, n.id)).take(k)
    override def zero: ArrayBuffer[NeighborS] = new ArrayBuffer[NeighborS](k + 1)
    override def reduce(b: ArrayBuffer[NeighborS], a: NeighborS): ArrayBuffer[NeighborS] = {
      b += a
      if (b.length > cap) prune(b) else b
    }
    override def merge(x: ArrayBuffer[NeighborS], y: ArrayBuffer[NeighborS]): ArrayBuffer[NeighborS] = {
      x ++= y
      if (x.length > cap) prune(x) else x
    }
    override def finish(b: ArrayBuffer[NeighborS]): Seq[NeighborS] =
      b.sortInPlaceBy(n => (n.dist, n.id)).take(k).toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[NeighborS]] =
      org.apache.spark.sql.Encoders.kryo[ArrayBuffer[NeighborS]]
    override def outputEncoder: Encoder[Seq[NeighborS]] = ExpressionEncoder[Seq[NeighborS]]()
  }

  /** [[knnJoin]] for string corpus ids — identical plan shape (broadcast
    * queries, map-side bounded top-k, Q*k-row shuffle); ties order by
    * (dist, id-lexicographic). */
  def knnJoinStr(queries: DataFrame, corpus: DataFrame, k: Int,
                 metric: String = "cosine",
                 queryId: String = "query_id", queryVec: String = "query_vec",
                 corpusId: String = "id", corpusVec: String = "vec",
                 filter: Option[Filter] = None): DataFrame = {
    val filtered = filter.map(f => corpus.where(f.compile)).getOrElse(corpus)
    broadcastTopKStr(
      filtered.select(col(corpusId).cast("string").as("_cid"),
        col(corpusVec).as("_cvec")),
      queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec")),
      k, metric, queryId, pairFilter = None)
  }

  /** [[hardNegatives]] with STRING corpus ids — the collection facade's
    * natural document keys. */
  def hardNegativesStr(queries: DataFrame, corpus: DataFrame, k: Int,
                       metric: String = "cosine",
                       queryId: String = "query_id", queryVec: String = "query_vec",
                       queryLabel: String = "query_label",
                       corpusId: String = "id", corpusVec: String = "vec",
                       corpusLabel: String = "label"): DataFrame =
    broadcastTopKStr(
      corpus.select(col(corpusId).cast("string").as("_cid"),
        col(corpusVec).as("_cvec"), col(corpusLabel).as("_clab")),
      queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec"),
        col(queryLabel).as("_qlab")),
      k, metric, queryId,
      pairFilter = Some(!(col("_clab") <=> col("_qlab"))))

  /** String-keyed twin of [[broadcastTopK]] (NeighborS aggregator),
    * shared by [[knnJoinStr]] / [[hardNegativesStr]]. */
  private def broadcastTopKStr(corpusSide: DataFrame, querySide: DataFrame,
                               k: Int, metric: String, queryId: String,
                               pairFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val topk = udaf(new TopKAggregatorS(k), ExpressionEncoder[NeighborS]())
    val crossed = corpusSide.crossJoin(broadcast(querySide))
    pairFilter.map(crossed.where).getOrElse(crossed)
      .select(col("_qid"), col("_cid"),
        vector.distance(metric, col("_cvec"), col("_qvec")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId),
        (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"),
        col("_n.dist").as("dist"))
  }

  /** Fused-operator variant: the custom KnnTopK physical plan
    * (graft.plans.KnnPlan) scores each corpus partition against the query
    * batch in one pass with bounded heaps — no Q*N row materialization —
    * then the same bounded aggregator merges the Q*k-per-partition
    * partials. Semantically identical to [[knnJoin]].
    *
    * The query batch is collected to the driver ("queries are small" is
    * the operator's contract, like the reference's in-memory Q×N GEMM) —
    * ENFORCED: the collect is capped at `maxQueryRows + 1` rows by a limit
    * (so an oversized frame cannot OOM the driver) and fails loudly past
    * the cap. Callers with a legitimately larger batch pre-collect via
    * [[knnJoinFusedArr]] or raise the cap explicitly. */
  def knnJoinFused(queries: DataFrame, corpus: DataFrame, k: Int,
                   metric: String = "cosine",
                   queryId: String = "query_id", queryVec: String = "query_vec",
                   corpusId: String = "id", corpusVec: String = "vec",
                   filter: Option[Filter] = None,
                   maxQueryRows: Int = 65536): DataFrame = {
    val rows = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .limit(maxQueryRows + 1)
      .collect()
    require(rows.length <= maxQueryRows,
      s"knnJoinFused query batch exceeds maxQueryRows=$maxQueryRows: the fused " +
        "path holds the batch on the driver. Raise maxQueryRows deliberately " +
        "or use knnJoin (fully distributed) for large query sets.")
    val qArr = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    knnJoinFusedArr(qArr, corpus, k, metric, queryId, corpusId, corpusVec, filter)
  }

  /** Per-partition partial top-k through the fused physical operator:
    * (query_id, neighbor_id, dist), at most Q*k rows per partition, NO
    * final merge — single shuffle-free stage. Callers either aggregate
    * downstream ([[knnJoinFusedArr]]) or merge the tiny partial set
    * themselves (the reference's `_merge_top_k` shape). */
  def knnTopKPartial(qArr: Array[(Long, Array[Float])], corpus: DataFrame,
                     k: Int, metric: String = "cosine",
                     corpusId: String = "id", corpusVec: String = "vec",
                     filter: Option[Filter] = None): DataFrame = {
    import graft.plans.{KnnStrategy, KnnTopK}
    import org.apache.spark.sql.graft.Bridge
    val spark = corpus.sparkSession
    if (!spark.experimental.extraStrategies.contains(KnnStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ KnnStrategy
    val filtered = filter.map(f => corpus.where(f.compile)).getOrElse(corpus)
    val child = filtered
      .where(col(corpusId).isNotNull && col(corpusVec).isNotNull)
      .select(col(corpusId).cast("long").as("_cid"),
        col(corpusVec).cast("array<float>").as("_cvec"))
    Bridge.ofRows(spark,
      KnnTopK(Bridge.logicalPlan(child), qArr, k, metric, idOrdinal = 0, vecOrdinal = 1))
  }

  /** [[knnJoinFused]] with the query batch already on the driver — callers
    * issuing many batches over the same corpus skip the per-call collect
    * job. */
  def knnJoinFusedArr(qArr: Array[(Long, Array[Float])], corpus: DataFrame,
                      k: Int, metric: String = "cosine",
                      queryId: String = "query_id",
                      corpusId: String = "id", corpusVec: String = "vec",
                      filter: Option[Filter] = None): DataFrame = {
    val partial = knnTopKPartial(qArr, corpus, k, metric, corpusId, corpusVec, filter)
    val topk = udaf(new TopKAggregator(k), ExpressionEncoder[Neighbor]())
    partial
      .groupBy(col("query_id").as(queryId))
      .agg(topk(col("neighbor_id"), col("dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").as("dist"))
  }

  /** Reference implementation via window row_number over the full cross
    * join — semantically identical to [[knnJoin]]; kept for cross-checking
    * and for corpora whose id column is not castable to Long. Shuffles Q*N
    * rows; do not use at scale. */
  def knnJoinWindow(queries: DataFrame, corpus: DataFrame, k: Int,
                    metric: String = "cosine",
                    queryId: String = "query_id", queryVec: String = "query_vec",
                    corpusId: String = "id", corpusVec: String = "vec",
                    filter: Option[Filter] = None): DataFrame = {
    val filtered = filter.map(f => corpus.where(f.compile)).getOrElse(corpus)
    val w = Window.partitionBy("_qid").orderBy(col("_dist"), col("_cid"))
    filtered
      .select(col(corpusId).as("_cid"), col(corpusVec).as("_cvec"))
      .crossJoin(broadcast(queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec"))))
      .select(col("_qid"), col("_cid"),
        vector.distance(metric, col("_cvec"), col("_qvec")).as("_dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("_qid").as(queryId), col("rank"),
        col("_cid").as("neighbor_id"), col("_dist").as("dist"))
  }

  /** Single-query exact search: global ORDER BY dist LIMIT k — Spark plans
    * this as TakeOrderedAndProject (O(n) scan + per-partition heap + final
    * merge), the same algorithm as the reference's argpartition top-k
    * (parallel_search.py:228-233). */
  def search(corpus: DataFrame, query: Array[Float], k: Int,
             metric: String = "cosine",
             corpusId: String = "id", corpusVec: String = "vec",
             filter: Option[Filter] = None): DataFrame = {
    val filtered = filter.map(f => corpus.where(f.compile)).getOrElse(corpus)
    val q: Column = lit(query)
    filtered
      .select(col(corpusId).as("neighbor_id"),
        vector.distance(metric, col(corpusVec), q).as("dist"))
      .orderBy(col("dist"), col("neighbor_id"))
      .limit(k)
  }
}
