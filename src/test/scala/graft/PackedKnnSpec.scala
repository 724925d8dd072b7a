package graft

import graft.operators.{Knn, PackedKnn}
import org.apache.spark.sql.functions._

/** The packed-matrix BLAS search must agree with the oracle-checked
  * composed kNN join: same neighbor sets, distances equal to the double
  * kernel within float32-GEMM tolerance. */
class PackedKnnSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queryDF = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val qArr = queryDF.collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    .sortBy(_._1)

  test("packed search matches composed knnJoin on all metrics") {
    val pc = PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding")
    try {
      for (m <- Seq("cosine", "l2", "ip")) {
        val exact = Knn.knnJoin(queryDF, embs, 10, m,
            corpusId = "vec_id", corpusVec = "embedding")
          .collect()
          .map(r => (r.getAs[Long]("query_id"),
            (r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist"))))
          .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(x => (x._2, x._1))).toMap
        val packed = PackedKnn.search(pc, qArr, 10, m).toMap
        assert(packed.keySet === exact.keySet, s"metric $m query ids")
        for ((qid, got) <- packed) {
          val want = exact(qid)
          assert(got.map(_._1).toSeq === want.map(_._1).toSeq,
            s"metric $m query $qid neighbor ids")
          // float32 GEMM tolerance; l2 uses the norm identity, whose
          // cancellation near zero is quadratic — compare squared dists
          val tol = 2e-3
          got.zip(want).foreach { case ((_, dGot), (_, dWant)) =>
            val err = if (m == "l2") math.abs(dGot * dGot - dWant * dWant)
                      else math.abs(dGot - dWant)
            assert(err < tol, s"metric $m query $qid dist $dGot vs $dWant")
          }
        }
      }
    } finally pc.unpersist(blocking = true)
  }

  test("packed search survives empty partitions and k > corpus size") {
    import spark.implicits._
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("id", "vec")
      .repartition(8) // most partitions empty
    val pc = PackedKnn.pack(tiny)
    try {
      val res = PackedKnn.search(pc, Array((100L, Array(1f, 0f))), 10, "cosine")
      assert(res.length === 1)
      val (qid, nbrs) = res.head
      assert(qid === 100L)
      assert(nbrs.map(_._1).toSet === Set(1L, 2L, 3L))
      assert(nbrs.head._1 === 1L) // identical direction first
      assert(math.abs(nbrs.head._2) < 1e-6)
    } finally pc.unpersist(blocking = true)
  }

  test("pack rejects a ragged corpus") {
    import spark.implicits._
    val ragged = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f, 2f)))
      .toDF("id", "vec").coalesce(1)
    val ex = intercept[Exception] { PackedKnn.pack(ragged) }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("ragged")), messages.mkString(" | "))
  }
}
