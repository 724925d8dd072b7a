package graft

import graft.operators.{Ann, PackedPq, PackedPq4, Quantization}
import org.apache.spark.sql.functions._

/** The 4-bit (fastscan-layout) tier must be BIT-IDENTICAL to the 8-bit
  * resident ADC on the same ≤16-centroid models — nibble packing is a
  * lossless re-layout, so every distance, cut and rank agrees exactly.
  * Plus the tier's own contracts: half the code bytes, odd-m tail
  * handling, fail-loud on codes that don't fit a nibble. */
class PackedPq4Spec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queryDF = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val qArr = queryDF.collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
  private lazy val ivf = Ann.trainIvf(embs, "embedding", numCells = 8)
  private lazy val pq16 =
    Quantization.trainPq(embs, "embedding", numSubspaces = 8, numCentroids = 16)

  test("4-bit ADC is bit-identical to the 8-bit tier on the same 16-centroid models") {
    val p8 = PackedPq.packIvfPq(embs, ivf, pq16, idCol = "vec_id", vecCol = "embedding")
    val p4 = PackedPq4.fromPacked(p8)
    try {
      for (nProbe <- Seq(2, 8)) {
        val want = PackedPq.searchAdc[Long](p8, qArr, fetchK = 20, nProbe = nProbe)
        val got = PackedPq4.searchAdc4[Long](p4, qArr, fetchK = 20, nProbe = nProbe)
        assert(got.length === want.length)
        got.zip(want).foreach { case ((gq, gn), (wq, wn)) =>
          assert(gq === wq)
          assert(gn.toSeq === wn.toSeq, s"query $gq nProbe=$nProbe") // exact doubles
        }
      }
    } finally { p4.unpersist(); p8.unpersist() }
  }

  test("search facade is row-identical to the 8-bit funnel and to Ann.ivfPqSearch") {
    val p8 = PackedPq.packIvfPq(embs, ivf, pq16, idCol = "vec_id", vecCol = "embedding")
    val p4 = PackedPq4.fromPacked(p8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "dist").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    try {
      val batch = rows(Ann.ivfPqSearch(queryDF, embs, ivf, pq16,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding"))
      val got = rows(PackedPq4.search(p4, queryDF, embs,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding"))
      assert(got === batch)
    } finally { p4.unpersist(); p8.unpersist() }
  }

  test("odd subspace count: the tail nibble scores correctly and the pad is unread") {
    import spark.implicits._
    // dim=10, m=5 -> subDim=2, bytesPerRow=3: the last byte holds one code.
    // Hash-varied values so each subspace k-means keeps all 16 centroids
    // (a structured lattice collapses the codebooks).
    val df = (0L until 256L)
      .map(i => (i, Array.tabulate(10)(j =>
        (((i * 2654435761L + j * 40503L + (i ^ j) * 997L) % 1000L) / 250.0f))))
      .toDF("vec_id", "embedding")
    val m = Ann.trainIvf(df, "embedding", numCells = 2, seed = 7L)
    val p = Quantization.trainPq(df, "embedding", numSubspaces = 5, numCentroids = 16)
    val p8 = PackedPq.packIvfPq(df, m, p, idCol = "vec_id", vecCol = "embedding")
    val p4 = PackedPq4.fromPacked(p8)
    try {
      val q = Array((0L, Array.tabulate(10)(j => (j * 0.37f) % 4.0f)))
      val want = PackedPq.searchAdc[Long](p8, q, fetchK = 256, nProbe = 2)
      val got = PackedPq4.searchAdc4[Long](p4, q, fetchK = 256, nProbe = 2)
      assert(got.head._2.toSeq === want.head._2.toSeq)
      assert(PackedPq4.codeBytes(p4) === 256L * 3) // ceil(5/2) bytes/row
    } finally { p4.unpersist(); p8.unpersist() }
  }

  test("footprint is half the 8-bit tier; >16-centroid corpora are refused loudly") {
    val p8 = PackedPq.packIvfPq(embs, ivf, pq16, idCol = "vec_id", vecCol = "embedding")
    val p4 = PackedPq4.fromPacked(p8)
    try {
      assert(PackedPq4.codeBytes(p4) * 2 === PackedPq.codeBytes(p8))
    } finally { p4.unpersist(); p8.unpersist() }
    val pq64 =
      Quantization.trainPq(embs, "embedding", numSubspaces = 8, numCentroids = 64)
    val big = PackedPq.packIvfPq(embs, ivf, pq64, idCol = "vec_id", vecCol = "embedding")
    try {
      val e = intercept[IllegalArgumentException](PackedPq4.fromPacked(big))
      assert(e.getMessage.contains("numCentroids <= 16"))
    } finally big.unpersist()
  }
}
