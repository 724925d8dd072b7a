package graft

import graft.operators.{Ann, ModelStore, Quantization}
import org.apache.spark.sql.functions._

class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-modelstore-$name").toString

  private lazy val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("IVF model round-trips exactly (load ≡ train)") {
    val trained = Ann.trainIvf(vecs, "embedding", numCells = 8)
    val d = tmp("ivf")
    assert(!ModelStore.exists(d))
    ModelStore.saveIvf(spark, trained, d)
    assert(ModelStore.exists(d))
    val loaded = ModelStore.loadIvf(spark, d)
    assert(loaded.numCells === trained.numCells)
    assert(loaded.centroids.map(_.toSeq).toSeq === trained.centroids.map(_.toSeq).toSeq)
    // search through the loaded model matches search through the trained one
    val q = vecs.limit(3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def run(m: Ann.IvfModel) =
      Ann.ivfSearch(q, vecs, m, k = 5, nProbe = 2,
          corpusId = "vec_id", vecCol = "embedding")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(loaded) === run(trained))
  }

  test("PQ model round-trips exactly") {
    val trained = Quantization.trainPq(vecs, "embedding",
      numSubspaces = 4, numCentroids = 8)
    val d = tmp("pq")
    ModelStore.savePq(spark, trained, d)
    val loaded = ModelStore.loadPq(spark, d)
    assert(loaded.numSubspaces === trained.numSubspaces)
    assert(loaded.subDim === trained.subDim)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq
      === trained.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("SQ model and BQ thresholds round-trip exactly") {
    val sq = Quantization.trainSq(vecs, "embedding")
    val dSq = tmp("sq")
    ModelStore.saveSq(spark, sq, dSq)
    val sqLoaded = ModelStore.loadSq(spark, dSq)
    assert(sqLoaded.mins.toSeq === sq.mins.toSeq)
    assert(sqLoaded.maxs.toSeq === sq.maxs.toSeq)
    assert(sqLoaded.scales.toSeq === sq.scales.toSeq)

    val bq = Quantization.trainBq(vecs, "embedding")
    val dBq = tmp("bq")
    ModelStore.saveBq(spark, bq, dBq)
    assert(ModelStore.loadBq(spark, dBq).toSeq === bq.toSeq)
  }

  test("loading the wrong kind or a missing model fails loudly") {
    val d = tmp("kind")
    ModelStore.saveBq(spark, Array(0.1, 0.2), d)
    intercept[IllegalArgumentException] { ModelStore.loadIvf(spark, d) }
    intercept[IllegalArgumentException] {
      ModelStore.loadPq(spark, tmp("missing"))
    }
  }
}
