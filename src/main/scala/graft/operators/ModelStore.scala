package graft.operators

import graft.sources.Collections
import org.apache.spark.sql.SparkSession

/** Persisted sidecars for TRAINED models — IVF coarse centroids, PQ
  * codebooks, SQ min/max stats, BQ thresholds — following the BM25 index
  * sidecar pattern (Bm25.saveIndex/loadIndex).
  *
  * The reference trains its quantizers once on `fit()` and then searches
  * many times against the stored parameters (quantization.py:85-106 SQ
  * stats, 480-508 PQ codebooks); at 100 TB that split is non-negotiable —
  * a KMeans fit is a multi-pass corpus job, a search should cost
  * scan + ADC + rerank only. Each model is a tiny parquet relation
  * (exact doubles, engine-portable) written via the crash-safe
  * temp-dir + rename swap, plus a `model.json` kind marker written LAST —
  * its presence marks a complete, readable model (the same completion
  * stance as Bm25's stats.json).
  */
object ModelStore {

  // ------------------------------------------- filesystem-scheme helpers
  //
  // Every sidecar touch goes through the Hadoop FileSystem OF THE TARGET
  // PATH (the swapWrite stance): a model dir may live on s3a://, hdfs://,
  // or file:/ and NIO Paths.get would either crash on the URI or silently
  // operate on a nonexistent local path — the exact stale-sidecar hazard
  // the opq deletion in PackedPq.saveSlabs exists to close. The
  // implementations live next to swapWrite in [[Collections]]; these
  // delegates keep the model-layer call sites short.

  private[graft] def pathExists(path: String): Boolean =
    Collections.pathExists(path)

  /** Write a small marker/manifest string via tmp + delete + rename — a
    * crash mid-write never leaves a torn marker visible at `path`. */
  private[graft] def writeString(path: String, content: String): Unit =
    Collections.writeString(path, content)

  private[graft] def readString(path: String): String =
    Collections.readString(path)

  /** Delete a file or directory tree if present (idempotent). */
  private[graft] def deleteIfExists(path: String): Unit =
    Collections.deleteIfExists(path)

  def exists(dir: String): Boolean = pathExists(s"$dir/model.json")

  private def writeMeta(dir: String, kind: String): Unit =
    // marker lands only after the parquet swap succeeded; the tmp+rename
    // inside writeString keeps the crash window torn-marker-free
    writeString(s"$dir/model.json", s"""{"kind": "$kind"}""")

  private def requireKind(dir: String, kind: String): Unit = {
    require(exists(dir), s"no persisted model at $dir")
    val raw = readString(s"$dir/model.json")
    require(raw.contains(s""""kind": "$kind""""),
      s"model at $dir is not a $kind model: $raw")
  }

  // ------------------------------------------------------------------- IVF

  /** Centroids as (cell, centroid) rows; cell id = codebook row index. */
  def saveIvf(spark: SparkSession, m: Ann.IvfModel, dir: String): Unit = {
    import spark.implicits._
    Collections.swapWrite(
      m.centroids.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid"),
      s"$dir/data")
    writeMeta(dir, "ivf")
  }

  def loadIvf(spark: SparkSession, dir: String): Ann.IvfModel = {
    requireKind(dir, "ivf")
    Ann.IvfModel(spark.read.parquet(s"$dir/data").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray))
  }

  // -------------------------------------------------------------------- PQ

  /** Codebooks as (m, c, centroid) rows; numSubspaces/subDim are derivable
    * from the rows, so the relation is fully self-describing. */
  def savePq(spark: SparkSession, m: Quantization.PqModel, dir: String): Unit = {
    import spark.implicits._
    val rows = for {
      (book, mIdx) <- m.codebooks.toSeq.zipWithIndex
      (cent, c) <- book.toSeq.zipWithIndex
    } yield (mIdx, c, cent.toSeq)
    Collections.swapWrite(rows.toDF("m", "c", "centroid"), s"$dir/data")
    writeMeta(dir, "pq")
  }

  def loadPq(spark: SparkSession, dir: String): Quantization.PqModel = {
    requireKind(dir, "pq")
    val rows = spark.read.parquet(s"$dir/data")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3) }
      .map(_.toArray).toArray
    Quantization.PqModel(books.length, books.head.head.length, books)
  }

  // ------------------------------------------------------------------- OPQ

  /** Rotation as (i, row_i) rows plus the rotated-space codebooks as a
    * nested `pq/` model — one artifact, because codebooks fitted under a
    * different rotation are meaningless (the q123 coarse-model stance). */
  def saveOpq(spark: SparkSession, m: Quantization.OpqModel, dir: String): Unit = {
    import spark.implicits._
    savePq(spark, m.pq, s"$dir/pq")
    Collections.swapWrite(
      m.rotation.toSeq.zipWithIndex.map { case (row, i) => (i, row.toSeq) }
        .toDF("i", "r"),
      s"$dir/data")
    writeMeta(dir, "opq")
  }

  def loadOpq(spark: SparkSession, dir: String): Quantization.OpqModel = {
    requireKind(dir, "opq")
    val rot = spark.read.parquet(s"$dir/data").orderBy("i")
      .collect().map(_.getSeq[Double](1).toArray)
    Quantization.OpqModel(rot, loadPq(spark, s"$dir/pq"))
  }

  // -------------------------------------------------------------------- LR

  /** Quality-classifier weights as (b, w) rows: nonzero buckets, plus
    * b = -1 carrying the intercept and b = -2 carrying the bucket count
    * (small exact integers in a double). */
  def saveLr(spark: SparkSession, m: QualityClassifier.LrModel, dir: String): Unit = {
    import spark.implicits._
    val rows = m.weights.zipWithIndex
      .collect { case (w, b) if w != 0.0 => (b, w) }.toSeq ++
      Seq((-1, m.intercept), (-2, m.buckets.toDouble))
    Collections.swapWrite(rows.toDF("b", "w"), s"$dir/data")
    writeMeta(dir, "lr")
  }

  def loadLr(spark: SparkSession, dir: String): QualityClassifier.LrModel = {
    requireKind(dir, "lr")
    val rows = spark.read.parquet(s"$dir/data").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    val buckets = rows(-2).toInt
    val w = new Array[Double](buckets)
    rows.foreach { case (b, v) => if (b >= 0) w(b) = v }
    QualityClassifier.LrModel(w, rows(-1))
  }

  // -------------------------------------------------------------------- SQ

  def saveSq(spark: SparkSession, m: Quantization.SqModel, dir: String): Unit = {
    import spark.implicits._
    Collections.swapWrite(
      m.mins.indices.map(i => (i, m.mins(i), m.maxs(i))).toDF("dim", "mn", "mx"),
      s"$dir/data")
    writeMeta(dir, "sq")
  }

  def loadSq(spark: SparkSession, dir: String): Quantization.SqModel = {
    requireKind(dir, "sq")
    val rows = spark.read.parquet(s"$dir/data").orderBy("dim").collect()
    Quantization.SqModel(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  // -------------------------------------------------------------------- BQ

  def saveBq(spark: SparkSession, thresholds: Array[Double], dir: String): Unit = {
    import spark.implicits._
    Collections.swapWrite(
      thresholds.toSeq.zipWithIndex.map { case (t, i) => (i, t) }.toDF("dim", "thr"),
      s"$dir/data")
    writeMeta(dir, "bq")
  }

  def loadBq(spark: SparkSession, dir: String): Array[Double] = {
    requireKind(dir, "bq")
    spark.read.parquet(s"$dir/data").orderBy("dim").collect().map(_.getDouble(1))
  }
}
