package graft

import graft.functions.vector
import org.apache.spark.sql.functions._

class DistanceSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (Array(0.5f, -0.5f, 2.0f), Array(-1.0f, 0.25f, 0.75f)),
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")

  private def scalaCosine(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / (na * nb)
  }

  test("cosine/l2/dot expressions match scala math (interpreted + codegen)") {
    val got = pairs.select(
      vector.cosineDistance($"a", $"b"), vector.l2Distance($"a", $"b"),
      vector.dotProduct($"a", $"b")).collect()
    val in = pairs.select($"a", $"b").as[(Array[Float], Array[Float])].collect()
    in.zip(got).foreach { case ((a, b), row) =>
      assert(math.abs(row.getDouble(0) - scalaCosine(a, b)) < 1e-12)
      val l2 = math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x - y) }.sum)
      assert(math.abs(row.getDouble(1) - l2) < 1e-12)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      assert(math.abs(row.getDouble(2) - dot) < 1e-12)
    }
  }

  test("l2Normalize produces unit vectors; zero vector unchanged") {
    val out = pairs.select(vector.l2Normalize($"a").as("n")).as[Seq[Double]].collect()
    assert(math.abs(math.sqrt(out(0).map(x => x * x).sum) - 1.0) < 1e-12)
    assert(out(3).forall(_ == 0.0))
  }

  test("packBits + hammingDistance round-trip") {
    val df = Seq(
      (Array(1, 0, 1, 1, 0, 0, 0, 1, 1), Array(1, 0, 0, 1, 0, 0, 0, 1, 0))
    ).toDF("x", "y")
    val ham = df.select(vector.hammingDistance(
      vector.packBits($"x"), vector.packBits($"y"))).head().getInt(0)
    assert(ham === 2) // bits 2 and 8 differ
  }

  test("distance expressions survive whole-stage codegen in a real plan") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = embs.select(vector.cosineDistance($"embedding", $"embedding").as("d"))
      .where($"d" < 1e-9).count()
    assert(n === embs.count()) // self-distance ~ 0 for all rows
  }
}
