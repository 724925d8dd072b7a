package graft

import org.apache.spark.sql.SparkSession

/** Standalone check that `graft.GraftExtensions` registers the custom
  * expressions on a fresh session via spark.sql.extensions (cannot run
  * inside the shared-session test suite: extensions only apply at session
  * construction). Exits non-zero on failure. */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-check")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT cosine_distance(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c,
        |       l2_distance(array(0.0F, 3.0F), array(4.0F, 0.0F)) AS l,
        |       dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       hamming_distance(pack_bits(array(1, 0, 1)), pack_bits(array(1, 1, 1))) AS h
      """.stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12, s"cosine: $row")
    assert(math.abs(row.getDouble(1) - 5.0) < 1e-12, s"l2: $row")
    assert(math.abs(row.getDouble(2) - 11.0) < 1e-12, s"dot: $row")
    assert(row.getInt(3) == 1, s"hamming: $row")
    val row2 = spark.sql(
      """SELECT fp16_decode(fp16_encode(array(1.5F, -0.25F))) AS v,
        |       fingerprint('A  b') AS fp,
        |       quality_score('') AS q,
        |       canonical_url('HTTPS://WWW.Example.com/a/b/') AS u,
        |       bpe_token_count('aaab') AS n
      """.stripMargin).head()
    assert(row2.getSeq[Float](0) == Seq(1.5f, -0.25f), s"fp16: $row2")
    assert(row2.getString(1) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString,
      s"fingerprint: $row2")
    assert(row2.getDouble(2) == 0.0, s"quality(''): $row2") // every term zeroes
    assert(row2.getString(3) == "example.com/a/b", s"canonical_url: $row2")
    assert(row2.getLong(4) >= 1L, s"bpe_token_count: $row2")
    println("ExtensionsCheck OK: " + row + " / " + row2)
    spark.stop()
  }
}
