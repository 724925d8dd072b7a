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
    println("ExtensionsCheck OK: " + row)
    spark.stop()
  }
}
