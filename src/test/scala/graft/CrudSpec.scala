package graft

import graft.operators.{Crud, Filter}
import org.apache.spark.sql.functions._

class CrudSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "v")

  test("upsert replaces matching keys and appends new ones") {
    val updates = Seq((2L, "B!", 99.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    val got = Crud.upsert(base, updates, "id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got === Map(1L -> ("a", 10.0), 2L -> ("B!", 99.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("insertNew keeps existing rows on id conflict") {
    val rows = Seq((3L, "C?", 0.0), (5L, "e", 50.0)).toDF("id", "name", "v")
    val got = Crud.insertNew(base, rows, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(3L) === "c") // original kept
    assert(got(5L) === "e")
  }

  test("delete by ids and by filter") {
    assert(Crud.deleteByIds(base, Seq(1L, 3L), "id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    val byFilter = Crud.deleteByFilter(base, Filter.Gt("v", 15.0))
    assert(byFilter.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("page is deterministic with limit/offset") {
    val many = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    val p = Crud.page(many, "id", limit = 10, offset = 25).collect().map(_.getLong(0))
    assert(p.toSeq === (26L to 35L))
  }

  test("latestByKey keeps the max-version row per key") {
    val versioned = Seq((1L, 1L, "old"), (1L, 2L, "new"), (2L, 1L, "only"))
      .toDF("id", "ver", "payload")
    val got = Crud.latestByKey(versioned, "id", "ver").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(1L -> "new", 2L -> "only"))
  }

  test("swapWrite reads its own target and recovers from crash leftovers") {
    import graft.sources.Collections
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val dir = s"$root/rel"
    Collections.swapWrite((1L to 5L).toDF("id"), dir)
    // rewrite FROM a plan that reads the same files it replaces
    val doubled = spark.read.parquet(dir).withColumn("id", col("id") * 2)
    Collections.swapWrite(doubled, dir)
    assert(spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(2L, 4L, 6L, 8L, 10L))
    // a crashed prior swap leaves *_old / *_tmp dirs: the next swap must
    // clear them and land correctly
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 3L).toDF("id").write.parquet(s"${dir}_old")
    (1L to 2L).toDF("id").write.parquet(s"${dir}_tmp")
    Collections.swapWrite((7L to 9L).toDF("id"), dir)
    assert(spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(7L, 8L, 9L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}_old")))
    // partitioned form round-trips with the partition column recovered
    val part = Seq((1L, 0), (2L, 1), (3L, 0)).toDF("id", "b")
    Collections.swapWrite(part, dir, partitionCols = Seq("b"))
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet === Set("id", "b"))
    assert(back.where(col("b") === 0).count() === 2)
  }
}
