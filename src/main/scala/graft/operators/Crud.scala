package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Collection CRUD re-expressed as set-oriented batch operators
  * (reference vectordb.py insert/insert_batch/update/delete/get/list_ids,
  * vectordb.py:334-451, 563-586).
  *
  * A "collection" is a keyed DataFrame; every mutation is a new DataFrame
  * (persist by overwriting the collection's parquet — S2). All operators
  * are pure joins/unions so they distribute: upsert is an anti-join +
  * union (no driver loop), delete-by-filter is a negated predicate scan,
  * batch get is a broadcast semi-join on ids.
  */
object Crud {

  /** insert_batch with duplicate-id rejection semantics folded to
    * "last write wins" batch form: rows in `updates` replace same-id rows
    * in `base` (reference update(), vectordb.py:384-407; upsert in
    * fastpyvectordb/client.py). */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    base.join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(updates)

  /** Pure insert: reject ids already present (vectordb.py:334-361 raises on
    * duplicates; batch form keeps base rows and adds only new ids). */
  def insertNew(base: DataFrame, rows: DataFrame, keyCol: String): DataFrame =
    base.unionByName(rows.join(base.select(keyCol), Seq(keyCol), "left_anti"))

  /** delete(ids) (vectordb.py:409-432). */
  def deleteByIds(base: DataFrame, ids: Seq[Any], keyCol: String): DataFrame =
    base.where(!col(keyCol).isin(ids: _*))

  /** delete(filter) — reference client.delete(where=...) semantics. */
  def deleteByFilter(base: DataFrame, f: Filter): DataFrame =
    base.where(!coalesce(f.compile, lit(false)))

  /** get_batch(ids) (vectordb.py:434-451): broadcast semi-join. */
  def getBatch(base: DataFrame, ids: Seq[Any], keyCol: String): DataFrame =
    base.where(col(keyCol).isin(ids: _*))

  /** list_ids(limit, offset) (vectordb.py:583-586): deterministic
    * pagination. A global sort at 100 TB is the wrong tool — the driver
    * only ever pages small windows, so Spark's offset+limit (which plans
    * a single-partition tail only for the page) is acceptable; bulk
    * export should use partitioned writes instead. */
  def page(base: DataFrame, keyCol: String, limit: Int, offset: Int): DataFrame =
    base.orderBy(col(keyCol)).offset(offset).limit(limit)

  /** Dedup to latest version per key given a version/timestamp column —
    * the batch analog of sequential updates. */
  def latestByKey(df: DataFrame, keyCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(desc(versionCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }
}
