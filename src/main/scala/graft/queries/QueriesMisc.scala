package graft.queries

import graft.functions.{Embeddings, TextAnalysis}
import graft.operators.Pooling
import graft.sources.Changelog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remaining inventory coverage: the deterministic hash embedder (F11) and
  * batch change-data capture (E5). */
object QueriesMisc {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F11: deterministic text -> unit vector; export 3 components + norm
    "q50_mock_embedding" -> ((s, dir) =>
      t(s, dir, "documents").where(col("doc_id") < 100)
        .withColumn("_e", Embeddings.mockEmbedding(col("text"), 16))
        .select(col("doc_id"),
          round(element_at(col("_e"), 1), 6).as("e0"),
          round(element_at(col("_e"), 8), 6).as("e7"),
          round(element_at(col("_e"), 16), 6).as("e15"),
          round(sqrt(aggregate(transform(col("_e"), x => x * x), lit(0.0), _ + _)), 6).as("norm"))),

    // Chunk-level retrieval with doc-level maxP aggregation (Dai & Callan,
    // SIGIR'19): long documents retrieved by their BEST chunk — chunk ->
    // embed -> broadcast query dot-products -> per-(query, doc) max ->
    // rounded-rank top-5. Ranking on the 6-dec-ROUNDED score (the q68
    // stance) so float summation noise can never flip cross-engine order.
    "q105_chunked_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 200)
      val chunks = docs.select(col("doc_id"),
          explode(TextAnalysis.chunks(col("text"), windowSize = 32, stride = 24)).as("c"))
        .select(col("doc_id"), Embeddings.mockEmbedding(col("c.chunk"), 16).as("emb"))
      val queries = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          Embeddings.mockEmbedding(col("text"), 16).as("qv"))
      // unit vectors: dot product IS cosine similarity
      val maxp = chunks.crossJoin(broadcast(queries))
        .select(col("query_id"), col("doc_id"),
          graft.functions.vector.dotProduct(col("qv"), col("emb")).as("sim"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(round(max(col("sim")), 6).as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(desc("score"), col("doc_id"))
      maxp.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
    }),

    // End-to-end document embedding: chunk (32-token windows, stride 24)
    // -> deterministic chunk embedding -> mean-pool back to one vector per
    // doc. The full chunk->embed->pool pipeline in ONE declarative plan —
    // tokenize and embed are per-row expressions, pooling is the single
    // map-side-partial shuffle — exported long-form so the oracle checks
    // every component and position.
    "q70_doc_embedding" -> ((s, dir) => {
      val chunkEmb = t(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(TextAnalysis.chunks(col("text"), windowSize = 32, stride = 24)).as("c"))
        .select(col("doc_id"),
          Embeddings.mockEmbedding(col("c.chunk"), 16).as("emb"))
      // 4 decimals, not 6: pooled means merge partition buffers in
      // nondeterministic order vs DuckDB's sequential sum — headroom above
      // summation-order noise keeps the hash gate deterministic
      Pooling.meanPool(chunkEmb, "doc_id", "emb")
        .select(col("doc_id"), posexplode(col("centroid")).as(Seq("pos", "v")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"),
          (round(col("v"), 4) + lit(0.0)).as("v"))  // +0.0 folds -0.0
    }),

    // SQL interface parity: the flagship kNN expressed as pure spark.sql
    // text over temp views + the registered distance function — proves a
    // reference user can drive the engine from SQL alone.
    "q52_sql_knn" -> ((s, dir) => {
      graft.functions.vector.registerSql(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql(
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
          |           FROM embeddings_v WHERE vec_id < 5),
          |pairs AS (
          |  SELECT q.query_id, c.vec_id AS neighbor_id,
          |         cosine_distance(c.embedding, q.qv) AS dist
          |  FROM embeddings_v c CROSS JOIN q),
          |ranked AS (
          |  SELECT query_id, neighbor_id, dist,
          |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
          |  FROM pairs)
          |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
          |       round(dist, 6) AS dist
          |FROM ranked WHERE rank <= 10""".stripMargin)
    }),

    // E5: CDC diff between orders and a deterministically mutated version
    "q51_cdc_diff" -> ((s, dir) => {
      val before = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val after = before
        .where(col("o_orderkey") % 97 =!= 0) // deletes
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, round(col("o_totalprice") * 1.07, 2))
            .otherwise(col("o_totalprice"))) // updates
        .unionByName(before.where(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"))) // inserts
      Changelog.diff(before, after, "o_orderkey")
        .select(col("op"), col("o_orderkey"),
          round(col("before_o_totalprice"), 2).as("before_price"),
          round(col("after_o_totalprice"), 2).as("after_price"))
    }),

    // Deterministic corpus shuffle-sharding (training-data export layout)
    "q79_shuffle_shards" -> ((s, dir) =>
      graft.operators.Sampling.shuffleShards(
          t(s, dir, "documents").select(col("doc_id")), "doc_id", numShards = 8)
        .select(col("doc_id"), col("shard"), col("seq"))),

    // Concat-and-chunk sequence packing per shard (2048-token contexts,
    // n_chars as the token proxy)
    "q80_pack_sequences" -> ((s, dir) =>
      graft.operators.Sampling.packSequences(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", numShards = 8, seqLen = 2048)
        .select(col("doc_id"), col("shard"), col("start_tok"),
          col("first_seq"), col("last_seq"), col("offset_in_seq"))),

    // Exact nearest-rank length percentiles per language
    "q81_length_percentiles" -> ((s, dir) =>
      graft.operators.Sampling.percentilesDisc(
        t(s, dir, "documents").select(col("lang"), col("n_chars")),
        "lang", "n_chars", qs = Seq(0.25, 0.5, 0.9, 0.99))),

    // Robust per-language length outliers: |n_chars - median| > 2*MAD
    // (integer-exact medians, no float accumulation)
    "q88_mad_outliers" -> ((s, dir) =>
      graft.operators.Sampling.madOutliers(
        t(s, dir, "documents").select(col("lang"), col("doc_id"), col("n_chars")),
        "lang", "n_chars", "doc_id", k = 2.0)),

    // Temperature-balanced mixture (sqrt-temperature language rebalance)
    "q89_temperature_sample" -> ((s, dir) =>
      graft.operators.Sampling.temperatureSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id")),

    // Deterministic stratified train/val/test split (80/10/10 within each
    // language) — per-stratum tallies prove the stratification
    "q96_stratified_split" -> ((s, dir) =>
      graft.operators.Sampling.assignSplits(
          t(s, dir, "documents"), "doc_id", "lang")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("lang"), col("split"))),

    // Curriculum export order: easy-first (n_chars ascending) within each
    // source, sources interleaved round-robin — computed position, no
    // global sort
    "q97_curriculum" -> ((s, dir) =>
      graft.operators.Sampling.curriculumInterleave(
          t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id", "source", "n_chars")
        .select(col("ord"), col("doc_id"), col("source"), col("n_chars"))),
  )

  val oracles: Map[String, String] = Map(
    "q52_sql_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS dist
        |  FROM q, embeddings c),
        |ranked AS (
        |  SELECT query_id, neighbor_id, dist,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       round(dist, 6) + 0.0 AS dist
        |FROM ranked WHERE rank <= 10""".stripMargin,

    "q50_mock_embedding" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), i ->
        |      ('0x' || substr(md5(text || ':' || i), 1, 8))::BIGINT / 4294967296.0 * 2.0 - 1.0) AS r
        |  FROM documents WHERE doc_id < 100),
        |normed AS (
        |  SELECT doc_id, r,
        |    sqrt(list_sum(list_transform(r, x -> x * x))) AS nrm
        |  FROM raw)
        |SELECT doc_id,
        |  round(r[1] * (1.0 / nrm), 6) AS e0,
        |  round(r[8] * (1.0 / nrm), 6) AS e7,
        |  round(r[16] * (1.0 / nrm), 6) AS e15,
        |  round(sqrt(list_sum(list_transform(r, x -> (x * (1.0 / nrm)) * (x * (1.0 / nrm))))), 6) AS norm
        |FROM normed""".stripMargin,

    "q105_chunked_retrieval" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM corpus),
        |counted AS (
        |  SELECT doc_id, tk,
        |         1 + CAST(ceil(greatest(len(tk) - 32, 0) / 24.0) AS INT) AS n_chunks
        |  FROM toks),
        |chunks AS (
        |  SELECT doc_id,
        |         array_to_string(list_slice(tk, i * 24 + 1, i * 24 + 32), ' ') AS chunk
        |  FROM counted, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)),
        |craw AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), i ->
        |      ('0x' || substr(md5(chunk || ':' || i), 1, 8))::BIGINT / 4294967296.0 * 2.0 - 1.0) AS r
        |  FROM chunks),
        |cemb AS (
        |  SELECT doc_id,
        |    list_transform(r, x -> x * (1.0 / sqrt(list_sum(list_transform(r, y -> y * y))))) AS e
        |  FROM craw),
        |qraw AS (
        |  SELECT doc_id AS query_id,
        |    list_transform(range(0, 16), i ->
        |      ('0x' || substr(md5(text || ':' || i), 1, 8))::BIGINT / 4294967296.0 * 2.0 - 1.0) AS r
        |  FROM corpus WHERE doc_id < 3),
        |qemb AS (
        |  SELECT query_id,
        |    list_transform(r, x -> x * (1.0 / sqrt(list_sum(list_transform(r, y -> y * y))))) AS e
        |  FROM qraw),
        |sims AS (
        |  SELECT q.query_id, c.doc_id,
        |    (SELECT sum(x * y) FROM (SELECT unnest(c.e) AS x, unnest(q.e) AS y)) AS sim
        |  FROM cemb c, qemb q),
        |maxp AS (SELECT query_id, doc_id, round(max(sim), 6) AS score
        |         FROM sims GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY score DESC, doc_id) AS rank
        |  FROM maxp)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score + 0.0 AS score
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "q70_doc_embedding" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 50),
        |counted AS (
        |  SELECT doc_id, tk,
        |         1 + CAST(ceil(greatest(len(tk) - 32, 0) / 24.0) AS INT) AS n_chunks
        |  FROM toks),
        |chunks AS (
        |  SELECT doc_id,
        |         array_to_string(list_slice(tk, i * 24 + 1, i * 24 + 32), ' ') AS chunk
        |  FROM counted, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)),
        |raw AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), i ->
        |      ('0x' || substr(md5(chunk || ':' || i), 1, 8))::BIGINT / 4294967296.0 * 2.0 - 1.0) AS r
        |  FROM chunks),
        |normed AS (
        |  SELECT doc_id,
        |    list_transform(r, x ->
        |      x * (1.0 / sqrt(list_sum(list_transform(r, y -> y * y))))) AS e
        |  FROM raw),
        |ex AS (
        |  SELECT doc_id, unnest(e) AS v, generate_subscripts(e, 1) AS pos
        |  FROM normed)
        |SELECT doc_id, pos, round(avg(v), 4) + 0.0 AS v
        |FROM ex GROUP BY doc_id, pos""".stripMargin,

    "q51_cdc_diff" ->
      """WITH before_t AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |after_t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice * 1.07, 2)
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM before_t WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM before_t WHERE o_orderkey % 97 = 0),
        |joined AS (
        |  SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |         b.o_totalprice AS bp, a.o_totalprice AS ap,
        |         b.o_orderkey IS NOT NULL AS in_b, a.o_orderkey IS NOT NULL AS in_a,
        |         (b.o_orderstatus IS DISTINCT FROM a.o_orderstatus)
        |           OR (b.o_totalprice IS DISTINCT FROM a.o_totalprice) AS changed
        |  FROM before_t b FULL OUTER JOIN after_t a ON b.o_orderkey = a.o_orderkey)
        |SELECT CASE WHEN NOT in_b THEN 'insert'
        |            WHEN NOT in_a THEN 'delete'
        |            ELSE 'update' END AS op,
        |       o_orderkey, round(bp, 2) AS before_price, round(ap, 2) AS after_price
        |FROM joined WHERE (NOT in_b) OR (NOT in_a) OR changed""".stripMargin,

    "q79_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM documents)
        |SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
        |       row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS seq
        |FROM h""".stripMargin,

    // CAST the window sum: DuckDB sum(BIGINT) is HUGEINT, which would
    // type-mismatch Spark's int64 cum
    "q80_pack_sequences" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars, hv, CAST(hv % 8 AS INT) AS shard FROM h),
        |c AS (
        |  SELECT doc_id, shard, n_chars,
        |         CAST(sum(n_chars) OVER (PARTITION BY shard ORDER BY hv, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM s)
        |SELECT doc_id, shard, cum - n_chars AS start_tok,
        |       (cum - n_chars) // 2048 AS first_seq,
        |       (cum - 1) // 2048 AS last_seq,
        |       (cum - n_chars) % 2048 AS offset_in_seq
        |FROM c""".stripMargin,

    "q81_length_percentiles" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |qs(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |                 (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE)))
        |SELECT lang, q, n_chars AS value
        |FROM r JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)""".stripMargin,

    "q88_mad_outliers" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |med AS (SELECT lang, n_chars AS m FROM r
        |        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
        |dev AS (
        |  SELECT d.lang, d.doc_id, d.n_chars, med.m,
        |         abs(d.n_chars - med.m) AS dv
        |  FROM documents d JOIN med USING (lang)),
        |r2 AS (
        |  SELECT lang, dv,
        |         row_number() OVER (PARTITION BY lang ORDER BY dv) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM dev),
        |mad AS (SELECT lang, dv AS mad FROM r2
        |        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
        |SELECT dev.lang, dev.doc_id, dev.n_chars,
        |       dev.m AS median, mad.mad AS mad
        |FROM dev JOIN mad USING (lang)
        |WHERE dev.dv > 2.0 * mad.mad""".stripMargin,

    "q89_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS nmin FROM c),
        |r AS (SELECT lang, sqrt(CAST(m.nmin AS DOUBLE) / c.n) AS rate FROM c, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT AS DOUBLE)
        |      < r.rate * 4294967296.0""".stripMargin,

    "q96_stratified_split" ->
      """WITH a AS (
        |  SELECT lang, n_chars,
        |         ('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |           % 100 AS h
        |  FROM documents),
        |s AS (
        |  SELECT lang, n_chars,
        |         CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM a)
        |SELECT lang, split, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q97_curriculum" ->
      """WITH g AS (
        |  SELECT source, row_number() OVER (ORDER BY source) AS gi
        |  FROM (SELECT DISTINCT source FROM documents)),
        |n AS (SELECT count(*) AS ng FROM g),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars, doc_id) AS rn
        |  FROM documents)
        |SELECT CAST(r.rn - 1 AS BIGINT) * n.ng + g.gi AS ord,
        |       r.doc_id, r.source, r.n_chars
        |FROM r JOIN g USING (source) CROSS JOIN n""".stripMargin,
  )
}
