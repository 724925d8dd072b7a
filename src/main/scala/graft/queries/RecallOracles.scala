package graft.queries

import graft.operators.{Ann, QualityClassifier, Quantization}

/** DuckDB oracle SQL for the approximate-nearest-neighbor RECALL queries
  * (q19/q48/q49/q72) — closing the last `no_oracle` rows.
  *
  * The engine's ANN paths are deterministic end to end: the IVF/PQ models
  * are seeded, trained once, and persisted as sidecars (ModelStore); the
  * LSH hyperplanes are a pure splitmix hash of (seed, bit, dim). So the
  * oracle can RE-EXECUTE the whole approximate search independently —
  * cell assignment, probe selection, banding, ADC, rerank — from the same
  * model parameters, inlined into the SQL as literal VALUES rows (the
  * models are tiny: 16×128 centroids, 8×64×16 codebooks, 4×64 planes).
  * Only the recall@k table (query_id, recall) is hash-compared; the
  * reference validates its quantizers the same way
  * (quantization.py:692-703: ground-truth top-k vs approximate top-k).
  *
  * Every ordering decision matches the Scala kernels: cell argmin ties
  * break by cell id (AnnExpressions.NearestCell), probe ranking by
  * (dist, cell) (ProbeCellIds), top-k by (dist, neighbor_id)
  * (Knn.TopKAggregator), PQ encode argmin by (d2, c) (strict `<` keeps
  * the first/lowest centroid), rerank by (dist, neighbor_id)
  * (Quantization.rerankExact). Distances reuse the position-aligned
  * unnest formulation proven hash-exact by q10-q14.
  */
object RecallOracles {

  /** Shortest round-trip decimal: DuckDB parses it back to the same
    * double, so the inlined model is bit-identical to the engine's. */
  private def d(x: Double): String = {
    val s = java.lang.Double.toString(x)
    if (s.contains("E") || s.contains("e") || s.contains(".")) s else s + ".0"
  }

  private def arr(a: Array[Double]): String = a.map(d).mkString("[", ", ", "]")

  /** (cell, centroid) VALUES rows for an IVF model. */
  private def centValues(m: Ann.IvfModel): String =
    m.centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${arr(c)})" }.mkString(",\n  ")

  /** (m, c, centroid) VALUES rows for a PQ model. */
  private def bookValues(pm: Quantization.PqModel): String =
    (for {
      (book, m) <- pm.codebooks.zipWithIndex
      (cent, c) <- book.zipWithIndex
    } yield s"($m, $c, ${arr(cent)})").mkString(",\n  ")

  /** (h, plane) VALUES rows for the LSH hyperplanes. */
  private def planeValues(ps: Array[Array[Double]]): String =
    ps.zipWithIndex.map { case (p, h) => s"($h, ${arr(p)})" }.mkString(",\n  ")

  private def cosine(cVec: String, qVec: String): String =
    s"""(SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
       |        ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
       | FROM (SELECT CAST(unnest($cVec) AS DOUBLE) AS x,
       |              CAST(unnest($qVec) AS DOUBLE) AS y))""".stripMargin

  private def l2(cVec: String, qVec: String): String =
    s"""(SELECT sqrt(sum((x-y)*(x-y)))
       | FROM (SELECT CAST(unnest($cVec) AS DOUBLE) AS x,
       |              CAST(unnest($qVec) AS DOUBLE) AS y))""".stripMargin

  /** Squared L2 against an already-DOUBLE[] model row (no sqrt: argmin
    * and rank orderings are sqrt-invariant). */
  private def sq2(vec: String, modelVec: String): String =
    s"""(SELECT sum((x-y)*(x-y))
       | FROM (SELECT CAST(unnest($vec) AS DOUBLE) AS x,
       |              unnest($modelVec) AS y))""".stripMargin

  /** Squared L2 of a RESIDUAL against a codebook row: Σ ((x−y)−z)² with x
    * the raw float widened to double, y the coarse-centroid slice, z the
    * PQ centroid — the exact double arithmetic of `Ann.residual` +
    * `Quantization.pqEncodeDouble` / `Ann.pqLutResidual`. */
  private def sq3(vec: String, centVec: String, bookVec: String): String =
    s"""(SELECT sum((x-y-z)*(x-y-z))
       | FROM (SELECT CAST(unnest($vec) AS DOUBLE) AS x,
       |              unnest($centVec) AS y,
       |              unnest($bookVec) AS z))""".stripMargin

  private val qCte =
    "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5)"

  /** Exact-side CTEs: full-corpus kNN top-k under `dist`, named `exact`. */
  private def exactCtes(distExpr: String, k: Int): String =
    s"""pairs AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id, $distExpr AS dist
       |  FROM q, embeddings c),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM pairs) WHERE rk <= $k)""".stripMargin

  /** recall@k = |approx ∩ exact| / k per query; inner join + group-by, so
    * a query with zero overlap emits NO row — recallAtK's exact shape. */
  private def recallSelect(k: Int): String =
    s"""SELECT a.query_id, CAST(count(*) AS DOUBLE) / $k AS recall
       |FROM approx a JOIN exact e
       |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |GROUP BY a.query_id""".stripMargin

  /** IVF cell-assignment + probe CTEs shared by q48/q72: `corpus_cell`
    * (vec_id, embedding, cell) and `probed` (query_id, cell). */
  private def ivfCtes(m: Ann.IvfModel, nProbe: Int): String =
    s"""cent(cell, cv) AS (VALUES
       |  ${centValues(m)}),
       |ccd AS (
       |  SELECT c.vec_id, c.embedding, cent.cell,
       |         ${sq2("c.embedding", "cent.cv")} AS d2
       |  FROM embeddings c, cent),
       |corpus_cell AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |    FROM ccd) WHERE rn = 1),
       |qpd AS (
       |  SELECT q.query_id, cent.cell, ${sq2("q.qv", "cent.cv")} AS d2
       |  FROM q, cent),
       |probed AS (
       |  SELECT query_id, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d2, cell) AS rn
       |    FROM qpd) WHERE rn <= $nProbe)""".stripMargin

  /** PQ encode + query-LUT CTEs shared by q19/q72: `codes` (vec_id, m, c)
    * and `lut` (query_id, m, c, d2). Subvector m spans 1-based slice
    * [m*subDim+1, (m+1)*subDim]. */
  private def pqCtes(pm: Quantization.PqModel): String = {
    val sd = pm.subDim
    s"""bk(m, c, cv) AS (VALUES
       |  ${bookValues(pm)}),
       |cd AS (
       |  SELECT v.vec_id, bk.m, bk.c,
       |         ${sq2(s"v.embedding[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM embeddings v, bk),
       |codes AS (
       |  SELECT vec_id, m, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |    FROM cd) WHERE rn = 1),
       |lut AS (
       |  SELECT q.query_id, bk.m, bk.c,
       |         ${sq2(s"q.qv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM q, bk)""".stripMargin
  }

  /** (j, column_j) VALUES rows for an OPQ rotation: rv[i] = R(i)(j), so
    * the rotated coordinate y_j = Σ_i x_i·rv[i] is one position-aligned
    * unnest sum — the same ordered-list arithmetic as [[sq2]], matching
    * `Quantization.opqRotate`'s ascending-i accumulation exactly. */
  private def rotValues(r: Array[Array[Double]]): String = {
    val d = r.length
    (0 until r(0).length).map { j =>
      s"($j, ${arr(Array.tabulate(d)(i => r(i)(j)))})"
    }.mkString(",\n  ")
  }

  /** Rotated twins of the corpus and query batch: (id, rv) with rv the
    * ordered list of rotated coordinates. `$src` must expose `$id` and
    * `$vec` (a float list — widened to DOUBLE before the product). */
  private def rotatedCte(name: String, src: String, id: String, vec: String): String =
    s"""$name AS (
       |  SELECT $id, list(y ORDER BY j) AS rv FROM (
       |    SELECT s.$id, rot.j,
       |           (SELECT sum(x*r)
       |            FROM (SELECT CAST(unnest(s.$vec) AS DOUBLE) AS x,
       |                         unnest(rot.rv) AS r)) AS y
       |    FROM $src s, rot)
       |  GROUP BY $id)""".stripMargin

  /** q125: OPQ — rotate corpus and queries by the inlined learned
    * rotation, PQ-encode the ROTATED corpus (same argmin/tie rules as the
    * raw-PQ oracle, over rotated slices), rotated-space ADC top-`fetchK`,
    * exact rerank on the RAW embeddings, recall vs exact L2. */
  def opqRecallSql(om: Quantization.OpqModel, fetchK: Int = 50,
                   k: Int = 10): String = {
    val pm = om.pq; val sd = pm.subDim
    s"""WITH $qCte,
       |rot(j, rv) AS (VALUES
       |  ${rotValues(om.rotation)}),
       |${rotatedCte("rx", "embeddings", "vec_id", "embedding")},
       |${rotatedCte("rq", "q", "query_id", "qv")},
       |bk(m, c, cv) AS (VALUES
       |  ${bookValues(pm)}),
       |cd AS (
       |  SELECT rx.vec_id, bk.m, bk.c,
       |         ${sq2(s"rx.rv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM rx, bk),
       |codes AS (
       |  SELECT vec_id, m, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |    FROM cd) WHERE rn = 1),
       |lut AS (
       |  SELECT rq.query_id, bk.m, bk.c,
       |         ${sq2(s"rq.rv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM rq, bk),
       |adc AS (
       |  SELECT l.query_id, cs.vec_id AS neighbor_id, sum(l.d2) AS s
       |  FROM codes cs JOIN lut l ON l.m = cs.m AND l.c = cs.c
       |  GROUP BY l.query_id, cs.vec_id),
       |fetched AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rn
       |    FROM adc) WHERE rn <= $fetchK),
       |rr AS (
       |  SELECT f.query_id, f.neighbor_id, ${l2("c.embedding", "q.qv")} AS dist
       |  FROM fetched f
       |  JOIN embeddings c ON c.vec_id = f.neighbor_id
       |  JOIN q ON q.query_id = f.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM rr) WHERE rk <= $k),
       |${exactCtes(l2("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin
  }

  /** q128: OPQ + IVFADC — coarse routing on the RAW vectors (the same
    * `ivfCtes` cell/probe algebra as q72), codes and LUTs in the ROTATED
    * space (the q125 algebra), ADC restricted to probed cells, exact
    * rerank on raw embeddings. */
  def ivfOpqRecallSql(im: Ann.IvfModel, om: Quantization.OpqModel,
                      nProbe: Int = 4, fetchK: Int = 50, k: Int = 10): String = {
    val pm = om.pq; val sd = pm.subDim
    s"""WITH $qCte,
       |${ivfCtes(im, nProbe)},
       |rot(j, rv) AS (VALUES
       |  ${rotValues(om.rotation)}),
       |${rotatedCte("rx", "embeddings", "vec_id", "embedding")},
       |${rotatedCte("rq", "q", "query_id", "qv")},
       |bk(m, c, cv) AS (VALUES
       |  ${bookValues(pm)}),
       |cd AS (
       |  SELECT rx.vec_id, bk.m, bk.c,
       |         ${sq2(s"rx.rv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM rx, bk),
       |codes AS (
       |  SELECT vec_id, m, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |    FROM cd) WHERE rn = 1),
       |lut AS (
       |  SELECT rq.query_id, bk.m, bk.c,
       |         ${sq2(s"rq.rv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM rq, bk),
       |adc AS (
       |  SELECT p.query_id, cc.vec_id AS neighbor_id, sum(l.d2) AS s
       |  FROM probed p
       |  JOIN corpus_cell cc ON cc.cell = p.cell
       |  JOIN codes cs ON cs.vec_id = cc.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.m = cs.m AND l.c = cs.c
       |  GROUP BY p.query_id, cc.vec_id),
       |fetched AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rn
       |    FROM adc) WHERE rn <= $fetchK),
       |rr AS (
       |  SELECT f.query_id, f.neighbor_id, ${l2("c.embedding", "q.qv")} AS dist
       |  FROM fetched f
       |  JOIN embeddings c ON c.vec_id = f.neighbor_id
       |  JOIN q ON q.query_id = f.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM rr) WHERE rk <= $k),
       |${exactCtes(l2("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin
  }

  /** q102: same-cell kNN graph over the vec_id < `maxId` subset — cell
    * assignment from the inlined centroids (identical argmin/tie rules to
    * the NearestCell kernel the packed layout used), pairs restricted to
    * equal cells, self-pairs excluded, exact cosine top-`k`. The engine's
    * float32 over-fetch + exact rerank must land on the same rows. */
  def sameCellGraphSql(m: Ann.IvfModel, maxId: Long, k: Int): String =
    s"""WITH cent(cell, cv) AS (VALUES
       |  ${centValues(m)}),
       |sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $maxId),
       |ccd AS (
       |  SELECT c.vec_id, c.embedding, cent.cell,
       |         ${sq2("c.embedding", "cent.cv")} AS d2
       |  FROM sub c, cent),
       |corpus_cell AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |    FROM ccd) WHERE rn = 1),
       |gpairs AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         ${cosine("b.embedding", "a.embedding")} AS dist
       |  FROM corpus_cell a JOIN corpus_cell b
       |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
       |  FROM gpairs)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
       |       round(dist, 6) + 0.0 AS dist
       |FROM ranked WHERE rank <= $k""".stripMargin

  /** q115: recompute the logistic quality score from the TRAINED weights
    * inlined as literals — the same hashed-unigram bucketing as the q95
    * DSIR oracle, margin = intercept + Σ count_b * w_b, sigmoid, round 4
    * (per-doc float sums are summation-order-dependent like q95's). */
  def lrScoreSql(m: QualityClassifier.LrModel): String = {
    // sentinel bucket -1 keeps the VALUES list non-empty even for a
    // degenerate all-zero-weight model (it can never match a real bucket)
    val wvals = (m.weights.zipWithIndex
      .collect { case (w, b) if w != 0.0 => s"($b, ${d(w)})" } :+ "(-1, 0.0)")
      .mkString(",\n  ")
    val b = m.buckets
    s"""WITH w(b, wt) AS (VALUES
       |  $wvals),
       |toks AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
       |         lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t
       |  FROM documents),
       |bk AS (SELECT doc_id,
       |              ('0x' || substr(md5(t), 1, 8))::BIGINT % $b AS b
       |       FROM toks),
       |db AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2),
       |mg AS (
       |  SELECT db.doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         sum(c * coalesce(w.wt, 0.0)) AS margin
       |  FROM db LEFT JOIN w USING (b) GROUP BY db.doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(mg.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       round(1.0 / (1.0 + exp(-(coalesce(mg.margin, 0.0) + ${d(m.intercept)}))), 4)
       |         + 0.0 AS score
       |FROM documents d LEFT JOIN mg USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q117: the round-7 pipeline stages composed — learned classifier
    * gate (rounded sigmoid >= 0.5 from the inlined weights) over the
    * footered corpus, boilerplate line strip whose counts run over the
    * CLASSIFIER SURVIVORS, whitespace-empty drop, exact-fingerprint
    * dedup keeping the min id. Stage ORDER is part of what this checks:
    * the footer masks exact duplicates until the strip re-unifies them. */
  def pipelineLearnedSql(m: QualityClassifier.LrModel): String = {
    val wvals = (m.weights.zipWithIndex
      .collect { case (w, b) if w != 0.0 => s"($b, ${d(w)})" } :+ "(-1, 0.0)")
      .mkString(",\n  ")
    val b = m.buckets
    s"""WITH corpus AS (
       |  SELECT doc_id, CASE WHEN doc_id % 2 = 0
       |    THEN text || chr(10) || 'Subscribe to our newsletter today'
       |              || chr(10) || 'Copyright 2020 Example Corp'
       |    ELSE text END AS text
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25),
       |w(b, wt) AS (VALUES
       |  $wvals),
       |toks AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
       |         lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t
       |  FROM corpus),
       |bk AS (SELECT doc_id,
       |              ('0x' || substr(md5(t), 1, 8))::BIGINT % $b AS b
       |       FROM toks),
       |db AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2),
       |mg AS (
       |  SELECT db.doc_id, sum(c * coalesce(w.wt, 0.0)) AS margin
       |  FROM db LEFT JOIN w USING (b) GROUP BY db.doc_id),
       |cg AS (
       |  SELECT c.doc_id, c.text FROM corpus c LEFT JOIN mg USING (doc_id)
       |  WHERE round(1.0 / (1.0 + exp(-(coalesce(mg.margin, 0.0)
       |          + ${d(m.intercept)}))), 6) >= 0.5),
       |tt AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM cg),
       |ln AS (SELECT doc_id, unnest(range(1, len(parts) + 1)) AS pos, parts FROM tt),
       |l2 AS (SELECT doc_id, pos, parts[pos] AS line FROM ln),
       |boiler AS (
       |  SELECT trim(line) AS tl FROM l2 WHERE trim(line) <> ''
       |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
       |kept AS (
       |  SELECT doc_id, pos, line FROM l2
       |  WHERE trim(line) = '' OR trim(line) NOT IN (SELECT tl FROM boiler)),
       |agg AS (
       |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
       |  FROM kept GROUP BY doc_id),
       |cleaned AS (
       |  SELECT c.doc_id, coalesce(a.text, '') AS text
       |  FROM cg c LEFT JOIN agg a USING (doc_id)),
       |ne AS (SELECT * FROM cleaned WHERE trim(text) <> ''),
       |fp AS (
       |  SELECT doc_id, text,
       |         md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS f
       |  FROM ne),
       |keepers AS (
       |  SELECT doc_id, text FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY f) AS k FROM fp)
       |  WHERE doc_id = k)
       |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
       |FROM keepers ORDER BY doc_id""".stripMargin
  }

  /** q114: cell-histogram drift KL between the full corpus (A) and its
    * label<5 slice (B) under the inlined IVF model — cell assignment is
    * fully re-derived from the centroid literals like the recall oracles,
    * then the add-one-smoothed per-cell KL contributions recomputed with
    * the operator's exact expression shape. */
  def cellDriftSql(m: Ann.IvfModel): String = {
    val c = m.numCells
    s"""WITH cent(cell, cv) AS (VALUES
       |  ${centValues(m)}),
       |ccd AS (
       |  SELECT e.vec_id, e.label, cent.cell,
       |         ${sq2("e.embedding", "cent.cv")} AS d2
       |  FROM embeddings e, cent),
       |assign AS (
       |  SELECT vec_id, label, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |    FROM ccd) WHERE rn = 1),
       |cells AS (SELECT unnest(range(0, $c)) AS cell),
       |ha AS (SELECT cell, count(*) AS n_a FROM assign GROUP BY cell),
       |hb AS (SELECT cell, count(*) AS n_b FROM assign WHERE label < 5 GROUP BY cell),
       |j AS (
       |  SELECT c.cell, coalesce(ha.n_a, 0) AS n_a, coalesce(hb.n_b, 0) AS n_b
       |  FROM cells c LEFT JOIN ha USING (cell) LEFT JOIN hb USING (cell)),
       |tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j)
       |SELECT CAST(cell AS INT) AS cell,
       |       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |       round(((n_a + 1.0) / (ta + $c)) *
       |             ln(((n_a + 1.0) / (ta + $c)) / ((n_b + 1.0) / (tb + $c))), 6)
       |         + 0.0 AS kl_contrib
       |FROM j, tot ORDER BY cell""".stripMargin
  }

  /** q48: IVF probe -> cosine top-10 on survivors -> recall vs exact. */
  def ivfRecallSql(m: Ann.IvfModel, nProbe: Int = 4, k: Int = 10): String =
    s"""WITH $qCte,
       |${ivfCtes(m, nProbe)},
       |cand AS (
       |  SELECT p.query_id, s.vec_id AS neighbor_id,
       |         ${cosine("s.embedding", "q.qv")} AS dist
       |  FROM probed p
       |  JOIN corpus_cell s ON s.cell = p.cell
       |  JOIN q ON q.query_id = p.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM cand) WHERE rk <= $k),
       |${exactCtes(cosine("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin

  /** q19: PQ-encode corpus, ADC rank all rows, top-10 -> recall vs exact
    * L2. ADC dist = sqrt(Σ_m lut[m][code[m]]); rank by the (monotone)
    * un-rooted sum. */
  def pqRecallSql(pm: Quantization.PqModel, k: Int = 10): String =
    s"""WITH $qCte,
       |${pqCtes(pm)},
       |adc AS (
       |  SELECT l.query_id, cs.vec_id AS neighbor_id, sum(l.d2) AS s
       |  FROM codes cs JOIN lut l ON l.m = cs.m AND l.c = cs.c
       |  GROUP BY l.query_id, cs.vec_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rk
       |    FROM adc) WHERE rk <= $k),
       |${exactCtes(l2("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin

  /** q72: IVF probe -> ADC top-fetchK on probed cells' codes -> exact-L2
    * rerank to top-10 -> recall vs exact L2. */
  def ivfPqRecallSql(im: Ann.IvfModel, pm: Quantization.PqModel,
                     nProbe: Int = 4, fetchK: Int = 50, k: Int = 10): String =
    s"""WITH $qCte,
       |${ivfCtes(im, nProbe)},
       |${pqCtes(pm)},
       |adc AS (
       |  SELECT p.query_id, cc.vec_id AS neighbor_id, sum(l.d2) AS s
       |  FROM probed p
       |  JOIN corpus_cell cc ON cc.cell = p.cell
       |  JOIN codes cs ON cs.vec_id = cc.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.m = cs.m AND l.c = cs.c
       |  GROUP BY p.query_id, cc.vec_id),
       |fetched AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rn
       |    FROM adc) WHERE rn <= $fetchK),
       |rr AS (
       |  SELECT f.query_id, f.neighbor_id, ${l2("c.embedding", "q.qv")} AS dist
       |  FROM fetched f
       |  JOIN embeddings c ON c.vec_id = f.neighbor_id
       |  JOIN q ON q.query_id = f.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM rr) WHERE rk <= $k),
       |${exactCtes(l2("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin

  /** q123: RESIDUAL IVF-PQ (the FAISS IVFADC composition). Same funnel as
    * q72 — probe, ADC top-fetchK, exact rerank — but codes quantize
    * `vec − cellCentroid`, so the encode compares residual subvectors to
    * the codebook (`cd` uses [[sq3]] with the row's OWN cell centroid) and
    * the LUT is per (query, PROBED cell) (`lut` carries the cell key and
    * the ADC join matches on it). */
  def ivfPqResidualRecallSql(im: Ann.IvfModel, pm: Quantization.PqModel,
                             nProbe: Int = 4, fetchK: Int = 50, k: Int = 10): String = {
    val sd = pm.subDim
    s"""WITH $qCte,
       |${ivfCtes(im, nProbe)},
       |bk(m, c, cv) AS (VALUES
       |  ${bookValues(pm)}),
       |cd AS (
       |  SELECT cc.vec_id, bk.m, bk.c,
       |         ${sq3(s"cc.embedding[(bk.m*$sd+1):((bk.m+1)*$sd)]",
                       s"ct.cv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM corpus_cell cc JOIN cent ct ON ct.cell = cc.cell, bk),
       |codes AS (
       |  SELECT vec_id, m, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |    FROM cd) WHERE rn = 1),
       |lut AS (
       |  SELECT p.query_id, p.cell, bk.m, bk.c,
       |         ${sq3(s"q.qv[(bk.m*$sd+1):((bk.m+1)*$sd)]",
                       s"ct.cv[(bk.m*$sd+1):((bk.m+1)*$sd)]", "bk.cv")} AS d2
       |  FROM probed p
       |  JOIN q ON q.query_id = p.query_id
       |  JOIN cent ct ON ct.cell = p.cell, bk),
       |adc AS (
       |  SELECT p.query_id, cc.vec_id AS neighbor_id, sum(l.d2) AS s
       |  FROM probed p
       |  JOIN corpus_cell cc ON cc.cell = p.cell
       |  JOIN codes cs ON cs.vec_id = cc.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.cell = p.cell
       |            AND l.m = cs.m AND l.c = cs.c
       |  GROUP BY p.query_id, cc.vec_id),
       |fetched AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rn
       |    FROM adc) WHERE rn <= $fetchK),
       |rr AS (
       |  SELECT f.query_id, f.neighbor_id, ${l2("c.embedding", "q.qv")} AS dist
       |  FROM fetched f
       |  JOIN embeddings c ON c.vec_id = f.neighbor_id
       |  JOIN q ON q.query_id = f.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM rr) WHERE rk <= $k),
       |${exactCtes(l2("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin
  }

  /** q49: multi-probe LSH under cosine. Bucket bit h = sign of the dot
    * with plane h over the first `dim` components; probes = base bucket +
    * the nProbe non-empty bit-flip masks with the smallest summed
    * |margin| (with numBits=4 the full 15-mask lattice is enumerable, so
    * ranking masks by score reproduces the priority-queue walk's
    * nondecreasing-score order). No trained model — the planes are a pure
    * hash, so this oracle is fully static. */
  def lshRecallSql(numBits: Int = 4, dim: Int = 64, seed: Long = 42L,
                   nProbe: Int = 4, k: Int = 10): String = {
    val ps = Ann.planes(numBits, dim, seed)
    val nMasks = (1 << numBits) - 1
    s"""WITH $qCte,
       |pl(h, pv) AS (VALUES
       |  ${planeValues(ps)}),
       |cdot AS (
       |  SELECT c.vec_id, pl.h,
       |         (SELECT sum(x*y) FROM (SELECT CAST(unnest(c.embedding[1:$dim]) AS DOUBLE) AS x,
       |                                       unnest(pl.pv) AS y)) AS dot
       |  FROM embeddings c, pl),
       |cbkt AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << h ELSE 0 END) AS BIGINT) AS bkt
       |  FROM cdot GROUP BY vec_id),
       |qdot AS (
       |  SELECT q.query_id, pl.h,
       |         (SELECT sum(x*y) FROM (SELECT CAST(unnest(q.qv[1:$dim]) AS DOUBLE) AS x,
       |                                       unnest(pl.pv) AS y)) AS dot
       |  FROM q, pl),
       |qbase AS (
       |  SELECT query_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << h ELSE 0 END) AS BIGINT) AS bkt
       |  FROM qdot GROUP BY query_id),
       |mscore AS (
       |  SELECT d.query_id, masks.mask, sum(CASE WHEN (masks.mask >> d.h) & 1 = 1
       |                                          THEN abs(d.dot) ELSE 0 END) AS score
       |  FROM qdot d, (SELECT unnest(range(1, ${nMasks + 1})) AS mask) masks
       |  GROUP BY d.query_id, masks.mask),
       |probes AS (
       |  SELECT query_id, mask FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score, mask) AS rn
       |    FROM mscore) WHERE rn <= $nProbe),
       |qbkts AS (
       |  SELECT query_id, bkt FROM qbase
       |  UNION
       |  SELECT p.query_id, xor(b.bkt, CAST(p.mask AS BIGINT))
       |  FROM probes p JOIN qbase b ON b.query_id = p.query_id),
       |cand AS (
       |  SELECT qb.query_id, cb.vec_id AS neighbor_id,
       |         ${cosine("c.embedding", "q.qv")} AS dist
       |  FROM qbkts qb
       |  JOIN cbkt cb ON cb.bkt = qb.bkt
       |  JOIN embeddings c ON c.vec_id = cb.vec_id
       |  JOIN q ON q.query_id = qb.query_id),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rk
       |    FROM cand) WHERE rk <= $k),
       |${exactCtes(cosine("c.embedding", "q.qv"), k)}
       |${recallSelect(k)}""".stripMargin
  }
}
