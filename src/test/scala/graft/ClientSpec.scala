package graft

import graft.functions.{BatchedEmbedder, Embedder}
import graft.operators.Filter
import org.apache.spark.sql.functions._

/** Non-default provider for the pluggable-embedder test: a batched
  * embedder (the remote-API contract) with vectors deliberately different
  * from MockEmbedder's. Top-level class so Spark task closures don't drag
  * the suite along. */
class TestBatchEmbedder(val dimensions: Int) extends BatchedEmbedder {
  def name: String = "testbatch"
  override def batchSize: Int = 2
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val raw = Array.tabulate(dimensions)(i =>
      1.0f + math.abs((t.reverse + ":" + i).hashCode % 1000) / 1000.0f)
    val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
    raw.map(_ / n)
  }
}

/** Mirrors the reference's client behavior suite (tests/test_client.py):
  * create/get/delete collections, add/query with where-filters,
  * get/update/upsert/delete-by-filter/peek, persist-and-reload. */
class ClientSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft-client").toString
  private lazy val client = new GraftClient(spark, root, embedDim = 16)

  private def docs = Seq(
    ("doc1", "the quick brown fox", "animals", 2020),
    ("doc2", "lazy dogs sleep all day", "animals", 2021),
    ("doc3", "spark processes big data", "tech", 2022),
    ("doc4", "catalyst optimizes query plans", "tech", 2023)
  ).toDF("id", "document", "category", "year")

  test("create, list, get, delete collections") {
    client.createCollection("a")
    client.createCollection("b")
    assert(client.listCollections === Seq("a", "b"))
    assert(client.getCollection("a").config.metric === "cosine")
    assert(client.deleteCollection("b"))
    assert(client.listCollections === Seq("a"))
    assert(!client.deleteCollection("nope"))
  }

  test("getCollection on a missing collection fails loudly") {
    intercept[Exception] { client.getCollection("does_not_exist") }
  }

  test("add embeds documents and rejects duplicate ids") {
    val c = client.getOrCreateCollection("docs")
    c.add(docs)
    assert(c.count() === 4)
    val emb = c.get(ids = Seq("doc1")).select("embedding").head().getSeq[Float](0)
    assert(emb.length === 16)
    assert(math.abs(emb.map(x => x.toDouble * x).sum - 1.0) < 1e-5) // unit norm
    // re-adding same ids is a no-op (insert keeps originals)
    c.add(docs.withColumn("year", lit(1999)))
    assert(c.count() === 4)
    assert(c.get(ids = Seq("doc1")).head().getAs[Int]("year") === 2020)
  }

  test("query by text returns the identical document first") {
    val c = client.getCollection("docs")
    val q = Seq((1L, "spark processes big data")).toDF("query_id", "query_text")
    val top = c.query(q, k = 2).orderBy("rank").collect()
    assert(top.head.getAs[String]("id") === "doc3")
    assert(math.abs(top.head.getAs[Double]("distance")) < 1e-6)
  }

  test("packedQuery matches exact query order; mutation invalidates the index") {
    val c = client.getCollection("docs")
    val q = Seq((1L, "spark processes big data"), (2L, "lazy dogs sleep all day"))
      .toDF("query_id", "query_text")
    val exact = c.query(q, k = 3).orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("id")))
    val packed = c.packedQuery(q, k = 3).orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("id")))
    assert(packed.toSeq === exact.toSeq)
    assert(c.hasPackedIndex)
    // distances agree within float32 GEMM tolerance
    val dP = c.packedQuery(q, k = 1).orderBy("query_id").collect()
      .map(_.getAs[Double]("distance"))
    val dE = c.query(q, k = 1).orderBy("query_id").collect()
      .map(_.getAs[Double]("distance"))
    dP.zip(dE).foreach { case (p, e) => assert(math.abs(p - e) < 1e-4) }
    // a mutation DELTAS the resident index in place (tombstone + slab
    // append) — no rebuild, and the next packedQuery sees the new row
    c.upsert(Seq(("doc9", "spark processes big data", "tech", 2024))
      .toDF("id", "document", "category", "year"))
    assert(c.hasPackedIndex)
    val after = c.packedQuery(q, k = 2).orderBy("query_id", "rank").collect()
      .map(_.getAs[String]("id"))
    assert(after.take(2).toSet === Set("doc3", "doc9")) // both identical texts
    // delete tombstones the row out of its slab, still without a rebuild
    c.delete(ids = Seq("doc9"))
    assert(c.hasPackedIndex)
    val gone = c.packedQuery(q, k = 4).collect().map(_.getAs[String]("id"))
    assert(!gone.contains("doc9"))
    // and an add appends a fresh slab the search also covers
    c.add(Seq(("doc10", "catalyst optimizes query plans", "tech", 2025))
      .toDF("id", "document", "category", "year"))
    assert(c.hasPackedIndex)
    val q3 = Seq((1L, "catalyst optimizes query plans")).toDF("query_id", "query_text")
    val dup = c.packedQuery(q3, k = 2).orderBy("rank").collect()
      .map(_.getAs[String]("id"))
    assert(dup.toSet === Set("doc4", "doc10"))
    c.delete(ids = Seq("doc10"))
    assert(c.count() === 4)
  }

  test("filtered packedQuery: over-fetch survivors + exact fallback equal query(where)") {
    val c = client.getOrCreateCollection("pf")
    val rows = (0 until 60).map(i => (s"d$i",
      s"document body number $i with words w$i x$i",
      if (i % 12 == 0) "rare" else "common", 2000 + i))
    c.add(rows.toDF("id", "document", "category", "year"))
    val q = Seq((1L, "document body number 7 with words w7 x7"))
      .toDF("query_id", "query_text")
    val f = Some(Filter.Eq("category", "rare")) // 5 of 60 docs
    // k=3: page (12) likely holds 3 rare docs -> pure fast path;
    // k=10: only 5 rare docs exist, page (40) is full -> exact fallback.
    // Either way membership must equal the exact filtered scan.
    for (k <- Seq(3, 5, 10)) {
      val exact = c.query(q, k = k, where = f)
        .collect().map(_.getAs[String]("id")).toSet
      val packed = c.packedQuery(q, k = k, where = f)
        .collect().map(_.getAs[String]("id")).toSet
      assert(packed === exact, s"k=$k")
      assert(packed.subsetOf((0 until 60 by 12).map(i => s"d$i").toSet))
    }
    assert(c.packedQuery(q, k = 3).count() === 3) // unfiltered unaffected

    // ANN twin: filtered result is BY DEFINITION filter(page).take(k) —
    // check against the unfiltered page of the same probes, with the
    // adaptive sizing clamped down to the fixed k*4 page so the page the
    // twin fetches is the one this check replicates
    c.buildVectorIndex(numCells = 4)
    val rares = (0 until 60 by 12).map(i => s"d$i").toSet
    val page = c.packedAnnQuery(q, k = 12, nProbe = 4)
      .orderBy("rank").collect().map(_.getAs[String]("id")).toSeq
    c.filterOverFetchMaxPage = 1 // clamp: page = k*4 exactly
    val annF = c.packedAnnQuery(q, k = 3, nProbe = 4, where = f)
      .collect().map(_.getAs[String]("id")).toSet
    assert(annF === page.filter(rares).take(3).toSet)
    assert(annF.subsetOf(rares))
    // default adaptive page (~2k/sel = 72 > corpus): the probe-limited
    // twin now FILLS at mid selectivity instead of returning the one
    // rare doc the fixed 12-row page happened to hold
    c.filterOverFetchMaxPage = 4096
    val annA = c.packedAnnQuery(q, k = 3, nProbe = 4, where = f)
      .collect().map(_.getAs[String]("id")).toSet
    assert(annA.size === 3 && annA.subsetOf(rares))
    // the fallback gauge is zeroed by EVERY filtered call, including the
    // no-fallback ann path — a stale count from an earlier packedQuery
    // must not be attributed to this call by an audit reading it now
    c.lastFilteredFallbacks = 99 // simulate stale state from a prior call
    c.packedAnnQuery(q, k = 3, nProbe = 4, where = f).collect()
    assert(c.lastFilteredFallbacks === 0)

    // optimize() compacts everything the collection owns; results identical
    c.buildKeywordIndex()
    val before = c.query(q, k = 5).collect().map(_.getAs[String]("id")).toSeq
    val report = c.optimize(maxFilesPerBucket = 1)
    assert(report.keySet === Set("data", "keyword", "dedup"))
    assert(c.count() === 60)
    assert(c.query(q, k = 5).collect().map(_.getAs[String]("id")).toSeq === before)
    assert(c.hasPackedIndex) // resident index survived, compacted
    client.deleteCollection("pf")
  }

  test("query with where-filter restricts candidates") {
    val c = client.getCollection("docs")
    val q = Seq((1L, "spark processes big data")).toDF("query_id", "query_text")
    val got = c.query(q, k = 4, where = Some(Filter.Eq("category", "animals")))
      .select("id").collect().map(_.getString(0)).toSet
    assert(got === Set("doc1", "doc2"))
  }

  test("hybrid query fuses keyword and vector evidence") {
    val c = client.getCollection("docs")
    val got = c.hybridQuery("spark big data", k = 4, alpha = 0.5).collect()
    assert(got.nonEmpty)
    // the doc containing the query terms must surface with keyword evidence
    val byId = got.map(r => r.getAs[String]("id") -> r).toMap
    assert(byId.contains("doc3"))
    assert(byId("doc3").getAs[Double]("keyword_score") > 0.0)
    // scores are fused: within [0, 1], descending
    val scores = got.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0 + 1e-12))
  }

  test("query can include vectors and metadata; internal columns stay hidden") {
    val c = client.getCollection("docs")
    val q = Seq((1L, "spark processes big data")).toDF("query_id", "query_text")
    val plain = c.query(q, k = 1)
    assert(plain.columns.toSeq === Seq("query_id", "rank", "id", "document", "distance"))
    val full = c.query(q, k = 1, includeVectors = true, includeMetadata = true)
    assert(full.columns.contains("embedding"))
    assert(full.columns.contains("category") && full.columns.contains("year"))
    val row = full.head()
    assert(row.getSeq[Float](full.columns.indexOf("embedding")).length === 16)
    assert(row.getAs[String]("category") === "tech")
  }

  test("hybrid query: metadata filter and explicit weights") {
    val c = client.getCollection("docs")
    // filter restricts both candidate sides
    val animals = c.hybridQuery("quick fox", k = 4,
        where = Some(Filter.Eq("category", "animals")))
      .collect().map(_.getAs[String]("id")).toSet
    assert(animals.nonEmpty && animals.subsetOf(Set("doc1", "doc2")))
    // vectorWeight/keywordWeight override alpha: all-keyword weights ==
    // alpha 0 (scores equal keyword_score)
    val kwOnly = c.hybridQuery("spark big data", k = 4,
      vectorWeight = Some(0.0), keywordWeight = Some(1.0))
    val rows = kwOnly.collect()
    assert(rows.forall(r =>
      math.abs(r.getAs[Double]("score") - r.getAs[Double]("keyword_score")) < 1e-12))
    // include_vectors carries the embedding column through fusion
    val withVec = c.hybridQuery("spark big data", k = 2, includeVectors = true)
    assert(withVec.columns.contains("embedding"))
    assert(withVec.head().getSeq[Float](withVec.columns.indexOf("embedding")).length === 16)
  }

  test("persisted keyword index: no re-tokenization, maintained by every mutation") {
    val c = client.getOrCreateCollection("kwidx")
    c.add(docs)
    val onTheFly = c.hybridQuery("spark big data", k = 4).collect().toSeq
    c.buildKeywordIndex()
    assert(c.hasKeywordIndex)
    val indexed = c.hybridQuery("spark big data", k = 4)
    // the keyword side reads the sidecar: the plan has NO tokenize stage
    // (the shared split-class regex is its fingerprint)
    assert(!indexed.queryExecution.analyzed.toString.contains("[^a-z0-9_"),
      "hybridQuery must read the stored postings, not re-tokenize the corpus")
    def canon(rows: Seq[org.apache.spark.sql.Row]): Seq[(String, Long)] =
      rows.map(r => (r.getAs[String]("id"),
        math.round(r.getAs[Double]("score") * 1e9)))
    assert(canon(indexed.collect().toSeq) === canon(onTheFly))

    // every mutation maintains the sidecar incrementally; results always
    // equal a from-scratch index over the current corpus
    def oracle(q: String): Seq[(String, Long)] = {
      val tmp = client.getOrCreateCollection("kwidx_oracle")
      tmp.delete()
      tmp.add(c.get())
      val got = canon(tmp.hybridQuery(q, k = 5).collect().toSeq)
      client.deleteCollection("kwidx_oracle")
      got
    }
    c.add(Seq(("doc5", "spark streams data too", "tech", 2024))
      .toDF("id", "document", "category", "year"))
    assert(canon(c.hybridQuery("spark big data", k = 5).collect().toSeq)
      === oracle("spark big data"), "after add")
    c.update(Seq(("doc3", "flink processes big data", "tech", 2022))
      .toDF("id", "document", "category", "year"))
    assert(canon(c.hybridQuery("spark big data", k = 5).collect().toSeq)
      === oracle("spark big data"), "after update")
    c.upsert(Seq(("doc6", "ducks process small data", "animals", 2026))
      .toDF("id", "document", "category", "year"))
    assert(canon(c.hybridQuery("small data", k = 5).collect().toSeq)
      === oracle("small data"), "after upsert")
    c.delete(ids = Seq("doc1"))
    assert(canon(c.hybridQuery("quick brown fox", k = 5).collect().toSeq)
      === oracle("quick brown fox"), "after delete")
    // filtered hybrid restricts the stored index by semi-join
    val filtered = c.hybridQuery("spark big data", k = 5,
      where = Some(Filter.Eq("category", "tech")))
    assert(!filtered.queryExecution.analyzed.toString.contains("[^a-z0-9_"))
    assert(filtered.collect().map(_.getAs[String]("id")).toSet
      .subsetOf(Set("doc3", "doc4", "doc5")))
  }

  test("pluggable embedder: add and query flow through the configured provider") {
    val registry = Embedder.builtin +
      ("testbatch" -> ((d: Int) => new TestBatchEmbedder(d): Embedder))
    val root2 = java.nio.file.Files.createTempDirectory("graft-embedder").toString
    val cl = new GraftClient(spark, root2, embedDim = 16, embedders = registry)
    val c = cl.createCollection("custom", embedder = "testbatch")
    c.add(Seq(("d1", "alpha beta"), ("d2", "gamma delta")).toDF("id", "document"))
    // stored vectors are the provider's output, not the mock's
    val stored = c.get(ids = Seq("d1")).select("embedding").head().getSeq[Float](0)
    assert(stored === new TestBatchEmbedder(16).embedBatch(Seq("alpha beta")).head.toSeq)
    val mock = graft.functions.MockEmbedder(16)
      .embed(Seq("alpha beta").toDF("t"), "t", "e").select("e").head().getSeq[Float](0)
    assert(stored !== mock)
    // query text embeds through the SAME provider: the exact document wins
    val hit = cl.getCollection("custom")
      .query(Seq((0L, "gamma delta")).toDF("query_id", "query_text"), k = 1)
    assert(hit.head().getAs[String]("id") === "d2")
    // provider name persists in config.json and resolves on reopen
    assert(new GraftClient(spark, root2, 16, registry)
      .getCollection("custom").config.embedder === "testbatch")
    // a client without the provider registered fails loudly
    intercept[IllegalArgumentException] {
      new GraftClient(spark, root2, 16).getCollection("custom")
    }
    intercept[IllegalArgumentException] {
      cl.createCollection("nope", embedder = "no_such_provider")
    }
  }

  test("persisted IVF vector index: annQuery prunes to probed cells, exact on self-match") {
    val c = client.getOrCreateCollection("ann")
    c.add((0 until 40).map(i => (s"v$i", s"unique document number $i body"))
      .toDF("id", "document"))
    intercept[IllegalArgumentException] { c.annQuery(docs, k = 1) } // no index yet
    c.buildVectorIndex(numCells = 4)
    assert(c.hasVectorIndex)
    // a query identical to a stored document always lands in its own cell:
    // rank 1 is the document itself at distance ~0
    val hits = c.annQuery(
      Seq((7L, "unique document number 7 body")).toDF("query_id", "query_text"),
      k = 3, nProbe = 1)
    val top = hits.where(col("rank") === 1).head()
    assert(top.getAs[String]("id") === "v7")
    assert(math.abs(top.getAs[Double]("distance")) < 1e-6)
    // probing every cell makes the result the exact kNN
    val annAll = c.annQuery(
        Seq((7L, "unique document number 7 body")).toDF("query_id", "query_text"),
        k = 5, nProbe = 4)
      .select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    val exact = c.query(
        Seq((7L, "unique document number 7 body")).toDF("query_id", "query_text"),
        k = 5)
      .select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(annAll.sortBy(_._1) === exact.sortBy(_._1))
    // a reopened collection sees the persisted index
    assert(new GraftClient(spark, root, 16).getCollection("ann").hasVectorIndex)
  }

  test("packedAnnQuery agrees with annQuery on the same model and probes") {
    val c = client.getCollection("ann") // index built in the previous test
    val q = Seq((7L, "unique document number 7 body"),
        (8L, "unique document number 8 body"))
      .toDF("query_id", "query_text")
    for (nProbe <- Seq(1, 4)) {
      val viaJoin = c.annQuery(q, k = 3, nProbe = nProbe)
        .select("query_id", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val viaPacked = c.packedAnnQuery(q, k = 3, nProbe = nProbe)
        .select("query_id", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(viaPacked === viaJoin, s"nProbe=$nProbe")
    }
    // upsert deltas BOTH resident layouts in place: the batch routes
    // through the same coarse quantizer and zips into its cells
    assert(c.hasPackedAnnIndex)
    c.upsert(Seq(("vX", "unique document number X body")).toDF("id", "document"))
    assert(c.hasPackedAnnIndex)
    val qX = Seq((1L, "unique document number X body")).toDF("query_id", "query_text")
    val after = c.packedAnnQuery(qX, k = 1, nProbe = 4).collect()
    assert(after.head.getAs[String]("id") === "vX") // delta sees the new row
    // delete tombstones the cell layout IN PLACE (partition i stays cell
    // i) — no release, and the dead id stops surfacing
    c.delete(ids = Seq("vX"))
    assert(c.hasPackedAnnIndex)
    val postDelete = c.packedAnnQuery(qX, k = 4, nProbe = 4).collect()
      .map(_.getAs[String]("id"))
    assert(!postDelete.contains("vX"))
    // retraining the coarse quantizer drops the stale resident layout
    // (but not the model-independent flat index)
    c.packedQuery(q, k = 1)
    c.packedAnnQuery(q, k = 1)
    assert(c.hasPackedIndex && c.hasPackedAnnIndex)
    // compaction folds the CRUD generations; both indexes stay resident
    // and queryable
    c.compactPackedIndexes()
    assert(c.hasPackedIndex && c.hasPackedAnnIndex)
    assert(c.packedQuery(q, k = 1).count() === 2)
    c.buildVectorIndex(numCells = 2)
    assert(c.hasPackedIndex && !c.hasPackedAnnIndex)
    // empty query batch returns empty results like query(), no throw
    assert(c.packedQuery(q.limit(0)).count() === 0)
    assert(c.packedAnnQuery(q.limit(0)).count() === 0)
  }

  test("packedPqQuery: resident code tier serves exactly, CRUD-maintained, warm-startable, stale-guarded") {
    val c = client.getOrCreateCollection("pqtier")
    c.add((0 until 48).map(i => (s"p$i", s"unique pq document number $i body"))
      .toDF("id", "document"))
    c.buildVectorIndex(numCells = 4)
    // no product quantizer yet: fail loud with the remedy
    val e0 = intercept[IllegalArgumentException] {
      c.packedPqQuery(Seq((1L, "x")).toDF("query_id", "query_text"))
    }
    assert(e0.getMessage.contains("buildQuantModel"))
    c.buildQuantModel(numSubspaces = 4, numCentroids = 16)
    assert(c.hasQuantModel)

    val q = Seq((7L, "unique pq document number 7 body")).toDF("query_id", "query_text")
    // all-cell probe + corpus-sized fetchK => candidates = corpus, and the
    // exact rerank makes the result THE exact kNN (same double kernel)
    def rrid(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    val exact = rrid(c.query(q, k = 5))
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)
    // self-match at rank 1 even on the pruned probe (own cell is nearest)
    val top = c.packedPqQuery(q, k = 1, nProbe = 1).head()
    assert(top.getAs[String]("id") === "p7")
    assert(math.abs(top.getAs[Double]("distance")) < 1e-6)

    // CRUD deltas maintain the code tier in place: appends encode
    // through the standing models, deletes tombstone
    c.upsert(Seq(("pX", "unique pq document number X body")).toDF("id", "document"))
    assert(c.hasPackedPqIndex)
    val qX = Seq((1L, "unique pq document number X body")).toDF("query_id", "query_text")
    assert(c.packedPqQuery(qX, k = 1, nProbe = 4).head().getAs[String]("id") === "pX")
    c.delete(ids = Seq("pX"))
    assert(!c.packedPqQuery(qX, k = 4, nProbe = 4).collect()
      .map(_.getAs[String]("id")).contains("pX"))
    // compaction folds the generations; results unchanged
    c.compactPackedIndexes()
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)

    // warm start: sidecar carries codes + BOTH models + the stamp
    c.saveResidentIndex()
    val reopened = new GraftClient(spark, root, 16).getCollection("pqtier")
    reopened.buildPackedPqIndex()
    assert(rrid(reopened.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)
    reopened.releasePackedIndex()

    // mutation through ANOTHER handle: fail loud, then rebuild via flag
    val other = new GraftClient(spark, root, 16).getCollection("pqtier")
    other.add(Seq(("pY", "unique pq document number Y body")).toDF("id", "document"))
    val e1 = intercept[IllegalStateException] { c.packedPqQuery(q, k = 1) }
    assert(e1.getMessage.contains("STALE") && e1.getMessage.contains("buildPackedPqIndex"))
    c.autoRebuildStalePacked = true
    try assert(c.packedPqQuery(q, k = 1).count() === 1)
    finally c.autoRebuildStalePacked = false

    // retraining the coarse quantizer drops the (cell-routed) code tier
    c.buildVectorIndex(numCells = 2)
    assert(!c.hasPackedPqIndex)
    // empty query batch returns empty results, no throw
    assert(c.packedPqQuery(q.limit(0)).count() === 0)
  }

  test("splitHotCells: refined model persists, queries stay exact, other handles notice") {
    val c = client.getOrCreateCollection("split")
    c.add((0 until 60).map(i => (s"s$i", s"unique split document number $i body"))
      .toDF("id", "document"))
    c.buildVectorIndex(numCells = 2)
    val q = Seq((7L, "unique split document number 7 body"))
      .toDF("query_id", "query_text")
    def rrid(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    val exact = rrid(c.query(q, k = 5))
    // a second handle packs against the PRE-split model
    val other = new GraftClient(spark, root, 16).getCollection("split")
    other.buildPackedAnnIndex()

    val n = c.splitHotCells(maxRows = 20)
    assert(n >= 1, "60 rows over 2 cells must exceed 20 somewhere")
    val cells = 2 + n
    assert(c.residentPackedIvf.get.model.numCells === cells)
    // full-probe searches stay exact through BOTH paths: the resident
    // split index and annQuery's persisted (refined) model
    assert(rrid(c.packedAnnQuery(q, k = 5, nProbe = cells)) === exact)
    assert(rrid(c.annQuery(q, k = 5, nProbe = cells)) === exact)
    // every cell now under the threshold
    assert(graft.operators.PackedKnn.cellSizes(c.residentPackedIvf.get).forall(_ <= 20))
    // CRUD keeps maintaining the split-geometry index in place
    c.upsert(Seq(("sX", "unique split document number X body")).toDF("id", "document"))
    val qX = Seq((1L, "unique split document number X body"))
      .toDF("query_id", "query_text")
    assert(c.packedAnnQuery(qX, k = 1, nProbe = cells).head()
      .getAs[String]("id") === "sX")
    // the pre-split handle's resident index is now stale — fail loud
    val e = intercept[IllegalStateException] { other.packedAnnQuery(q, k = 1) }
    assert(e.getMessage.contains("STALE"))
    // a fresh rebuild on that handle routes through the refined model
    other.buildPackedAnnIndex()
    assert(other.residentPackedIvf.get.model.numCells === cells)
    other.releasePackedIndex()
    // zero-split call is a no-op: nothing invalidated
    val stamp = graft.sources.Collections.readMutationCount(spark, s"$root/split")
    assert(c.splitHotCells(maxRows = 1000000) === 0)
    assert(graft.sources.Collections.readMutationCount(spark, s"$root/split") === stamp)
  }

  test("residual quant model: exact at full probe, CRUD-maintained, coarse retrain kills it") {
    val c = client.getOrCreateCollection("pqres")
    c.add((0 until 48).map(i => (s"r$i", s"unique residual document number $i body"))
      .toDF("id", "document"))
    // residual training needs the coarse cells: fail loud without them
    val e0 = intercept[IllegalArgumentException] {
      c.buildQuantModel(numSubspaces = 4, numCentroids = 16, residual = true)
    }
    assert(e0.getMessage.contains("buildVectorIndex"))
    c.buildVectorIndex(numCells = 4)
    c.buildQuantModel(numSubspaces = 4, numCentroids = 16, residual = true)
    assert(c.quantModelIsResidual)

    val q = Seq((7L, "unique residual document number 7 body"))
      .toDF("query_id", "query_text")
    def rrid(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    val exact = rrid(c.query(q, k = 5))
    // all-cell probe + corpus fetchK + exact rerank = exact kNN, through
    // residual codes and their per-cell LUTs
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)
    assert(c.residentPackedPq.exists(_.residual))

    // CRUD deltas encode residually through the standing models
    c.upsert(Seq(("rX", "unique residual document number X body")).toDF("id", "document"))
    val qX = Seq((1L, "unique residual document number X body"))
      .toDF("query_id", "query_text")
    assert(c.packedPqQuery(qX, k = 1, nProbe = 4).head().getAs[String]("id") === "rX")
    c.delete(ids = Seq("rX"))
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)

    // the sidecar carries the residual flag; a fresh handle warm-starts
    // into the same geometry
    c.saveResidentIndex()
    val reopened = new GraftClient(spark, root, 16).getCollection("pqres")
    assert(reopened.quantModelIsResidual)
    reopened.buildPackedPqIndex()
    assert(reopened.residentPackedPq.exists(_.residual))
    assert(rrid(reopened.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)
    reopened.releasePackedIndex()

    // coarse retrain: residual codebooks belonged to the old geometry —
    // the model dies with it and the next build demands a retrain
    c.buildVectorIndex(numCells = 2)
    assert(!c.hasQuantModel && !c.quantModelIsResidual)
    val e1 = intercept[IllegalArgumentException] { c.packedPqQuery(q, k = 1) }
    assert(e1.getMessage.contains("buildQuantModel"))
  }

  test("SQ8 tier: full-probe ranking, CRUD-maintained, stale-guarded, survives retrain") {
    val c = client.getOrCreateCollection("sq8")
    c.add((0 until 48).map(i => (s"s$i", s"unique scalar quantized doc number $i body",
        if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "document", "parity"))
    c.buildVectorIndex(numCells = 4)
    val e0 = intercept[IllegalArgumentException] { c.buildPackedSqIndex() }
    assert(e0.getMessage.contains("buildScalarQuantModel"))
    c.buildScalarQuantModel()
    assert(c.hasScalarQuantModel)

    val q = Seq((7L, "unique scalar quantized doc number 7 body"))
      .toDF("query_id", "query_text")
    def rrid(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    // decoded-space distances rank the hash-embedder's well-separated
    // vectors identically to the exact scan at full probe (deterministic
    // data, deterministic quantizer — a stable equality)
    val exact = rrid(c.query(q, k = 5))
    assert(rrid(c.packedSqQuery(q, k = 5, nProbe = 4)) === exact)
    assert(c.hasPackedSqIndex)
    // footprint: dim bytes/row vs the float tier's 4*dim
    val pi = c.residentPackedSq.get
    assert(graft.operators.PackedSq.codeBytes(pi) === 48L * pi.dim)

    // CRUD deltas encode through the standing model
    c.upsert(Seq(("sX", "unique scalar quantized doc number X body")).toDF("id", "document"))
    val qX = Seq((1L, "unique scalar quantized doc number X body"))
      .toDF("query_id", "query_text")
    assert(c.packedSqQuery(qX, k = 1, nProbe = 4).head().getAs[String]("id") === "sX")
    c.delete(ids = Seq("sX"))
    assert(rrid(c.packedSqQuery(q, k = 5, nProbe = 4)) === exact)

    // warm start from the slab sidecar
    c.saveResidentIndex()
    val reopened = new GraftClient(spark, root, 16).getCollection("sq8")
    assert(reopened.hasScalarQuantModel)
    reopened.buildPackedSqIndex()
    assert(rrid(reopened.packedSqQuery(q, k = 5, nProbe = 4)) === exact)

    // foreign mutation -> THIS handle's resident SQ index is fail-loud stale
    reopened.upsert(Seq(("sY", "another unique doc body Y")).toDF("id", "document"))
    val e1 = intercept[IllegalStateException] { c.packedSqQuery(q, k = 5) }
    assert(e1.getMessage.contains("STALE") && e1.getMessage.contains("SQ"))
    reopened.delete(ids = Seq("sY"))
    reopened.releasePackedIndex()

    // coarse retrain: per-dim stats are cell-independent — model SURVIVES,
    // only the cell-partitioned slabs rebuild under the new routing
    c.buildVectorIndex(numCells = 2)
    assert(c.hasScalarQuantModel)
    c.buildPackedSqIndex()
    assert(rrid(c.packedSqQuery(q, k = 5, nProbe = 2)) === exact)

    // filtered fast path: survivors of the metadata filter keep their
    // decoded-space ranking (the packedAnnQuery over-fetch contract) —
    // the query doc itself (s7, odd) is filtered out
    val filtered = c.packedSqQuery(q, k = 5, nProbe = 2,
      where = Some(Filter.Ne("parity", "odd")))
      .select("id").collect().map(_.getString(0)).toSet
    assert(!filtered.contains("s7") && filtered.nonEmpty)
    assert(filtered.forall(_.stripPrefix("s").toInt % 2 == 0))
    val unfiltered = c.packedSqQuery(q, k = 48, nProbe = 2)
      .select("id").collect().map(_.getString(0))
    assert(filtered.subsetOf(unfiltered.toSet))
  }

  test("SQ warm-start fallback is narrow: corrupt sidecar pays ONE rebuild; bugs propagate") {
    val c = client.getOrCreateCollection("sqcorrupt")
    c.add((0 until 48).map(i => (s"c$i", s"unique corrupt sidecar doc number $i body"))
      .toDF("id", "document"))
    c.buildVectorIndex(numCells = 4)
    c.buildScalarQuantModel()
    c.buildPackedSqIndex()
    val q = Seq((1L, "unique corrupt sidecar doc number 7 body"))
      .toDF("query_id", "query_text")
    def rrid(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    val exact = rrid(c.query(q, k = 5))
    c.saveResidentIndex()
    // corrupt a slab file in place (garbage bytes, truncated)
    val slabDir = new java.io.File(s"$root/sqcorrupt/index_packed_sq")
    val part = slabDir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".slab"))
      .head
    java.nio.file.Files.write(part.toPath, Array.fill[Byte](64)(0x42))
    val reopened = new GraftClient(spark, root, 16).getCollection("sqcorrupt")
    reopened.buildPackedSqIndex() // one warn + cold rebuild, NOT a crash
    // gauge read through the PUBLIC facade (r13 verdict: operators must
    // see a persistent format problem without reflection or log scraping)
    assert(reopened.warmStartRebuilds === 1,
      "a corrupt sidecar must pay exactly one counted rebuild")
    assert(rrid(reopened.packedSqQuery(q, k = 5, nProbe = 4)) === exact)
    // the classifier: load/format failures fall back...
    import GraftCollection.sidecarLoadRecoverable
    assert(sidecarLoadRecoverable(new java.io.IOException("footer")))
    assert(sidecarLoadRecoverable(new IllegalArgumentException("slab require")))
    assert(sidecarLoadRecoverable(new org.apache.spark.SparkException(
      "task failed", new java.io.EOFException("truncated slab"))))
    // a cluster-side failure whose cause did not survive deserialization:
    // only the class NAME remains in the message — still recoverable
    assert(sidecarLoadRecoverable(new org.apache.spark.SparkException(
      "Task failed: java.io.EOFException: truncated slab at offset 64")))
    // ...while genuine bugs PROPAGATE (r12 finding: the old blanket catch
    // would silently pay the full cold pack on every open, forever)
    assert(!sidecarLoadRecoverable(new NullPointerException("bug")))
    assert(!sidecarLoadRecoverable(new org.apache.spark.SparkException(
      "task failed", new NullPointerException("bug"))))
    assert(!sidecarLoadRecoverable(new org.apache.spark.SparkException(
      "Task failed: java.lang.NullPointerException at Foo.bar")))
    assert(!sidecarLoadRecoverable(new MatchError("bug")))
  }

  test("OPQ quant model: exact at full probe, CRUD-maintained, survives coarse retrain") {
    val c = client.getOrCreateCollection("pqopq")
    c.add((0 until 48).map(i => (s"o$i", s"unique rotated document number $i body"))
      .toDF("id", "document"))
    c.buildVectorIndex(numCells = 4)
    // residual and opq are alternatives, not a composition
    val e0 = intercept[IllegalArgumentException] {
      c.buildQuantModel(numSubspaces = 4, numCentroids = 16,
        residual = true, opq = true)
    }
    assert(e0.getMessage.contains("alternative"))
    c.buildQuantModel(numSubspaces = 4, numCentroids = 16, opq = true)
    assert(c.quantModelIsOpq && !c.quantModelIsResidual)

    val q = Seq((7L, "unique rotated document number 7 body"))
      .toDF("query_id", "query_text")
    def rrid(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    val exact = rrid(c.query(q, k = 5))
    // all-cell probe + corpus fetchK + exact rerank = exact kNN, through
    // rotated codes and rotated-query LUTs
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)
    assert(c.residentPackedPq.exists(_.rotation.isDefined))

    // CRUD deltas rotate through the standing model
    c.upsert(Seq(("oX", "unique rotated document number X body")).toDF("id", "document"))
    val qX = Seq((1L, "unique rotated document number X body"))
      .toDF("query_id", "query_text")
    assert(c.packedPqQuery(qX, k = 1, nProbe = 4).head().getAs[String]("id") === "oX")
    c.delete(ids = Seq("oX"))
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)

    // warm start keeps the rotation
    c.saveResidentIndex()
    val reopened = new GraftClient(spark, root, 16).getCollection("pqopq")
    assert(reopened.quantModelIsOpq)
    reopened.buildPackedPqIndex()
    assert(reopened.residentPackedPq.exists(_.rotation.isDefined))
    assert(rrid(reopened.packedPqQuery(q, k = 5, nProbe = 4, fetchK = 48)) === exact)
    reopened.releasePackedIndex()

    // coarse retrain: OPQ codes are raw-space — the model SURVIVES (only
    // the cell-partitioned slabs rebuild under the new routing)
    c.buildVectorIndex(numCells = 2)
    assert(c.hasQuantModel && c.quantModelIsOpq)
    assert(rrid(c.packedPqQuery(q, k = 5, nProbe = 2, fetchK = 48)) === exact)

    // retraining without opq clears the rotation end to end
    c.buildQuantModel(numSubspaces = 4, numCentroids = 16)
    assert(!c.quantModelIsOpq)
    c.buildPackedPqIndex()
    assert(c.residentPackedPq.exists(_.rotation.isEmpty))
  }

  test("update, upsert, delete-by-filter, peek, reload") {
    val c = client.getCollection("docs")
    c.update(Seq(("doc2", "lazy dogs nap", "animals", 2024)).toDF("id", "document", "category", "year"))
    assert(c.get(ids = Seq("doc2")).head().getAs[Int]("year") === 2024)
    // update on unknown id is ignored
    c.update(Seq(("ghost", "x", "y", 1)).toDF("id", "document", "category", "year"))
    assert(c.count() === 4)
    // upsert inserts the unknown id
    c.upsert(Seq(("doc5", "new arrival", "tech", 2025)).toDF("id", "document", "category", "year"))
    assert(c.count() === 5)
    c.delete(where = Some(Filter.Eq("category", "tech")))
    assert(c.get().select("id").collect().map(_.getString(0)).toSet === Set("doc1", "doc2"))
    assert(c.peek(1).head().getAs[String]("id") === "doc1")
    // list_ids(limit, offset) pages the id universe in stable id order
    assert(c.listIds() === Seq("doc1", "doc2"))
    assert(c.listIds(limit = 1) === Seq("doc1"))
    assert(c.listIds(limit = 5, offset = 1) === Seq("doc2"))
    assert(c.listIds(offset = 2) === Seq.empty)
    // fresh client sees persisted state
    val again = new GraftClient(spark, root).getCollection("docs")
    assert(again.count() === 2)
  }

  test("pipeline facade: dedup clusters, decontamination, mixture sample, keywords") {
    val c = client.getOrCreateCollection("pipeline")
    c.add(Seq(
      ("p1", "the quick brown fox jumps over the lazy dog near the river bank", "web"),
      ("p2", "the quick brown fox jumps over the lazy dog near the river", "web"),  // ~ p1
      ("p3", "completely different content about database engines", "books"),
      ("p4", "catalyst turns plans into executable stages", "books")
    ).toDF("id", "document", "source"))

    val clusters = c.dedupClusters(threshold = 0.5).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(clusters === Map("p1" -> "p1", "p2" -> "p1"))

    val hits = c.decontaminate(
        Seq(("e1", "the quick brown fox jumps over the lazy dog")).toDF("eid", "etext"),
        "eid", "etext", threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hits.nonEmpty && hits.forall(_._2 == "e1"))
    assert(hits.map(_._1).subsetOf(Set("p1", "p2")))

    val sampled = c.sampleMixture("source", Map("web" -> 1.0, "books" -> 0.0))
      .select("id").collect().map(_.getString(0)).toSet
    assert(sampled === Set("p1", "p2"))

    val kw = c.keywords(topK = 2).collect()
    assert(kw.map(_.getString(0)).distinct.length === 4) // every doc got keywords
    assert(kw.forall(_.getInt(1) <= 2))

    // once a keyword index exists, keywords() reads the sidecar — same
    // no-tokenize fingerprint as hybridQuery — with identical output
    c.buildKeywordIndex()
    val kwIndexed = c.keywords(topK = 2)
    assert(!kwIndexed.queryExecution.analyzed.toString.contains("[^a-z0-9_"),
      "keywords must read the stored postings, not re-tokenize the corpus")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(canon(kwIndexed.collect()) === canon(kw))
  }

  test("pipeline facade: quality signals, PII scan, contamination, shards, RRF") {
    val c = client.getOrCreateCollection("pipeline2")
    c.add(Seq(
      ("r1", "spark spark spark spark", "web"),
      ("r2", "reach me at bob@corp.io or 415-555-0100", "web"),
      ("r3", "the quick brown fox jumps over the lazy dog", "books"),
      ("r4", "plain unremarkable text with no repeats", "books")
    ).toDF("id", "document", "source"))

    val q = c.qualitySignals().collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(q.size === 4)
    assert(q("r1").getAs[Double]("dup_trigram_frac") === 0.5) // 1 distinct of 2 trigrams
    assert(q("r1").getAs[String]("top_bigram") === "spark spark")
    assert(q.values.forall(r => r.getAs[Double]("quality") >= 0.0))

    val pii = c.piiScan().collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(pii("r2").getAs[Int]("n_emails") === 1)
    assert(pii("r2").getAs[Int]("n_phones") === 1)
    assert(pii("r2").getAs[String]("redacted") === "reach me at <EMAIL> or <PHONE>")
    assert(pii("r4").getAs[Int]("n_emails") === 0)

    val cont = c.contamination(
        Seq(("e1", "quick brown fox jumps"), ("e2", "nothing shared here at all"))
          .toDF("eid", "etext"), "eid", "etext")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("overlap_frac")).toMap
    assert(cont("e1") === 1.0 && cont("e2") === 0.0)

    val shards = c.exportShards(numShards = 2).select("id", "shard", "seq").collect()
    assert(shards.length === 4)
    assert(shards.map(_.getInt(1)).forall(s => s == 0 || s == 1))

    val rrf = c.hybridQueryRrf("quick brown fox", k = 2).collect()
    assert(rrf.nonEmpty && rrf.head.getAs[String]("id") === "r3")
    assert(rrf.head.getAs[Double]("score") > 0.0)

    val heavy = c.heavyTerms(minCount = 4L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heavy === Map("spark" -> 4L))  // only r1's repeated token clears 4

    val drift = c.sourceDrift("source").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(drift.keySet === Set("web", "books"))
    // disjoint vocabularies -> strictly positive divergence both ways
    assert(drift.values.forall(_ > 0.0))
  }

  test("pipeline facade: dup spans, importance weights, splits, curriculum") {
    val c = client.getOrCreateCollection("pipeline3")
    c.add(Seq(
      ("a1", "one two three four five tail1 tail2", "web"),
      ("a2", "one two three four five other6 other7", "web"),
      ("a3", "completely different words here entirely", "books"),
      ("a4", "the quick brown fox jumps again", "books")
    ).toDF("id", "document", "source"))

    val spans = c.dupSpans(n = 5).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(spans === Map("a1" -> 5L, "a2" -> 5L)) // shared 5-token prefix

    val target = Seq("quick brown fox", "brown fox jumps").toDF("txt")
    val w = c.importanceWeights(target, "txt").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w("a4") > w("a1")) // fox-speak doc is most target-like

    val splits = c.assignSplits("source").select("id", "split").collect()
    assert(splits.length === 4)
    assert(splits.forall(r => Set("train", "val", "test")(r.getString(1))))

    val cur = c.curriculum("source", "id").orderBy("ord").collect()
    assert(cur.length === 4)
    // round-robin: first two positions are one doc from each source group
    assert(cur.take(2).map(_.getAs[String]("source")).toSet === Set("web", "books"))
  }

  test("persisted dedup index: ingest drops near-copies, accept maintains") {
    val c = client.getOrCreateCollection("dedupix")
    c.add(Seq(
      ("d1", "the quick brown fox jumps over the lazy dog tonight", "web"),
      ("d2", "completely different content about spark partitions here", "web")
    ).toDF("id", "document", "source"))
    assert(!c.hasDedupIndex)
    c.buildDedupIndex()
    assert(c.hasDedupIndex)

    val batch = Seq(
      ("b1", "the quick brown fox jumps over the lazy dog"),   // near-copy of d1
      ("b2", "fresh unique sentence with brand new words entirely")
    ).toDF("bid", "btext")
    val s1 = c.dedupIngest(batch, "bid", "btext", accept = true)
      .select("id").collect().map(_.getString(0)).toSet
    assert(s1 === Set("b2"))
    // accept=true appended b2's signatures: a copy of b2 is now caught
    val s2 = c.dedupIngest(
      Seq(("b3", "fresh unique sentence with brand new words entirely"))
        .toDF("bid", "btext"), "bid", "btext")
      .select("id").collect().map(_.getString(0)).toSet
    assert(s2 === Set.empty[String])
  }

  private def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    rdd.dependencies.exists {
      case _: org.apache.spark.ShuffleDependency[_, _, _] => true
      case d => hasShuffle(d.rdd)
    }

  private def lineageClasses(rdd: org.apache.spark.rdd.RDD[_]): Set[String] =
    rdd.dependencies.map(_.rdd).flatMap(lineageClasses).toSet + rdd.getClass.getName

  test("resident index warm-starts from saved slabs; a mutation invalidates them") {
    val c = client.getOrCreateCollection("warm")
    c.add(docs)
    c.buildPackedIndex()
    val q = Seq((1L, "spark processes big data")).toDF("query_id", "query_text")
    def rows(col: GraftCollection, f: GraftCollection => org.apache.spark.sql.DataFrame) =
      f(col).orderBy("rank").collect()
        .map(r => (r.getAs[Int]("rank"), r.getAs[String]("id"),
          math.rint(r.getAs[Double]("distance") * 1e6) / 1e6)).toSeq
    val want = rows(c, _.packedQuery(q, 3))
    c.saveResidentIndex()

    // reopen through a fresh handle: the build must load slabs, not re-pack
    val re = client.getCollection("warm")
    re.buildPackedIndex()
    val blocks = re.residentPacked.get.blocks
    assert(!hasShuffle(blocks), "warm start must be shuffle-free")
    assert(!lineageClasses(blocks).exists(_.contains("FileScan")),
      "warm start must not re-scan the corpus parquet")
    assert(rows(re, _.packedQuery(q, 3)) === want)

    // IVF layout: model rides inside the sidecar, partition i = cell i
    c.buildVectorIndex(numCells = 2)
    c.buildPackedAnnIndex()
    val wantAnn = rows(c, _.packedAnnQuery(q, 3, nProbe = 2))
    c.saveResidentIndex()
    val re2 = client.getCollection("warm")
    re2.buildPackedAnnIndex()
    val ivfBlocks = re2.residentPackedIvf.get.blocks
    assert(!hasShuffle(ivfBlocks), "IVF warm start must skip the routing shuffle")
    assert(rows(re2, _.packedAnnQuery(q, 3, nProbe = 2)) === wantAnn)

    // any mutation drops the sidecars — a later cold build re-packs from
    // the (changed) data rather than serving a stale snapshot
    assert(graft.operators.PackedKnn.slabsExist(spark, s"$root/warm/index_packed"))
    re2.add(Seq(("warm9", "a brand new row after the snapshot", "tech", 2026))
      .toDF("id", "document", "category", "year"))
    assert(!graft.operators.PackedKnn.slabsExist(spark, s"$root/warm/index_packed"))
    assert(!graft.operators.PackedKnn.ivfSlabsExist(spark, s"$root/warm/index_packed_ivf"))
    val cold = client.getCollection("warm")
    cold.buildPackedIndex()
    val after = cold.packedQuery(
        Seq((1L, "a brand new row after the snapshot")).toDF("query_id", "query_text"), 1)
      .collect().map(_.getAs[String]("id"))
    assert(after.toSeq === Seq("warm9"), "cold rebuild must see the mutation")
  }

  test("staleness guard: mutation through another handle fails loud; flag rebuilds") {
    val c = client.getOrCreateCollection("stale")
    c.add(docs)
    c.buildPackedIndex()
    val q = Seq((1L, "spark processes big data")).toDF("query_id", "query_text")
    assert(c.packedQuery(q, 1).collect().head.getAs[String]("id") === "doc3")

    // mutate through a DIFFERENT handle of the same collection: handle
    // c's resident index still holds the pre-mutation matrix, and the
    // reference's RLock answer (vectordb.py:245) does not exist across
    // processes — the packed query must fail loud, not serve stale rows
    val other = client.getCollection("stale")
    other.add(Seq(("stale9", "spark processes big data exactly", "tech", 2026))
      .toDF("id", "document", "category", "year"))
    val e = intercept[IllegalStateException] { c.packedQuery(q, 1) }
    assert(e.getMessage.contains("STALE") &&
      e.getMessage.contains("buildPackedIndex"), e.getMessage)
    // a stale handle must not poison the sidecar either
    val e2 = intercept[IllegalStateException] { c.saveResidentIndex() }
    assert(e2.getMessage.contains("STALE"))

    // opt-in transparent rebuild serves the post-mutation corpus
    c.autoRebuildStalePacked = true
    val ids = c.packedQuery(q, 2).orderBy("rank").collect()
      .map(_.getAs[String]("id")).toSet
    assert(ids.contains("stale9"), s"rebuilt index must see the mutation: $ids")
    c.autoRebuildStalePacked = false

    // the ANN layout is guarded by its own stamp
    c.buildVectorIndex(numCells = 2)
    c.buildPackedAnnIndex()
    assert(c.packedAnnQuery(q, 1, nProbe = 2).count() === 1)
    other.delete(ids = Seq("stale9"))
    val e3 = intercept[IllegalStateException] { c.packedAnnQuery(q, 1, nProbe = 2) }
    assert(e3.getMessage.contains("ANN") &&
      e3.getMessage.contains("buildPackedAnnIndex"), e3.getMessage)
    // rebuilt-by-hand handle queries clean again
    c.buildPackedAnnIndex()
    assert(c.packedAnnQuery(q, 1, nProbe = 2).count() === 1)

    // an IVF model RETRAIN through another handle changes ANN routing
    // without touching the data dir — it must read as a mutation too,
    // or this handle's RESIDENT cell layout serves the old centroids
    // (checked while the IVF index is resident: buildPackedIndex below
    // would release it and a cold rebuild is trivially fresh)
    val other2 = client.getCollection("stale")
    other2.buildVectorIndex(numCells = 4)
    val e5 = intercept[IllegalStateException] { c.packedAnnQuery(q, 1, nProbe = 2) }
    assert(e5.getMessage.contains("STALE"), e5.getMessage)
    c.buildPackedAnnIndex()
    assert(c.packedAnnQuery(q, 1, nProbe = 2).count() === 1)

    c.buildPackedIndex()
    assert(c.packedQuery(q, 1).count() === 1)
  }

  test("packed query recovers when a warm-started slab partition is lost") {
    val c = client.getOrCreateCollection("slabloss")
    c.add(docs)
    c.buildPackedIndex()
    c.saveResidentIndex()
    val q = Seq((1L, "catalyst optimizes query plans")).toDF("query_id", "query_text")

    val re = client.getCollection("slabloss")
    re.buildPackedIndex() // warm start: lineage READS the slab files
    // simulate the unrecoverable-loss window: the resident blocks are
    // evicted (stand-in for a lost executor) while the slab files are
    // gone, so recompute-by-lineage hits a missing-slab read — the same
    // terminal state a same-handle mutation (which drops the sidecar but
    // keeps the warm base blocks in its delta chain) reaches on executor
    // loss. The query must cold-rebuild and answer, not die.
    re.residentPacked.get.blocks.unpersist(blocking = true)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/slabloss/index_packed"), true)
    val got = re.packedQuery(q, 1).collect()
    assert(got.length === 1 && got.head.getAs[String]("id") === "doc4")
    // recovered index is a healthy resident rebuild: querying again works
    assert(re.packedQuery(q, 2).count() === 2)
  }

  test("sidecar from a pre-stamp era (no _mutstamp) cold-packs instead of warm-starting") {
    val c = client.getOrCreateCollection("legacysidecar")
    c.add(docs)
    c.buildPackedIndex()
    c.saveResidentIndex()
    // strip the stamp, as a sidecar written before the stamp protocol
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/legacysidecar/index_packed/_mutstamp"), false)
    val re = client.getCollection("legacysidecar")
    re.buildPackedIndex()
    assert(lineageClasses(re.residentPacked.get.blocks).exists(_.contains("FileScan")) ||
      hasShuffle(re.residentPacked.get.blocks),
      "an unstamped sidecar must not warm-start (cold pack re-scans the corpus)")
    val q = Seq((1L, "the quick brown fox")).toDF("query_id", "query_text")
    assert(re.packedQuery(q, 1).collect().head.getAs[String]("id") === "doc1")
  }

  test("facade: profile, boilerplate strip, learned quality, hard negatives") {
    val c = client.getOrCreateCollection("facade7")
    c.add(Seq(
      ("f1", "education curriculum learning chapter\nSHARED FOOTER", "school", 1),
      ("f2", "casino jackpot bonus spins\nSHARED FOOTER", "spam", 2),
      ("f3", "education chapter about learning\nSHARED FOOTER", "school", 1),
      ("f4", "quarterly revenue report figures", "biz", 3))
      .toDF("id", "document", "category", "label"))
    // profile: long-format dashboard over the collection
    val prof = c.profile(langCol = "category")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prof("n_docs") === 4.0)
    assert(prof("n_langs") === 3.0)
    // boilerplate strip: the shared footer is removed, text order kept
    val stripped = c.stripBoilerplate(minDocs = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stripped("f1") === "education curriculum learning chapter")
    assert(stripped("f4") === "quarterly revenue report figures")
    // learned quality filter trained from seed splits of the collection
    val m = c.trainQualityClassifier(
      c.get(where = Some(Filter.Eq("category", "school"))),
      c.get(where = Some(Filter.Eq("category", "spam"))), buckets = 128)
    val scores = c.scoreQuality(m)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(scores("f1") > scores("f2"), s"$scores")
    // hard negatives: nearest docs with a DIFFERENT label per anchor
    val anchors = Seq(("a1", "education curriculum learning chapter", 1))
      .toDF("query_id", "query_text", "query_label")
    val negs = c.hardNegatives(anchors, k = 2)
      .collect().map(_.getAs[String]("id")).toSet
    assert(negs.subsetOf(Set("f2", "f4")), s"label-1 docs must be excluded: $negs")
    assert(negs.nonEmpty)
    // LM perplexity: fit on the school slice, score everything — the
    // in-distribution docs sit closer to the reference LM than spam
    val e0 = intercept[IllegalArgumentException] { c.perplexityScores() }
    assert(e0.getMessage.contains("trainLmModel"))
    c.trainLmModel(where = Some(Filter.Eq("category", "school")))
    assert(c.hasLmModel)
    val ppl = c.perplexityScores()
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ppl")).toMap
    assert(ppl("f1") < ppl("f2"), s"$ppl")
    assert(ppl("f3") < ppl("f2"), s"$ppl")
  }
  test("auto routing: size, k, filter selectivity and tier availability drive the route") {
    val c = client.getOrCreateCollection("auto_route")
    c.add((0 until 60).map(i =>
        (s"a$i", s"unique auto document number $i body",
          if (i % 3 == 0) "tri" else "rest"))
      .toDF("id", "document", "category"))
    val q = Seq((1L, "unique auto document number 7 body"))
      .toDF("query_id", "query_text")
    def routed(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq

    // tiny corpus under every threshold -> exact scan
    val exact = routed(c.query(q, k = 5))
    assert(routed(c.autoQuery(q, k = 5)) === exact)
    assert(c.lastAutoRoute === Some("exact"))

    // side columns pin the exact path regardless of size knobs
    c.autoRouteFlatRows = 1L
    c.autoQuery(q, k = 5, includeMetadata = true).collect()
    assert(c.lastAutoRoute === Some("exact"))

    // k within over-fetch of the whole corpus -> exact (20*4 >= 60)
    c.autoQuery(q, k = 20).collect()
    assert(c.lastAutoRoute === Some("exact"))

    // above the flat floor -> flat resident scan; rows equal the exact path
    assert(routed(c.autoQuery(q, k = 5)) === exact)
    assert(c.lastAutoRoute === Some("packed"))

    // the cell tier needs its floor AND a coarse model: without one the
    // router stays flat rather than training inside a query
    c.autoRouteIvfRows = 1L
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed"))
    c.buildVectorIndex(numCells = 2)
    assert(routed(c.autoQuery(q, k = 5)) ===
      routed(c.packedAnnQuery(q, k = 5, nProbe = c.autoRouteNProbe)))
    assert(c.lastAutoRoute === Some("packed_ivf"))

    // the code tier outranks it once a product quantizer is trained
    c.autoRoutePqRows = 1L
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed_ivf"))
    c.buildQuantModel(numSubspaces = 8, numCentroids = 16)
    assert(routed(c.autoQuery(q, k = 5)) ===
      routed(c.packedPqQuery(q, k = 5, nProbe = c.autoRouteNProbe)))
    assert(c.lastAutoRoute === Some("packed_pq"))

    // filters never ride approximate tiers: selective -> exact; permissive
    // -> the flat tier, whose filtered contract keeps exact membership
    val selective = Some(Filter.Eq("id", "a7")) // 1 of 60 rows
    val wantSel = routed(c.query(q, k = 1, where = selective))
    assert(routed(c.autoQuery(q, k = 1, where = selective)) === wantSel)
    assert(c.lastAutoRoute === Some("exact"))
    val permissive = Some(Filter.Ne("category", "tri")) // 2/3 of the corpus
    val wantPerm = routed(c.query(q, k = 5, where = permissive))
    assert(routed(c.autoQuery(q, k = 5, where = permissive)) === wantPerm)
    assert(c.lastAutoRoute === Some("packed"))
  }

  test("graph tier facade: exactness, auto route rank, mutation invalidation, warm start") {
    val c = client.getOrCreateCollection("graph_tier")
    c.add((0 until 48).map(i => (s"g$i", s"unique graph doc number $i body"))
      .toDF("id", "document"))
    val q = Seq((7L, "unique graph doc number 7 body")).toDF("query_id", "query_text")
    def routed(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq

    // cold build needs the coarse model
    val e0 = intercept[IllegalArgumentException] { c.packedGraphQuery(q, k = 3) }
    assert(e0.getMessage.contains("buildVectorIndex"))
    c.buildVectorIndex(numCells = 2)
    c.buildPackedGraphIndex(degree = 4, efConstruction = 16)

    // full probe + unbounded ef is EXACT (the protected-spanning-tree
    // contract riding into the facade)
    val exact = routed(c.query(q, k = 5))
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0)) === exact)

    // auto route: the graph tier outranks the flat cell scan once built
    c.autoRouteFlatRows = 1L
    c.autoRouteIvfRows = 1L
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed_graph"))

    // an ADD delta-maintains the graph (insertion is its native op) —
    // the resident handle survives the write and answers exactly over
    // the grown corpus, new row included
    c.add(Seq(("gx", "a brand new unique graph doc body")).toDF("id", "document"))
    assert(c.residentPackedGraph.isDefined, "add must maintain, not release")
    val exact2 = routed(c.query(q, k = 5))
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0)) === exact2)
    val qx = Seq((9L, "a brand new unique graph doc body")).toDF("query_id", "query_text")
    assert(routed(c.packedGraphQuery(qx, k = 1, nProbe = 2, ef = 0)).head._2 === "gx")

    // an UPSERT tombstones the old row and inserts the replacement —
    // the resident graph survives and stays exact (old g3 never emitted)
    c.upsert(Seq(("g3", "a completely rewritten unique doc body")).toDF("id", "document"))
    assert(c.residentPackedGraph.isDefined, "upsert must maintain the graph tier")
    val exact3 = routed(c.query(q, k = 5))
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0)) === exact3)

    // a DELETE tombstones in place: the dead row routes but never returns
    c.delete(ids = Seq("g7"))
    assert(c.residentPackedGraph.isDefined, "delete must maintain the graph tier")
    val exact4 = routed(c.query(q, k = 5))
    assert(!exact4.exists(_._2 == "g7"))
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0)) === exact4)

    // warm start: persist (tombstones ride the slabs), reopen through a
    // fresh handle, same answers as the fully-mutated state
    c.saveResidentIndex()
    val other = new GraftClient(spark, root, 16).getCollection("graph_tier")
    assert(routed(other.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0)) === exact4)

    // optimize() rebuilds the graph once tombstones pass the threshold:
    // the rebuilt tier carries NO dead rows and answers identically
    c.graphRebuildDeadFraction = 0.0001
    c.delete(ids = Seq("g11"))
    assert(graft.operators.PackedGraph.deadFraction(c.residentPackedGraph.get) > 0.0)
    c.optimize()
    assert(graft.operators.PackedGraph.deadFraction(c.residentPackedGraph.get) === 0.0)
    val exact5 = routed(c.query(q, k = 5))
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0)) === exact5)
  }

  test("auto routing: filter selectivity is ONE count job per (filter, stamp)") {
    val c = client.getOrCreateCollection("auto_selcache")
    c.add((0 until 40).map(i =>
        (s"s$i", s"selectivity cache doc $i", if (i < 2) "rare" else "common"))
      .toDF("id", "document", "category"))
    val q = Seq((1L, "selectivity cache doc 7")).toDF("query_id", "query_text")
    val fA = Some(Filter.Eq("category", "rare")) // 2/40 -> selective -> exact
    val fB = Some(Filter.Eq("id", "s7")) // 1/40 -> selective -> exact

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    }
    // listener events are async: wait for quiescence before reading
    def jobsDuring(f: => Unit): Int = {
      Thread.sleep(300)
      val before = jobCount.get
      f
      var last = -1
      val deadline = System.nanoTime() + 5_000_000_000L
      while (jobCount.get != last && System.nanoTime() < deadline) {
        last = jobCount.get; Thread.sleep(250)
      }
      jobCount.get - before
    }

    // warm: corpus count + the first selectivity count happen here
    c.autoQuery(q, k = 1, where = fA)
    assert(c.lastAutoRoute === Some("exact"))
    spark.sparkContext.addSparkListener(listener)
    try {
      // repeated identical filtered calls: ZERO jobs before routing (the
      // exact route is lazy, so any job here would be an uncached count)
      assert(jobsDuring { c.autoQuery(q, k = 1, where = fA) } === 0,
        "second identical filtered autoQuery must not re-count the corpus")
      assert(c.lastAutoRoute === Some("exact"))
      // a NEW filter fingerprint pays its one pushdown count (>= 1 job;
      // AQE may stage a count as several jobs) — then never again
      val freshFilterJobs = jobsDuring { c.autoQuery(q, k = 1, where = fB) }
      assert(freshFilterJobs >= 1, "a first-seen filter must run its count")
      assert(jobsDuring { c.autoQuery(q, k = 1, where = fB) } === 0)
      // a mutation bumps the stamp: corpus + filter re-count once, then
      // cached again for the new stamp
      c.add(Seq(("sx", "a fresh selectivity doc", "common"))
        .toDF("id", "document", "category"))
      assert(jobsDuring { c.autoQuery(q, k = 1, where = fA) } >= 1)
      assert(jobsDuring { c.autoQuery(q, k = 1, where = fA) } === 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("filtered graph-tier serving: exact membership at full probe, bounded fallback, auto route") {
    val c = client.getOrCreateCollection("graph_filtered")
    c.add((0 until 48).map(i =>
        (s"f$i", s"unique filtered graph doc number $i body",
          if (i % 3 == 0) "tri" else "rest"))
      .toDF("id", "document", "category"))
    val q = Seq((7L, "unique filtered graph doc number 7 body"))
      .toDF("query_id", "query_text")
    def routed(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "id").collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    c.buildVectorIndex(numCells = 2)
    c.buildPackedGraphIndex(degree = 4, efConstruction = 16)

    // permissive filter, full probe, unbounded ef: identical to the exact
    // filtered scan (the spanning-tree exactness contract rides the
    // filtered path too)
    val permissive = Some(Filter.Ne("category", "tri"))
    val wantPerm = routed(c.query(q, k = 5, where = permissive))
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0,
      where = permissive)) === wantPerm)

    // selective filter: the over-fetch page underfills (< k survivors of
    // 48-row full page) and the bounded exact fallback fills in — exact
    // membership per query, never silently short
    val selective = Some(Filter.In("id", Seq("f1", "f2")))
    val wantSel = routed(c.query(q, k = 5, where = selective))
    assert(wantSel.length === 2)
    assert(routed(c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0,
      where = selective)) === wantSel)

    // auto route: permissive filtered traffic rides the graph tier once
    // one is built (the reference's filtered-HNSW pattern)
    c.autoRouteFlatRows = 1L
    c.autoRouteIvfRows = 1L
    assert(routed(c.autoQuery(q, k = 5, where = permissive)) === wantPerm)
    assert(c.lastAutoRoute === Some("packed_graph"))
    // selective filters still route exact
    c.autoQuery(q, k = 1, where = selective).collect()
    assert(c.lastAutoRoute === Some("exact"))

    // the membership job PUSHES the page's candidate ids into the parquet
    // scan (the q148 get() shape) — the filtered page costs the row
    // groups holding those ids, never a corpus scan per query batch
    val memberPlan = c.filterMembershipPlan(Seq("f1", "f2"), permissive.get)
      .queryExecution.executedPlan.toString
    assert(memberPlan.contains("PushedFilters"), memberPlan)
    assert(memberPlan.contains("In(id"), memberPlan)
  }

  test("adaptive filtered over-fetch: mid-selectivity filters stop falling back, results identical") {
    val c = client.getOrCreateCollection("adaptive_page")
    c.add((0 until 256).map(i =>
        (f"a$i%03d", s"unique adaptive page doc number $i body",
          if (i % 16 == 0) "rare" else "common"))
      .toDF("id", "document", "category"))
    val q = (0 until 3).map(i =>
        (i.toLong, s"unique adaptive page doc number ${i * 7} body"))
      .toDF("query_id", "query_text")
    val f = Some(Filter.Eq("category", "rare"))
    def routed(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val exact = routed(c.query(q, k = 5, where = f))
    assert(exact.length === 15)
    // selectivity-sized page (~2k/sel = 160 of 256 rows): the page holds
    // k survivors for every query — zero exact-scan fallbacks
    assert(routed(c.packedQuery(q, k = 5, where = f)) === exact)
    assert(c.lastFilteredFallbacks === 0,
      "adaptive page must not underfill at 1/16 selectivity")
    // clamp the cap back down to the fixed k*4 page: every query
    // underfills and the bounded exact fallback fills in — results
    // identical either way (the fallback IS the exact scan)
    c.filterOverFetchMaxPage = 1
    assert(routed(c.packedQuery(q, k = 5, where = f)) === exact)
    assert(c.lastFilteredFallbacks > 0,
      "the fixed k*4 page at 1/16 selectivity must fall back")
    c.filterOverFetchMaxPage = 4096
  }

  test("foreign compaction: a second handle's cached relation survives optimize()'s data-dir swap") {
    val c = client.getOrCreateCollection("foreign_compact")
    c.add((0 until 32).map(i => (s"fc$i", s"unique foreign compact doc $i"))
      .toDF("id", "document"))
    val other = new GraftClient(spark, root, 16).getCollection("foreign_compact")
    assert(other.count() === 32) // warm other's stamp-keyed relation cache
    // optimize() swap-rewrites the data dir WITHOUT bumping the mutation
    // stamp (contents identical) — the layout stamp is what tells the
    // foreign handle its cached file listing is gone
    c.optimize(maxFilesPerBucket = 0)
    assert(other.count() === 32,
      "foreign handle must re-list after a compaction swap, not FileNotFound")
    assert(other.query(Seq((1L, "unique foreign compact doc 7"))
      .toDF("query_id", "query_text"), k = 1).count() === 1)
  }

  test("mutation storm: optimize() folds every resident tier back to one generation") {
    val c = client.getOrCreateCollection("storm")
    c.add((0 until 64).map(i => (s"m$i", s"unique storm doc number $i body"))
      .toDF("id", "document"))
    c.buildVectorIndex(numCells = 2)
    c.buildQuantModel(numSubspaces = 8, numCentroids = 16)
    c.buildScalarQuantModel()
    val q = Seq((1L, "unique storm doc number 9 body")).toDF("query_id", "query_text")
    def allTiers() = Seq(
      c.packedQuery(q, k = 5),
      c.packedAnnQuery(q, k = 5, nProbe = 2),
      c.packedPqQuery(q, k = 5, nProbe = 2),
      c.packedSqQuery(q, k = 5, nProbe = 2),
      c.packedGraphQuery(q, k = 5, nProbe = 2, ef = 0))
      .map(_.select("rank", "id").collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq)
    allTiers() // pack all five resident tiers

    // the storm: appends, upserts, deletes — every op chains a generation
    (0 until 3).foreach { g =>
      c.add(Seq((s"n$g", s"a new storm doc gen $g")).toDF("id", "document"))
      c.upsert(Seq((s"m${10 + g}", s"rewritten storm doc $g")).toDF("id", "document"))
      c.delete(ids = Seq(s"m${20 + g}"))
    }
    def gens() = Seq(
      c.residentPacked.get.generations,
      c.residentPackedIvf.get.generations,
      c.residentPackedPq.get.generations,
      c.residentPackedSq.get.generations,
      c.residentPackedGraph.get.generations)
    assert(gens().forall(_ > 1), s"storm must chain generations: ${gens()}")
    val before = allTiers()

    // optimize() compacts: one generation everywhere, one slab per
    // partition on the block tiers (task/sgemm-call count bound), no
    // graph tombstones once past the rebuild threshold
    c.graphRebuildDeadFraction = 0.0001
    c.optimize()
    assert(gens() === Seq(1, 1, 1, 1, 1))
    def maxBlocksPerPartition[T](rdd: org.apache.spark.rdd.RDD[T]): Int =
      rdd.mapPartitions(it => Iterator.single(it.size)).collect().max
    assert(maxBlocksPerPartition(c.residentPacked.get.blocks) === 1)
    assert(maxBlocksPerPartition(c.residentPackedIvf.get.blocks) === 1)
    assert(maxBlocksPerPartition(c.residentPackedPq.get.blocks) === 1)
    // SQ slabs are cell-tagged; the default layout is one partition per
    // cell (grouped layouts via the explicit numParts knob may hold
    // several cells per partition) — compaction folds generations to ONE
    // slab per (partition, cell)
    assert(c.residentPackedSq.get.blocks.mapPartitions { it =>
      val cells = it.map(_.cell).toSeq
      Iterator.single(cells.distinct.size == cells.size)
    }.collect().forall(identity),
      "a compacted SQ partition must hold at most one slab per cell")
    assert(graft.operators.PackedGraph.deadFraction(c.residentPackedGraph.get) === 0.0)
    // results identical before and after — compaction is layout-only
    assert(allTiers() === before)
    // a second optimize() on the quiet collection is gauge-skipped: the
    // SAME corpus handles survive (no re-persist churn)
    val handles = (c.residentPacked.get, c.residentPackedIvf.get,
      c.residentPackedPq.get, c.residentPackedSq.get, c.residentPackedGraph.get)
    c.optimize()
    assert((c.residentPacked.get, c.residentPackedIvf.get,
      c.residentPackedPq.get, c.residentPackedSq.get,
      c.residentPackedGraph.get) === handles,
      "optimize() on a compacted collection must not rebuild any tier")
  }

  test("auto routing: SQ8 is a footprint route — only under a memory budget") {
    val c = client.getOrCreateCollection("auto_sq_budget")
    c.add((0 until 64).map(i => (s"b$i", s"unique byte budget doc $i body"))
      .toDF("id", "document"))
    val q = Seq((1L, "unique byte budget doc 9 body")).toDF("query_id", "query_text")
    c.buildVectorIndex(numCells = 2)
    c.buildScalarQuantModel()
    c.autoRouteFlatRows = 1L
    c.autoRouteIvfRows = 1L
    c.autoRoutePqRows = 1L
    // unbounded budget (default): the float tiers outrank the byte tier
    // even though SQ8 is available — latency-wise it loses at every shape
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed_ivf"))
    // a binding budget flips the route: footprint now justifies the codes
    c.autoRouteMemoryBudgetBytes = 1L
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed_sq"))
  }

  test("auto routing: the int-domain byte kernel earns a latency route below the cell tiers") {
    val c = client.getOrCreateCollection("auto_sq_int")
    c.add((0 until 64).map(i => (s"bi$i", s"unique int kernel doc $i body"))
      .toDF("id", "document"))
    val q = Seq((1L, "unique int kernel doc 9 body")).toDF("query_id", "query_text")
    c.buildVectorIndex(numCells = 2)
    c.buildScalarQuantModel()
    c.autoRouteFlatRows = 1L
    c.autoRoutePqRows = 1L
    // autoRouteIvfRows stays high: neither graph nor cell tier routes, so
    // the contest is byte tier vs flat scan
    c.autoRouteIvfRows = Long.MaxValue
    // exact kernel, no budget: the flat scan wins (the sweep's verdict)
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed"))
    // int kernel: the byte tier beats the flat scan outright (1.92 vs
    // 2.47 ms/q at 1M), so it routes without a memory budget
    c.sqKernelDomain = "int"
    val got = c.autoQuery(q, k = 5).select("rank", "id").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(c.lastAutoRoute === Some("packed_sq"))
    // ...and the faster graph/cell tiers still outrank it when routable
    c.autoRouteIvfRows = 1L
    c.autoQuery(q, k = 5).collect()
    assert(c.lastAutoRoute === Some("packed_ivf"))
    // int-kernel results: same top-k membership as the exact scan on
    // this fixture (quantization flips only exact near-ties)
    val want = c.query(q, k = 5).select("rank", "id").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got.map(_._2).toSet === want.map(_._2).toSet)
    c.sqKernelDomain = "exact"
  }

}
