package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // near-dup of 1
    (3L, "completely different content about database engines and query planners"),
    (4L, "The  quick brown fox jumps over the lazy dog near the river bank today"), // exact mod spacing/case
    (5L, "another unrelated string with its own vocabulary entirely")).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val groups = Dedup.exact(docs, "doc_id", "text", minSize = 2).collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("n_dups") === 2)
    assert(groups.head.getAs[Long]("keeper_id") === 1L)
  }

  test("canonicalizeUrl collapses scheme/www/fragment/tracking/slash variants") {
    val urls = Seq(
      "HTTPS://WWW.Example.com/A/B/",
      "http://example.com/a/b",
      "https://example.com/a/b#frag",
      "http://www.example.com/a/b?utm_source=x&utm_medium=y",
      "example.com/a/b/index.html",
      // and ones that must NOT collapse:
      "https://example.com/a/b?page=2",
      "https://other.com/a/b").toDF("url")
    val canon = urls.select(Dedup.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(canon.take(5).toSet === Set("example.com/a/b"))
    assert(canon(5) === "example.com/a/b?page=2")
    assert(canon(6) === "other.com/a/b")
  }

  test("dedupByUrl keeps the longest variant, ties by smallest id") {
    val rows = Seq(
      (1L, "short", "https://www.site.com/p/1"),
      (2L, "much longer capture of page one", "http://site.com/p/1/"),
      (3L, "much longer capture of page one", "http://site.com/p/1#x"), // tie with 2 -> 2 wins
      (4L, "only capture of page two", "https://site.com/p/2")
    ).toDF("doc_id", "text", "url")
    val got = Dedup.dedupByUrl(rows, "url", "doc_id", "text")
      .select("doc_id", "canonical_url", "n_variants").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (2L, "site.com/p/1", 3L),
      (4L, "site.com/p/2", 1L)))
  }

  test("minhash LSH finds the planted near-duplicate pair") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)) || pairs.contains((2L, 4L))) // 4 ~ 1
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash signature kernel matches the md5-per-token fold (oracle parity)") {
    // independent JVM re-derivation of the whole signature: md5-32 per
    // token, the mod-P rolling combine per window, then the permutation
    // minima — exactly what the q28/q29 DuckDB oracles inline in BIGINT
    // arithmetic
    def md5h32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val hs = (0 to 1).map { i =>
      toks.slice(i, i + 3).foldLeft(0L)((a, t) =>
        Math.floorMod(a * Dedup.MinhashTokenA + md5h32(t), Dedup.MinhashP))
    }
    val expected = (0 until 32).map { p =>
      hs.map(h => (Dedup.minhashA(p) * h + Dedup.minhashB(p)) % Dedup.MinhashP).min
    }
    val got = Dedup.minhashSignatures(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getSeq[Long](1)
    assert(got === expected)
    // windowless and null-text docs take the all-P sentinel
    val sent = Dedup.minhashSignatures(
        Seq((1L, "just two"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(_.getSeq[Long](1)).toSeq
    assert(sent.forall(_.forall(_ == Dedup.MinhashP)))
  }

  test("minhash semi-filter: broadcast in the common regime, skipped when candidates exceed the bound — identical pairs") {
    // common regime: candidate docs are a minority -> the verification
    // semi-filter rides an explicit broadcast() hint (which FORCES a
    // BroadcastHashJoin LeftSemi — no AQE dependence, no exchange)
    val viaBroadcast = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(Dedup.lastSemiFilterRegime === Some("broadcast"),
      "sweep-like dup rates must take the broadcast regime")
    // degenerate regime (all-dup corpus): the filter is SKIPPED, never
    // degraded to a doc-keyed exchange of the full shingle relation —
    // and the answer is byte-identical
    val viaSkip = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5,
        maxSemiFilterDocs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(Dedup.lastSemiFilterRegime === Some("skipped"))
    assert(viaSkip === viaBroadcast,
      "both semi-filter regimes must emit identical verified pairs")
    assert(viaBroadcast.nonEmpty)
  }

  test("ngram jaccard is the exact superset of LSH results") {
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(exact.contains((1L, 2L)))
  }

  test("duplicateClusters merges transitive chains into one component") {
    // chain 1-2-3-4 (no direct 1~4 pair), separate pair 7-9, singleton-free
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("duplicateClusters converges on a long path in O(log n) rounds") {
    // a 1000-node path is the worst case for min-label propagation
    // (O(diameter) = ~1000 rounds); large-star/small-star contracts it in
    // O(log n) — assert the iteration counter, not just the labels
    val n = 1000L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    assert(got.values.forall(_ === 0L))
    assert(rounds <= 12, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("dropDuplicatesByCluster keeps one survivor per class plus all unclustered docs") {
    val corpus = Seq((1L, "x"), (2L, "x"), (3L, "x"), (7L, "y"), (9L, "y"), (50L, "z"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.dropDuplicatesByCluster(corpus, clusters, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 7L, 50L))
  }

  test("survivorByScore keeps the highest-scoring member, min-id on ties") {
    val corpus = Seq((1L, "x", 10L), (2L, "x", 30L), (3L, "x", 30L),
        (7L, "y", 5L), (9L, "y", 4L), (50L, "z", 1L))
      .toDF("doc_id", "text", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.survivorByScore(corpus, clusters, "doc_id", "score")
      .collect().map(_.getLong(0)).toSet
    // cluster 1: 2 and 3 tie at 30 -> lower id 2; cluster 7: 7 (5 > 4);
    // 50 is unclustered and always survives
    assert(kept === Set(2L, 7L, 50L))
  }

  test("prefix-filtered jaccard join is identical to the plain exact join") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val plain = pairs(Dedup.ngramJaccard(docs, "doc_id", "text", threshold = t))
      val pref = pairs(Dedup.ngramJaccardPrefix(docs, "doc_id", "text", threshold = t))
      assert(pref === plain, s"threshold $t")
    }
    // and on a real corpus slice with planted near-dups
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = real.unionByName(real.where(col("doc_id") < 10)
      .select((col("doc_id") + 50000).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 30, 10))").as("text")))
    val plainR = pairs(Dedup.ngramJaccard(planted, "doc_id", "text", threshold = 0.5))
    val prefR = pairs(Dedup.ngramJaccardPrefix(planted, "doc_id", "text", threshold = 0.5))
    assert(prefR === plainR)
    assert(plainR.nonEmpty)
  }

  test("decontaminate flags train docs overlapping the eval set, cross-corpus only") {
    val train = docs
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river"), // ~ 1/2/4
      (101L, "held out benchmark prompt with no training overlap at all")
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(train, evalSet, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.nonEmpty)
    assert(hits.forall { case (_, e) => e >= 100L }) // pairs are cross-corpus
    assert(hits.exists { case (t, e) => t == 2L && e == 100L })
    assert(!hits.exists { case (t, _) => t == 3L || t == 5L })
    // eval doc with no counterpart stays clean
    assert(!hits.exists { case (_, e) => e == 101L })
  }

  test("dedupAgainstCorpus keeps exactly the batch docs with no corpus near-dup") {
    val corpus = docs
    val batch = Seq(
      (200L, "the quick brown fox jumps over the lazy dog near the river"), // near-dup of corpus
      (201L, "held out fresh snapshot document with wholly novel content"),
      (202L, "another genuinely new page from the incremental crawl run")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(201L, 202L))
    // threshold 1.0+epsilon-like strictness: nothing is an exact copy, all survive
    val keptAll = Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text", threshold = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(keptAll === Set(200L, 201L, 202L))
  }

  test("LSH decontamination is a subset of exact and catches high-overlap pairs") {
    val train = docs
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "held out benchmark prompt with no training overlap at all")
    ).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = pairs(Dedup.decontaminate(train, evalSet, "doc_id", "text", threshold = 0.5))
    val lsh = pairs(Dedup.decontaminateLsh(train, evalSet, "doc_id", "text", threshold = 0.5))
    assert(lsh.keySet.subsetOf(exact.keySet))
    // verified jaccards agree exactly where both found the pair
    lsh.foreach { case (k, j) => assert(j === exact(k)) }
    // the standard banding curve makes >= 0.8-jaccard misses vanishingly
    // rare; on this fixed corpus the outcome is deterministic
    val high = exact.filter(_._2 >= 0.8).keySet
    assert(high.subsetOf(lsh.keySet))
  }

  test("simhash: identical docs share the sketch, near-dups are close") {
    val sk = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) === sk(4L)) // same tokens after normalization
    val hamNear = java.lang.Long.bitCount(sk(1L) ^ sk(2L))
    val hamFar = java.lang.Long.bitCount(sk(1L) ^ sk(3L))
    assert(hamNear < hamFar)
    val pairs = Dedup.simhashPairs(
        Dedup.simhash(docs, "doc_id", "text"), "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  // --------------------------------------------------- hot-bucket guard

  /** 10_000 byte-identical copies (one LSH band bucket of 10k rows in
    * EVERY band) + 3 distinct docs that form their own small buckets. */
  private lazy val megaCluster = {
    val copies = (1L to 10000L).map(i =>
      (i, "the exact same boilerplate footer text repeated across the whole crawl"))
    val rest = Seq(
      (20001L, "completely different content about database engines and query planners"),
      (20002L, "completely different content about database engines and query planner"),
      (20003L, "another unrelated string with its own vocabulary entirely"))
    (copies ++ rest).toDF("doc_id", "text")
  }

  test("hot-bucket guard: fail mode aborts loud on a planted 10k-copy mega-cluster") {
    val e = intercept[IllegalStateException] {
      Dedup.minhashLsh(megaCluster, "doc_id", "text", threshold = 0.5,
        hotBucketMode = "fail").collect()
    }
    assert(e.getMessage.contains("maxBucket=8192"))
    assert(e.getMessage.contains("size=10000"))
    assert(e.getMessage.contains("hotBucketMode"))
  }

  test("star mode (the default) bounds the mega-cluster to linear candidates, keeps one component") {
    val pairs = Dedup.minhashLsh(megaCluster, "doc_id", "text",
      threshold = 0.5) // hotBucketMode = "star" is the default
    val rows = pairs.collect()
    // linear, not quadratic: 9999 hub edges from the mega-bucket plus the
    // one small-bucket near-dup pair — nowhere near the 5*10^7 all-pairs
    assert(rows.length < 10100, s"expected ~10k star edges, got ${rows.length}")
    val hubEdges = rows.filter(r => r.getLong(0) == 1L)
    assert(hubEdges.length === 9999) // hub = min doc id of the bucket
    assert(hubEdges.forall(_.getDouble(2) === 1.0)) // exact verify still ran
    assert(rows.map(r => (r.getLong(0), r.getLong(1)))
      .contains((20001L, 20002L))) // cold buckets keep all-pairs semantics
    // connectivity-preserving: the whole mega-cluster is ONE component
    val comps = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((2L to 10000L).forall(i => comps(i) === comps(1L)))
  }

  test("star-mode degradation is surfaced in data: hotBucketStats counts buckets and rows") {
    Dedup.resetHotBucketStats()
    // a clean pass (no bucket over the cap) records nothing
    Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).collect()
    assert(Dedup.hotBucketStats.isEmpty)
    // the planted mega-cluster degrades: exact extent lands in the
    // registry (one 10k bucket per colliding band), not just a WARN line
    Dedup.minhashLsh(megaCluster, "doc_id", "text", threshold = 0.5).collect()
    val st = Dedup.hotBucketStats("minhashLsh")
    assert(st.buckets >= 1, s"expected linearized buckets, got $st")
    assert(st.rows >= 10000L, s"expected >= 10k degraded rows, got $st")
    // a second degraded run ACCUMULATES (per-run extent = bracket with reset)
    Dedup.minhashLsh(megaCluster, "doc_id", "text", threshold = 0.5).collect()
    val st2 = Dedup.hotBucketStats("minhashLsh")
    assert(st2.buckets === 2 * st.buckets && st2.rows === 2 * st.rows)
    Dedup.resetHotBucketStats()
    assert(Dedup.hotBucketStats.isEmpty)
  }

  test("withHotBucketScope isolates concurrent runs' degradation counters") {
    Dedup.resetHotBucketStats()
    // two interleaved runs on separate threads: one drives the planted
    // mega-cluster (degrades), one a clean corpus (must see ZERO even
    // while the neighbor is degrading in the same JVM)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirty = Future(Dedup.withHotBucketScope {
      Dedup.minhashLsh(megaCluster, "doc_id", "text", threshold = 0.5).collect()
    })
    val clean = Future(Dedup.withHotBucketScope {
      Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).collect()
    })
    val (_, dirtyStats) = Await.result(dirty, 5.minutes)
    val (_, cleanStats) = Await.result(clean, 5.minutes)
    assert(cleanStats.isEmpty,
      s"clean run cross-attributed a neighbor's degradation: $cleanStats")
    val st = dirtyStats("minhashLsh")
    assert(st.buckets >= 1 && st.rows >= 10000L, s"degradation lost: $st")
    // the global registry still accumulated BOTH runs (cumulative audit)
    assert(Dedup.hotBucketStats("minhashLsh") === st)
    Dedup.resetHotBucketStats()
  }

  test("star mode output is a connectivity-equal subset of the unbounded join") {
    val full = Dedup.minhashLsh(docs, "doc_id", "text",
        threshold = 0.5, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = Dedup.minhashLsh(docs, "doc_id", "text",
        threshold = 0.5, maxBucket = 2, hotBucketMode = "star")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star.subsetOf(full))
    // the (1,2,4) near-dup cluster stays one component even though the
    // tiny cap forced its buckets through the star path
    assert(star.contains((1L, 2L)) || star.contains((1L, 4L)))
  }

  test("simhashPairs hot-bucket guard: fail lists the bucket, star is linear") {
    val sketches = spark.range(1, 101)
      .select(col("id").as("doc_id"), lit(0x123456789ABL).as("simhash"))
    val e = intercept[IllegalStateException] {
      Dedup.simhashPairs(sketches, "doc_id", maxHamming = 8, maxBucket = 10,
        hotBucketMode = "fail").collect()
    }
    assert(e.getMessage.contains("simhashPairs") && e.getMessage.contains("size=100"))
    val star = Dedup.simhashPairs(sketches, "doc_id", maxHamming = 8,
        maxBucket = 10, hotBucketMode = "star")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star === (2L to 100L).map(i => (1L, i)).toSet)
  }

  test("banded simhashPairs is identical to the all-pairs scan") {
    val sketches = Dedup.simhash(docs, "doc_id", "text")
    for (h <- Seq(2, 8, 20)) {
      val banded = Dedup.simhashPairs(sketches, "doc_id", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val exact = Dedup.simhashPairsExact(sketches, "doc_id", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded === exact, s"maxHamming=$h")
    }
  }

  test("IVF-blocked embedding near-dup is identical to all-pairs (incl. zero vector)") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(120)
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    val zero = Seq((999999L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val embs = base.union(zero)
    for (t <- Seq(0.2, 0.4, 0.8)) {
      // sampled training must not change the output (blocking is lossless
      // for any centroids)
      val blocked = Dedup.embeddingNearDupBlocked(embs, "vec_id", "embedding",
          threshold = t, numCells = 8, trainFraction = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = Dedup.embeddingNearDup(embs, "vec_id", "embedding", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(blocked === exact, s"threshold=$t")
    }
    // a pre-fit model (fit-once/dedup-many) is equally lossless — even
    // one trained on a DIFFERENT subset of the corpus
    val m = Dedup.trainNearDupModel(embs.where(col("vec_id") < 60),
      "vec_id", "embedding", numCells = 8)
    val viaModel = Dedup.embeddingNearDupBlocked(embs, "vec_id", "embedding",
        threshold = 0.4, model = Some(m))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact04 = Dedup.embeddingNearDup(embs, "vec_id", "embedding", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaModel === exact04)
  }

  test("embedding near-dup finds self-similar vectors only above threshold") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    val pairs = Dedup.embeddingNearDup(embs, "vec_id", "embedding", threshold = 0.99)
    // random unit-ish vectors: no two distinct vectors at cos >= 0.99
    assert(pairs.count() === 0)
    val some = Dedup.embeddingNearDup(embs, "vec_id", "embedding", threshold = -1.0)
    assert(some.count() === 100L * 99 / 2) // every pair passes at -1
  }

  test("persisted dedup index: round-trip equals in-memory LSH, append maintains") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val batch = corpus.where($"doc_id" < 15)
      .select(($"doc_id" + 100000).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 15, 10))").as("text"))
      .unionByName(Seq((200001L, "zzz fresh unique alpha zzz fresh unique beta"),
        (200002L, "yyy other unique gamma yyy other unique delta"))
        .toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupix").toString
    Dedup.saveDedupIndex(corpus, "doc_id", "text", dir)
    assert(Dedup.dedupIndexExists(dir))
    val st = Dedup.readDedupStats(dir)
    assert(st.numHashes === 32 && st.bands === 8 && st.nDocs === corpus.count())

    val survivors = Dedup.dedupAgainstIndex(batch, "doc_id", "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same semantics as the in-memory banded path: candidates from band
    // collisions, exact-verified at threshold
    val dupIds = Dedup.decontaminateLsh(corpus, batch, "doc_id", "text")
      .select($"eval_id").collect().map(_.getLong(0)).toSet
    val expected = batch.collect().map(_.getLong(0)).toSet -- dupIds
    assert(survivors === expected)
    assert(survivors.contains(200001L) && survivors.contains(200002L))
    assert((survivors -- Set(200001L, 200002L)).size < 15) // near-copies drop

    // bands land in bucket-partitioned directories (pruned reads at probe)
    val bandDirs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("_bb=")).map(_.getName)
    assert(bandDirs.nonEmpty && bandDirs.length <= st.bandBuckets)

    // append the fresh survivors, then a near-copy of one must be caught
    Dedup.appendDedupIndex(dir,
      Seq((200001L, "zzz fresh unique alpha zzz fresh unique beta"))
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(Dedup.readDedupStats(dir).nDocs === st.nDocs + 1)
    val recheck = Dedup.dedupAgainstIndex(
      Seq((300001L, "zzz fresh unique alpha zzz fresh unique beta extra"),
        (300002L, "totally unrelated words qqq www eee rrr ttt yyy uuu iii"))
        .toDF("doc_id", "text"),
      "doc_id", "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(recheck === Set(300002L))
  }

  test("compactDedupIndex shrinks hot buckets without changing probe results") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Dedup.saveDedupIndex(corpus, "doc_id", "text", dir)
    // five 64-doc appends: every bucket accumulates small files per batch
    (0 until 5).foreach { b =>
      Dedup.appendDedupIndex(dir,
        (0 until 64).map(i => (400000L + b * 64 + i,
          s"unique append doc batch $b item $i words w$b$i x$b$i y$b$i z$b$i"))
          .toDF("doc_id", "text"), "doc_id", "text")
    }
    def maxFiles(sub: String): Int = {
      val buckets = new java.io.File(s"$dir/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.contains("="))
      buckets.map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    }
    assert(maxFiles("shingles") > 3) // appends piled files into doc buckets
    val probe = Seq(
      (500001L, "unique append doc batch 2 item 7 words w27 x27 y27 z27"),
      (500002L, "completely different material aaa bbb ccc ddd eee fff"))
      .toDF("doc_id", "text")
    val before = Dedup.dedupAgainstIndex(probe, "doc_id", "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val rewritten = Dedup.compactDedupIndex(spark, dir, maxFilesPerBucket = 3)
    assert(rewritten > 0)
    assert(maxFiles("shingles") <= 3 && maxFiles("bands") <= 3)
    // idempotent: a second pass finds nothing over threshold
    assert(Dedup.compactDedupIndex(spark, dir, maxFilesPerBucket = 3) === 0)

    val after = Dedup.dedupAgainstIndex(probe, "doc_id", "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after === before)
    assert(!after.contains(500001L) && after.contains(500002L))
    assert(Dedup.readDedupStats(dir).nDocs === 520L)
  }

  test("dupNgramFraction: closed-form shares, within-doc repeats don't count") {
    import spark.implicits._
    // bigrams: d1 {a b, b c}, d2 {b c, c d}, d3 {x y} — only "b c" is
    // cross-doc; d4 repeats its own bigram (distinct-level: no dup)
    val docs = Seq(
      (1L, "a b c"), (2L, "b c d"), (3L, "x y"),
      (4L, "p q p q")).toDF("doc_id", "text")
    val got = Dedup.dupNgramFraction(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((1L, 0L, 0.0)))
    // d4: distinct bigrams {p q, q p} — repeated internally, dup'd nowhere
    assert(got(4L) === ((2L, 0L, 0.0)))
  }

  test("dupNgramSpans merges overlapping/adjacent spans, ignores within-doc repeats") {
    import spark.implicits._
    // docs 1+2 share tokens 1..6 ("a b c d e f": 3-gram starts 1..4 merge
    // into ONE span) and tokens 9..11 ("x y z": a second span, separated by
    // unique filler). doc 3 repeats "r s t" twice WITHIN itself only.
    val docs = Seq(
      (1L, "a b c d e f u1 u2 x y z"),
      (2L, "a b c d e f v1 v2 x y z"),
      (3L, "r s t w1 w2 r s t")).toDF("doc_id", "text")
    val out = Dedup.dupNgramSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // within-doc-only duplication must not flag doc 3
    assert(!out.contains(3L))
    // docs 1 and 2: two maximal spans (1..6 and 9..11), 9 dup tokens of 11
    assert(out(1L) === ((2L, 9L, 11L)))
    assert(out(2L) === ((2L, 9L, 11L)))
    // adjacency merge: "p q r s t u" vs "p q r" + "s t u" in another doc —
    // starts 1 and 4 with n=3 touch (ends 3, starts 4) and merge
    val adj = Seq(
      (10L, "p q r s t u"),
      (11L, "p q r zz1 zz2 zz3"),
      (12L, "s t u zz4 zz5 zz6")).toDF("doc_id", "text")
    val spans = Dedup.dupNgramSpans(adj, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spans(10L) === 1L) // one merged span covering 1..6
  }

  test("dupNgramSpans plan: no count-distinct Expand, no redundant distinct exchange") {
    import spark.implicits._
    // deterministic plan-shape proof of the r13 slimming (wall-clock at
    // the 1M sweep rung is window-dominated on this box; shuffle structure
    // is not): the >= 2-distinct-docs test is min!=max (a plain
    // map-side-combinable aggregate — countDistinct would plan an Expand
    // doubling the first shuffle), and the dupKeys join output carries no
    // distinct (one n-gram per (doc, start) x unique keys = no fan-out).
    val docs = (0 until 50).map(i =>
      (i.toLong, s"w${i % 7} common a b c d w${i % 5} tail$i")).toDF("doc_id", "text")
    val plan = Dedup.dupNgramSpans(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan
    def countNodes(p: org.apache.spark.sql.execution.SparkPlan,
                   pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int =
      p.collectWithSubqueries { case n if pred(n) => 1 }.sum
    assert(countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.ExpandExec]) === 0,
      "count-distinct Expand crept back into the spans plan")
    val exchanges = countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    // two n-gram passes: dup-key agg (1) + join both sides (2) + doc
    // window (1) + islands agg rides the window partitioning + final doc
    // agg partials (1) = 5; a regression re-adding distinct or Expand
    // pushes this up
    assert(exchanges <= 5, s"spans plan grew to $exchanges exchanges")
  }

  test("compactBuckets recovers a crashed swap before compacting") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a bucket dir with several small files (separate appends)
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"row $i")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(s"$root/b=0")
    }
    // simulate the crash window: bucket renamed aside, tmp never moved in
    assert(fs.rename(new Path(s"$root/b=0"), new Path(s"$root/.compact_b=0.old")))
    fs.mkdirs(new Path(s"$root/.compact_b=1.tmp"))
    // a parquet read now silently sees NOTHING (dot-dirs are skipped)
    assert(!fs.exists(new Path(s"$root/b=0")))
    // the next pass self-heals: bucket restored, tmp leftover removed
    graft.sources.Collections.compactBuckets(spark, root, maxFilesPerBucket = 10)
    assert(fs.exists(new Path(s"$root/b=0")), "crashed bucket must be restored")
    assert(!fs.exists(new Path(s"$root/.compact_b=0.old")))
    assert(!fs.exists(new Path(s"$root/.compact_b=1.tmp")))
    val rows = spark.read.parquet(root).select("k").collect().map(_.getLong(0)).toSet
    assert(rows === Set(0L, 1L, 2L, 3L))
    // stale .old NEXT TO a live bucket (crash after the second rename) is
    // cleaned, and the live bucket still compacts when over the limit
    fs.mkdirs(new Path(s"$root/.compact_b=0.old"))
    assert(graft.sources.Collections.compactBuckets(spark, root, maxFilesPerBucket = 2) === 1)
    assert(!fs.exists(new Path(s"$root/.compact_b=0.old")))
    val after = spark.read.parquet(root).select("k").collect().map(_.getLong(0)).toSet
    assert(after === Set(0L, 1L, 2L, 3L))
  }

  test("stripBoilerplate removes corpus-wide lines, keeps order, blanks, empties") {
    val docs = Seq(
      (1L, "unique alpha\nSHARED FOOTER\n\nunique beta"),
      (2L, "SHARED FOOTER\nunique gamma"),
      (3L, "  SHARED FOOTER  \nunique delta"),   // trimmed form matches
      (4L, "SHARED FOOTER"),                      // all-boilerplate doc
      (5L, "untouched document"))
      .toDF("doc_id", "text")
    val got = Dedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "unique alpha\n\nunique beta") // blank line preserved
    assert(got(2L) === "unique gamma")
    assert(got(3L) === "unique delta")
    assert(got(4L) === "")                       // emptied, not dropped
    assert(got(5L) === "untouched document")
    // below the threshold (footer is in 4 docs) nothing is touched
    val loose = Dedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(2L) === "SHARED FOOTER\nunique gamma")
  }

  test("dedupAgainstIndex: default strict mode checks a batch's own standing ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-strict").toString
    Dedup.saveDedupIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"),
      "doc_id", "text", dir)
    // batch re-delivers id 1 alongside a NEW near-dup (id 2) of 1's text
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely fresh unrelated document with novel words"))
      .toDF("doc_id", "text")
    // replay-safe opt-in (EventStream.commitIngestBatch only): id 1's
    // standing signatures are skipped, so both 1 and 2 are admitted
    val relaxed = Dedup.dedupAgainstIndex(batch, "doc_id", "text", dir,
        excludeBatchIds = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(relaxed === Set(1L, 2L, 3L))
    // DEFAULT (strict): every standing signature is checked, only the
    // literal same-id pair is excluded — the NEW near-dup (id 2) drops
    // against id 1's standing signatures; the re-delivered id itself
    // passes in both modes (exact-key re-delivery is upstream's job)
    val strict = Dedup.dedupAgainstIndex(batch, "doc_id", "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict === Set(1L, 3L),
      "default mode must drop the near-dup of a re-delivered id's standing doc")
  }
}
