package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ChunkSchema.{ChunkMetadata, ChunkRow}
import graft.core.GraftSession
import graft.embed.HashedEmbedder
import graft.ingest.Ingest
import graft.search.{Bm25, HybridSearch, VectorSearch}
import graft.store.ChunkStore

class StoreSearchSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val embedder = new HashedEmbedder(64)

  private def mkChunk(file: String, idx: Int, text: String): ChunkRow =
    ChunkRow(s"$file-$idx", file, idx, text, embedder.embed(text),
      ChunkMetadata(file.split('/').last, text.length.toLong, "md"),
      Some("t"), Some("h"), "2026-01-01T00:00:00Z")

  private def tmpStore(): ChunkStore =
    new ChunkStore(spark, Files.createTempDirectory("chunks").toString + "/table")

  // ---- ChunkStore ----

  test("insert + read round trip with fixed schema") {
    val st = tmpStore()
    st.insert(Seq(mkChunk("/a/x.md", 0, "first chunk text"),
      mkChunk("/a/x.md", 1, "second chunk text")).toDF())
    assert(st.read().count() === 2)
    // parquet read-back reports all fields nullable — compare names + types
    assert(st.read().schema.fieldNames.toSeq ===
      graft.core.ChunkSchema.schema.fieldNames.toSeq)
    assert(st.read().schema.map(_.dataType.simpleString) ===
      graft.core.ChunkSchema.schema.map(_.dataType.simpleString))
  }

  test("upsert replaces only the target file; delete removes it") {
    val st = tmpStore()
    st.insert(Seq(mkChunk("/a/x.md", 0, "old x"), mkChunk("/a/y.md", 0, "y text")).toDF())
    st.upsertFile("/a/x.md", Seq(mkChunk("/a/x.md", 0, "new x"), mkChunk("/a/x.md", 1, "new x2")).toDF())
    val rows = st.read().filter($"filePath" === "/a/x.md").select("text").as[String].collect().sorted
    assert(rows === Array("new x", "new x2"))
    assert(st.read().filter($"filePath" === "/a/y.md").count() === 1)
    st.deleteFile("/a/x.md")
    assert(st.read().select("filePath").distinct().as[String].collect() === Array("/a/y.md"))
  }

  test("zero-chunk upsert fails BEFORE any destructive step") {
    val st = tmpStore()
    st.insert(Seq(mkChunk("/a/x.md", 0, "keep me")).toDF())
    intercept[Ingest.NoChunksError] {
      st.upsertFile("/a/x.md", st.read().filter(lit(false)))
    }
    assert(st.read().count() === 1) // existing rows preserved
  }

  test("neighbors: clamp at 0, contract sort, isTarget, out-of-range empty") {
    val st = tmpStore()
    st.insert((0 to 9).map(i => mkChunk("/a/x.md", i, s"chunk $i")).toDF())
    val n = st.neighbors("/a/x.md", target = 1, before = 5, after = 2)
      .select("chunkIndex", "isTarget").as[(Int, Boolean)].collect()
    assert(n.map(_._1).toSeq === Seq(0, 1, 2, 3)) // clamped to >= 0
    assert(n.filter(_._2).map(_._1).toSeq === Seq(1))
    assert(st.neighbors("/a/x.md", target = 99).count() === 0)
    intercept[IllegalArgumentException] { st.neighbors("/a/x.md", 1, before = 51) }
  }

  test("listFiles + status aggregates") {
    val st = tmpStore()
    st.insert((0 to 2).map(i => mkChunk("/a/x.md", i, s"c$i")).toDF())
    st.insert(Seq(mkChunk("/a/y.md", 0, "y")).toDF())
    val lf = st.listFiles().as[(String, Long, String)].collect()
    assert(lf.map(_._1).toSeq === Seq("/a/x.md", "/a/y.md"))
    assert(lf.find(_._1 == "/a/x.md").get._2 === 3L)
    assert(st.status() === (4L, 2L))
  }

  test("additive schema migration: old tables read with null new columns") {
    // write a pre-migration table (no fileTitle / contentHash)
    val dir = Files.createTempDirectory("old-schema").toString + "/table"
    Seq(mkChunk("/a/x.md", 0, "legacy row")).toDF()
      .drop("fileTitle", "contentHash")
      .write.parquet(dir)
    val st = new ChunkStore(spark, dir)
    val row = st.read().collect().head
    assert(row.getAs[String]("text") === "legacy row")
    assert(row.getAs[String]("fileTitle") === null)
    assert(row.getAs[String]("contentHash") === null)
  }

  test("schema migration round trip: mutating an old table migrates it in place") {
    // upsert into a pre-migration table: legacy rows survive with null new
    // columns, the new file's rows carry them, and the REWRITTEN table is
    // current-schema parquet (the additive migration happens on first write,
    // reference ensureSchemaVersion, vectordb/index.ts:289-307)
    val dir = Files.createTempDirectory("old-schema-rt").toString + "/table"
    Seq(mkChunk("/a/x.md", 0, "legacy row"), mkChunk("/a/y.md", 0, "other legacy")).toDF()
      .drop("fileTitle", "contentHash")
      .write.parquet(dir)
    val st = new ChunkStore(spark, dir)
    st.upsertFile("/a/x.md", Seq(mkChunk("/a/x.md", 0, "migrated row")).toDF())
    // physical schema of the rewritten table now includes the new columns
    assert(spark.read.parquet(dir).columns.contains("contentHash"))
    val rows = st.read().collect().map(r => r.getAs[String]("filePath") -> r).toMap
    assert(rows("/a/x.md").getAs[String]("text") === "migrated row")
    assert(rows("/a/x.md").getAs[String]("contentHash") === "h")
    assert(rows("/a/y.md").getAs[String]("contentHash") === null) // untouched legacy
    // hashless rows are never "converged": the manifest exposes the null
    // for sync to classify as dirty (SyncPlannerSpec pins the classification)
    val manifest = st.manifest().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(manifest("/a/y.md") === null)
  }

  test("bucketed layout: per-file upsert rewrites only the file's partition") {
    val base = Files.createTempDirectory("bucketed").toString + "/table"
    val st = new ChunkStore(spark, base, numBuckets = 8)
    val files = (0 until 12).map(i => s"/corpus/doc$i.md")
    st.insert(files.flatMap(f => Seq(mkChunk(f, 0, s"text of $f"))).toDF())
    assert(st.read().count() === 12)

    val target = files.head
    val targetBucket = st.bucketOf(target)
    // snapshot modification times of all OTHER partitions
    def partFiles(): Map[String, Long] = {
      val d = new java.io.File(base)
      d.listFiles().filter(_.getName.startsWith("pbucket="))
        .flatMap(p => p.listFiles().map(f => f.getPath -> f.lastModified()))
        .toMap
    }
    val before = partFiles().filter(!_._1.contains(s"pbucket=$targetBucket"))
    st.upsertFile(target, Seq(mkChunk(target, 0, "updated"), mkChunk(target, 1, "second")).toDF())
    val after = partFiles().filter(!_._1.contains(s"pbucket=$targetBucket"))
    assert(after === before) // untouched partitions bit-identical
    assert(st.read().filter($"filePath" === target).count() === 2)
    assert(st.read().count() === 13)

    st.deleteFile(target)
    assert(st.read().filter($"filePath" === target).count() === 0)
    assert(st.read().count() === 11)
    // neighbors + listing still work through the bucketed layout
    assert(st.listFiles().count() === 11)
  }

  test("optimize compacts fragmented partitions and sweeps stale swap debris") {
    val root = Files.createTempDirectory("compact")
    val base = root.toString + "/table"
    val st = new ChunkStore(spark, base, numBuckets = 2)
    // 6 separate inserts of the same file set → every bucket accumulates
    // one parquet fragment per insert
    val files = (0 until 4).map(i => s"/corpus/doc$i.md")
    (0 until 6).foreach { gen =>
      st.insert(files.map(f => mkChunk(f, gen, s"gen $gen of $f")).toDF())
    }
    def fragments(): Int = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("pbucket="))
      .map(_.listFiles().count(f => f.getName.endsWith(".parquet"))).sum
    assert(fragments() >= 12, "inserts should fragment the partitions")
    val beforeRows = st.read().orderBy("filePath", "chunkIndex").collect()

    // plant stale + fresh swap debris next to the table
    val stale = new java.io.File(root.toString + "/table.old-123")
    stale.mkdirs()
    stale.setLastModified(System.currentTimeMillis() - 3600 * 1000L)
    val fresh = new java.io.File(root.toString + "/table.swap-456")
    fresh.mkdirs()

    st.optimize(maxFragments = 2, cleanupOlderThanMs = 60000L)
    assert(fragments() === 2, "one file per bucket after compaction")
    assert(st.read().orderBy("filePath", "chunkIndex").collect() === beforeRows)
    assert(!stale.exists, "stale debris swept")
    assert(fresh.exists, "fresh debris (possible in-flight swap) kept")
  }

  // ---- search semantics (reference vectordb.test.ts behavioral contracts) ----

  private def scoreLadder(scores: Seq[Double]): org.apache.spark.sql.DataFrame =
    scores.zipWithIndex.map { case (s, i) => (s"/f$i.md", i, s) }
      .toDF("filePath", "chunkIndex", "score")

  test("grouping: one clear gap — similar cuts at boundary, related keeps all") {
    val ladder = scoreLadder(Seq(0.10, 0.11, 0.12, 0.50, 0.52))
    val similar = HybridSearch.applyGrouping(ladder, "similar", tiebreak = Seq("filePath"))
      .select("score").as[Double].collect().sorted
    assert(similar === Array(0.10, 0.11, 0.12))
    val related = HybridSearch.applyGrouping(ladder, "related", tiebreak = Seq("filePath"))
    assert(related.count() === 5)
  }

  test("grouping: two gaps — related cuts at second boundary; similar subset of related") {
    // enough small gaps that mean + 1.5·sd stays below the two jumps
    val groupA = (0 until 10).map(i => 0.10 + i * 0.002)
    val groupB = (0 until 3).map(i => 0.42 + i * 0.002)
    val groupC = (0 until 2).map(i => 0.72 + i * 0.002)
    val ladder = scoreLadder(groupA ++ groupB ++ groupC)
    val similar = HybridSearch.applyGrouping(ladder, "similar", tiebreak = Seq("filePath"))
      .select("score").as[Double].collect().toSet
    val related = HybridSearch.applyGrouping(ladder, "related", tiebreak = Seq("filePath"))
      .select("score").as[Double].collect().toSet
    assert(similar === groupA.toSet)
    assert(related === (groupA ++ groupB).toSet)
    assert(similar.subsetOf(related))
  }

  test("grouping: no significant gap keeps everything") {
    // alternating 0.025/0.015 gaps: sd stays small but threshold > max gap
    val ladder = scoreLadder(Seq(0.10, 0.125, 0.14, 0.165, 0.18))
    assert(HybridSearch.applyGrouping(ladder, "similar", tiebreak = Seq("filePath")).count() === 5)
  }

  test("keyword boost: monotone (boosted <= score), no-match unchanged") {
    val vec = scoreLadder(Seq(0.2, 0.3, 0.4))
    val fts = Seq(("/f0.md", 0, 2.0), ("/f1.md", 1, 1.0))
      .toDF("filePath", "chunkIndex", "bm25")
    val out = HybridSearch.applyKeywordBoost(vec, fts, Seq("filePath", "chunkIndex"), 0.6)
      .select("filePath", "score", "boosted").as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("/f0.md")._2 < out("/f0.md")._1) // matched => boosted (smaller)
    assert(out("/f2.md")._2 === out("/f2.md")._1) // no match => unchanged
    assert(out.values.forall { case (s, b) => b <= s })
    // weight 0 => pure vector order preserved
    val w0 = HybridSearch.applyKeywordBoost(vec, fts, Seq("filePath", "chunkIndex"), 0.0)
      .select("score", "boosted").as[(Double, Double)].collect()
    assert(w0.forall { case (s, b) => b === s })
  }

  test("file filter: keeps all chunks of top-N files by best score") {
    val rows = Seq(
      ("/a.md", 0, 0.1), ("/a.md", 1, 0.9),
      ("/b.md", 0, 0.2), ("/c.md", 0, 0.3)).toDF("filePath", "chunkIndex", "boosted")
    val kept = HybridSearch.applyFileFilter(rows, "filePath", maxFiles = 2)
      .select("filePath").as[String].collect().toSet
    assert(kept === Set("/a.md", "/b.md")) // a best=0.1, b=0.2; c dropped
    // maxFiles >= distinct files is a no-op
    assert(HybridSearch.applyFileFilter(rows, "filePath", 5).count() === 4)
  }

  test("vector top-k: self-match scores ~0 and ranks first") {
    val texts = Seq("spark join table", "stream window agg", "pasta tomato basil")
    val chunks = texts.zipWithIndex.map { case (t, i) => mkChunk(s"/d$i.md", 0, t) }.toDF()
    val qv = typedLit(embedder.embed("spark join table").toSeq)
    val top = VectorSearch.topK(chunks, qv, 3, tiebreak = Seq("filePath"))
      .select("filePath", "score").as[(String, Double)].collect()
    assert(top.head._1 === "/d0.md")
    assert(math.abs(top.head._2) < 1e-6)
    assert(top.map(_._2).toSeq === top.map(_._2).toSeq.sorted)
  }

  test("bm25: more occurrences of a rarer term ranks higher; absent term scores nothing") {
    val docs = Seq(
      (0, "spark spark spark common common"),
      (1, "spark common common common common"),
      (2, "common common common common common")).toDF("doc_id", "text")
    val scores = Bm25.score(docs, Seq("doc_id"), Bm25.wordTokens($"text"), Seq("spark"))
      .as[(Int, Double)].collect().toMap
    assert(scores(0) > scores(1))
    assert(!scores.contains(2))
  }

  test("hybrid search end-to-end obeys limit bounds") {
    val chunks = (0 until 30).map(i => mkChunk(s"/f$i.md", 0, s"text number $i spark data"))
      .toDF()
    val qv = typedLit(embedder.embed("spark data").toSeq)
    intercept[IllegalArgumentException] {
      HybridSearch.search(chunks, qv, HybridSearch.Params(limit = 21))
    }
    val res = HybridSearch.search(chunks, qv,
      HybridSearch.Params(limit = 5, queryTokens = Seq("spark")))
    assert(res.count() <= 5)
  }

  // ---- AnnIndexStore (persisted IVF behind the engine read path) ----

  test("persisted IVF index: probe prunes to nProbe list partitions; recall gated on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("ann-idx").toString + "/ann"
    val st = new graft.store.AnnIndexStore(spark, dir, 0, Seq("vec_id"), "embedding")
    assert(!st.exists && st.rowCount() === 0L)
    st.rebuild(e, nLists = 16)
    assert(st.exists)
    assert(st.rowCount() === e.count())

    // partition pruning: the probe scan carries PartitionFilters on list_id
    // (the 100 TB claim — nProbe/nLists of the corpus read, never all of it)
    val qv0 = e.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val probePlan = st.probe(qv0, nProbe = 8, k = 10)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters: [") && probePlan.contains("list_id"),
      probePlan.take(1500))

    // recall@10 vs the brute-force oracle over several queries (uniform
    // random embeddings — IVF's adversarial case; nProbe=8/16 measures 0.83)
    val recalls = Seq(0L, 7L, 42L).map { q =>
      val qv = e.filter($"vec_id" === q).select("embedding").head().getSeq[Float](0).toArray
      val brute = e
        .withColumn("score", VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
        .orderBy("score", "vec_id").limit(10).select("vec_id").as[Long].collect().toSet
      val ann = st.probe(qv, nProbe = 8, k = 10)
        .select("vec_id").as[Long].collect().toSet
      ann.intersect(brute).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.8, s"persisted-probe recall@10 $recall < 0.8 at nProbe=8/16")

    // probing ALL lists is exact: identical to brute force, scores included
    val bruteAll = e
      .withColumn("score", VectorSearch.dotDistance($"embedding", typedLit(qv0.toSeq)))
      .orderBy("score", "vec_id").limit(10)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    val annAll = st.probe(qv0, nProbe = 16, k = 10)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    assert(annAll === bruteAll)
  }

  test("centroid stamp: repeat loadCentroids runs ZERO Spark jobs; rebuild invalidates; cache is mutation-proof") {
    // r14 VERDICT ask #3 extended: the centroid table is a pure function
    // of the centroids dir, so after one read the staleness story is the
    // filesystem signature — every probe used to pay a read+sort+collect
    // job for the same k×dim rows
    graft.core.SourceStamp.clear()
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("ann-stamp").toString + "/ann"
    val st = new graft.store.AnnIndexStore(spark, dir, 0, Seq("vec_id"), "embedding")
    st.rebuild(e, nLists = 8)
    def countJobs[A](body: => A): (A, Int) = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val out = body
        val before = jobs.get()
        spark.sparkContext.parallelize(1 to 2, 1).count() // flush sentinel
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (jobs.get() <= before && System.nanoTime() < deadline) Thread.sleep(20)
        (out, jobs.get() - 1) // minus the sentinel
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val (c1, _) = countJobs(st.loadCentroids()) // first read warms the stamp
    val (c2, jobsHit) = countJobs(st.loadCentroids())
    assert(jobsHit === 0, s"stamped centroid read scheduled $jobsHit Spark jobs")
    assert(c2.map(_.toSeq).toSeq === c1.map(_.toSeq).toSeq)
    // defensive copy: a caller mutating its rows must not poison the cache
    c2(0)(0) = 12345f
    assert(st.loadCentroids()(0)(0) !== 12345f)
    // a rebuild rewrites the dir → the stamp misses and fresh rows return
    st.rebuild(e, nLists = 4)
    val (c3, jobsMiss) = countJobs(st.loadCentroids())
    assert(jobsMiss > 0, "rebuild must invalidate the centroid stamp")
    assert(c3.length <= 4 && c3.length < c1.length)
  }

  test("IVF appendBatch: appended vectors are probe-visible; drift counter forces retrain") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("ann-append").toString + "/ann"
    val st = new graft.store.AnnIndexStore(spark, dir, 0, Seq("vec_id"), "embedding")
    // build on the first 40% of vectors, stream the rest in as append
    // batches — the SRP store's freshness cadence, now on the IVF family
    // (appends will total 60% of the final index, past the 0.5 drift bar)
    val cut = (e.count() * 4 / 10)
    st.rebuild(e.filter($"vec_id" < cut), nLists = 16)
    val before = st.rowCount()
    assert(st.appendedSinceRebuild() === 0L)

    // a small batch appends WITHOUT retraining (below the drift threshold)
    val b1 = e.filter($"vec_id" >= cut && $"vec_id" < cut + 40)
    assert(st.appendBatch(b1, nLists = 16) === 40L)
    assert(st.rowCount() === before + 40L)
    assert(st.appendedSinceRebuild() === 40L) // counter advanced, no retrain
    // an appended vector is immediately probe-visible: probing with its own
    // embedding must return it at distance ~0 (self is always in the
    // nearest list — it defines it)
    val qv = e.filter($"vec_id" === cut).select("embedding").head().getSeq[Float](0).toArray
    val hit = st.probe(qv, nProbe = 4, k = 1).select("vec_id").as[Long].head()
    assert(hit === cut)

    // recall gate still holds on the mixed built+appended index
    val recalls = Seq(0L, 7L, cut + 11).map { q =>
      val v = e.filter($"vec_id" === q).select("embedding").head().getSeq[Float](0).toArray
      val indexed = e.filter($"vec_id" < cut + 40)
      val brute = indexed
        .withColumn("score", VectorSearch.dotDistance($"embedding", typedLit(v.toSeq)))
        .orderBy("score", "vec_id").limit(10).select("vec_id").as[Long].collect().toSet
      val ann = st.probe(v, nProbe = 8, k = 10).select("vec_id").as[Long].collect().toSet
      ann.intersect(brute).size / 10.0
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"post-append recall@10 ${recalls.sum / recalls.size} < 0.8")

    // a big batch trips the drift threshold (appended > 0.5 · total) →
    // the append finishes with a full retrain from the index's own
    // vectors: counter resets, every row survives, probes stay correct
    val b2 = e.filter($"vec_id" >= cut + 40)
    val n2 = st.appendBatch(b2, nLists = 16)
    assert(st.rowCount() === e.count())
    assert(n2 === e.count() - before - 40L)
    assert(st.appendedSinceRebuild() === 0L, "drift rebuild did not reset the counter")
    // retrained index probes the full corpus exactly at nProbe = all lists
    val qvAll = e.filter($"vec_id" === 3).select("embedding").head().getSeq[Float](0).toArray
    val bruteAll = e
      .withColumn("score", VectorSearch.dotDistance($"embedding", typedLit(qvAll.toSeq)))
      .orderBy("score", "vec_id").limit(10)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    assert(st.probe(qvAll, nProbe = 16, k = 10)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq === bruteAll)
  }

  test("persisted SRP index: probe equals the inline bucket scan; radius widens monotonically") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("srp-idx").toString + "/srp"
    val st = new graft.store.SrpIndexStore(spark, dir, dim = 64, planes = 8,
      0, Seq("vec_id"), "embedding")
    st.rebuild(e)
    assert(st.rowCount() === e.count())
    val qv = e.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)

    // persisted probe ≡ the inline srpBucket scan (same bucket, same scores)
    val inline = e
      .withColumn("bucket", graft.ops.Similarity.srpBucket("embedding", 64, 8))
      .filter($"bucket" === graft.ops.Similarity.srpBucketScala(qv, 64, 8))
      .withColumn("score", VectorSearch.dotDistance($"embedding", typedLit(qv)))
      .orderBy("score", "vec_id").limit(10)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    val persisted = st.probe(qv, k = 10)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    assert(persisted === inline)

    // Hamming radius only ADDS candidates (recall knob, same scan shape)
    val r0 = st.probe(qv, k = 500).select("vec_id").as[Long].collect().toSet
    val r1 = st.probe(qv, k = 500, hammingRadius = 1).select("vec_id").as[Long].collect().toSet
    val r2 = st.probe(qv, k = 500, hammingRadius = 2).select("vec_id").as[Long].collect().toSet
    assert(r0.subsetOf(r1) && r1.subsetOf(r2))
    assert(r1.size > r0.size) // neighbors actually contribute on real data
  }

  test("SRP appendBatch: appended vectors become probe-visible, index equals one-shot rebuild") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val batch1 = e.filter($"vec_id" < 400)
    val batch2 = e.filter($"vec_id" >= 400)
    val dir = Files.createTempDirectory("srp-append").toString + "/srp"
    val st = new graft.store.SrpIndexStore(spark, dir, dim = 64, planes = 8,
      0, Seq("vec_id"), "embedding")
    st.appendBatch(batch1) // bootstrap = rebuild
    assert(st.rowCount() === batch1.count())
    val n2 = st.appendBatch(batch2)
    assert(n2 === batch2.count())
    assert(st.rowCount() === e.count())
    // a probe with a BATCH-2 vector finds it: the appended partition serves
    val late = e.filter($"vec_id" === 450).select("embedding").head().getSeq[Float](0)
    val hits = st.probe(late, k = 5).select("vec_id").as[Long].collect().toSet
    assert(hits.contains(450L))
    // appended index ≡ one-shot rebuild over the same rows, probe for probe
    val dir2 = Files.createTempDirectory("srp-oneshot").toString + "/srp"
    val oneShot = new graft.store.SrpIndexStore(spark, dir2, dim = 64, planes = 8,
      0, Seq("vec_id"), "embedding")
    oneShot.rebuild(e)
    val qv = e.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    assert(st.probe(qv, k = 20).select("vec_id").as[Long].collect().toSeq ===
      oneShot.probe(qv, k = 20).select("vec_id").as[Long].collect().toSeq)
  }

  test("minhash index: delta candidates equal the full-run pairs touching the batch") {
    import graft.ops.Dedup
    val base = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge every single morning while the birds sing in the tall trees"
    // stored corpus: two near-dups (0, 1) and a distinct doc (2);
    // batch: a near-dup of 0/1 (10) and a fresh distinct doc (11)
    val stored = Seq(
      (0L, base), (1L, base + " with extra words"),
      (2L, "completely different content about spark catalyst optimizer rules " +
        "and whole stage code generation for columnar execution plans today")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base + " again and again"),
      (11L, "unrelated legal boilerplate paragraph concerning limitation of " +
        "liability and governing law in commercial software license agreements")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("mh-idx").toString + "/mh"
    val st = new graft.store.MinhashIndexStore(spark, dir,
      nHashes = 16, bands = 4, rowsPerBand = 4)
    st.rebuild(stored)
    assert(st.exists && st.rowCount() === 3)

    val delta = st.deltaCandidates(batch).as[(Long, Long)].collect().toSet
    // ground truth: band the UNION corpus, keep candidate pairs with a batch side
    val union = stored.union(batch)
      .withColumn("ws", Dedup.wordsArray("text"))
      .withColumn("shs", Dedup.wordShingles("ws", 5))
      .filter(size($"shs") > 0)
      .withColumn("hs", Dedup.shingleBaseHashes("shs"))
      .withColumn("sig", Dedup.minhashSignature("hs", 16))
    val fullPairs = Dedup.lshCandidatePairs(
        Dedup.lshBands(union, "doc_id", "sig", 4, 4), "doc_id")
      .as[(Long, Long)].collect().toSet
    val touchingBatch = fullPairs.filter(p => p._1 >= 10L || p._2 >= 10L)
    assert(delta === touchingBatch)
    assert(delta.contains((0L, 10L)) && delta.contains((1L, 10L)))
    assert(!delta.exists(p => p._1 == 11L || p._2 == 11L)) // distinct doc pairs with nothing
    st.drop()
    assert(!st.exists)
  }

  test("bucketed minhash index: single-bucket refresh tracks new text") {
    import graft.ops.Dedup
    val nb = 4
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = (0L until 12L).map(i => (i, s"doc $i " + base + s" tail $i"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("mh-idx-b").toString + "/mh"
    val st = new graft.store.MinhashIndexStore(spark, dir,
      nHashes = 16, bands = 4, rowsPerBand = 4, numBuckets = nb)
    st.rebuild(docs)
    val before = st.rowCount()

    // rewrite doc 0's bucket: doc 0 becomes an exact twin of doc 1
    val b0 = Dedup.hash60Scala("0") % nb
    val bucketDocs = docs.filter(
      pmod(Dedup.hash60($"doc_id".cast("string")), lit(nb.toLong)) === b0)
      .withColumn("text", when($"doc_id" === 0L,
        lit(s"doc 1 $base tail 1")).otherwise($"text"))
    st.refreshBucket(bucketDocs, b0)
    assert(st.rowCount() === before) // same docs, new signatures

    // a batch equal to doc 1's text must now find doc 0 as a candidate
    val probe = Seq((100L, s"doc 1 $base tail 1")).toDF("doc_id", "text")
    val cands = st.deltaCandidates(probe).as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 100L)) && cands.contains((1L, 100L)))
    st.drop()
  }

  test("bucketed ANN index: single-bucket refresh tracks a file's new vectors") {
    val chunks = (0 until 24).map(i => mkChunk(s"/corpus/doc$i.md", 0, s"document $i about topic ${i % 6}"))
    val dir = Files.createTempDirectory("ann-bucketed").toString + "/ann"
    val st = new graft.store.AnnIndexStore(spark, dir, numBuckets = 4)
    st.rebuild(chunks.toDF(), nLists = 4)
    val total = st.rowCount()
    assert(total === 24L)

    // replace one file's chunks (two rows now) and refresh ONLY its bucket
    val target = "/corpus/doc3.md"
    val bucket = math.floorMod(graft.ops.Dedup.hash60Scala(target), 4L)
    val bucketRows = chunks.filter(c =>
        math.floorMod(graft.ops.Dedup.hash60Scala(c.filePath), 4L) == bucket)
      .filterNot(_.filePath == target) ++
      Seq(mkChunk(target, 0, "fresh text about spark shuffles"),
          mkChunk(target, 1, "more fresh text about partitions"))
    st.refreshBucket(bucketRows.toDF(), bucket)
    assert(st.rowCount() === 25L) // 24 - 1 + 2

    // the refreshed vectors are probe-visible: query exactly the new text
    val qv = embedder.embed("fresh text about spark shuffles")
    val top = st.probe(qv, nProbe = 4, k = 1).collect().head
    assert(top.getAs[String]("filePath") === target)
    assert(top.getAs[Double]("score") < 1e-6) // self-match (float-sum rounding)

    // refresh a bucket to EMPTY (its last file deleted): stats drop, the
    // probe still works over the remaining buckets
    val emptied = chunks.take(0).toDF()
    st.refreshBucket(emptied, bucket)
    assert(st.rowCount() === 25L - bucketRows.size)
    val survivors = st.probe(qv, nProbe = 4, k = 50).collect()
    assert(survivors.nonEmpty)
    assert(survivors.forall(r =>
      math.floorMod(graft.ops.Dedup.hash60Scala(r.getAs[String]("filePath")), 4L) != bucket))
  }

  test("sketch store: incremental appends equal the one-shot sketches") {
    import org.apache.spark.sql.functions._
    import graft.ops.Sketches
    import spark.implicits._
    val dir = Files.createTempDirectory("sketches").toString + "/store"
    val store = new graft.store.SketchStore(spark, dir, b = 6, depth = 4, width = 64)
    assert(!store.exists)
    val all = (0 until 600).map(i => (i.toLong, s"tok${i % 91} body ${i % 140}"))
      .toDF("doc_id", "text")
    // three mutation batches merged incrementally
    for (k <- 0 until 3)
      store.appendBatch(all.filter($"doc_id" % 3 === k))
    assert(store.exists)
    val st = store.stats().head()
    assert(st.getLong(0) === 3L && st.getLong(1) === 600L)
    // HLL: stored registers == one-shot corpus sketch → identical estimate
    val oneShot = Sketches.hllEstimate(
      Sketches.hllRegisters(all, col("text"), 6), 6).head()
    val stored = store.distinctEstimate().head()
    assert(stored.getDouble(2) === oneShot.getDouble(2))
    assert(stored.getString(3) === oneShot.getString(3))
    // CMS: point estimates over the merged grid == one-shot grid lookups
    val words = all.select(explode(graft.ops.Dedup.wordsArray("text")).as("w"))
    val items = words.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
    val inc = store.frequencyEstimates(items, "w")
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("cms_est")).toMap
    val one = Sketches.cmsLookup(
        Sketches.cmsSketch(words, col("w"), 4, 64), items, "w", 4, 64)
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("cms_est")).toMap
    assert(inc === one)
    // estimates stay one-sided after merging
    store.frequencyEstimates(items, "w").collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
    }

    // legacy-layout migration: a store written by the pre-state/ layout
    // (hll/, cms/, stats/ directly under the root) must not read as empty
    // — simulate one by moving state/* up a level, then reopen
    val legacyDir = Files.createTempDirectory("sketches-legacy").toString + "/store"
    val lp = java.nio.file.Paths.get(legacyDir)
    java.nio.file.Files.createDirectories(lp)
    for (sub <- Seq("hll", "cms", "stats"))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$dir/state/$sub"), lp.resolve(sub))
    val reopened = new graft.store.SketchStore(spark, legacyDir,
      b = 6, depth = 4, width = 64)
    assert(reopened.exists) // triggers the migration
    assert(!java.nio.file.Files.exists(lp.resolve("hll"))) // legacy removed
    val mst = reopened.stats().head()
    assert(mst.getLong(0) === 3L && mst.getLong(1) === 600L)
    assert(reopened.distinctEstimate().head().getDouble(2)
      === oneShot.getDouble(2))
    // and the migrated store keeps accepting batches
    reopened.appendBatch(all.limit(10))
    assert(reopened.stats().head().getLong(0) === 4L)
  }
}
