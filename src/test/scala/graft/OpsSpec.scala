package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("text analysis: langid, quality bounds, fingerprint normalization") {
    val rows = Seq(
      (0L, "the cat and the dog is on the mat to play"),
      (1L, "der hund und die katze ist im haus und der garten"),
      (2L, "这是一段中文文本用来测试语言识别"),
      (3L, "le chat et la souris est dans le jardin")).toDF("doc_id", "text")
    val out = rows.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) === "en"); assert(out(1L) === "de")
    assert(out(2L) === "zh"); assert(out(3L) === "fr")

    val q = rows.select(TextAnalysis.qualityScore($"text").as("q")).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))

    val fp = Seq(Tuple1("A  Text\nHere"), Tuple1("a text here")).toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[String].collect()
    assert(fp(0) === fp(1)) // case + whitespace normalized away
  }

  test("positional shingle hashes agree with the distinct-set helper") {
    // wordShingleHashesAt(i) must be the hash of the gram at position i
    // under the SAME mix as wordShingleHashes — span dedup keys its gram
    // exchanges on the positional form while the coverage/minhash family
    // uses the distinct form; drift between them would silently diverge
    // the two families' notion of "same gram". Pins: (a) distinct-set
    // equality on random word arrays, (b) positional count/window
    // identity, (c) equal grams at different positions hash equal.
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val k = 3
    val both = docs.withColumn("ws", Dedup.wordsArray("text"))
      .select($"doc_id", $"ws",
        Dedup.wordShingleHashesAt("ws", k).as("at"),
        Dedup.wordShingleHashes("ws", k).as("dist"))
      .as[(Long, Seq[String], Seq[Long], Seq[Long])].collect()
    for ((_, ws, at, dist) <- both) {
      assert(at.size === (if (ws.size < k) 0 else ws.size - k + 1))
      assert(at.toSet === dist.toSet)
      // repeated grams (same k words) hash identically position-to-position
      if (ws.size >= k)
        ws.sliding(k).toSeq.zip(at).groupBy(_._1).values.foreach { occ =>
          assert(occ.map(_._2).distinct.size === 1, "equal grams must hash equal")
        }
    }
  }

  test("spanDedup cuts exactly the k-gram-covered spans and reassembles the rest") {
    // k=3; "a b c" occurs in docs 0 and 1 → doc 0 covers positions 0-2
    // (start 0), doc 1 covers 2-4 (start 2); doc 2 shares no 3-gram and
    // survives whole; doc 3 is shorter than k (no grams, all kept); doc 4
    // is entirely one repeated gram window of doc 0's tail → fully cut
    val rows = Seq(
      (0L, "a b c d e"),
      (1L, "x y a b c"),
      (2L, "p q r s"),
      (3L, "u v"),
      (4L, "c d e")).toDF("doc_id", "text")
    val (out, release) = Dedup.spanDedupReleasable(rows, "doc_id", "text", 3)
    val got = out.orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    release()
    val want = Seq(
      (0L, 5L, 0L, 5L, ""),          // starts 0 ("a b c") and 2 ("c d e") cover 0-4
      (1L, 5L, 2L, 3L, "x y"),
      (2L, 4L, 4L, 0L, "p q r s"),
      (3L, 2L, 2L, 0L, "u v"),
      (4L, 3L, 0L, 3L, ""))
    assert(got === want)

    // coverage-split route (r15 VERDICT #3, knob-gated): 3 of 5 docs are
    // covered (0.6 ≤ 0.9), so clean docs 2 and 3 take the broadcast anti
    // pass-through and covered docs ride the join — results byte-identical
    // to the pinned single-join route, and both caches released
    val floor = spark.sparkContext.parallelize(Seq(0), 1).id
    val (outS, releaseS) = Dedup.spanDedupReleasable(rows, "doc_id", "text", 3,
      splitMaxCoveredFraction = 0.9)
    val gotS = outS.orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    releaseS()
    assert(gotS === want, "split route must match the single-join route")
    val leftS = spark.sparkContext.getPersistentRDDs.keys.filter(_ >= floor)
    assert(leftS.isEmpty, s"split route leaked persisted blocks: ${leftS.mkString(",")}")
    // a fraction knob below the corpus's covered fraction falls back to
    // the single join (and still releases the measurement persist)
    val (outF, releaseF) = Dedup.spanDedupReleasable(rows, "doc_id", "text", 3,
      splitMaxCoveredFraction = 0.1)
    assert(outF.orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect() === want)
    releaseF()
  }

  test("url canonicalization: ports, params, tracking, fragments, slashes") {
    import graft.ops.TextAnalysis.canonicalUrl
    assert(canonicalUrl("HTTP://WWW.Ex.COM:80/a/b?utm_source=x&b=2&a=1#f") ===
      "http://www.ex.com/a/b?a=1&b=2")
    assert(canonicalUrl("HTTPS://Ex.COM:443/a/") === "https://ex.com/a")
    assert(canonicalUrl("https://ex.com:8443/a") === "https://ex.com:8443/a")
    assert(canonicalUrl("http://ex.com/") === "http://ex.com/") // root kept
    assert(canonicalUrl("http://ex.com?gclid=1&fbclid=2") === "http://ex.com")
    assert(canonicalUrl("ex.com/x?z=1&y=2") === "http://ex.com/x?y=2&z=1")
    assert(canonicalUrl(null) === null)
  }

  test("exact dedup groups duplicates under one canonical id") {
    val rows = Seq((1L, "same text"), (2L, "same  TEXT"), (3L, "different")).toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(rows, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(groups(1L) === 2L) // 1 and 2 normalize to the same fingerprint
    assert(groups(3L) === 1L)
  }

  test("minhash: identical shingle sets share every band; disjoint sets none") {
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
      .withColumn("ws", Dedup.wordsArray("text"))
      .withColumn("shs", Dedup.wordShingles("ws", 5))
      .filter(size($"shs") > 0)
      .withColumn("hs", Dedup.shingleBaseHashes("shs"))
      .withColumn("sig", Dedup.minhashSignature("hs", 16))
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(rows, "doc_id", "sig", 4, 4), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("hot-bucket cap drops pathological LSH buckets, keeps healthy ones") {
    // a degenerate band hash shared by 50 docs (boilerplate) would emit
    // 50*49/2 pairs from one bucket; the cap drops the bucket while the
    // healthy 2-doc bucket still pairs. Recall impact: only pairs whose
    // SOLE agreeing band is the hot one are lost — here docs 100/101 also
    // agree on band 1, so they survive the cap.
    val hot = (0 until 50).map(i => (i.toLong, 0, "deadbeef"))
    val healthy = Seq((100L, 0, "cafe01"), (101L, 0, "cafe01"),
      (100L, 1, "beef02"), (101L, 1, "beef02"))
    val bands = (hot ++ healthy).toDF("doc_id", "band", "band_hash")

    val uncapped = Dedup.lshCandidatePairs(bands, "doc_id").collect()
    assert(uncapped.length === 50 * 49 / 2 + 1)

    val capped = Dedup.lshCandidatePairs(bands, "doc_id", maxBucketSize = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped === Set((100L, 101L)))

    val dropped = Dedup.oversizedBuckets(bands, "doc_id", maxBucketSize = 10)
      .as[(Int, String, Long)].collect().toSeq
    assert(dropped === Seq((0, "deadbeef", 50L)))

    // the audit accumulator counts what the cap dropped, single-pass
    val acc = spark.sparkContext.longAccumulator("graft.lsh.test_dropped")
    Dedup.lshCandidatePairs(bands, "doc_id", maxBucketSize = 10,
      droppedBuckets = Some(acc)).count()
    assert(acc.value === 1L)
  }

  test("LSH hot bucket streams its pair expansion: a 10k-id bucket completes") {
    // one band hash shared by 10,000 docs — the r5-flagged failure shape:
    // the old combinations(2) UDF forced this bucket's ~50M pairs into one
    // in-memory Seq inside a single expression eval (an executor OOM at
    // scale); the chained-posexplode generator yields pairs row-at-a-time,
    // so the bucket completes with bounded memory no matter its size.
    val n = 10000
    val bands = spark.range(n.toLong).select(col("id").as("doc_id"))
      .withColumn("band", lit(0)).withColumn("band_hash", lit("hotbucket"))
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id", maxBucketSize = n + 1)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    // spot-check ordering and bounds without collecting the pair set
    val firstRows = pairs.filter(col("id_a") === 0L).agg(
      count(lit(1)), min(col("id_b")), max(col("id_b"))).collect().head
    assert(firstRows.getLong(0) === (n - 1).toLong)
    assert(firstRows.getLong(1) === 1L && firstRows.getLong(2) === (n - 1).toLong)
  }

  test("simhash: near-identical texts within small hamming distance") {
    val rows = Seq(
      (1L, "spark streaming joins state watermark window trigger output"),
      (2L, "spark streaming joins state watermark window trigger output extra"),
      (3L, "completely unrelated cooking pasta sauce recipe basil")).toDF("doc_id", "text")
      .withColumn("ws", Dedup.wordsArray("text"))
      .select($"doc_id", Dedup.simhash("ws", 32).as("simhash"))
    val sh = rows.as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
  }

  test("SRP-LSH: self bucket always matches; top result is the query itself") {
    val vecs = (0 until 50).map { i =>
      val v = Array.tabulate(16)(j => math.sin(i * 17 + j * 3).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum).toFloat
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 7).select($"embedding".as("qv"))
    val withQ = vecs.crossJoin(broadcast(q))
      .withColumn("bucket", Similarity.srpBucket("embedding", 16, 6))
      .withColumn("qbucket", Similarity.srpBucket("qv", 16, 6))
    val cands = withQ.filter($"bucket" === $"qbucket")
      .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", $"qv"))
      .orderBy("score", "vec_id")
    val top = cands.select("vec_id").as[Long].head()
    assert(top === 7L)
  }

  test("PQ ANN: asymmetric-distance search recovers brute-force neighbors") {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val qv = vecs.filter($"vec_id" === 3).select("embedding").head().getSeq[Float](0).toArray
    val brute = vecs
      .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
      .orderBy("score", "vec_id").limit(10).select("vec_id").as[Long].collect().toSet
    val idx = Similarity.buildPq(vecs, "vec_id", "embedding", dim = 16, m = 4, k = 8)
    // PQ shortlists 30 by approximate distance; the true top-10 should be in it
    val shortlist = Similarity.pqTopK(idx, "vec_id", qv, kTop = 30)
      .select("vec_id").as[Long].collect().toSet
    assert(brute.intersect(shortlist).size >= 8,
      s"PQ shortlist missed too many true neighbors: ${brute.diff(shortlist)}")
  }

  test("suffix array: distributed prefix doubling equals a driver-side sort") {
    import graft.ops.SuffixArray
    val docs = Seq(
      (0L, "banana"), (1L, "bandana"), (2L, "an"), (3L, "banana"), // 0 ≡ 3
      (4L, ""), (5L, "x")).toDF("doc_id", "text")
    val got = SuffixArray.build(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // independent reference: materialize every suffix and sort
    val data = Map(0L -> "banana", 1L -> "bandana", 2L -> "an",
      3L -> "banana", 4L -> "", 5L -> "x")
    val ref = (for ((id, t) <- data.toSeq; p <- 0 until t.length)
        yield (t.substring(p), id, p.toLong))
      .sorted.zipWithIndex
      .map { case ((_, id, p), r) => (id, p, r.toLong) }.sorted
    assert(got === ref)
    // duplicate documents hit the fixed point (ranks can never go fully
    // distinct) — termination is the thing under test, equality above
    // already proves the tie-break order

    // longest repeat: "anana" is shared between doc 0 and doc 3 at pos 1
    val best = SuffixArray.longestRepeat(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Long)].collect().head
    assert(best === ((6L, "banana", 0L, 0L, 3L, 0L)))
    // cap truncates: with cap=3 the same pair reports lcp 3
    val capped = SuffixArray.longestRepeat(docs, "doc_id", "text", cap = 3)
      .as[(Long, String, Long, Long, Long, Long)].collect().head
    assert(capped._1 === 3L && capped._2 === "ban")

    // token-level: same core over word sequences
    val tdocs = Seq((0L, "the cat sat on the mat"),
      (1L, "a cat sat on the mat today"), (2L, "dogs")).toDF("doc_id", "text")
    val gotT = SuffixArray.buildTokens(tdocs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val tdata = Map(0L -> Seq("the", "cat", "sat", "on", "the", "mat"),
      1L -> Seq("a", "cat", "sat", "on", "the", "mat", "today"),
      2L -> Seq("dogs"))
    val refT = {
      import scala.math.Ordering.Implicits._
      (for ((id, ws) <- tdata.toSeq; p <- ws.indices)
          yield (ws.drop(p), id, p.toLong))
        .sortBy(x => (x._1, x._2, x._3)).zipWithIndex
        .map { case ((_, id, p), r) => (id, p, r.toLong) }.sorted
    }
    assert(gotT === refT)
    val bestT = SuffixArray.longestTokenRepeat(tdocs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Long)].collect().head
    assert(bestT === ((5L, "cat sat on the mat", 0L, 1L, 1L, 1L)))
  }

  test("suffix array equals a driver-side sort on random corpora (property)") {
    import graft.ops.SuffixArray
    import org.scalacheck.Gen
    // small alphabet + short docs force heavy rank ties, duplicate
    // suffixes, and multi-round refinement — the regimes where a doubling
    // bug would hide
    val gen = for {
      nDocs <- Gen.chooseNum(1, 6)
      docs <- Gen.listOfN(nDocs, Gen.chooseNum(0, 12)
        .flatMap(len => Gen.stringOfN(len, Gen.oneOf('a', 'b', 'c'))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    var seed = org.scalacheck.rng.Seed(11L)
    for (_ <- 0 until 8) {
      gen.apply(Gen.Parameters.default, seed).foreach { data =>
        val got = SuffixArray.build(data.toDF("doc_id", "text"), "doc_id", "text")
          .as[(Long, Long, Long)].collect().toSeq.sorted
        val ref = (for ((id, t) <- data; p <- 0 until t.length)
            yield (t.substring(p), id, p.toLong))
          .sorted.zipWithIndex
          .map { case ((_, id, p), r) => (id, p, r.toLong) }.sorted
        assert(got === ref, s"corpus=$data")
      }
      seed = seed.next
    }
  }

  test("cdc chunking: reassembles exactly, boundaries survive edits elsewhere") {
    // short/degenerate inputs
    assert(Dedup.cdcChunks("") === Seq.empty)
    assert(Dedup.cdcChunks("abc") === Seq("abc")) // shorter than the window
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the field while the farmer watches from the old barn"
    val edited = "ENTIRELY NEW PREAMBLE INSERTED HERE " + base
    val a = Dedup.cdcChunks(base)
    val b = Dedup.cdcChunks(edited)
    // chunks partition the document exactly
    assert(a.mkString === base)
    assert(b.mkString === edited)
    assert(a.size >= 3, s"fixture too short to be meaningful: $a")
    // CONTENT-DEFINED: boundaries depend only on the trailing window, so
    // after the first boundary past the edit the chunk streams REALIGN —
    // the whole shared tail dedups chunk-for-chunk (a fixed-size blocking
    // would shift every block and share nothing)
    val aligned = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(aligned >= a.size - 2,
      s"only $aligned/${a.size} tail chunks realigned: a=$a b=$b")
    // non-BMP text: windows count CODE POINTS (SQL substr parity), so a
    // surrogate pair is never split and chunks still reassemble exactly
    val emoji = "abc😀defghij klmnopqrs tuvwxyz et cetera 1234"
    assert(Dedup.cdcChunks(emoji).mkString === emoji)
  }

  test("multimodal: frame partition arithmetic reassembles payloads") {
    val media = Multimodal.fromDocuments(
      Seq((0L, "abcdefghij", "s0"), (1L, "xy", "s1")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
    val frames = Multimodal.frameSample(media, 4)
      .groupBy("media_id").agg(sum("frame_bytes").as("total"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(frames(0L) === ((10L, 4L))) // frames reassemble the payload exactly
    assert(frames(1L) === ((2L, 4L)))  // short payload: empty middle frames
  }

  test("BMP encoder produces real BMPs: javax.imageio decodes them pixel-for-pixel") {
    // independent decoder: the JDK's built-in BMP reader. If our encoder's
    // header, stride padding, or bottom-up row order were wrong, ImageIO
    // would either fail or disagree on pixel values.
    for (docId <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 13L, 255L, 256L, 1000L)) {
      val bytes = Multimodal.encodeBmp(docId)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not read BMP for docId=$docId")
      val did = (docId % 256).toInt
      val w = (4 + docId % 5).toInt
      val h = (3 + docId % 4).toInt
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === (did + x * y) % 256, s"R at ($x,$y) id=$docId")
        assert(((rgb >> 8) & 0xff) === (2 * did + 3 * x + 5 * y) % 256, s"G at ($x,$y) id=$docId")
        assert((rgb & 0xff) === (did + 7 * x + 13 * y) % 256, s"B at ($x,$y) id=$docId")
      }
    }
  }

  test("bandedHammingPairs: exact recall vs brute force when maxHamming < bands") {
    // pigeonhole guarantee: ≤6 differing bits over 7 bands leave one band
    // intact, so banding must find EVERY qualifying pair brute force finds
    val rng = new scala.util.Random(7)
    // random background hashes (pairwise far apart with overwhelming odds)
    val hashes = (0 until 60).map(i => (i.toLong, rng.nextLong() & ((1L << 56) - 1)))
    // explicit planted near-dups: pairs (100+i, 200+i) differ in ≤ 4 bits
    val planted = (0 until 20).flatMap { i =>
      val h = rng.nextLong() & ((1L << 56) - 1)
      val flips = (0 until rng.nextInt(5)).foldLeft(h)((acc, _) =>
        acc ^ (1L << rng.nextInt(56)))
      Seq((100L + i, h), (200L + i, flips))
    }
    val df = (hashes ++ planted).toDF("id", "h")
    val banded = Dedup.bandedHammingPairs(df, "id", "h", 56, 7, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val rows = (hashes ++ planted)
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(banded === brute)
    assert(brute.nonEmpty) // the planted pairs actually exercised the path
  }

  test("bandedHammingPairs: duplicate (id, hash) input rows collapse by default") {
    // the aggregate-free pair stream multiplies pair rows under repeated
    // input ids; the default dedupInput guard restores one-row-per-pair
    // semantics by collapsing the (linear, pre-explode) input instead of
    // the quadratic pair stream. Opting out reproduces the raw behavior.
    val base = Seq((1L, 0L), (2L, 1L)) // hamming 1 — one qualifying pair
    val dup = base ++ base ++ Seq((1L, 0L)) // id 1 thrice, id 2 twice
    val clean = Dedup.bandedHammingPairs(base.toDF("id", "h"), "id", "h", 56, 7, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(clean === Seq((1L, 2L)))
    val guarded = Dedup.bandedHammingPairs(dup.toDF("id", "h"), "id", "h", 56, 7, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(guarded === Seq((1L, 2L))) // default guard: same single pair
    val raw = Dedup.bandedHammingPairs(dup.toDF("id", "h"), "id", "h", 56, 7, 6,
      dedupInput = false).collect()
    assert(raw.length === 6) // 3 copies of id 1 × 2 of id 2 — the documented hazard
  }

  test("routedPairJoin: shuffle route matches broadcast route exactly") {
    // the verify-stage size routing must be a physical-strategy choice only:
    // identical pairs in, identical verified rows out on both routes
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 12).map(j => s"sh_${(i % 5)}_$j") :+ s"own_$i"))
      .toDF("doc_id", "shs")
    val pairs = (for (a <- 0 until 40; b <- a + 1 until 40; if a % 5 == b % 5)
      yield (a.toLong, b.toLong)).toDF("id_a", "id_b")
    val viaBroadcast = Dedup.jaccardOnPairs(pairs, docs, "doc_id", "shs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaShuffle = Dedup.jaccardOnPairs(pairs, docs, "doc_id", "shs",
      maxBroadcastPairs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaBroadcast === viaShuffle)
    assert(viaBroadcast.nonEmpty)
  }

  test("jaccardOnPairs over hashed shingles equals the exact string-set value") {
    // the verify leg carries xxhash64(shingle) longs, not the strings — the
    // emitted jaccard must equal the exact set computation on the strings
    // (the DuckDB oracle's semantics) on every pair, including skewed set
    // sizes and empty intersections
    val raw = Seq(
      (1L, Seq("a b c d e", "b c d e f", "c d e f g")),
      (2L, Seq("a b c d e", "b c d e f", "x y z w v")),
      (3L, Seq("p q r s t")),
      (4L, Seq("a b c d e", "b c d e f", "c d e f g", "d e f g h",
               "e f g h i", "f g h i j")),
      (5L, Seq("entirely disjoint from one", "and from two as well", "third gram here")))
    val docs = raw.toDF("doc_id", "shs")
    val pairs = (for (a <- raw.map(_._1); b <- raw.map(_._1); if a < b)
      yield (a, b)).toDF("id_a", "id_b")
    val got = Dedup.jaccardOnPairs(pairs, docs, "doc_id", "shs")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sets = raw.map { case (id, shs) => id -> shs.toSet }.toMap
    for (((a, b), j) <- got) {
      val inter = sets(a).intersect(sets(b)).size
      val expect = BigDecimal(inter.toDouble / (sets(a).size + sets(b).size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j === expect, s"pair ($a,$b)")
    }
    assert(got.size === pairs.count())
  }

  test("routed-join release handles leave no persisted blocks, both routes") {
    // the releasable variants exist for long-lived sessions: after the
    // caller's terminal action + release(), the session must hold NO cached
    // blocks from the routed join (getPersistentRDDs back to baseline) —
    // on the broadcast route AND the shuffle route of all three entry points
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 until 8).map(j => s"sh_${(i % 3)}_$j"))).toDF("doc_id", "shs")
    val pairs = (for (a <- 0 until 30; b <- a + 1 until 30; if a % 3 == b % 3)
      yield (a.toLong, b.toLong)).toDF("id_a", "id_b")
    val ids = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    for (limit <- Seq(-1L, 0L)) { // -1 → conf default (broadcast), 0 → shuffle
      val (verified, relPairs) =
        Dedup.jaccardOnPairsReleasable(pairs, docs, "doc_id", "shs", limit)
      assert(verified.count() > 0)
      relPairs()
      val (semi, relIds) =
        Dedup.routedSemiJoinReleasable(docs, ids, "doc_id", limit)
      assert(semi.count() > 0)
      relIds()
      assert(spark.sparkContext.getPersistentRDDs.keySet === baseline,
        s"persisted blocks leaked at maxBroadcastPairs=$limit")
    }
    // the posting-persisting operators release the same way
    val (jp, relJp) = Dedup.jaccardPairsReleasable(docs, "doc_id", "shs", 0.1)
    assert(jp.count() > 0)
    relJp()
    val (cov, relCov) = Dedup.dupGramCoverageReleasable(docs, "doc_id", "shs")
    assert(cov.count() > 0)
    relCov()
    assert(spark.sparkContext.getPersistentRDDs.keySet === baseline,
      "posting blocks leaked")
  }

  test("routed verify: posting route equals pair-carry route pair-for-pair") {
    // r13: jaccardOnPairsRouted may re-route the verify onto a posting join
    // when pair mass dominates candidate-doc mass. The two shapes must emit
    // IDENTICAL (id_a, id_b, jaccard) rows — including candidate pairs that
    // share no gram (jaccard 0.0 on both routes, not a dropped row) and
    // pairs whose ids are absent from the payload (dropped on both routes).
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 12).map(j => s"sh_${(i % 5)}_$j") :+ s"own_$i"))
      .toDF("doc_id", "shs")
    val pairs = ((for (a <- 0 until 40; b <- a + 1 until 40; if a % 5 == b % 5)
      yield (a.toLong, b.toLong)) ++
      Seq((0L, 1L),    // zero shared grams (different mod-5 groups)
          (2L, 8L),    // another disjoint pair
          (3L, 999L))) // id 999 not in docs — dropped by the payload join
      .toDF("id_a", "id_b")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val carry = rows(Dedup.jaccardOnPairsRouted(pairs, docs, "doc_id", "shs",
      postingFactor = 1e18)) // pin the pair carry
    val posting = rows(Dedup.jaccardOnPairsRouted(pairs, docs, "doc_id", "shs",
      postingFactor = 0.0)) // force the posting route
    assert(carry === posting)
    assert(carry.exists { case (a, b, j) => (a, b) == (0L, 1L) && j == 0.0 },
      "zero-intersection candidate pair must verify to 0.0, not vanish")
    assert(!carry.exists { case (_, b, _) => b == 999L },
      "pair with an id absent from the payload must drop on both routes")
    // and the posting route under the SHUFFLE semi-join leg too
    val postingShuffle = rows(Dedup.jaccardOnPairsRouted(pairs, docs,
      "doc_id", "shs", maxBroadcastPairs = 0L, postingFactor = 0.0))
    assert(postingShuffle === carry)
    // the RAW stats core agrees too (containment consumes _inter/_n_a/_n_b
    // directly, so jaccard equality alone would not pin the denominators)
    def stats(factor: Double) =
      Dedup.pairStatsRouted(pairs, docs, "doc_id", "shs", postingFactor = factor)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2).longValue,
          r.getInt(3), r.getInt(4))).toSet
    assert(stats(0.0) === stats(1e18))
    // r14: factor >= PostingVerifyFactor skips the measurement job (pinned
    // carry); a finite factor that still picks the carry takes the MEASURED
    // leg, which reuses the measurement's persisted pair list + exact count
    // for the join routing. All three carry shapes must agree with posting:
    // 143 pairs over ~40 ids -> carry iff factor >= ~3.6, so 10.0 measures
    // and picks carry while 0.0 still forces posting.
    assert(stats(10.0) === stats(1e18))
  }

  test("routed verify: duplicate-element shingles score identically on both routes") {
    // ADVICE r13: the carry route sized the raw hashed array while the
    // posting route sized array_distinct of it — a caller passing shingles
    // with duplicate elements got route-dependent _n/jaccard. Both routes
    // now size the DISTINCT set.
    val docs = Seq(
      (1L, Seq("a", "b", "c", "a", "a")), // 3 distinct, 5 raw
      (2L, Seq("a", "b", "d", "b"))       // 3 distinct, 4 raw
    ).toDF("doc_id", "shs")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    def j(factor: Double) =
      Dedup.jaccardOnPairsRouted(pairs, docs, "doc_id", "shs",
        postingFactor = factor).collect().map(_.getDouble(2)).toSeq
    val pinned = j(1e18)   // pinned carry (measurement skipped)
    val measured = j(10.0) // measured carry
    val posting = j(0.0)   // forced posting
    assert(pinned === Seq(0.5)) // |{a,b}| / |{a,b,c,d}| on DISTINCT sets
    assert(measured === pinned)
    assert(posting === pinned)
  }

  test("routed verify: posting-route release leaves no persisted blocks") {
    // the posting route persists the pair list, the semi-join id set, and
    // the candidate-doc hashed projection — the release handle must drop
    // all three (the same session-hygiene gate as the pair-carry twins)
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 until 8).map(j => s"sh_${(i % 3)}_$j"))).toDF("doc_id", "shs")
    val pairs = (for (a <- 0 until 30; b <- a + 1 until 30; if a % 3 == b % 3)
      yield (a.toLong, b.toLong)).toDF("id_a", "id_b")
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    for (limit <- Seq(-1L, 0L)) {
      val (verified, rel) = Dedup.jaccardOnPairsRoutedReleasable(
        pairs, docs, "doc_id", "shs", limit, postingFactor = 0.0)
      assert(verified.count() > 0)
      rel()
      assert(spark.sparkContext.getPersistentRDDs.keySet === baseline,
        s"posting-route blocks leaked at maxBroadcastPairs=$limit")
    }
    // pair-carry route through the SAME entry point releases too —
    // both the pinned leg (measurement skipped) and the measured leg
    // (which keeps ONE persisted pair list for the carry join)
    for (factor <- Seq(1e18, 1e6)) {
      val (v2, rel2) = Dedup.jaccardOnPairsRoutedReleasable(
        pairs, docs, "doc_id", "shs", postingFactor = factor)
      assert(v2.count() > 0)
      rel2()
      assert(spark.sparkContext.getPersistentRDDs.keySet === baseline,
        s"pair-carry blocks leaked through the routed entry at factor=$factor")
    }
  }

  test("dhash: constant image hashes to 0, monotone gradient to all-ones") {
    def bmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val stride = ((3 * w + 3) / 4) * 4
      val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (sr <- 0 until h) {
        val y = h - 1 - sr
        for (x <- 0 until w) {
          val (r, g, b) = px(x, y)
          buf.put(b.toByte); buf.put(g.toByte); buf.put(r.toByte)
        }
        for (_ <- 0 until stride - 3 * w) buf.put(0.toByte)
      }
      buf.array()
    }
    // constant: no neighbor is brighter anywhere
    assert(Multimodal.dhash(bmp(5, 4, (_, _) => (80, 80, 80))) === 0L)
    // luma strictly increasing in x: every right neighbor brighter → all 56
    val grad = bmp(8, 8, (x, _) => (x * 30, x * 30, x * 30))
    assert(Multimodal.dhash(grad) === (1L << 56) - 1)
    // deterministic + scale-invariant for an x-only gradient: the same
    // gradient at double width resizes to the same 8x8 comparison signs
    val grad2 = bmp(16, 8, (x, _) => (x * 15, x * 15, x * 15))
    assert(Multimodal.dhash(grad2) === (1L << 56) - 1)
    // identical payloads agree (exact-dup grouping key)
    assert(Multimodal.dhash(Multimodal.encodeBmp(9L)) ===
      Multimodal.dhash(Multimodal.encodeBmp(9L)))
  }

  test("audio resample: identity length is lossless; constant stays constant") {
    // identity: outRate == inRate → m == n, every fr == 0 → samples copied
    val src = Multimodal.encodeWav(5L)
    val same = Multimodal.resampleWavLinear(src, 8000)
    val a = Multimodal.decodeWav(src)
    val b = Multimodal.decodeWav(same)
    assert(a.nSamples === b.nSamples)
    assert(a.sumSamples === b.sumSamples)
    assert(a.probeSample === b.probeSample)
    assert(a.maxAbs === b.maxAbs)
    assert(b.sampleRate === 8000)
    // downsample: length follows the rate ratio; amplitude bounded by input
    val down = Multimodal.decodeWav(Multimodal.resampleWavLinear(src, 6000))
    assert(down.sampleRate === 6000)
    assert(down.nSamples === math.max(2L, a.nSamples * 6000 / 8000))
    assert(down.maxAbs <= a.maxAbs)
    // constant signal: any interpolation of equal values is that value
    val n = 20
    val flat = {
      val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1).putShort(1).putInt(8000).putInt(16000)
      buf.putShort(2).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(2 * n)
      for (_ <- 0 until n) buf.putShort(-123)
      buf.array()
    }
    val fr = Multimodal.decodeWav(Multimodal.resampleWavLinear(flat, 5000))
    assert(fr.nSamples === 12L) // 20 * 5000 / 8000
    assert(fr.sumSamples === -123L * 12)
    assert(fr.maxAbs === 123L)
  }

  test("sketches: HLL/KMV estimate within theory bounds and merge exactly") {
    import graft.ops.Sketches
    val docs = (0 until 2000).map(i => (i.toLong, s"doc text ${i % 1200}"))
      .toDF("doc_id", "text") // 1200 distinct values, every one duplicated
    val regs = Sketches.hllRegisters(docs, $"text", 6)
    // merge = union + groupBy max: two shards re-merged equal the whole
    val h1 = Sketches.hllRegisters(docs.filter($"doc_id" < 700), $"text", 6)
    val h2 = Sketches.hllRegisters(docs.filter($"doc_id" >= 700), $"text", 6)
    val merged = h1.union(h2).groupBy("register")
      .agg(max("max_rho").as("max_rho"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asMap(merged) === asMap(regs))
    // estimator: m=64 gives ~1.04/8 = 13% typical error; gate at 3 sigma
    val est = Sketches.hllEstimate(regs, 6).head()
    assert(est.getAs[String]("method") === "hll")
    assert(math.abs(est.getAs[Double]("est") - 1200.0) < 0.4 * 1200.0)
    // linear-counting branch engages on small cardinalities and is tighter
    val small = (0 until 300).map(i => (i.toLong, s"v${i % 20}")).toDF("doc_id", "text")
    val se = Sketches.hllEstimate(Sketches.hllRegisters(small, $"text", 6), 6).head()
    assert(se.getAs[String]("method") === "linear")
    assert(math.abs(se.getAs[Double]("est") - 20.0) < 8.0)
    // KMV: k−1 over kth-smallest; merge = union bottom-k, re-take bottom-k
    val kw = Sketches.kmvEstimate(docs, $"text", 32).head()
    assert(kw.getAs[Long]("n_held") === 32L)
    assert(math.abs(kw.getAs[Double]("est") - 1200.0) < 0.5 * 1200.0)
    val u = Sketches.kmvEstimate(
      docs.filter($"doc_id" < 700).select("text")
        .union(docs.filter($"doc_id" >= 700).select("text")), $"text", 32).head()
    assert(u.getAs[Long]("kth_hash") === kw.getAs[Long]("kth_hash"))
    // under k distinct values the sketch is exact
    val tiny = (0 until 100).map(i => (i.toLong, s"t${i % 10}")).toDF("doc_id", "text")
    val te = Sketches.kmvEstimate(tiny, $"text", 32).head()
    assert(te.getAs[Long]("n_held") === 10L)
    assert(te.getAs[Double]("est") === 10.0)
  }

  test("count-min sketch: one-sided estimates; shard sketches sum-merge exactly") {
    import graft.ops.Sketches
    val rows = (0 until 3000).map(i => (i, s"w${i % 170}"))
    val words = rows.toDF("i", "w")
    val sketch = Sketches.cmsSketch(words, $"w", 4, 64) // narrow → collisions
    val exact = words.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
    val looked = Sketches.cmsLookup(sketch, exact, "w", 4, 64).collect()
    assert(looked.length === 170)
    // conservative: the estimate NEVER undercounts
    looked.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"), r.toString)
    }
    // with 170 keys over 64 counters, collisions exist → some est > exact
    assert(looked.exists(r => r.getAs[Long]("cms_est") > r.getAs[Long]("exact_cnt")))
    // merge = union + re-sum: two disjoint half-corpus sketches == the whole
    val h1 = Sketches.cmsSketch(words.filter($"i" % 2 === 0), $"w", 4, 64)
    val h2 = Sketches.cmsSketch(words.filter($"i" % 2 === 1), $"w", 4, 64)
    val merged = h1.union(h2).groupBy("r", "idx").agg(sum("cnt").as("cnt"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(asMap(merged) === asMap(sketch))
  }

  test("clusterSelect: deterministic, balanced, centers and members coherent") {
    // 3 tight blobs far apart in 4-D; ids interleaved so seed order (first
    // k ids) does NOT align with blob membership.
    def v(base: Double, j: Int): Seq[Float] =
      Seq(base + 0.01 * j, base, base - 0.01 * j, base).map(_.toFloat)
    val rows = (0 until 30).map { i =>
      (i.toLong, v((i % 3) * 10.0, i / 3)) // blobs at 0, 10, 20
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.clusterSelect(df, "vec_id", "embedding", 3, 2)
      .orderBy("cluster", "pick_rank")
      .collect()
    // k=3 seeds are ids 0,1,2 = one per blob → every blob is a cluster of 10
    assert(out.length === 6) // 3 clusters × 2 picks
    assert(out.map(_.getLong(4)).toSet === Set(10L))
    // picks belong to the blob their cluster's seed came from
    out.foreach { r =>
      val cluster = r.getLong(0); val id = r.getLong(2)
      assert(id % 3 === cluster, s"pick $id in wrong cluster $cluster")
    }
    // pick_rank 1 is strictly the most central (dist non-decreasing in rank)
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val dists = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(dists.sameElements(dists.sorted))
    }
    // deterministic: a second run is byte-identical
    val again = Similarity.clusterSelect(df, "vec_id", "embedding", 3, 2)
      .orderBy("cluster", "pick_rank").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // k larger than distinct blobs still returns every vector once overall
    val all = Similarity.clusterSelect(df, "vec_id", "embedding", 5, 30)
      .collect()
    assert(all.map(_.getLong(2)).toSet === (0L until 30L).toSet)
  }

  test("bilinear resize: identity dims reproduce the source image exactly") {
    // at ow = w, oh = h every fractional weight is zero, so the output must
    // be byte-identical pixels (align-corners property) — catches any
    // weight, rounding, or row-order bug in one shot.
    for (docId <- Seq(0L, 3L, 7L, 255L, 1000L)) {
      val src = Multimodal.encodeBmp(docId)
      val w = (4 + docId % 5).toInt
      val h = (3 + docId % 4).toInt
      val out = Multimodal.resizeBmpBilinear(src, w, h)
      val a = Multimodal.decodeBmp(src)
      val b = Multimodal.decodeBmp(out)
      assert(a === b, s"identity resize changed stats for docId=$docId")
      // stronger: independent decoder agrees pixel-for-pixel
      val i1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
      val i2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
      for (y <- 0 until h; x <- 0 until w)
        assert(i1.getRGB(x, y) === i2.getRGB(x, y), s"pixel ($x,$y) id=$docId")
    }
  }

  test("bilinear resize: constant image stays constant; outputs stay in corner hull") {
    // constant input: every bilinear combination of equal corners is that
    // value (weights sum to 65536 and rounding is exact).
    val w = 6; val h = 5
    val stride = ((3 * w + 3) / 4) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (_ <- 0 until h) {
      for (_ <- 0 until w) { buf.put(77.toByte); buf.put(77.toByte); buf.put(77.toByte) }
      for (_ <- 0 until stride - 3 * w) buf.put(0.toByte)
    }
    for ((ow, oh) <- Seq((2, 2), (3, 4), (11, 9), (1, 1))) {
      val out = Multimodal.resizeBmpBilinear(buf.array(), ow, oh)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
      assert(img.getWidth === ow && img.getHeight === oh)
      for (y <- 0 until oh; x <- 0 until ow)
        assert((img.getRGB(x, y) & 0xffffff) === 0x4d4d4d, s"($x,$y) $ow x $oh")
    }
    // gradient input: every output channel bounded by the source channel range
    for (docId <- Seq(2L, 9L)) {
      val src = Multimodal.encodeBmp(docId)
      val srcImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
      val (wS, hS) = (srcImg.getWidth, srcImg.getHeight)
      val chans = for (y <- 0 until hS; x <- 0 until wS) yield srcImg.getRGB(x, y)
      def bound(shift: Int) = {
        val vs = chans.map(v => (v >> shift) & 0xff); (vs.min, vs.max)
      }
      val bounds = Seq(bound(16), bound(8), bound(0))
      val out = Multimodal.resizeBmpBilinear(src, 3, 2)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
      for (y <- 0 until 2; x <- 0 until 3; (sh, (lo, hi)) <- Seq(16, 8, 0).zip(bounds)) {
        val v = (img.getRGB(x, y) >> sh) & 0xff
        assert(v >= lo && v <= hi, s"channel@$sh out of hull at ($x,$y) id=$docId")
      }
    }
  }

  test("bilinear resize: 2x upscale midpoint is the exact corner average") {
    // a 2x1 image upscaled to 3x1 puts dest x=1 at fx = 128 exactly — the
    // midpoint — so each channel must be round((a + b) / 2) (round half up).
    val w = 2; val h = 1; val stride = ((3 * w + 3) / 4) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // pixel 0: B=10 G=20 R=30; pixel 1: B=11 G=21 R=255
    buf.put(10.toByte).put(20.toByte).put(30.toByte)
    buf.put(11.toByte).put(21.toByte).put(255.toByte)
    for (_ <- 0 until stride - 6) buf.put(0.toByte)
    val out = Multimodal.resizeBmpBilinear(buf.array(), 3, 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(((img.getRGB(0, 0) >> 16) & 0xff) === 30)
    assert(((img.getRGB(2, 0) >> 16) & 0xff) === 255)
    assert((img.getRGB(1, 0) & 0xff) === 11)        // (10+11+1)/2 = 10.5 -> 11
    assert(((img.getRGB(1, 0) >> 8) & 0xff) === 21) // 20.5 -> 21
    assert(((img.getRGB(1, 0) >> 16) & 0xff) === 143) // (30+255+1)/2 = 142.5 -> 143
  }

  test("PNG encoder produces real PNGs: javax.imageio decodes them pixel-for-pixel") {
    // independent decoder: the JDK's built-in PNG reader. Wrong CRCs,
    // zlib framing, or filter application would make ImageIO fail or
    // disagree; docIds cover every (w, h, filter-rotation, IDAT-split)
    // combination class.
    for (docId <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 11L, 255L, 256L, 1000L)) {
      val bytes = Multimodal.encodePng(docId)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not read PNG for docId=$docId")
      val did = (docId % 256).toInt
      val w = (5 + docId % 4).toInt
      val h = (4 + docId % 3).toInt
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === (did + x * y) % 256, s"R at ($x,$y) id=$docId")
        assert(((rgb >> 8) & 0xff) === (2 * did + 3 * x + 5 * y) % 256, s"G at ($x,$y) id=$docId")
        assert((rgb & 0xff) === (did + 7 * x + 13 * y) % 256, s"B at ($x,$y) id=$docId")
      }
    }
  }

  test("PNG decoder: closed-form stats, crc/structure rejection") {
    for (docId <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 99L, 255L, 511L)) {
      val f = Multimodal.decodePng(Multimodal.encodePng(docId))
      val did = (docId % 256).toInt
      val w = (5 + docId % 4).toInt
      val h = (4 + docId % 3).toInt
      val lumas = for (y <- 0 until h; x <- 0 until w) yield {
        val r = (did + x * y) % 256
        val g = (2 * did + 3 * x + 5 * y) % 256
        val b = (did + 7 * x + 13 * y) % 256
        (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(f.width === w && f.height === h && f.nPx === w.toLong * h)
      assert(f.sumLuma === lumas.map(_.toLong).sum)
      assert(f.probeLuma === lumas(2 * w + 1)) // pixel (x=1, y=2)
    }
    // corrupting any IDAT byte breaks the chunk CRC → rejected whole
    val png = Multimodal.encodePng(9L)
    val corrupt = png.clone()
    corrupt(45) = (corrupt(45) ^ 0x5A).toByte
    intercept[IllegalArgumentException] { Multimodal.decodePng(corrupt) }
    intercept[IllegalArgumentException] { Multimodal.decodePng("junk".getBytes) }
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(png.take(30)) // truncated mid-chunk
    }
  }

  test("GIF encoder produces real GIFs: javax.imageio decodes them pixel-for-pixel") {
    // ImageIO's GIF reader is a fully independent LZW implementation: a
    // bit-packing, width-growth, or sub-block bug would make it fail or
    // disagree with the palette rule.
    for (docId <- Seq(0L, 1L, 2L, 3L, 5L, 255L, 256L, 1000L)) {
      val bytes = Multimodal.encodeGif(docId)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not read GIF for docId=$docId")
      val did = (docId % 256).toInt
      val w = (6 + docId % 3).toInt
      val h = (5 + docId % 2).toInt
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val ix = (x + 3 * y + did) % 256
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === (did + ix) % 256, s"R at ($x,$y) id=$docId")
        assert(((rgb >> 8) & 0xff) === (2 * did + 3 * ix) % 256, s"G at ($x,$y) id=$docId")
        assert((rgb & 0xff) === (did + 7 * ix) % 256, s"B at ($x,$y) id=$docId")
      }
    }
  }

  test("GIF decoder: closed-form stats, general LZW, malformed rejection") {
    for (docId <- Seq(0L, 1L, 2L, 3L, 5L, 99L, 255L, 511L)) {
      val f = Multimodal.decodeGif(Multimodal.encodeGif(docId))
      val did = (docId % 256).toInt
      val w = (6 + docId % 3).toInt
      val h = (5 + docId % 2).toInt
      val lumas = for (y <- 0 until h; x <- 0 until w) yield {
        val ix = (x + 3 * y + did) % 256
        (299 * ((did + ix) % 256) + 587 * ((2 * did + 3 * ix) % 256) +
          114 * ((did + 7 * ix) % 256)) / 1000
      }
      assert(f.width === w && f.height === h && f.nPx === w.toLong * h)
      assert(f.sumLuma === lumas.map(_.toLong).sum)
      assert(f.probeLuma === lumas(2 * w + 1))
    }
    // the decoder's LZW is GENERAL, not just the fixture's clear-heavy
    // stream: a normally-compressed GIF (ImageIO-written, real dictionary
    // growth + KwKwK sequences) must decode to the same stats
    val src = Multimodal.encodeGif(42L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val re = Multimodal.decodeGif(bos.toByteArray)
    val ours = Multimodal.decodeGif(src)
    assert((re.width, re.height, re.sumLuma, re.probeLuma) ===
      ((ours.width, ours.height, ours.sumLuma, ours.probeLuma)))
    intercept[IllegalArgumentException] { Multimodal.decodeGif("nope".getBytes) }
    intercept[Exception] { Multimodal.decodeGif(src.take(20)) }
  }

  test("mu-law: G.711 expansion matches javax.sound sample-for-sample") {
    import graft.ops.Multimodal
    for (docId <- Seq(0L, 1L, 7L, 255L, 511L)) {
      val bytes = Multimodal.encodeWavMulaw(docId)
      val f = Multimodal.decodeWavMulaw(bytes)
      val did = (docId % 256).toInt
      val n = (40 + docId % 20).toInt
      val pcm = (0 until n).map(i => Multimodal.mulawToPcm((did * 7 + i * 13) % 256))
      assert(f.nSamples === n.toLong && f.sampleRate === 8000)
      assert(f.sumSamples === pcm.map(_.toLong).sum)
      assert(f.probeSample === pcm(2))
      assert(f.maxAbs === pcm.map(v => math.abs(v).toLong).max)
      // independent decoder: the JDK's ULAW converter
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcmFmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
      val raw = conv.readAllBytes()
      assert(raw.length === 2 * n)
      for (i <- 0 until n) {
        val v = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
        assert(v === pcm(i), s"sample $i docId=$docId")
      }
    }
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.decodeWavMulaw("RIFFxxxxWAVE".getBytes)
    }
    // a PCM (format tag 1) wav is refused by the mu-law decoder
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.decodeWavMulaw(graft.ops.Multimodal.encodeWav(4L))
    }
  }

  test("TIFF: both byte orders round-trip; ImageIO agrees; malformed refused") {
    import graft.ops.Multimodal
    for (docId <- Seq(0L, 1L, 2L, 3L, 5L, 255L, 511L)) { // even=II, odd=MM
      val bytes = Multimodal.encodeTiff(docId)
      val f = Multimodal.decodeTiff(bytes)
      val did = (docId % 256).toInt
      val w = (7 + docId % 3).toInt
      val h = (5 + docId % 4).toInt
      val lumas = for (y <- 0 until h; x <- 0 until w) yield {
        val r = (did + x * y) % 256
        val g = (2 * did + 3 * x + 5 * y) % 256
        val b = (did + 7 * x + 13 * y) % 256
        (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(f.width === w && f.height === h && f.nPx === w.toLong * h)
      assert(f.sumLuma === lumas.map(_.toLong).sum)
      assert(f.probeLuma === lumas(2 * w + 1))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not read TIFF for docId=$docId")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === (did + x * y) % 256, s"R($x,$y) id=$docId")
      }
    }
    intercept[IllegalArgumentException] { Multimodal.decodeTiff("junk".getBytes) }
    // flipping the compression tag to LZW must refuse, not garble
    val t = Multimodal.encodeTiff(2L) // little-endian
    val bb = java.nio.ByteBuffer.wrap(t).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xFFFF
    val comp = (0 until n).map(k => ifd + 2 + k * 12)
      .find(o => (bb.getShort(o) & 0xFFFF) == 259).get
    bb.putShort(comp + 8, 5) // LZW
    intercept[IllegalArgumentException] { Multimodal.decodeTiff(t) }
  }

  test("JPEG fixtures round-trip exactly; ImageIO agrees within IDCT rounding") {
    import graft.ops.Jpeg
    for (docId <- Seq(0L, 1L, 2L, 3L, 5L, 99L, 255L, 511L)) {
      val f = Jpeg.decodeJpeg(Jpeg.encodeJpeg(docId))
      val did = (docId % 256).toInt
      val w = (24 + (docId % 2) * 8).toInt
      val h = (16 + (docId % 3) * 8).toInt
      val ys = for (by <- 0 until h / 8; bx <- 0 until w / 8)
        yield Jpeg.blockY(did, bx, by).toLong
      assert(f.width === w && f.height === h && f.nPx === w.toLong * h)
      assert(f.sumLuma === ys.map(_ * 64).sum) // DC-exact: lossless
      assert(f.probeLuma === Jpeg.blockY(did, 0, 0))
      // an independent decoder (ImageIO/libjpeg) agrees on every pixel
      // within integer-IDCT rounding; flat chroma ⇒ gray RGB
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Jpeg.encodeJpeg(docId)))
      assert(img != null, s"ImageIO could not read fixture docId=$docId")
      for (by <- 0 until h / 8; bx <- 0 until w / 8) {
        val want = Jpeg.blockY(did, bx, by)
        val got = (img.getRGB(bx * 8 + 3, by * 8 + 3) >> 8) & 0xFF
        assert(math.abs(got - want) <= 1, s"($bx,$by) id=$docId: $got vs $want")
      }
    }
  }

  test("JPEG decoder handles general AC streams (ImageIO-encoded gradients)") {
    import graft.ops.Jpeg
    // a real compressed image: full standard Huffman tables, nonzero AC
    // coefficients, magnitude/run-length codes — none of which the
    // DC-only fixtures exercise
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (37 + 5 * x + 3 * y + ((x * y) % 23)) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = Jpeg.decodeJpeg(bytes)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var refSum = 0L
    for (y <- 0 until h; x <- 0 until w)
      refSum += ref.getRaster.getSample(x, y, 0)
    assert(ours.width === w && ours.height === h)
    // the two IDCTs may differ by ±1 per pixel on a lossy stream
    assert(math.abs(ours.sumLuma - refSum) <= w.toLong * h,
      s"ours=${ours.sumLuma} ref=$refSum")
    val refProbe = ref.getRaster.getSample(1, 2, 0)
    assert(math.abs(ours.probeLuma - refProbe) <= 1)
  }

  test("JPEG malformed rejection: garbage, truncation, progressive refusal") {
    import graft.ops.Jpeg
    intercept[IllegalArgumentException] { Jpeg.decodeJpeg("garbage".getBytes) }
    intercept[Exception] { Jpeg.decodeJpeg(Jpeg.encodeJpeg(7L).take(40)) }
    // flipping SOF0 to SOF2 (progressive) must refuse, not garble
    val j = Jpeg.encodeJpeg(7L)
    val sof = j.indices.find(i => (j(i) & 0xFF) == 0xFF &&
      i + 1 < j.length && (j(i + 1) & 0xFF) == 0xC0).get
    val prog = j.clone(); prog(sof + 1) = 0xC2.toByte
    intercept[IllegalArgumentException] { Jpeg.decodeJpeg(prog) }
  }

  test("BMP decoder: closed-form stats, top-down variant, malformed rejection") {
    // round-trip equals the closed form the SQL oracle computes
    for (docId <- Seq(0L, 1L, 2L, 3L, 4L, 99L, 255L, 511L)) {
      val f = Multimodal.decodeBmp(Multimodal.encodeBmp(docId))
      val did = (docId % 256).toInt
      val w = (4 + docId % 5).toInt
      val h = (3 + docId % 4).toInt
      val lumas = for (y <- 0 until h; x <- 0 until w) yield {
        val r = (did + x * y) % 256
        val g = (2 * did + 3 * x + 5 * y) % 256
        val b = (did + 7 * x + 13 * y) % 256
        (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(f.width === w && f.height === h && f.nPx === w.toLong * h)
      assert(f.sumLuma === lumas.map(_.toLong).sum)
      assert(f.probeLuma === lumas(2 * w + 1)) // pixel (x=1, y=2), row-major
    }
    // a top-down BMP (negative height) must decode to the same image stats:
    // flip the height sign and reverse the stored row order of a fixture
    val src = Multimodal.encodeBmp(7L)
    val bb = java.nio.ByteBuffer.wrap(src.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bb.getInt(18); val h = bb.getInt(22)
    val stride = ((3 * w + 3) / 4) * 4
    val flipped = src.clone()
    bb2Flip(flipped, h, stride)
    java.nio.ByteBuffer.wrap(flipped).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    assert(Multimodal.decodeBmp(flipped) === Multimodal.decodeBmp(src))
    // malformed payloads are rejected, not mis-parsed
    intercept[IllegalArgumentException](Multimodal.decodeBmp(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp("not a bitmap at all, just text padded to length 54+"
        .getBytes("UTF-8")))
  }

  test("quality model: recovers rule labels, separates classes, ranks sanely") {
    import graft.ops.QualityModel
    val good = (0 until 120).map { i =>
      (i.toLong, ("the data pipeline processes documents with careful quality checks and " +
        s"balanced vocabulary across many topics number $i ") * (2 + i % 3))
    }
    val bad = (200 until 240).map { i =>
      i % 4 match {
        case 0 => (i.toLong, s"short $i")                         // word floor
        case 1 => (i.toLong, ("### ### " * 30) + s"symbols $i")   // symbol ratio
        case 2 => (i.toLong, (s"- bullet point item\n" * 25) + i) // bullet ratio
        case _ => (i.toLong, (s"and then it trailed off...\n" * 20) + i) // ellipsis
      }
    }
    val docs = (good ++ bad).toDF("doc_id", "text")
    val scored = QualityModel.trainScore(QualityModel.featurize(docs))
      .select($"id", $"label", $"p_keep").as[(Long, Double, Double)].collect()
    assert(scored.length === 160)
    val byLabel = scored.groupBy(_._2)
    assert(byLabel.keySet === Set(0.0, 1.0), "weak label must be two-class")
    // thresholded at 0.5 the model recovers the rule verdict almost exactly
    val acc = scored.count(r => (r._3 >= 0.5) == (r._2 == 1.0)).toDouble / scored.length
    assert(acc >= 0.97, s"label recovery accuracy $acc")
    // calibrated separation, not a degenerate constant
    val mean1 = byLabel(1.0).map(_._3).sum / byLabel(1.0).size
    val mean0 = byLabel(0.0).map(_._3).sum / byLabel(0.0).size
    assert(mean1 - mean0 >= 0.5, s"class separation ${mean1 - mean0}")
    // ranking sanity: the symbol-heavy docs score below every clean doc
    val worstClean = scored.filter(_._2 == 1.0).map(_._3).min
    val symbolDocs = scored.filter(r => r._1 >= 200 && r._1 % 4 == 1)
    assert(symbolDocs.forall(_._3 < worstClean))
  }

  test("TopKAggregator: any reduce/merge split equals global sort-take (property)") {
    import org.scalacheck.Gen
    import graft.functions.TopKAggregator
    import TopKAggregator.Entry
    val agg = new TopKAggregator(3)
    val entryGen = for {
      price <- Gen.chooseNum(0.0, 100.0)
      okey <- Gen.chooseNum(0L, 20L)
      lnum <- Gen.chooseNum(0, 3)
    } yield Entry(price, okey, lnum, okey % 7, okey % 5)
    val caseGen = for {
      rows <- Gen.listOfN(40, entryGen)
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 40))
    } yield (rows, cuts.sorted)
    val seed0 = org.scalacheck.rng.Seed(20260812L)
    var seed = seed0
    (1 to 80).foreach { _ =>
      seed = seed.next
      caseGen.apply(Gen.Parameters.default, seed).foreach { case (rows, cuts) =>
        val expected = rows.sorted(TopKAggregator.ord).take(3)
        // arbitrary partitioning into 4 slices, each reduced independently
        // then merged in order — the contract partial aggregation relies on
        val slices = (0 +: cuts :+ rows.size).sliding(2)
          .map { case Seq(a, b) => rows.slice(a, b) }.toSeq
        val merged = slices
          .map(sl => sl.foldLeft(agg.zero)(agg.reduce))
          .foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) === expected,
          s"split $cuts diverged from the global sort-take")
        // merge is also order-insensitive across slice permutations
        val mergedRev = slices.reverse
          .map(sl => sl.foldLeft(agg.zero)(agg.reduce))
          .foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(mergedRev) === expected)
      }
    }
  }

  test("sharded corpus export: deterministic placement, bounded files, pruned reads") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name, max => smax}
    val docs = (0 until 120).map { i =>
      (i.toLong, if (i % 3 == 0) "de" else "en",
        s"document number $i with some text content repeated " * (1 + i % 4))
    }.toDF("doc_id", "lang", "text")
    val out1 = java.nio.file.Files.createTempDirectory("shard-out1").toString + "/corpus"
    val out2 = java.nio.file.Files.createTempDirectory("shard-out2").toString + "/corpus"
    graft.ops.CorpusWriter.writeSharded(docs, out1, numShards = 4, maxRecordsPerFile = 10)
    graft.ops.CorpusWriter.writeSharded(docs, out2, numShards = 4, maxRecordsPerFile = 10)

    def placement(dir: String) = spark.read.parquet(dir)
      .select(col("doc_id"), col("split"), col("shard").cast("long"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // byte-identical placement across runs (content/id hashes, no RNG)
    assert(placement(out1) === placement(out2))
    // round-trip: every row lands exactly once
    assert(spark.read.parquet(out1).count() === 120L)
    assert(spark.read.parquet(out1).select("doc_id").as[Long].collect().sorted
      === (0L until 120L).toArray)
    // maxRecordsPerFile honored: no output file exceeds the bound
    val maxPerFile = spark.read.parquet(out1)
      .groupBy(input_file_name()).count().agg(smax("count")).head().getLong(0)
    assert(maxPerFile <= 10L, s"a file holds $maxPerFile rows > bound 10")
    // a cell read opens ONLY that cell's directory (partition pruning)
    val cell = spark.read.parquet(out1)
      .select(col("split"), col("lang"), col("shard").cast("long").as("shard"))
      .as[(String, String, Long)].head()
    val pruned = graft.ops.CorpusWriter.readCell(spark, out1, cell._1, cell._2, cell._3)
    val nRows = pruned.count()
    assert(nRows > 0L)
    // semantics: the pruned read equals a direct path read of that cell dir
    val cellDir = s"$out1/split=${cell._1}/lang=${cell._2}/shard=${cell._3}"
    assert(nRows === spark.read.parquet(cellDir).count())
    // pruning: the cell filter reaches the scan as PartitionFilters, and the
    // executed scan opened exactly the cell directory's files (inputFiles
    // would lie here — it lists the relation pre-pruning)
    pruned.collect(): Unit
    val plan = pruned.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters: ["), plan.toString.take(1500))
    val scan = plan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.head
    val cellFiles = new java.io.File(new java.net.URI(s"file://$cellDir"))
      .listFiles().count(_.getName.endsWith(".parquet")).toLong
    assert(scan.metrics("numFiles").value === cellFiles,
      s"scan read ${scan.metrics("numFiles").value} files, cell holds $cellFiles")
  }

  test("WAV encoder produces real WAVs: javax.sound decodes them sample-for-sample") {
    // independent decoder: the JDK's built-in RIFF/PCM reader. A wrong
    // header field, chunk length, or sample byte order would make
    // AudioSystem fail or disagree on the decoded samples.
    for (docId <- Seq(0L, 1L, 2L, 3L, 16L, 17L, 255L, 256L, 1001L)) {
      val bytes = Multimodal.encodeWav(docId)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate === 8000f && fmt.getChannels === 1 &&
        fmt.getSampleSizeInBits === 16, s"format mismatch for docId=$docId")
      val n = (16 + docId % 17).toInt
      val data = in.readAllBytes()
      assert(data.length === 2 * n, s"sample count mismatch for docId=$docId")
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
               else java.nio.ByteOrder.LITTLE_ENDIAN)
      val did = (docId % 256).toInt
      for (i <- 0 until n)
        assert(bb.getShort(2 * i).toInt === ((did * 31 + i * 997) % 65536) - 32768,
          s"sample $i mismatch for docId=$docId")
    }
  }

  test("WAV decoder: closed-form stats, chunk walk, malformed rejection") {
    for (docId <- Seq(0L, 1L, 2L, 3L, 16L, 17L, 99L, 255L, 511L)) {
      val f = Multimodal.decodeWav(Multimodal.encodeWav(docId))
      val did = (docId % 256).toInt
      val n = (16 + docId % 17).toInt
      val samples = (0 until n).map(i => (((did * 31 + i * 997) % 65536) - 32768).toLong)
      assert(f.sampleRate === 8000 && f.channels === 1 && f.nSamples === n.toLong)
      assert(f.sumSamples === samples.sum)
      assert(f.probeSample === samples(3))
      assert(f.maxAbs === samples.map(math.abs).max)
      // odd docIds carry a junk LIST chunk before data: identical stats
      // prove the chunk walk skips it instead of mis-reading offsets
    }
    assert(Multimodal.decodeWav(Multimodal.encodeWav(1L)).sampleRate === 8000)
    intercept[IllegalArgumentException](Multimodal.decodeWav(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(("RIFFxxxxJUNK" + "x" * 64).getBytes("US-ASCII")))
  }

  test("AVI decoder: closed-form stats, container walk, malformed rejection") {
    for (docId <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 99L, 255L, 511L)) {
      val f = Multimodal.decodeAvi(Multimodal.encodeAvi(docId))
      val did = (docId % 256).toInt
      val w = (4 + docId % 3).toInt
      val h = (3 + docId % 2).toInt
      val frames = (2 + docId % 3).toInt
      def luma(x: Int, y: Int, fr: Int): Long = {
        val r = (did + x * y + 29 * fr) % 256
        val g = (2 * did + 3 * x + 5 * y + 11 * fr) % 256
        val b = (did + 7 * x + 13 * y + 17 * fr) % 256
        ((299 * r + 587 * g + 114 * b) / 1000).toLong
      }
      assert(f.width === w && f.height === h && f.nFrames === frames)
      val all = for (fr <- 0 until frames; y <- 0 until h; x <- 0 until w)
        yield luma(x, y, fr)
      assert(f.sumLuma === all.sum)
      assert(f.probeLuma === luma(1, 1, 1)) // second frame, pixel (1,1)
    }
    // a consistent container with a junk chunk between LISTs still decodes:
    // splice an 8+4-byte 'JUNK' chunk after hdrl and patch the RIFF length
    val src = Multimodal.encodeAvi(7L)
    val bb = java.nio.ByteBuffer.wrap(src).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hdrlLen = bb.getInt(16) // LIST hdrl chunk at offset 12
    val insertAt = 12 + 8 + hdrlLen
    val junk = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("JUNK".getBytes("US-ASCII")); junk.putInt(4); junk.putInt(0)
    val spliced = src.take(insertAt) ++ junk.array() ++ src.drop(insertAt)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bb.getInt(4) + 12)
    assert(Multimodal.decodeAvi(spliced) === Multimodal.decodeAvi(src))
    // malformed payloads are rejected, not mis-parsed
    intercept[IllegalArgumentException](Multimodal.decodeAvi(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Multimodal.decodeAvi(("RIFFxxxxWAVE" + "x" * 64).getBytes("US-ASCII")))
    // a header/movi frame-count mismatch is detected
    val lying = src.clone()
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 8 + 4 + 8 + 16, 99) // avih totalFrames
    intercept[IllegalArgumentException](Multimodal.decodeAvi(lying))
  }

  private def bb2Flip(bytes: Array[Byte], h: Int, stride: Int): Unit = {
    val off = 54
    val tmp = new Array[Byte](stride)
    for (i <- 0 until h / 2) {
      val a = off + i * stride; val b = off + (h - 1 - i) * stride
      System.arraycopy(bytes, a, tmp, 0, stride)
      System.arraycopy(bytes, b, bytes, a, stride)
      System.arraycopy(tmp, 0, bytes, b, stride)
    }
  }

  test("IVF ANN: probed search recovers the brute-force top-k on clustered data") {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val qv = vecs.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray

    val brute = vecs
      .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
      .orderBy("score", "vec_id").limit(10)
      .select("vec_id").as[Long].collect().toSet
    val idx = Similarity.buildIvf(vecs, "vec_id", "embedding", nLists = 8, seed = 42L)
    val ivf = Similarity.ivfTopK(idx, "vec_id", "embedding", qv, nProbe = 3, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.intersect(brute).size >= 8, s"recall too low: $ivf vs $brute")

    // the 100 TB claim: assignments written partitioned by list_id let a
    // probe read ONLY the probed partitions — pin that partition pruning
    // actually happens on the stored layout
    val dir = java.nio.file.Files.createTempDirectory("ivf_parts").toString
    idx.assignments.write.partitionBy("list_id").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val probed = stored.filter($"list_id".isin(0L, 1L, 2L))
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.contains("list_id"), scan.take(1500))
    assert(probed.select("list_id").distinct().as[Long].collect().toSet
      .subsetOf(Set(0L, 1L, 2L)))
  }

  test("IVF sampled fit (corpus above fitSampleCap) keeps the recall gate") {
    // the r17 straggler fix: above the cap the coarse quantizer trains on
    // a bounded seeded sample and the full corpus pays ONE assignment pass.
    // Force the sampled path with a tiny cap and hold the same recall bar
    // as the full fit on the same clustered fixture; also pin determinism
    // (same seed -> identical centroids) and the duplicate-heavy re-clamp
    // (sample-distinct < k must not trip the blockified-KMeans AIOOBE).
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val qv = vecs.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val brute = vecs
      .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
      .orderBy("score", "vec_id").limit(10)
      .select("vec_id").as[Long].collect().toSet

    val idx = Similarity.buildIvfCols(vecs, Seq("vec_id"), "embedding",
      nLists = 8, seed = 42L, fitSampleCap = 64) // 200 rows >> cap: sampled path
    assert(idx.centroids.length >= 2 && idx.centroids.length <= 8)
    val ivf = Similarity.ivfTopK(idx, "vec_id", "embedding", qv, nProbe = 3, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.intersect(brute).size >= 8, s"sampled-fit recall too low: $ivf vs $brute")

    val idx2 = Similarity.buildIvfCols(vecs, Seq("vec_id"), "embedding",
      nLists = 8, seed = 42L, fitSampleCap = 64)
    assert(idx.centroids.map(_.toSeq).toSeq == idx2.centroids.map(_.toSeq).toSeq,
      "sampled fit must be deterministic under a fixed seed")

    // duplicate-heavy corpus: 300 rows, 3 distinct vectors; full-distinct(3)
    // < k(8) clamps k, and the SAMPLE may see fewer still — must build, not
    // throw, and every distinct vector must land in a valid list
    val dups = (0 until 300).map(i => (i.toLong, centers(i % 3).toSeq.toArray))
      .toDF("vec_id", "embedding")
    val dupIdx = Similarity.buildIvfCols(dups, Seq("vec_id"), "embedding",
      nLists = 8, seed = 42L, fitSampleCap = 32)
    val listIds = dupIdx.assignments.select("list_id").distinct()
      .as[Int].collect().toSet
    assert(listIds.forall(l => l >= 0 && l < dupIdx.centroids.length))
    assert(dupIdx.assignments.count() == 300L)
  }

  test("IVF/PQ recall@10 gated on the real embeddings table") {
    // deterministic recall gate vs the brute-force oracle on actual data
    // (not just the synthetic clustered fixture): ANN quality is verified,
    // not only operator shape. The real embeddings table is UNIFORM RANDOM
    // (no cluster structure), the adversarial case for IVF — measured curve:
    // nProbe 4→0.57, 8→0.83, 10→0.90, 16→1.0. Gate at the half-probe point;
    // the clustered-data advantage (recall 0.8+ probing 3/8 lists) is pinned
    // by the synthetic IVF test above. PQ on random data needs fine
    // subquantization: m=16×k=16 (4-dim subvectors) measures 0.90 at
    // kTop=30 where m=8×k=16 sits at 0.50.
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = Seq(0L, 7L, 42L)
    val ivfIdx = Similarity.buildIvf(e, "vec_id", "embedding", nLists = 16, seed = 42L)
    val pqIdx = Similarity.buildPq(e, "vec_id", "embedding", dim = 64, m = 16, k = 16)
    val recalls = queries.map { q =>
      val qv = e.filter($"vec_id" === q).select("embedding").head().getSeq[Float](0).toArray
      val brute = e
        .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
        .orderBy("score", "vec_id").limit(10).select("vec_id").as[Long].collect().toSet
      val ivf = Similarity.ivfTopK(ivfIdx, "vec_id", "embedding", qv, nProbe = 8, k = 10)
        .select("vec_id").as[Long].collect().toSet
      val pq = Similarity.pqTopK(pqIdx, "vec_id", qv, kTop = 30)
        .select("vec_id").as[Long].collect().toSet
      (ivf.intersect(brute).size / 10.0, pq.intersect(brute).size / 10.0)
    }
    val ivfRecall = recalls.map(_._1).sum / recalls.size
    val pqRecall = recalls.map(_._2).sum / recalls.size
    assert(ivfRecall >= 0.8, s"IVF recall@10 $ivfRecall < 0.8 at nProbe=8/16")
    assert(pqRecall >= 0.85, s"PQ shortlist recall@10 $pqRecall < 0.85 at kTop=30")
  }

  test("IVF/PQ/SRP recall gates hold on LEARNED embeddings (Word2Vec geometry)") {
    // the r4 gates ran on the uniform-random embeddings table; this re-runs
    // them on vectors a REAL model produced from the documents corpus —
    // distributional geometry with genuine cluster structure, the regime a
    // production ANN index actually serves. Same thresholds as the random
    // gates: IVF 0.8 at nProbe=8/16, PQ 0.85 at kTop=30 with m=16×k=16.
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"text")
    val le = graft.embed.LearnedEmbedder.train(docs, "text", dim = 64)
    // the synthetic corpus draws from a 31-word vocabulary; a full fit
    // covers (almost) all of it
    assert(le.vocabSize >= 25, s"vocab ${le.vocabSize} is not a full fit of the corpus")
    val vecs = graft.embed.EmbedStage
      .withEmbeddings(docs, "text", "embedding", () => le)
      .select($"doc_id".as("vec_id"), $"embedding")
      .persist()
    try {
      val queries = Seq(0L, 7L, 42L)
      val ivfIdx = Similarity.buildIvf(vecs, "vec_id", "embedding", nLists = 16, seed = 42L)
      val pqIdx = Similarity.buildPq(vecs, "vec_id", "embedding", dim = 64, m = 16, k = 16)
      val recalls = queries.map { q =>
        val qv = vecs.filter($"vec_id" === q).select("embedding").head().getSeq[Float](0).toArray
        val brute = vecs
          .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
          .orderBy("score", "vec_id").limit(10).select("vec_id").as[Long].collect().toSet
        val ivf = Similarity.ivfTopK(ivfIdx, "vec_id", "embedding", qv, nProbe = 8, k = 10)
          .select("vec_id").as[Long].collect().toSet
        val pq = Similarity.pqTopK(pqIdx, "vec_id", qv, kTop = 30)
          .select("vec_id").as[Long].collect().toSet
        // SRP same-bucket candidates must recover the query itself as top-1
        val qb = Similarity.srpBucketScala(qv.toSeq, 64, 6)
        val srpTop = vecs
          .withColumn("bucket", Similarity.srpBucket("embedding", 64, 6))
          .filter($"bucket" === qb)
          .withColumn("score", graft.search.VectorSearch.dotDistance($"embedding", typedLit(qv.toSeq)))
          .orderBy("score", "vec_id").select("vec_id").as[Long].head()
        assert(srpTop === q, s"SRP self-bucket top-1 for query $q was $srpTop")
        (ivf.intersect(brute).size / 10.0, pq.intersect(brute).size / 10.0)
      }
      val ivfRecall = recalls.map(_._1).sum / recalls.size
      val pqRecall = recalls.map(_._2).sum / recalls.size
      assert(ivfRecall >= 0.8, s"IVF recall@10 $ivfRecall < 0.8 on learned embeddings")
      assert(pqRecall >= 0.85, s"PQ shortlist recall@10 $pqRecall < 0.85 on learned embeddings")
    } finally vecs.unpersist()
  }

  test("pii redaction is idempotent and catches the planted patterns") {
    val rows = Seq(
      (0L, "reach me at jane.doe+x@corp.example.org thanks"),
      (1L, "call 12345678 or ping 192.168.1.100 today"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val once = rows.select($"doc_id", TextAnalysis.redactPii($"text").as("r"))
    val twice = once.select($"doc_id", TextAnalysis.redactPii($"r").as("r"))
    assert(once.collect().toSeq === twice.collect().toSeq) // idempotent
    val byId = once.as[(Long, String)].collect().toMap
    assert(byId(0L).contains("<EMAIL>") && !byId(0L).contains("@"))
    assert(byId(1L).contains("<NUMBER>") && byId(1L).contains("<IP>"))
    assert(byId(2L) === "no pii here at all")
  }

  test("hash split is deterministic and roughly 80/10/10") {
    val keys = (0 until 2000).map(i => Tuple1(s"doc-content-$i")).toDF("k")
    val counts = keys.select(TextAnalysis.hashSplit($"k").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 1600L) < 100)
    assert(math.abs(counts("val") - 200L) < 60)
    assert(math.abs(counts("test") - 200L) < 60)
    // stable across evaluations
    val again = keys.select(TextAnalysis.hashSplit($"k").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("winnowing fingerprints overlap heavily for near-duplicate documents") {
    val base = "the quick brown fox jumps over the lazy dog while spark processes distributed data"
    val rows = Seq((0L, base), (1L, base + " with a small appended suffix"),
      (2L, "entirely different content about cooking pasta with rich tomato sauce"))
      .toDF("doc_id", "text")
    val fps = rows.select($"doc_id", TextAnalysis.winnowFingerprints($"text").as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    val overlap01 = fps(0L).toSet.intersect(fps(1L).toSet).size.toDouble / fps(0L).size
    val overlap02 = fps(0L).toSet.intersect(fps(2L).toSet).size.toDouble / fps(0L).size
    assert(overlap01 > 0.8, s"near-dup overlap too low: $overlap01")
    assert(overlap02 < 0.2, s"unrelated overlap too high: $overlap02")
  }

  test("bm25 indexed path equals ad-hoc path") {
    val docs = Seq((0L, "spark joins data"), (1L, "spark spark streaming"),
      (2L, "other words entirely")).toDF("doc_id", "text")
    val adhoc = graft.search.Bm25.score(docs, Seq("doc_id"),
      graft.search.Bm25.wordTokens($"text"), Seq("spark"))
      .as[(Long, Double)].collect().toMap
    val idx = graft.search.Bm25.buildIndex(docs, Seq("doc_id"),
      graft.search.Bm25.wordTokens($"text"))
    val indexed = graft.search.Bm25.scoreIndexed(idx, Seq("doc_id"), Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(adhoc === indexed)
    assert(adhoc(1L) > adhoc(0L))
  }

  test("bandingFor: chosen (b, r) brackets the requested threshold (property)") {
    import org.scalacheck.Gen
    def forAll[T](gen: Gen[T], n: Int = 60)(f: T => Unit): Unit = {
      var seed = org.scalacheck.rng.Seed(42L)
      var i = 0
      while (i < n) {
        gen.apply(Gen.Parameters.default, seed).foreach(f)
        seed = seed.next
        i += 1
      }
    }
    def scurve(b: Int, r: Int): Double = math.pow(1.0 / b, 1.0 / r)
    val gen = for {
      t <- Gen.chooseNum(0.05, 0.95)
      n <- Gen.oneOf(16, 32, 64, 128, 256)
    } yield (t, n)
    forAll(gen) { case (t, n) =>
      val (b, r) = Dedup.bandingFor(t, n)
      assert(b * r === n, s"banding must partition the signature: ($b, $r) for n=$n")
      // no other divisor pair sits strictly closer to the requested threshold
      val chosen = math.abs(scurve(b, r) - t)
      val best = (1 to n).filter(n % _ == 0)
        .map(bb => math.abs(scurve(bb, n / bb) - t)).min
      assert(chosen === best, s"($b, $r) at ${scurve(b, r)} is not nearest to $t")
      // bracketing: neighbors on the divisor ladder land on opposite sides
      // (or the chosen point is an endpoint of the achievable range)
      val curves = (1 to n).filter(n % _ == 0).map(bb => scurve(bb, n / bb)).sorted
      assert(scurve(b, r) >= curves.head && scurve(b, r) <= curves.last)
    }
    // monotonicity: a higher requested threshold never picks MORE bands
    val picks = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(t => Dedup.bandingFor(t, 128)._1)
    assert(picks === picks.sorted.reverse)
  }

  test("nearDupPairsAt: verified precision is exact and banded recall meets the s-curve promise") {
    // clustered corpora across thresholds 0.5–0.9: members of a cluster are
    // the base shingle set with k replacements, giving a spread of true
    // Jaccard values around each threshold. The pipeline is deterministic
    // (fixed hash family), so these bounds are exact assertions, not flaky
    // statistics.
    val rnd = new scala.util.Random(1234)
    def corpus(nClusters: Int, perCluster: Int): Seq[(Long, Set[String])] = {
      var id = -1L
      (0 until nClusters).flatMap { c =>
        val base = Set.tabulate(60)(i => s"c${c}_s${i}_${rnd.nextInt(1000)}")
        (0 until perCluster).map { _ =>
          id += 1
          val k = rnd.nextInt(31) // 0..30 replacements of 60 → Jaccard 1.0 .. ~0.33
          val dropped = rnd.shuffle(base.toSeq).take(k).toSet
          (id, (base -- dropped) ++ Set.tabulate(k)(i => s"n${id}_$i"))
        }
      }
    }
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 0.0 else a.intersect(b).size.toDouble / a.union(b).size
    for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9)) {
      val docs = corpus(nClusters = 4, perCluster = 6)
      val df = docs.map { case (i, s) => (i, s.toSeq) }.toDF("id", "shs")
      val got = Dedup.nearDupPairsAt(df, "id", "shs", t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      val byId = docs.toMap
      // precision is EXACT modulo the 4-decimal rounding the operator
      // applies: every emitted pair re-verifies against the driver-side
      // Jaccard (the verify stage is exact set arithmetic, not approximate)
      got.foreach { case (a, b, j) =>
        val truth = jac(byId(a), byId(b))
        assert(truth >= t - 5.1e-5,
          s"pair ($a,$b) emitted at $j but true Jaccard $truth < $t")
        assert(math.abs(truth - j) < 5.1e-5, s"pair ($a,$b): jaccard $j != $truth")
      }
      // recall: every pair the s-curve promises with near-certainty
      // (capture prob 1-(1-j^r)^b >= 0.9999, and clear of the rounding
      // boundary) must be present
      val (b, r) = Dedup.bandingFor(t, 128)
      val gotSet = got.map(p => (p._1, p._2)).toSet
      val ids = docs.map(_._1)
      for (i <- ids; k <- ids if i < k) {
        val j = jac(byId(i), byId(k))
        val captureProb = 1.0 - math.pow(1.0 - math.pow(j, r.toDouble), b.toDouble)
        if (j >= t + 5.1e-5 && captureProb >= 0.9999)
          assert(gotSet.contains((i, k)),
            s"pair ($i,$k) with Jaccard $j (capture ${captureProb}) missed at t=$t")
      }
    }
  }

  test("connectedComponents equals a union-find reference on random graphs (property)") {
    import org.scalacheck.Gen
    def forAll[T](gen: Gen[T], n: Int = 12)(f: T => Unit): Unit = {
      var seed = org.scalacheck.rng.Seed(7L)
      var i = 0
      while (i < n) {
        gen.apply(Gen.Parameters.default, seed).foreach(f)
        seed = seed.next
        i += 1
      }
    }
    // driver-side union-find as the independent reference implementation
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) parent(find(a)) = find(b)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.valuesIterator.flatMap(ns => ns.map(_ -> ns.min)).toMap
    }
    val gen = for {
      nNodes <- Gen.chooseNum(2, 24)
      nEdges <- Gen.chooseNum(1, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0, nNodes - 1)
        b <- Gen.chooseNum(0, nNodes - 1) if a != b
      } yield (a.toLong, b.toLong))
    } yield edges
    forAll(gen) { edges =>
      if (edges.nonEmpty) {
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(got === unionFind(edges), s"edges=$edges")
      }
    }
  }

  test("connectedComponents: empty edge set converges to empty labels") {
    // r17: the convergence count is an observed metric on the checkpoint
    // job (sum over an empty label table is NULL — the coalesce must read
    // it as converged, and the loop must terminate without a count job)
    val labels = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    try assert(labels.count() === 0L)
    finally labels.unpersist()
  }

  test("connectedComponents: chains close transitively, min id is the rep") {
    // two components: a chain 1-2-3-4 (no direct 1-4 pair) and a pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(edges)
    try {
      val m = comp.as[(Long, Long)].collect().toMap
      assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally comp.unpersist()

    // a 100-link path graph (diameter 100): pointer jumping must converge
    // in O(log d) rounds, well under the 25-round cap that plain label
    // propagation would blow through — the boilerplate-dup-chain cliff
    val path = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val pc = Dedup.connectedComponents(path)
    try {
      val pm = pc.as[(Long, Long)].collect().toMap
      assert(pm.size === 101 && pm.values.forall(_ === 0L))
    } finally pc.unpersist()

    // edge direction must not matter
    val rev = Seq((5L, 2L), (2L, 9L)).toDF("id_a", "id_b")
    val rc = Dedup.connectedComponents(rev)
    try assert(rc.as[(Long, Long)].collect().toMap.values.toSet === Set(2L))
    finally rc.unpersist()
  }

  test("sequence packing: offsets tile each (lang, shard) stream gaplessly") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.Registry.byName("t_pack_sequences")
      .build(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // within each stream, in WINDOW order (hash key, then doc_id — emitted
    // order can differ when zero-token docs tie on offset), cum-before must
    // equal the running sum of preceding docs' tokens: seq_id*256 + offset
    // is exactly that cumsum, so recompute and compare
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (Dedup.hash60Scala(r._3.toString), r._3)).foreach {
        case (_, _, _, nTok, seqId, offset) =>
          assert(seqId * 256 + offset === cum)
          cum += nTok
      }
    }
    // offsets always inside the budget; first doc of each stream at (0, 0)
    assert(out.forall(r => r._6 >= 0 && r._6 < 256))
  }

  test("nearDupPairsAt: one-knob dedupe finds planted near-dups and skips distinct docs") {
    val base = "the quick brown fox jumps over the lazy dog near the riverbank every morning " +
      "while birds sing in the tall green trees beside the water"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("morning", "evening")), // near-dup of 0
      (2L, "completely different text about database partitioning strategies and " +
        "shuffle optimization inside distributed analytical query engines today"),
      (3L, base.replace("quick", "swift").replace("lazy", "sleepy")) // near-dup of 0
    ).toDF("doc_id", "text")
      .withColumn("ws", Dedup.wordsArray("text"))
      .withColumn("shs", Dedup.wordShingles("ws", 3))
    val pairs = Dedup.nearDupPairsAt(docs, "doc_id", "shs", threshold = 0.5, nHashes = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("dupGramCoverage: exact copies score 1.0, unique docs 0.0, short docs 0 grams") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta"),
      (1L, "alpha beta gamma delta epsilon zeta eta"), // exact copy of 0
      (2L, "one two three four five six seven eight"), // unique
      (3L, "tiny")                                     // below the 5-gram floor
    ).toDF("doc_id", "text")
      .withColumn("ws", Dedup.wordsArray("text"))
      .withColumn("shs", Dedup.wordShingles("ws", 5))
    val out = Dedup.dupGramCoverage(docs, "doc_id", "shs")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) === ((1.0, 3L)) && out(1L) === ((1.0, 3L)))
    assert(out(2L) === ((0.0, 4L)))
    assert(out(3L) === ((0.0, 0L)))
  }

  test("heavyHitterTokens: exact output; certification failure is loud, not wrong") {
    // 40×"alpha", 25×"beta", rest singletons across 3 partitions
    val docs = (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      (0 until 30).map(i => s"unique$i"))
      .map(Tuple1(_)).toDF("text").repartition(3)
    val got = TextAnalysis.heavyHitterTokens(docs, "text", minCount = 20L,
        capacity = 64)
      .as[(String, Long)].collect().toMap
    assert(got === Map("alpha" -> 40L, "beta" -> 25L))
    // a capacity too small for the partition volume must FAIL (an evicted
    // token could be heavy), never silently drop a hitter
    val boom = intercept[org.apache.spark.SparkException] {
      TextAnalysis.heavyHitterTokens(docs, "text", minCount = 3L, capacity = 1)
        .collect()
    }
    assert(boom.getMessage.contains("capacity") ||
      Option(boom.getCause).exists(_.getMessage.contains("capacity")))
  }

  test("z-order: interleave bit layout, bucket monotonicity, null handling") {
    import graft.ops.ZOrder
    // buckets (1, 2) at 2 bits: z = bit0(a)<<0 | bit0(b)<<1 | bit1(a)<<2
    // | bit1(b)<<3 = 1 + 0 + 0 + 8 = 9
    val z = Seq((1L, 2L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 2).as("z"))
      .as[Long].head()
    assert(z === 9L)
    // bucket = count of boundaries <= value; nulls land in bucket 0
    val bs = Array(1.0, 2.0, 3.0)
    val got = Seq(Some(0.5), Some(1.0), Some(2.5), None).toDF("v")
      .select(ZOrder.bucketExpr(col("v"), bs).as("b")).as[Long].collect().toSeq
    assert(got === Seq(0L, 1L, 2L, 0L))
    // duplicate boundaries stay monotone (low-cardinality dims)
    val dup = Seq(0.0, 5.0, 10.0).toDF("v")
      .select(ZOrder.bucketExpr(col("v"), Array(5.0, 5.0, 5.0)).as("b"))
      .as[Long].collect().toSeq
    assert(dup === Seq(0L, 3L, 3L))
  }

  test("z-order layout prunes multi-dim range reads a single-sort layout cannot") {
    import graft.ops.ZOrder
    import graft.ops.ZOrder.ZRange
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val zdir = s"$base/z"; val ldir = s"$base/linear"
    assert(ZOrder.writeZOrdered(events, zdir, Seq("user_id", "value"),
      bits = 4, numFiles = 16) === 16L)
    ZOrder.writeSorted(events, ldir, "user_id", Seq("user_id", "value"),
      numFiles = 16)
    // a value-only range: the user_id-sorted layout has no order on value,
    // so every file's value envelope spans the domain and nothing prunes;
    // the z-order layout dedicates half the key bits to value and opens a
    // strict subset
    val valueOnly = Seq(ZRange("value", 40.0, 110.0))
    val (zSel, zTot) = ZOrder.prunedPaths(spark, zdir, valueOnly)
    val (lSel, lTot) = ZOrder.prunedPaths(spark, ldir, valueOnly)
    // range partitioning on a 15-distinct-value column leaves some
    // partitions empty (footer-only files: stated with n_rows=0 and null
    // stats, so always pruned), so the linear layout's no-pruning claim is
    // against its NON-EMPTY file count
    val lNonEmpty = ZOrder.stats(spark, ldir).filter(col("n_rows") > 0).count()
    assert(zTot === 16L && lNonEmpty >= 10L)
    assert(lSel.size === lNonEmpty,
      s"single-sort layout unexpectedly pruned: ${lSel.size} of $lNonEmpty")
    assert(zSel.size < lSel.size,
      s"z-order opened ${zSel.size} files vs linear ${lSel.size}")
    // pruned read is exact: identical rows to the brute-force filter, on a
    // predicate over BOTH dims
    val both = Seq(ZRange("user_id", 3, 7), ZRange("value", 40.0, 110.0))
    val got = ZOrder.read(spark, zdir, both)
      .select("event_id").as[Long].collect().sorted.toSeq
    val want = events
      .filter(col("user_id").between(3, 7) && col("value").between(40.0, 110.0))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got === want && want.nonEmpty)
    // stats sidecar is one row per file with finite envelopes
    assert(ZOrder.stats(spark, zdir).count() === 16L)
  }

  test("z-order append: batches cluster on the stored key, reads stay exact") {
    import graft.ops.ZOrder
    import graft.ops.ZOrder.ZRange
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("zappend").toString + "/t"
    val base = events.filter(col("event_id") < 600)
    val b1 = events.filter(col("event_id") >= 600 && col("event_id") < 800)
    val b2 = events.filter(col("event_id") >= 800)
    val n0 = ZOrder.writeZOrdered(base, dir, Seq("user_id", "value"),
      bits = 4, numFiles = 8)
    val n1 = ZOrder.appendZOrdered(b1, dir, batchFiles = 4)
    val n2 = ZOrder.appendZOrdered(b2, dir, batchFiles = 4)
    assert(n1 > 0 && n2 > 0)
    // sidecar tracks every file; the layout serves exact reads over the
    // union of base + batches
    assert(ZOrder.stats(spark, dir).count() === n0 + n1 + n2)
    val ranges = Seq(ZRange("user_id", 3, 9), ZRange("value", 30.0, 150.0))
    val got = ZOrder.read(spark, dir, ranges)
      .select("event_id").as[Long].collect().sorted.toSeq
    val want = events
      .filter(col("user_id").between(3, 9) && col("value").between(30.0, 150.0))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got === want && want.nonEmpty)
    // appended batches keep multi-dim pruning: a narrow range must not
    // open every file
    val (sel, tot) = ZOrder.prunedPaths(spark, dir,
      Seq(ZRange("value", 30.0, 60.0)))
    assert(sel.size < tot,
      s"append destroyed pruning: ${sel.size} of $tot files opened")
  }

  test("z-order interleave: bijective and per-dim monotone (property)") {
    import graft.ops.ZOrder
    import org.scalacheck.Gen
    // Scala reference twin of the Column expression
    def ref(buckets: Seq[Long], bits: Int): Long =
      (for { i <- 0 until bits; j <- buckets.indices }
        yield ((buckets(j) >> i) & 1L) << (i * buckets.size + j)).sum
    def unref(z: Long, k: Int, bits: Int): Seq[Long] =
      (0 until k).map(j =>
        (0 until bits).map(i => ((z >> (i * k + j)) & 1L) << i).sum)
    for (k <- Seq(1, 2, 3); bits <- Seq(3, 6)) {
      val gen = Gen.listOfN(k, Gen.chooseNum(0L, (1L << bits) - 1))
      var seed = org.scalacheck.rng.Seed(20260813L)
      val samples = (0 until 80).flatMap { _ =>
        val s = gen.apply(Gen.Parameters.default, seed); seed = seed.next
        s.map(_.toSeq)
      }
      // expression twin: one Spark pass over all samples
      val cols = (0 until k).map(j => col(s"b$j"))
      val df = samples.map(t => Tuple1(t)).toDF("bs")
        .select((0 until k).map(j => element_at(col("bs"), j + 1).as(s"b$j")): _*)
      val got = df.select(ZOrder.interleave(cols, bits).as("z")).as[Long].collect()
      samples.zip(got).foreach { case (t, z) =>
        assert(z === ref(t, bits))           // expression == reference
        assert(unref(z, k, bits) === t)      // bijective: buckets recoverable
      }
      // per-dim monotone: raising ONE bucket (others fixed) raises z
      samples.take(30).foreach { t =>
        (0 until k).foreach { j =>
          if (t(j) < (1L << bits) - 1) {
            val up = t.updated(j, t(j) + 1)
            assert(ref(up, bits) > ref(t, bits),
              s"z not monotone in dim $j at $t (bits=$bits)")
          }
        }
      }
    }
  }

  test("z-order scrub/repair: unstated files become readable, orphaned stats drop") {
    import graft.ops.ZOrder
    import graft.ops.ZOrder.ZRange
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("zscrub").toString + "/t"
    ZOrder.writeZOrdered(events, dir, Seq("user_id", "value"), bits = 4, numFiles = 8)
    assert(ZOrder.scrub(spark, dir) === ((Seq.empty, Seq.empty)))
    val wide = Seq(ZRange("user_id", 0, 1e9), ZRange("value", -1e9, 1e9))
    val baseline = ZOrder.read(spark, dir, wide).count()

    // crash twin of append: a data file lands with no stats row → invisible
    val dataFiles = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val src = dataFiles.minBy(_.getName)
    val copyRows = spark.read.parquet(src.getPath).count()
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(s"$dir/data/zz-unstated.parquet").toPath)
    assert(ZOrder.read(spark, dir, wide).count() === baseline) // invisible
    // external deletion: stats row outlives its file
    val victim = dataFiles.maxBy(_.getName)
    val victimRows = spark.read.parquet(victim.getPath).count()
    victim.delete()

    val (unstated, orphaned) = ZOrder.scrub(spark, dir)
    assert(unstated === Seq("zz-unstated.parquet"))
    assert(orphaned.size === 1 && orphaned.head.endsWith(victim.getName))

    assert(ZOrder.repair(spark, dir) === ((1L, 1L)))
    assert(ZOrder.scrub(spark, dir) === ((Seq.empty, Seq.empty)))
    // repaired layout serves the surviving rows: baseline minus the deleted
    // file's rows plus the recovered copy's
    assert(ZOrder.read(spark, dir, wide).count() ===
      baseline - victimRows + copyRows)
  }

  test("z-order: _zstats come from parquet footers — correct, and no second data scan") {
    import graft.ops.ZOrder
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("zfooter").toString + "/t"
    ZOrder.writeZOrdered(events, dir, Seq("user_id", "value"), bits = 4, numFiles = 8)
    val files = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    // scan-based oracle: the stats a full re-read of the data would compute
    val want = spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("user_id").cast("double")).as("min_user_id"),
        max(col("user_id").cast("double")).as("max_user_id"),
        min(col("value").cast("double")).as("min_value"),
        max(col("value").cast("double")).as("max_value"))
      .collect()
      .map(r => new java.io.File(r.getString(0)).getName ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // job pin: footerStats is driver-side footer metadata — it must launch
    // ZERO Spark jobs (a job here means the data was re-scanned). Listener
    // events are delivered in order, so once the sentinel job's start is
    // observed, any earlier job start would have been observed too.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      val rows = ZOrder.footerStats(spark, files, Seq("user_id", "value")).collect()
      spark.sparkContext.parallelize(1 to 2, 1).count() // sentinel job
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() === 1,
        s"footerStats launched ${jobs.get() - 1} Spark job(s) — a data re-scan")
      rows
    } finally spark.sparkContext.removeSparkListener(listener)
    // footer stats == scan stats, file by file (non-empty files; empty
    // part files are footer-stated with n_rows=0 and no scan-side row)
    val gotNonEmpty = got.filter(_.getAs[Long]("n_rows") > 0)
    assert(gotNonEmpty.map(r => new java.io.File(r.getString(0)).getName).toSet
      === want.keySet)
    gotNonEmpty.foreach { r =>
      val name = new java.io.File(r.getString(0)).getName
      val (n, loU, hiU, loV, hiV) = want(name)
      assert(r.getAs[Long]("n_rows") === n, s"n_rows mismatch in $name")
      assert(r.getAs[Double]("min_user_id") === loU && r.getAs[Double]("max_user_id") === hiU,
        s"user_id envelope mismatch in $name")
      assert(r.getAs[Double]("min_value") === loV && r.getAs[Double]("max_value") === hiV,
        s"value envelope mismatch in $name")
    }
  }

  test("z-order scrub/repair converge on a layout containing an empty part file") {
    import graft.ops.ZOrder
    import graft.ops.ZOrder.ZRange
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("zempty").toString + "/t"
    ZOrder.writeZOrdered(events, dir, Seq("user_id", "value"), bits = 4, numFiles = 8)
    val wide = Seq(ZRange("user_id", -1e9, 1e9), ZRange("value", -1e9, 1e9))
    val baseline = ZOrder.read(spark, dir, wide).count()
    // fabricate the footer-only empty part file a crashed append's empty
    // partition leaves behind — the r5 non-convergence: scan-based stat
    // recompute produced no group row for it, so scrub reported it
    // unstated forever
    val stage = java.nio.file.Files.createTempDirectory("zemptysrc").toString
    events.limit(0).coalesce(1).write.mode("overwrite").parquet(s"$stage/e")
    val part = new java.io.File(s"$stage/e").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(s"$dir/data/zz-empty.parquet").toPath)
    val (unstated, orphaned) = ZOrder.scrub(spark, dir)
    assert(unstated === Seq("zz-empty.parquet") && orphaned.isEmpty)
    assert(ZOrder.repair(spark, dir) === ((1L, 0L)))
    assert(ZOrder.scrub(spark, dir) === ((Seq.empty, Seq.empty))) // converged
    // the empty file is stated with n_rows=0 and null stats — never
    // selected by any range, so reads are unchanged
    val row = ZOrder.stats(spark, dir)
      .filter(col("path").endsWith("zz-empty.parquet")).collect()
    assert(row.length === 1 && row.head.getAs[Long]("n_rows") === 0L)
    assert(row.head.isNullAt(row.head.fieldIndex("min_user_id")))
    assert(ZOrder.read(spark, dir, wide).count() === baseline)
  }

  test("dupGramCoverage: solo-gram inversion equals brute force on random corpora") {
    // the r15 join-free shape computes n_cov = n_grams − |count-1 grams
    // owned by the doc|, leaning on wordShingles' per-doc distinctness;
    // cross-validate the whole identity against a brute-force in-memory
    // recomputation on randomized corpora (overlap-heavy vocab so shared
    // and solo grams both occur)
    val rng = new scala.util.Random(43)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    for (trial <- 0 until 3) {
      val docs = (0 until 30).map { i =>
        val n = rng.nextInt(10) + (trial % 3)
        (i.toLong, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val k = 3
      val df = docs.toDF("doc_id", "text")
        .withColumn("ws", Dedup.wordsArray("text"))
        .withColumn("shs", Dedup.wordShingles("ws", k))
      val got = Dedup.dupGramCoverage(df, "doc_id", "shs")
        .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      // brute force: distinct k-grams per doc, gram -> containing-doc count
      val grams = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).sliding(k)
          .filter(_.size == k).map(_.mkString(" ")).toSet
      }.toMap
      val docCount = grams.values.flatten.toSeq.groupBy(identity).map { case (g, o) => g -> o.size }
      for ((id, gs) <- grams) {
        val nCov = gs.count(g => docCount(g) >= 2)
        val frac = if (gs.isEmpty) 0.0
          else BigDecimal(nCov.toDouble / gs.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(id) === ((frac, gs.size.toLong)),
          s"trial $trial doc $id: got ${got(id)}, brute ($frac, ${gs.size})")
      }
    }
  }

  test("spanDedup: a null text row flows through as an empty doc, not an NPE") {
    // ADVICE r14: the rebuild UDF is a public-op surface now — caller data
    // is not controlled, and wordsArray maps null text to a null array.
    // Contract pin: null text = empty doc (0 kept, empty rebuild), the
    // same null-in/empty-out contract as the sibling shingle UDFs.
    val rows = Seq((0L, "a b c d e"), (1L, null: String), (2L, "a b c x y"))
      .toDF("doc_id", "text")
    val (out, release) = Dedup.spanDedupReleasable(rows, "doc_id", "text", 3)
    val got = out.orderBy("doc_id")
      .select($"doc_id", $"n_kept", $"cleaned").as[(Long, Long, String)].collect()
    release()
    assert(got(1) === ((1L, 0L, "")), "null text row must survive as empty")
    // the non-null rows still dedup normally around it
    assert(got(0)._2 === 2L && got(2)._2 === 2L)
  }

  test("q1 compact-path domain guards fail loudly, never null (r15 ADVICE)") {
    import graft.queries.Decimals
    // in-domain: exact unscaled DECIMAL(·,8) semantics
    val ok = Seq((904.47, 31.0, 0.05)).toDF("price", "qty", "disc")
      .select(Decimals.q1Unscaled8($"price", $"qty", $"disc").as("k"))
      .as[Long].head()
    assert(ok === 85924650000L) // 904.47 * 0.95 = 859.2465 → ×1e8
    // price >= 1e6 previously null-overflowed the DECIMAL(8,2) cast and
    // silently dropped from sum(); now the row throws
    val bad = Seq((1.0e6, 1.0, 0.0)).toDF("price", "qty", "disc")
      .select(Decimals.q1Unscaled8($"price", $"qty", $"disc"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
    val badQty = Seq((10.0, -1.0, 0.0)).toDF("price", "qty", "disc")
      .select(Decimals.q1Unscaled8($"price", $"qty", $"disc"))
    intercept[Exception](badQty.collect()): Unit
    // the unguarded helper's own ceiling is loud too (longValueExact)
    val over = Seq(Tuple1(1.0e11)).toDF("x")
      .select(Decimals.unscaled8($"x"))
    intercept[Exception](over.collect()): Unit
  }

  test("q1 overflow guard tolerates a legitimately all-null group (r16 ADVICE)") {
    // sum() is null BOTH when a DECIMAL(18,2) partial overflows and when
    // every input in the group is null; the guard keys on the per-column
    // non-null COUNT so the second case returns a null sum instead of
    // aborting with a misleading 'decimal overflow'. Run the REAL registry
    // builder over a lineitem table with one normal and one all-null group.
    val dir = java.nio.file.Files.createTempDirectory("q1null").toString
    Seq(
      ("A", "F", Some(10.0), Some(100.0), Some(0.1)),
      ("A", "F", Some(20.0), Some(200.0), Some(0.0)),
      ("N", "O", None: Option[Double], None: Option[Double], Some(0.0)))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = graft.queries.Registry.byName("q1_pricing_summary")
      .build(spark, dir).collect()
    assert(out.length === 2)
    val a = out.find(_.getString(0) == "A").get
    assert(math.abs(a.getDouble(2) - 30.0) < 1e-9)   // sum_qty
    assert(math.abs(a.getDouble(3) - 300.0) < 1e-9)  // sum_base_price
    assert(math.abs(a.getDouble(4) - 290.0) < 1e-9)  // sum_disc_price
    val n = out.find(_.getString(0) == "N").get
    assert(n.isNullAt(2) && n.isNullAt(3), "all-null group must sum to null, not raise")
    assert(n.getLong(5) === 1L) // count_order still counts the row
  }

  test("cleanCorpus: null-text rows drop at the quality gate; an empty corpus flows through") {
    import graft.ops.CleanCorpus
    // public-op robustness (the spanDedup null-contract class): a null
    // text makes every quality ratio null, and a null predicate filters
    // the row — dropped at stage 2, no NPE anywhere downstream
    val rows = Seq(
      (0L, ("word " * 25).trim),
      (1L, null: String)).toDF("doc_id", "text")
    val (st, release) = CleanCorpus.cleanCorpusReleasable(rows, "doc_id", "text")
    assert(st.corpus.count() === 2L && st.quality.count() === 1L)
    assert(st.decontaminated.select("doc_id").as[Long].collect() === Seq(0L))
    release()
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (st0, release0) = CleanCorpus.cleanCorpusReleasable(empty, "doc_id", "text",
      isHoldout = Some($"doc_id" === 0))
    assert(st0.decontaminated.count() === 0L)
    release0()
  }

  test("cleanCorpus funnel: hand-computed stage counts, preserved schema, released blocks") {
    import graft.ops.CleanCorpus
    // Stage-by-stage hand-computable corpus (quality floor is 20 words):
    //  0: 24-word base doc                          -> survives everything
    //  1: doc 0 with case/whitespace jitter          -> exact-dedup drop
    //     (fingerprint-equal to 0, canonical = min id)
    //  2: doc 0 + trailing "!!!"                     -> near-dedup drop
    //     (punctuation is not a word, so the SHINGLE SET is identical to
    //     doc 0 -> identical minhash signature -> every band agrees ->
    //     candidate guaranteed, jaccard = 1.0; fingerprint differs so it
    //     passes exact dedup -- the deterministic near-dup construction)
    //  3: distinct 24-word doc                       -> survives everything
    //  4: 5-word doc                                 -> quality drop
    //  5: holdout doc (isHoldout hits it)            -> decontamination drop
    //  6: distinct doc sharing ONE 5-gram with doc 5 -> contamination drop
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray"
    val rows = Seq(
      (0L, base),
      (1L, "Alpha  BRAVO " + base.split(" ").drop(2).mkString(" ")),
      (2L, base + " !!!"),
      (3L, "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen " +
        "twenty andone andtwo andthree andfour"),
      (4L, "too short to keep here"),
      (5L, "red orange yellow green blue indigo violet crimson scarlet " +
        "amber gold silver copper bronze pearl ivory jade ruby topaz onyx " +
        "quartz garnet opal beryl"),
      (6L, "wind rain snow hail storm cloud mist fog dew frost blue indigo " +
        "violet crimson scarlet thunder lightning breeze gale cyclone " +
        "typhoon monsoon drizzle sleet")).toDF("doc_id", "text")
    val floor = spark.sparkContext.parallelize(Seq(0), 1).id
    val (st, release) = CleanCorpus.cleanCorpusReleasable(rows, "doc_id", "text",
      isHoldout = Some($"doc_id" === 5))
    assert(st.corpus.count() === 7L)
    assert(st.quality.count() === 6L)
    assert(st.exactDeduped.count() === 5L)
    assert(st.nearDeduped.count() === 4L)
    val fin = st.decontaminated.select("doc_id").as[Long].collect().sorted
    assert(fin === Seq(0L, 3L))
    // every stage frame keeps the INPUT schema — no internal columns leak
    for (f <- Seq(st.quality, st.exactDeduped, st.nearDeduped, st.decontaminated))
      assert(f.columns.toSeq === Seq("doc_id", "text"))
    // the one release handle drops every block the funnel cached
    release()
    val left = spark.sparkContext.getPersistentRDDs.keys.filter(_ >= floor)
    assert(left.isEmpty, s"funnel leaked persisted blocks: ${left.mkString(",")}")
    // no holdout predicate -> decontamination is the identity on stage 4
    val (st2, release2) = CleanCorpus.cleanCorpusReleasable(rows, "doc_id", "text")
    assert(st2.decontaminated.select("doc_id").as[Long].collect().sorted ===
      Seq(0L, 3L, 5L, 6L))
    release2()

    // oversized-holdout safety (r15 ADVICE): decontamination carries NO
    // forced broadcast hint — AQE sizes the holdout side at runtime, so a
    // huge holdout degrades to a shuffled join instead of OOM-ing. Pin the
    // hint's absence in the optimized plan (a ResolvedHint would survive
    // to the join strategy as a requirement; its absence leaves the
    // decision to AQE's size estimate).
    val (st3, release3) = CleanCorpus.cleanCorpusReleasable(rows, "doc_id", "text",
      isHoldout = Some($"doc_id" === 5))
    val plan = st3.decontaminated.queryExecution.optimizedPlan.toString
    // a broadcast() hint survives optimization as the join's
    // "rightHint=(strategy=broadcast)" field (EliminateResolvedHint folds
    // the hint node into the join). Other funnel joins carry their own
    // MEASURED broadcasts (the routed verify's pair join) — pin only the
    // shingle-contamination join: the line joining on _sh must carry no
    // forced strategy.
    val shJoin = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("_sh#")).toSeq
    assert(shJoin.nonEmpty, s"expected a _sh contamination join in:\n$plan")
    assert(shJoin.forall(l => !l.contains("strategy=broadcast")),
      s"decontamination must not force a broadcast — AQE routes by measured size: $shJoin")
    assert(st3.decontaminated.select("doc_id").as[Long].collect().sorted ===
      Seq(0L, 3L))
    release3()
  }
}
