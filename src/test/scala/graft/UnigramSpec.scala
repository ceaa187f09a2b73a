package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.Unigram

/** Unigram-LM tokenizer training (`ops/Unigram.scala`) — the algorithmic
  * gates: Viterbi segmentation against brute-force enumeration, soft-EM
  * expected counts against a sequential forward-backward reference, EM
  * monotonicity of the corpus log-likelihood, coverage invariants of the
  * learned vocabulary, and encode determinism. */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private val rng = new scala.util.Random(42)

  /** all segmentations of `word` into pieces of length ≤ MaxPieceLen */
  private def allSegmentations(word: String): Seq[Seq[String]] =
    if (word.isEmpty) Seq(Seq.empty)
    else (1 to math.min(word.length, Unigram.MaxPieceLen)).flatMap { k =>
      allSegmentations(word.drop(k)).map(word.take(k) +: _)
    }

  /** sequential reference: expected counts + log-likelihood by enumerating
    * every segmentation (exponential — only for short words) */
  private def bruteForceExpected(word: String, freq: Long,
      lp: Map[String, Double]): (Map[String, Double], Double) = {
    val segs = allSegmentations(word)
      .filter(_.forall(lp.contains))
      .map(seg => (seg, seg.map(lp).sum))
    if (segs.isEmpty) (Map.empty, 0.0)
    else {
      val m = segs.map(_._2).max
      val z = m + math.log(segs.map(s => math.exp(s._2 - m)).sum)
      val counts = scala.collection.mutable.HashMap.empty[String, Double]
      segs.foreach { case (seg, s) =>
        val w = math.exp(s - z)
        seg.foreach(p => counts.update(p, counts.getOrElse(p, 0.0) + w * freq))
      }
      (counts.toMap, z * freq)
    }
  }

  private def randomVocab(word: String): Map[String, Double] = {
    // all chars + a random half of the substrings, random log-probs
    val subs = for {
      i <- 0 until word.length
      j <- (i + 1) to math.min(word.length, i + Unigram.MaxPieceLen)
    } yield word.substring(i, j)
    val multi = subs.filter(_.length > 1).distinct.filter(_ => rng.nextBoolean())
    val all = (subs.filter(_.length == 1) ++ multi).distinct
    all.map(p => p -> (-1.0 - 5.0 * rng.nextDouble())).toMap
  }

  test("viterbi finds the max-probability segmentation (vs brute force, 200 random cases)") {
    (1 to 200).foreach { _ =>
      val word = (1 to (1 + rng.nextInt(9)))
        .map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val lp = randomVocab(word)
      val got = Unigram.viterbi(word, lp).get
      assert(got.mkString("") === word) // concatenation invariant
      assert(got.forall(lp.contains))
      val bestBrute = allSegmentations(word).filter(_.forall(lp.contains))
        .map(seg => seg.map(lp).sum).max
      assert(math.abs(got.map(lp).sum - bestBrute) < 1e-9,
        s"word=$word viterbi=${got.mkString("|")} score=${got.map(lp).sum} brute=$bestBrute")
    }
  }

  test("forward-backward expected counts match brute-force enumeration (100 random cases)") {
    (1 to 100).foreach { _ =>
      val word = (1 to (1 + rng.nextInt(7)))
        .map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val freq = 1L + rng.nextInt(50)
      val lp = randomVocab(word)
      val (gotIt, gotLL) = Unigram.expectedCounts(word, freq, lp)
      val got = gotIt.toSeq.groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).sum }
      val (want, wantLL) = bruteForceExpected(word, freq, lp)
      assert(math.abs(gotLL - wantLL) < 1e-6 * math.max(1.0, math.abs(wantLL)))
      want.foreach { case (p, v) =>
        val g = got.getOrElse(p, 0.0)
        assert(math.abs(g - v) < 1e-6 * math.max(1.0, v),
          s"word=$word piece=$p got=$g want=$v")
      }
      // nothing extra above the pruning epsilon
      got.foreach { case (p, v) =>
        assert(want.contains(p) || v < 1e-6, s"unexpected piece $p=$v")
      }
    }
  }

  private def corpusDF = {
    import spark.implicits._
    val docs = Seq.tabulate(60) { i =>
      val base = Seq("the quick brown fox jumps over the lazy dog",
        "training data pipelines deduplicate and tokenize text corpora",
        "unigram language models segment words into subword pieces")(i % 3)
      (i.toLong, base + s" document $i with extra tokens ${i % 7}")
    }
    docs.toDF("doc_id", "text")
  }

  test("EM is monotonic: log-likelihood never decreases across 5 EM rounds") {
    // sequential EM on a word dict using the SAME forward-backward kernel
    // learn() distributes — the textbook EM gate, isolated from pruning
    val dict = Seq(("tokenize", 40L), ("tokens", 25L), ("token", 30L),
      ("broken", 10L), ("akenized", 5L), ("zine", 8L), ("ken", 12L))
    val chars = dict.flatMap(_._1.toSeq).distinct.map(_.toString)
    val subs = dict.flatMap { case (w, _) =>
      for { i <- 0 until w.length
            j <- (i + 1) to math.min(w.length, i + Unigram.MaxPieceLen) }
        yield w.substring(i, j)
    }.distinct
    var vocab: Map[String, Double] = {
      val all = (chars ++ subs).distinct
      all.map(p => p -> math.log(1.0 / all.size)).toMap
    }
    def ll(v: Map[String, Double]): Double =
      dict.map { case (w, c) => Unigram.expectedCounts(w, c, v)._2 }.sum
    var prev = ll(vocab)
    (1 to 5).foreach { round =>
      val counts = scala.collection.mutable.HashMap.empty[String, Double]
      dict.foreach { case (w, c) =>
        Unigram.expectedCounts(w, c, vocab)._1.foreach { case (p, v) =>
          counts.update(p, counts.getOrElse(p, 0.0) + v)
        }
      }
      val total = counts.values.sum
      vocab = counts.map { case (p, v) => p -> math.log(v / total) }.toMap ++
        chars.filterNot(counts.contains).map(c => c -> math.log(1e-9 / total))
      val cur = ll(vocab)
      assert(cur >= prev - 1e-9 * math.abs(prev),
        s"EM round $round decreased LL: $prev -> $cur")
      prev = cur
    }
  }

  test("distributed log-likelihood equals the sequential sum over the word dict") {
    import spark.implicits._
    val pieces = Unigram.learn(corpusDF, "text", targetSize = 120, seedSize = 600)
    val lp = pieces.map(p => p.piece -> p.logProb).toMap
    val distributed = Unigram.corpusLogLikelihood(corpusDF, "text", pieces)
    val dict = corpusDF.select(
        org.apache.spark.sql.functions.explode(
          graft.ops.Dedup.wordsArray("text")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect()
    val sequential = dict.map { case (w, c) =>
      Unigram.expectedCounts(w, c, lp)._2 }.sum
    assert(math.abs(distributed - sequential) <
      1e-9 * math.max(1.0, math.abs(sequential)))
  }

  test("learned vocab: bounded size, total coverage, deterministic across runs") {
    val pieces = Unigram.learn(corpusDF, "text", targetSize = 120, seedSize = 600)
    val lp = pieces.map(p => p.piece -> p.logProb).toMap
    assert(pieces.size <= 600)
    // every corpus char is a piece → every corpus word segments
    val words = corpusDF.collect().flatMap(
      _.getString(1).toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
    words.foreach { w =>
      val seg = Unigram.viterbi(w, lp)
      assert(seg.isDefined && seg.get.mkString("") === w, s"uncovered word $w")
    }
    // multi-char pieces were actually learned (the corpus repeats heavily)
    assert(pieces.count(_.piece.length > 1) > 10)
    // determinism: a second run produces the identical table
    val again = Unigram.learn(corpusDF, "text", targetSize = 120, seedSize = 600)
    assert(again === pieces)
  }

  test("encode: viterbi application round-trips and is map-side deterministic") {
    import spark.implicits._
    val pieces = Unigram.learn(corpusDF, "text", targetSize = 120, seedSize = 600)
    val enc = Unigram.encode(corpusDF, "text", pieces)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.concat_ws("", org.apache.spark.sql.functions.col("tokens")).as("glued"))
      .as[(Long, String)].collect().toMap
    corpusDF.as[(Long, String)].collect().foreach { case (id, text) =>
      val wordsGlued = "[a-z0-9]+".r.findAllIn(text.toLowerCase).mkString("")
      assert(enc(id) === wordsGlued, s"doc $id round-trip")
    }
  }
}
