package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.core.GraftSession
import graft.ops.WordPiece

/** WordPiece training + encoding (`ops/WordPiece.scala`). The distributed
  * learner's TWO delta-maintained tables (pair counts AND symbol
  * marginals — the score denominator) are cross-validated merge-for-merge
  * against the sequential reference [[WordPiece.learnLocal]] over
  * randomized corpora; greedy longest-match encoding is property-gated
  * (lossless round-trip on in-vocab words, [UNK] on alphabet misses). */
class WordPieceSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(1234L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def wordCountsOf(texts: Seq[String]): Seq[(String, Long)] =
    texts.flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq

  test("score argmax differs from raw-count BPE where marginals dominate") {
    // (l,##o) count 10 but its parts are everywhere (10 each → 0.1);
    // (##s,##t) has count 5 with marginals 5/5 → 0.2: the
    // likelihood-ratio argmax picks it where raw-count BPE would not
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(3)("lowest") ++ Seq.fill(2)("ost")).mkString(" ")
    val merges = WordPiece.learnLocal(wordCountsOf(Seq(corpus)), 1)
    assert(merges.head.left === "##s" && merges.head.right === "##t")
    assert(merges.head.merged === "##st")
    assert(merges.head.pairCount === 5L && merges.head.score === 0.2)
  }

  test("## continuation marks survive merges; pieces are BERT-form") {
    val corpus = Seq.fill(6)("abc").mkString(" ")
    val merges = WordPiece.learnLocal(wordCountsOf(Seq(corpus)), 2)
    // whichever pair wins first, every merged piece strips the inner ##
    // and keeps the leading marker iff it starts mid-word
    assert(merges.nonEmpty)
    merges.foreach { m =>
      assert(!m.merged.substring(2.min(m.merged.length)).contains("##"))
      if (m.left.startsWith("##")) assert(m.merged.startsWith("##"))
    }
  }

  test("distributed learner equals the sequential reference, K=1 and K=8") {
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val textGen = Gen.choose(8, 60).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.listOfN(3, textGen), 6) { texts =>
      val df = texts.toDF("text")
      val wc = wordCountsOf(texts)
      for (k <- Seq(1, 8)) {
        val dist = WordPiece.learn(df, "text", numMerges = 12, minCount = 2,
          batchK = k)
        val local = WordPiece.learnLocal(wc, numMerges = 12, minCount = 2,
          batchK = k)
        assert(dist === local, s"batchK=$k corpus=${texts.take(1)}")
      }
    }
  }

  test("greedy longest-match encode: round-trip, ## joins, [UNK]") {
    val vocab = Set("a", "b", "un", "hash", "##ing", "##s", "##h", "##a",
      "##b", "u", "##n")
    assert(WordPiece.segmentWord("hashing", vocab) === Seq("hash", "##ing"))
    assert(WordPiece.segmentWord("hashings", vocab) === Seq("hash", "##ing", "##s"))
    // longest match wins over shorter compositions
    assert(WordPiece.segmentWord("un", vocab) === Seq("un"))
    // alphabet miss anywhere → whole word [UNK] (BERT semantics)
    assert(WordPiece.segmentWord("axe", vocab) === Seq("[UNK]"))
    // round-trip: stripping ## reassembles the word exactly
    val pieces = WordPiece.segmentWord("hashab", vocab)
    assert(pieces.head + pieces.tail.map(_.substring(2)).mkString === "hashab")
  }

  test("corpus encode: vocabulary covers the alphabet, tokens reassemble") {
    val texts = Seq("spark shuffles partition data", "spark parts data fast",
      "shuffle partitions share data")
    val df = texts.toDF("text")
    val merges = WordPiece.learn(df, "text", numMerges = 10, minCount = 2)
    val vocab = WordPiece.vocabulary(df, "text", merges)
    val rows = WordPiece.encode(df, "text", vocab)
      .select("tokens").as[Seq[String]].collect()
    // every corpus word is alphabet-covered → no [UNK]; the token stream
    // reassembles each document's words in order
    rows.zip(texts).foreach { case (tokens, text) =>
      assert(!tokens.contains("[UNK]"))
      val rebuilt = tokens.foldLeft(Seq.empty[String]) { (acc, t) =>
        if (t.startsWith("##")) acc.init :+ (acc.last + t.substring(2))
        else acc :+ t
      }
      assert(rebuilt === "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq)
    }
  }
}
