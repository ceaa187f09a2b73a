package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.core.GraftSession
import graft.ops.Bpe

/** BPE vocabulary training (`ops/Bpe.scala`). The distributed learner's
  * delta-maintained pair counts are cross-validated merge-for-merge against
  * the sequential reference [[Bpe.learnLocal]] — any drift in the deltas
  * eventually flips an argmax, so merge-table equality over randomized
  * corpora is the correctness gate for the incremental maintenance. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  /** minimal deterministic property runner (scalatestplus is not on the
    * offline classpath; plain scalacheck Gen + fixed seeds) */
  private def forAll[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
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

  test("learns the textbook merge sequence on a hand corpus") {
    // 'lo' dominates: low(5) lower(2) lowest(3) → pair (l,o) count 10
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(3)("lowest")).mkString(" ")
    val df = Seq(docs).toDF("text")
    val merges = Bpe.learn(df, "text", numMerges = 3, minCount = 2)
    assert(merges.head.left === "l" && merges.head.right === "o" &&
      merges.head.pairCount === 10)
    assert(merges(1).left === "lo" && merges(1).right === "w" &&
      merges(1).pairCount === 10)
    // after (lo,w): low(5) + lowe(2+3=5 as 'low','e') → (low,e) count 5
    assert(merges(2).left === "low" && merges(2).right === "e" &&
      merges(2).pairCount === 5)
  }

  test("distributed merges equal the sequential reference on random corpora") {
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpusGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, wordGen))
    forAll(corpusGen, n = 12) { words =>
      val text = words.mkString(" ")
      val df = Seq(text).toDF("text")
      val dist = Bpe.learn(df, "text", numMerges = 8, minCount = 2)
      val local = Bpe.learnLocal(wordCountsOf(Seq(text)), numMerges = 8,
        minCount = 2)
      assert(dist === local)
    }
  }

  test("deterministic tiebreak: equal counts resolve (left asc, right asc)") {
    // "ab" and "cd" both appear twice, disjoint pairs, same count
    val df = Seq("ab ab cd cd").toDF("text")
    val merges = Bpe.learn(df, "text", numMerges = 2, minCount = 2)
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "b"), ("c", "d")))
    assert(merges.forall(_.pairCount === 2))
  }

  test("minCount stops the ladder; empty/short corpora learn nothing") {
    val df = Seq("xy xy qq").toDF("text")
    // (x,y)=2 qualifies at minCount=2; (q,q)=1 does not
    assert(Bpe.learn(df, "text", numMerges = 10, minCount = 2)
      .map(m => (m.left, m.right)) === Seq(("x", "y")))
    assert(Bpe.learn(Seq("a b c").toDF("text"), "text", 5) === Seq.empty)
    assert(Bpe.learn(Seq.empty[String].toDF("text"), "text", 5) === Seq.empty)
  }

  test("encode applies merges greedily by rank; tokens reassemble the word") {
    val train = Seq(("low low low low low lower lowest newest newest")).toDF("text")
    val merges = Bpe.learn(train, "text", numMerges = 6, minCount = 2)
    val toks = Bpe.encode(Seq("lowest newlow").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].collect().head
    // segmentation may vary with the learned table, but token concat must
    // reassemble each word exactly, in order
    assert(toks.mkString === "lowestnewlow")
    // and the dominant word's learned unit is used whole
    val lowToks = Bpe.encode(Seq("low").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].collect().head
    assert(lowToks === Seq("low"))
  }

  test("encode matches a by-hand greedy application") {
    val merges = Seq(
      Bpe.Merge(0, "l", "o", "lo", 10),
      Bpe.Merge(1, "e", "s", "es", 8),
      Bpe.Merge(2, "lo", "w", "low", 7),
      Bpe.Merge(3, "es", "t", "est", 6))
    val toks = Bpe.encode(Seq("lowest").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].collect().head
    // l o w e s t → lo (r0) → es (r1) → low (r2) → est (r3)
    assert(toks === Seq("low", "est"))
  }
}
