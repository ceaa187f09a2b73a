package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chunker.MaxMinChunker
import graft.embed.{HashedEmbedder, LearnedEmbedder}

class EmbedderSpec extends AnyFunSuite {

  private val e = new HashedEmbedder(64)
  private lazy val spark = graft.core.GraftSession.local(4)

  test("deterministic across instances and calls") {
    val e2 = new HashedEmbedder(64)
    assert(e.embed("spark joins tables").toSeq === e2.embed("spark joins tables").toSeq)
    assert(e.embed("abc").toSeq === e.embed("abc").toSeq)
  }

  test("fixed dim and unit norm for non-empty text") {
    val v = e.embed("hello world of embeddings")
    assert(v.length === 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty text gives zero vector") {
    assert(e.embed("").forall(_ == 0.0f))
  }

  test("lexically similar texts are more similar than dissimilar ones") {
    val a = e.embed("spark executes distributed join queries")
    val b = e.embed("spark executes distributed join pipelines")
    val c = e.embed("pasta tomato basil olive oil")
    val simAB = MaxMinChunker.cosineSimilarity(a, b)
    val simAC = MaxMinChunker.cosineSimilarity(a, c)
    assert(simAB > simAC)
    assert(simAB > 0.5)
  }

  test("batch equals per-item embedding") {
    val texts = Seq("one two three", "four five six", "")
    val batch = e.embedBatch(texts)
    texts.zip(batch).foreach { case (t, v) => assert(v.toSeq === e.embed(t).toSeq) }
  }

  test("learned embedder: deterministic fit, unit norm, OOV handling, batch parity") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, "spark executes distributed join queries over partitioned tables " +
          "with shuffle exchange and broadcast joins across many executors")
      else
        (i.toLong, "simmer the tomato sauce with basil garlic and olive oil " +
          "then toss the fresh pasta gently in the warm pan")
    }.toDF("doc_id", "text")
    val le = LearnedEmbedder.train(docs, "text", dim = 16, minCount = 1, maxIter = 3)
    val le2 = LearnedEmbedder.train(docs, "text", dim = 16, minCount = 1, maxIter = 3)
    assert(le.vocabSize > 20)
    // deterministic: same corpus + seed => identical geometry
    assert(le.embed("spark shuffle joins").toSeq === le2.embed("spark shuffle joins").toSeq)
    // unit norm for in-vocab text
    val v = le.embed("distributed join shuffle")
    assert(v.length === 16)
    assert(math.abs(math.sqrt(v.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-5)
    // all-OOV text => zero vector (cosine paths guard zero norms)
    assert(le.embed("zzzqqq xxyyzz").forall(_ == 0.0f))
    // batch equals per-item
    val texts = Seq("spark joins", "tomato basil pasta", "")
    le.embedBatch(texts).zip(texts).foreach { case (bv, t) =>
      assert(bv.toSeq === le.embed(t).toSeq)
    }
  }

  test("learned embedder: distributional similarity groups topical texts") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0)
        (i.toLong, "spark executes distributed join queries over partitioned tables " +
          "with shuffle exchange and broadcast joins across many executors")
      else
        (i.toLong, "simmer the tomato sauce with basil garlic and olive oil " +
          "then toss the fresh pasta gently in the warm pan")
    }.toDF("doc_id", "text")
    val le = LearnedEmbedder.train(docs, "text", dim = 16, minCount = 1, maxIter = 5)
    val a = le.embed("spark executes distributed queries")
    val b = le.embed("shuffle exchange over partitioned tables")
    val c = le.embed("tomato basil olive oil pasta")
    val simAB = MaxMinChunker.cosineSimilarity(a, b)
    val simAC = MaxMinChunker.cosineSimilarity(a, c)
    assert(simAB > simAC,
      s"within-topic $simAB should beat cross-topic $simAC on learned vectors")
  }
}
