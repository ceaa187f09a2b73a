package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chunker.MaxMinChunker
import graft.embed.HashedEmbedder

class EmbedderSpec extends AnyFunSuite {

  private val e = new HashedEmbedder(64)

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
}
