package graft.embed

import scala.util.hashing.MurmurHash3

/** The pluggable embedder seam (reference `EmbedderInterface { embedBatch }`,
  * `src/chunker/semantic-chunker.ts:29-31`). The invariant that matters is
  * same-model-for-index-and-query (reference README.md:270-272) — which
  * embedder sits behind the trait is swappable.
  *
  * In the reference this is ONNX MiniLM (384-dim, mean-pooled, normalized).
  * This build is offline/zero-egress, so the default implementation is a
  * deterministic feature-hashing embedder: word + char-3-gram features hashed
  * into `dim` buckets with a sign hash, log-scaled counts, L2-normalized.
  * Same structural properties the pipeline depends on: fixed dim, unit norm,
  * lexical similarity ⇒ cosine similarity, cheap + deterministic on any JVM.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  final def embed(text: String): Array[Float] = embedBatch(Seq(text)).head
}

final class HashedEmbedder(val dim: Int = 64, seed: Int = 42) extends Embedder {

  private def features(text: String): Iterator[String] = {
    val lower = text.toLowerCase
    val words = "[a-z0-9]+".r.findAllIn(lower).toList
    val trigrams = lower.sliding(3).filter(_.length == 3)
    words.iterator ++ words.iterator.map("w2:" + _) ++ trigrams
  }

  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    features(t).foreach(f => counts.update(f, counts.getOrElse(f, 0) + 1))
    for ((f, c) <- counts) {
      val h = MurmurHash3.stringHash(f, seed)
      val idx = math.floorMod(h, dim)
      val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
      v(idx) += sign * (1.0 + math.log(c.toDouble)).toFloat
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    if (norm > 0) { var i = 0; while (i < dim) { v(i) = (v(i) / norm).toFloat; i += 1 } }
    v
  }
}
