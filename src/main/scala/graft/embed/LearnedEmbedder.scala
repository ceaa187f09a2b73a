package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A REAL learned embedder behind the F1 seam: Spark MLlib Word2Vec trained
  * on the corpus, embedding a text as the L2-normalized mean of its word
  * vectors — the same composition rule `Word2VecModel.transform` applies,
  * reimplemented here so the fitted vocabulary travels inside a plain
  * `Embedder` (serializable, usable from `mapPartitions` like any other).
  *
  * This is the realistic stand-in for the reference's MiniLM ONNX model
  * (`src/embedder/index.ts:257-286`): distributional semantics learned from
  * data, not feature hashing — co-occurring words land near each other, so
  * the ANN recall gates exercise realistic vector geometry instead of the
  * quasi-random directions hashing produces. [[HashedEmbedder]] remains the
  * deterministic default for oracle-checked queries; the
  * same-model-for-index-and-query invariant (reference README.md:270-272)
  * holds for whichever sits behind the seam.
  *
  * The vocabulary map is held driver-side and ships with the closure; a
  * cluster deployment would `broadcast` it once (vocab × dim floats — a few
  * MB for a 100k vocab at dim 64; model size is vocabulary-bounded, not
  * corpus-bounded, so this survives 100 TB of training text).
  */
final class LearnedEmbedder(val dim: Int,
                            vocab: Map[String, Array[Float]]) extends Embedder {

  def vocabSize: Int = vocab.size

  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    var n = 0
    LearnedEmbedder.tokens(t).foreach { w =>
      vocab.get(w).foreach { wv =>
        var i = 0
        while (i < dim) { v(i) += wv(i); i += 1 }
        n += 1
      }
    }
    if (n > 0) {
      var i = 0
      while (i < dim) { v(i) /= n; i += 1 }
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    if (norm > 0) {
      var i = 0
      while (i < dim) { v(i) = (v(i) / norm).toFloat; i += 1 }
    }
    v // all-OOV text => zero vector; cosine paths guard zero norms already
  }
}

object LearnedEmbedder {

  /** training and inference MUST tokenize identically (the embedder twin of
    * same-model-for-index-and-query) */
  private[embed] def tokens(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  /** Fit Word2Vec on `docs(textCol)` and return the serializable embedder.
    * numPartitions=1 + fixed seed makes the fit deterministic — gates that
    * re-run the training get the same geometry. Training cost is one pass
    * over the corpus (maxIter=1), distributed by MLlib; only the fitted
    * vocabulary is collected. */
  def train(docs: DataFrame, textCol: String, dim: Int = 64,
            minCount: Int = 2, seed: Long = 42L, maxIter: Int = 1): LearnedEmbedder = {
    import docs.sparkSession.implicits._
    val tokenized = docs.select(col(textCol).cast("string").as("text"))
      .na.drop().as[String].map(tokens).toDF("tokens")
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("tokens").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount)
      .setSeed(seed).setMaxIter(maxIter).setNumPartitions(1)
      .fit(tokenized)
    val vocab = model.getVectors.collect().map { r =>
      r.getString(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.map(_.toFloat)
    }.toMap
    new LearnedEmbedder(dim, vocab)
  }
}
