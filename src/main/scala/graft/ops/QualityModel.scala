package graft.ops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage real corpus builds
  * run after (and trained FROM) rule filters: the public CCNet / GPT-3-era
  * recipe bootstraps a linear classifier from weak labels and uses its
  * calibrated score where hard rules are too blunt. Here the weak label is
  * the Gopher rule verdict ([[TextAnalysis.gopherRules]] `keep`) and the
  * features are the per-document measurements those rules read — all
  * scan-speed column expressions, so featurization adds no corpus pass.
  * MLlib's LogisticRegression does the fitting (same seam discipline as
  * the Word2Vec embedder): training reduces over a features aggregate,
  * scoring is one broadcast-model projection per row.
  *
  * What the model adds over the rules it learned from: a CONTINUOUS
  * `p_keep` that ranks borderline documents (the rules only bisect), which
  * is what per-stratum budget cuts threshold against. The spec gates that
  * the score (a) recovers the rule labels almost perfectly when
  * thresholded at 0.5 and (b) orders rule-violating docs below rule-clean
  * ones on average — learned generalization, not memorized row identity.
  */
object QualityModel {

  val FeatureNames: Seq[String] = Seq(
    "log_n_words", "mean_word_len", "symbol_ratio", "bullet_ratio",
    "ellipsis_ratio", "alpha_word_ratio", "n_stopwords", "quality")

  /** (id, label, f0..f7) — weak label + the rule measurements as features.
    * The label is the MULTILINGUAL-SAFE rule subset (word floor + format
    * ratios — the same stage-1 filter the cleaning funnel applies): the
    * full Gopher set's stopword/mean-word-length rules are English priors
    * that degenerate to all-drop on a multilingual corpus, and a
    * single-class label trains nothing. */
  def featurize(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val g = TextAnalysis.gopherRules(col(textCol))
    val label = g.getField("n_words").between(20, 100000) &&
      g.getField("symbol_ratio") < 0.1 &&
      g.getField("bullet_ratio") <= 0.9 &&
      g.getField("ellipsis_ratio") <= 0.3
    docs.select(
      col(idCol).as("id"),
      label.cast("double").as("label"),
      log1p(g.getField("n_words").cast("double")).as("log_n_words"),
      g.getField("mean_word_len").as("mean_word_len"),
      g.getField("symbol_ratio").as("symbol_ratio"),
      g.getField("bullet_ratio").as("bullet_ratio"),
      g.getField("ellipsis_ratio").as("ellipsis_ratio"),
      g.getField("alpha_word_ratio").as("alpha_word_ratio"),
      g.getField("n_stopwords").cast("double").as("n_stopwords"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
  }

  /** fit LR on the weak labels and score every document; returns
    * (id, label, p_keep). Deterministic: zero-init L-BFGS over a fixed
    * feature set — no RNG in the pipeline. */
  def trainScore(feats: DataFrame, maxIter: Int = 50,
                 regParam: Double = 0.01): DataFrame = {
    val toVec = udf((r: Row) =>
      Vectors.dense(FeatureNames.indices.map(i => r.getDouble(i)).toArray))
    val assembled = feats.withColumn("features",
      toVec(struct(FeatureNames.map(col): _*)))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(true)
      .fit(assembled)
    val p1 = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(assembled)
      .select(col("id"), col("label"), p1(col("probability")).as("p_keep"))
  }
}
