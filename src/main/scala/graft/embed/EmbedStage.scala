package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Distributed embedding stage: `mapPartitions` with one embedder instance
  * per partition and batched calls — the Spark twin of the reference's
  * batch-of-16 ONNX inference (`src/embedder/index.ts:294-392`,
  * `src/server/index.ts:290-294`). A per-row UDF would re-enter the model
  * once per row; batching amortizes it and keeps the door open for a real
  * model runtime behind the same trait.
  *
  * Batches are length-sorted before embedding — the skew mitigation the
  * reference implements as padding-amplification outlier deferral
  * (`src/embedder/index.ts:56-93`): grouping similar-length texts bounds
  * wasted padding compute for any batched model runtime. For the hashing
  * embedder it is a no-op cost-wise but keeps the contract visible.
  */
object EmbedStage {

  val BatchSize = 16

  def withEmbeddings(df: DataFrame, textCol: String, vecCol: String,
                     mkEmbedder: () => Embedder,
                     batchSize: Int = BatchSize): DataFrame = {
    val schema = df.schema.add(vecCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      val embedder = mkEmbedder()
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(textIdx)).getOrElse(""))
        // padding-skew guard: evict outliers from the padded batch and embed
        // them solo (reference outlier deferral, embedder/index.ts:56-93)
        val (main, deferred) = BatchPlanner.planBatch(texts.map(_.length))
        val out = new Array[Array[Float]](batch.size)
        val mainVecs = embedder.embedBatch(main.map(texts))
        main.zip(mainVecs).foreach { case (i, v) => out(i) = v }
        deferred.foreach(i => out(i) = embedder.embed(texts(i)))
        batch.zip(out).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(enc)
  }
}
