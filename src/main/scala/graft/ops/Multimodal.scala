package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The decode step is STUBBED — no image/audio codecs exist in this
  * container — with a deterministic fake (byte statistics standing in for
  * pixel statistics). Everything Spark-side is real: binary column schema,
  * mapPartitions batch shape, frame-range arithmetic, and the
  * partitioning-friendly layout (payload stays columnar, metadata is a
  * pruned struct — a scan that only needs metadata never reads payload
  * bytes at 100 TB).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("codec", StringType, nullable = false))), nullable = false)))

  /** derive a media table from a text corpus (payload = utf8 bytes — a
    * deterministic stand-in for real image/audio bytes) */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        col(sourceCol).as("source"),
        length(col(textCol).cast("binary")).cast("long").as("bytes"),
        lit("raw/v1").as("codec")).as("meta"))

  /** Decode stub via mapPartitions (the real-model seam): deterministic
    * byte statistics stand in for decoded features. Batch shape, schema and
    * null-safety are production-real; the `???` is the codec call. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = media.schema
      .add("feat_mean", DoubleType).add("feat_max", IntegerType)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      // val codec = loadCodec()   <- real decoder would initialize here, once
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // STUB: real impl decodes pixels/samples; fake = byte statistics
        val mean = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        val mx = if (bytes.isEmpty) 0 else bytes.map(_ & 0xff).max
        Row.fromSeq(r.toSeq :+ (math.rint(mean * 100) / 100) :+ mx)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stub: deterministic payload downsampling (every `factor`-th
    * byte) standing in for pixel-grid resampling. The Spark-side contract is
    * real — binary in, smaller binary out, per-row projection, metadata
    * updated — the byte math is the `???` a codec would replace. */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val f = udf((payload: Array[Byte]) =>
      payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b })
    media
      .withColumn("payload", f(col("payload")))
      .withColumn("meta", struct(
        col("meta.source").as("source"),
        length(col("payload")).cast("long").as("bytes"),
        concat(col("meta.codec"), lit(s"/resized-1:$factor")).as("codec")))
  }

  /** frame sampling: split payload into `n` contiguous byte ranges (last
    * frame takes the remainder); per-row generator, no shuffle */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("frame_len", expr(s"CAST(length(payload) DIV $n AS INT)"))
      .select(col("media_id"), col("modality"),
        posexplode(expr(
          s"""transform(sequence(0, $n - 1), i ->
             |  CASE WHEN i < $n - 1
             |       THEN substring(payload, i * frame_len + 1, frame_len)
             |       ELSE substring(payload, i * frame_len + 1, length(payload) - i * frame_len)
             |  END)""".stripMargin)).as(Seq("frame_idx", "frame")))
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
}
