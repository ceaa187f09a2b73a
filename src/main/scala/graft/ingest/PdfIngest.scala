package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-side PDF ingestion: [[PdfTextParser]] (pure per-doc byte parse)
  * feeding the existing F15/F16 relational pipeline ([[PdfBoundaryFilter]]).
  * One `binaryFile` pass; items, lines, boundary patterns and the strip are
  * all DataFrame stages — the same shapes the fixture-driven queries pin.
  *
  * The returned docs carry `rawHash` = sha-256 of the file BYTES decoded as
  * UTF-8 — the exact value the sync manifest computes for every file — so
  * change detection keeps working even though the stored row's `text` is
  * the extracted text, not the bytes. Without this override a synced PDF
  * would re-upsert forever (stored hash of extracted text ≠ manifest hash
  * of raw bytes).
  */
object PdfIngest {

  def isPdf(path: String): Boolean = path.toLowerCase.endsWith(".pdf")

  /** raw(filePath, content: binary) →
    * (filePath, content: extracted text, rawHash, titleOverride).
    * Documents whose parse yields no text produce NO row — the caller's
    * zero-chunk semantics (count empty, preserve existing rows) apply. */
  def pdfDocsDF(spark: SparkSession, raw: DataFrame,
                mkEmbedder: () => graft.embed.Embedder): DataFrame = {
    import spark.implicits._
    val items = raw.select("filePath", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        PdfTextParser.parseItems(bytes)
          .map(it => (p, it.page, it.x, it.y, it.fontSize, it.text))
      }
      .toDF("doc_id", "page", "x", "y", "font_size", "item")
    val lines = PdfBoundaryFilter.assembleLines(items)
    val patterns = PdfBoundaryFilter.boundaryPatterns(lines, mkEmbedder)
    val stripped = PdfBoundaryFilter.stripBoundaries(lines, patterns)
    val text = stripped
      .filter(length(col("text")) > 0)
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("page"), col("text")))),
        x => x.getField("text")), "\n\n").as("content"))
    // per-file facts ride a narrow projection of the same scan: the manifest
    // hash (decode parity with the sync planner) and the Info-dict title
    val meta = pdfMetaDF(raw).withColumnRenamed("filePath", "doc_id")
    text.join(meta, Seq("doc_id"))
      .select(col("doc_id").as("filePath"), col("content"),
        col("rawHash"), col("titleOverride"))
  }

  /** Per-file PDF facts for EVERY file in the scan (independent of whether
    * text extraction produced anything): the raw-bytes manifest hash and
    * the Info-dict title. Shared by text ingest and the visual (F20) path,
    * where a text-empty PDF can still ingest caption-only. */
  def pdfMetaDF(raw: DataFrame): DataFrame = {
    val titleUdf = udf((b: Array[Byte]) => PdfTextParser.docTitle(b))
    raw.select(col("filePath"),
      Ingest.utf8LossyHash(col("content")).as("rawHash"),
      titleUdf(col("content")).as("titleOverride"))
  }

  /** F21 — raw(filePath, content: binary) → one row per page:
    * (filePath, page, isCandidate, x0, y0, x1, y1), the crop columns null
    * for non-candidates and full-page-fallback candidates. This is the
    * work manifest the external F20 captioner consumes: same `binaryFile`
    * scan as text extraction, [[VisualDetector.detect]] pure per document,
    * so the candidate sweep of a corpus is one distributed pass. */
  def visualCandidatesDF(spark: SparkSession, raw: DataFrame): DataFrame = {
    import spark.implicits._
    raw.select("filePath", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        VisualDetector.detect(bytes).map { r =>
          val c = r.cropRect
          (p, r.page, r.isCandidate,
            c.map(_.x0), c.map(_.y0), c.map(_.x1), c.map(_.y1))
        }
      }
      .toDF("filePath", "page", "isCandidate", "x0", "y0", "x1", "y1")
  }
}
