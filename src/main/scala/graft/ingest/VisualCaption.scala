package graft.ingest

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** F20 — VLM page captioning, as a seam (reference
  * `src/pdf-visual/captioners/shared.ts:17-21`, `fast.ts:38-122`,
  * `quality.ts:43-149`). The model INFERENCE itself (SmolVLM-256M /
  * Qwen2.5-VL-3B forward passes) is the one part that stays outside the
  * Spark engine — BASELINE.json's "serving requires external system" — but
  * everything around it is in scope and implemented here:
  *
  *   - the `caption(pngBytes, pageNum)` interface a real captioner plugs
  *     into (reference `src/pdf-visual/types.ts:58-60`),
  *   - F17 post-processing of the decoded text (`shared.ts:97-127`),
  *   - the render→caption orchestration over F21's candidate manifest with
  *     PER-PAGE failure tolerance (`src/pdf-visual/index.ts:90-106`: a
  *     thrown error or null caption drops that page's record with a
  *     warning; the file's ingest as a whole succeeds),
  *   - and the distributed corpus sweep: one `binaryFile` pass, captioning
  *     fused into the same task that detects, so a 100 TB corpus never
  *     re-reads its PDFs for the visual stage.
  *
  * A production deployment implements [[Captioner]] over its inference
  * runtime (ONNX/JNI/RPC); executors construct it lazily via the
  * `mkCaptioner` thunk exactly like [[graft.embed.Embedder]]'s seam, so
  * model state is per-executor, never serialized from the driver.
  */
trait Captioner extends Serializable {

  /** Raw decoded model output for one rendered page crop, or None when the
    * model yields nothing (reference `captioner.caption` returning null).
    * May throw — the orchestrator treats a throw as a per-page warning, not
    * a file failure (reference FR-3, `src/pdf-visual/index.ts:22-26`). */
  def caption(pngBytes: Array[Byte], pageNum: Int): Option[String]
}

object Captioner {

  /** reference `shared.ts:96` MAX_CAPTION_LENGTH */
  val MaxCaptionLength = 1000

  /** F17 — post-generation caption processing (reference
    * `shared.ts:97-127`): strip C0 (U+0000–U+001F) and C1 (U+007F–U+009F)
    * control chars except `\n` and `\t`, trim, empty → None, longer than
    * [[MaxCaptionLength]] → truncate + `…`. Shared verbatim with the
    * `f17_clean_truncate` registry query's semantics. */
  def postProcess(decoded: String): Option[String] = {
    val sb = new StringBuilder(decoded.length)
    var i = 0
    while (i < decoded.length) {
      val c = decoded.charAt(i)
      val keep = c == '\n' || c == '\t' ||
        (c > 0x1f && (c < 0x7f || c > 0x9f))
      if (keep) sb += c
      i += 1
    }
    val stripped = sb.result().trim
    if (stripped.isEmpty) None
    else if (stripped.length > MaxCaptionLength)
      Some(stripped.substring(0, MaxCaptionLength) + "…")
    else Some(stripped)
  }

  /** Deterministic stand-in for the VLM — the model seam's test double.
    * Captions are a stable function of the render payload (content digest +
    * payload size + page), so specs and pipelines exercise the full
    * render→caption→post-process→chunk-row path with reproducible output
    * and zero model weights. Pages whose render payload is empty yield
    * None, the reference's "model produced nothing" leg. */
  final class Deterministic extends Captioner {
    def caption(pngBytes: Array[Byte], pageNum: Int): Option[String] = {
      if (pngBytes.isEmpty) None
      else {
        val d = MessageDigest.getInstance("SHA-256").digest(pngBytes)
        val hex = d.take(6).map("%02x".format(_)).mkString
        Some(s"figure $hex (${pngBytes.length} bytes rendered)")
      }
    }
  }
}

/** Distributed F20 orchestration: the `enrichPagesWithCaptions` +
  * `prepareVisualPdfChunks` twins (reference `src/pdf-visual/index.ts`,
  * `src/ingest/visual.ts:100-160`), re-expressed as one corpus pass. */
object VisualCaption {

  /** Rasterization seam (reference `renderer.ts:29` — mupdf DrawDevice at
    * 200 DPI, module-private constant). A real pixmap needs a PDF raster
    * engine the offline JVM doesn't ship, so the stand-in packs what the
    * renderer's contract guarantees downstream — a byte payload that is a
    * pure function of (document, page, crop rect) — from the page's raw
    * content streams plus the crop geometry. The captioner interface only
    * sees bytes either way; swapping in a real renderer changes no
    * signature. Deterministic: same doc/page/crop → same payload. */
  val RenderDpi = 200

  def renderPage(docBytes: Array[Byte], page: Int,
                 crop: Option[VisualDetector.Rect]): Array[Byte] = {
    val content = PdfTextParser.pageContentBytes(docBytes, page)
    val header = crop match {
      case Some(r) => f"render p$page dpi$RenderDpi crop ${r.x0}%.2f ${r.y0}%.2f ${r.x1}%.2f ${r.y1}%.2f\n"
      case None => s"render p$page dpi$RenderDpi full-page\n"
    }
    val h = header.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](h.length + content.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(content, 0, out, h.length, content.length)
    out
  }

  /** Per-page caption record, post-processed: reference `VisualCaption`
    * (`src/pdf-visual/index.ts:85-88`) — text WITHOUT the wrapper; the
    * chunk-building layer applies `[Visual content on page N: …]`. */
  final case class PageCaption(page: Int, text: String)

  /** Caption one already-loaded document: detect (F21) → render → caption →
    * post-process, per-page failures tolerated. Pure per document, so the
    * distributed sweep parallelizes by file with no shuffle. */
  def captionDoc(docBytes: Array[Byte], captioner: Captioner): Seq[PageCaption] =
    VisualDetector.detect(docBytes).filter(_.isCandidate).flatMap { cand =>
      try {
        val png = renderPage(docBytes, cand.page, cand.cropRect)
        captioner.caption(png, cand.page).flatMap(Captioner.postProcess)
          .map(PageCaption(cand.page, _))
      } catch {
        case e: Exception =>
          // reference index.ts:24-26: warning-level, page falls back to
          // text-only; the document's other pages are unaffected
          System.err.println(
            s"visual caption failed for page ${cand.page}: ${e.getMessage}")
          None
      }
    }

  /** The caption chunk text wrapper (reference `src/ingest/visual.ts:151-159`
    * — applied at the ingest layer so the chunk text matches the historical
    * marker format downstream search expects). */
  def wrap(c: PageCaption): String =
    s"[Visual content on page ${c.page}: ${c.text}]"

  /** Corpus-scale sweep: raw(filePath, content: binary) → one row per
    * captioned page (filePath, page, caption). Detection, rendering, and
    * captioning are fused into the binaryFile scan's own tasks — the
    * distributed twin of the reference's per-file orchestrator loop, with
    * the captioner constructed lazily per executor. */
  def captionsDF(spark: SparkSession, raw: DataFrame,
                 mkCaptioner: () => Captioner): DataFrame = {
    import spark.implicits._
    raw.select("filePath", "content").as[(String, Array[Byte])]
      .mapPartitions { it =>
        val captioner = mkCaptioner()
        it.flatMap { case (p, bytes) =>
          captionDoc(bytes, captioner).map(c => (p, c.page, c.text))
        }
      }
      .toDF("filePath", "page", "caption")
  }
}
