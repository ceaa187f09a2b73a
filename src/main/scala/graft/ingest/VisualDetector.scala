package graft.ingest

import scala.collection.mutable

import PdfTextParser._

/** F21 — visual-candidate detection, byte-level.
  *
  * The reference decides per PDF page whether the downstream renderer +
  * VLM captioner should run (`src/pdf-visual/detector.ts:1-309`): a page is
  * a candidate when its meaningful image area or vector-stroke density
  * says "there's a figure here", and the output carries a padded crop rect
  * for the renderer. The *decision geometry* is pure math over image and
  * stroke rectangles; only the captioning itself (F20) needs a model.
  * This object reproduces that geometry from scratch on top of
  * [[PdfTextParser]]'s object scan, with the rects coming from a graphics-
  * state interpretation of the content stream instead of mupdf callbacks:
  *
  *  - image rects: `q`/`Q`/`cm` CTM tracking; `/Name Do` resolved through
  *    the page's (inheritable) `/Resources → /XObject` to objects with
  *    `/Subtype /Image` — the placed rect is the CTM image of the unit
  *    square (PDF paints images into [0,1]²). Inline images (`BI…ID…EI`)
  *    contribute their CTM rect too; their binary payload is skipped.
  *  - vector stroke rects: path construction (`m l c v y re h`) transforms
  *    points through the CTM at construction time; stroke paints
  *    (`S s B B* b b*`) emit the accumulated bbox, fill-only/no-op paints
  *    (`f F f* n`) discard it — mirroring the reference's strokePath-only
  *    device (`detector.ts:213-233`).
  *
  * Decision rules and constants are the reference's, verbatim
  * (`detector.ts:27-48`): an image block is *effective* when ≥80×80 pt and
  * 1%–85% of the page, corner logos (≤3% area touching both edge bands of
  * a corner) are suppressed; the page is a candidate when the largest
  * effective image ≥10% of the page, total effective image area ≥15%, or
  * ≥5 effective stroke rects (each ≥20×20 pt, ≥0.05% of the page). The
  * vector signal is skipped when the image signal already fired — same
  * decision, and the reference documents the crop delta as below the
  * precision floor. The crop rect is the union of contributing rects
  * padded 8% (min 12 pt), dropped when it covers >85% of the page (the
  * renderer's full-page path is cheaper and identical).
  *
  * Page bounds come from the inheritable `/MediaBox`, defaulting to US
  * Letter when absent. Scale shape: [[detect]] is a pure per-document
  * function run inside the same `binaryFile` flatMap as text extraction —
  * candidates for a 100 TB corpus are one scan, no driver involvement.
  * F20 (VLM captioning) stays the external seam: [[PdfIngest.visualCandidatesDF]]
  * is exactly the work manifest such a service would consume, and caption
  * rows re-enter as visual chunks with continuing indexes (the row shape
  * EngineSpec already pins).
  */
object VisualDetector {

  // decision constants — reference src/pdf-visual/detector.ts:27-48
  private val MinImageBlockWidth = 80.0
  private val MinImageBlockHeight = 80.0
  private val MinImageBlockAreaRatio = 0.01
  private val MaxEffectiveAreaRatio = 0.85
  private val ImageMaxAreaRatioThreshold = 0.1
  private val ImageTotalAreaRatioThreshold = 0.15
  private val MaxCornerLogoAreaRatio = 0.03
  private val CornerLogoEdgeBandRatio = 0.15
  private val CropPaddingRatio = 0.08
  private val MinCropPadding = 12.0
  private val MaxCropPageRatio = 0.85
  private val MinVectorWidth = 20.0
  private val MinVectorHeight = 20.0
  private val MinVectorAreaRatio = 0.0005
  private val VectorStrokeCountThreshold = 5

  /** [x0, y0, x1, y1] in page coordinates */
  final case class Rect(x0: Double, y0: Double, x1: Double, y1: Double) {
    def width: Double = math.max(0, x1 - x0)
    def height: Double = math.max(0, y1 - y0)
    def area: Double = width * height
    def clamp(b: Rect): Rect = Rect(
      math.max(b.x0, math.min(b.x1, x0)), math.max(b.y0, math.min(b.y1, y0)),
      math.max(b.x0, math.min(b.x1, x1)), math.max(b.y0, math.min(b.y1, y1)))
    def union(o: Rect): Rect = Rect(math.min(x0, o.x0), math.min(y0, o.y0),
      math.max(x1, o.x1), math.max(y1, o.y1))
  }

  final case class PageResult(page: Int, isCandidate: Boolean,
                              cropRect: Option[Rect])

  /** per-page candidate decisions for a PDF, in page order; empty when the
    * bytes don't parse (same tolerance contract as [[PdfTextParser.parseItems]]) */
  def detect(bytes: Array[Byte]): Seq[PageResult] =
    try {
      val objs = loadObjects(bytes)
      val byNum = objs.map(o => o.num -> o).toMap
      orderedPages(objs, byNum).zipWithIndex.map { case (page, idx) =>
        decidePage(page, byNum, idx + 1)
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  // ---- page-level decision (reference detectVisualCandidates) ----

  private def decidePage(page: PdfObj, byNum: Map[Int, PdfObj],
                         pageNum: Int): PageResult = {
    val bounds = mediaBox(page, byNum)
    val pageArea = bounds.area
    if (pageArea <= 0) return PageResult(pageNum, isCandidate = false, None)

    val imageNames = imageXObjectNames(page, byNum)
    val (imageRaw, strokeRaw) = contentBytes(page, byNum) match {
      case Some(data) => interpretRects(data, imageNames)
      case None => (Seq.empty[Rect], Seq.empty[Rect])
    }

    // image signal (getMeaningfulImageRects)
    var maxRatio = 0.0
    var totalRatio = 0.0
    val imageRects = imageRaw.flatMap { r =>
      val c = r.clamp(bounds)
      val ratio = c.area / pageArea
      val effective = !isLikelyCornerLogo(c, bounds, ratio) &&
        c.width >= MinImageBlockWidth && c.height >= MinImageBlockHeight &&
        ratio >= MinImageBlockAreaRatio && ratio <= MaxEffectiveAreaRatio
      if (effective) {
        maxRatio = math.max(maxRatio, ratio); totalRatio += ratio; Some(c)
      } else None
    }
    val imageCandidate = maxRatio >= ImageMaxAreaRatioThreshold ||
      totalRatio >= ImageTotalAreaRatioThreshold

    // vector signal — skipped when the image signal already fired
    // (same decision either way; reference detector.ts:277-284)
    val vectorRects =
      if (imageCandidate) Seq.empty
      else strokeRaw.map(_.clamp(bounds)).filter { c =>
        val ratio = c.area / pageArea
        c.width >= MinVectorWidth && c.height >= MinVectorHeight &&
          ratio >= MinVectorAreaRatio && ratio <= MaxEffectiveAreaRatio
      }
    val isCandidate = imageCandidate ||
      vectorRects.size >= VectorStrokeCountThreshold

    if (!isCandidate) PageResult(pageNum, isCandidate = false, None)
    else {
      val all = imageRects ++ vectorRects
      val union = all.reduceOption(_ union _).getOrElse(bounds)
      val padded = pad(union, bounds)
      // near-page crops fall back to the full-page render path
      val crop = if (padded.area / pageArea > MaxCropPageRatio) None
                 else Some(padded)
      PageResult(pageNum, isCandidate = true, crop)
    }
  }

  private def pad(r: Rect, bounds: Rect): Rect = {
    val xPad = math.max(MinCropPadding, r.width * CropPaddingRatio)
    val yPad = math.max(MinCropPadding, r.height * CropPaddingRatio)
    Rect(r.x0 - xPad, r.y0 - yPad, r.x1 + xPad, r.y1 + yPad).clamp(bounds)
  }

  /** a small block touching both edge bands of a corner is decoration */
  private def isLikelyCornerLogo(r: Rect, bounds: Rect,
                                 areaRatio: Double): Boolean = {
    if (areaRatio > MaxCornerLogoAreaRatio) return false
    if (bounds.width <= 0 || bounds.height <= 0) return false
    val bandX = bounds.width * CornerLogoEdgeBandRatio
    val bandY = bounds.height * CornerLogoEdgeBandRatio
    val nearX = r.x0 <= bounds.x0 + bandX || r.x1 >= bounds.x1 - bandX
    val nearY = r.y0 <= bounds.y0 + bandY || r.y1 >= bounds.y1 - bandY
    nearX && nearY
  }

  // ---- inheritable page attributes ----

  /** /MediaBox, walking /Parent (ISO 32000 §7.7.3.4 inheritance via
    * [[PdfTextParser.inheritedAttr]]); US Letter when absent */
  private def mediaBox(page: PdfObj, byNum: Map[Int, PdfObj]): Rect =
    inheritedAttr(page, byNum, "MediaBox") match {
      case Some(PArr(Vector(PNum(a), PNum(b), PNum(c), PNum(d)))) =>
        Rect(math.min(a, c), math.min(b, d), math.max(a, c), math.max(b, d))
      case _ => Rect(0, 0, 612, 792)
    }

  /** names under /Resources → /XObject whose target is /Subtype /Image */
  private def imageXObjectNames(page: PdfObj,
                                byNum: Map[Int, PdfObj]): Set[String] = {
    def deref(v: PVal): Option[PDict] = v match {
      case d: PDict => Some(d)
      case PRef(n) => byNum.get(n).flatMap(_.dict)
      case _ => None
    }
    (for {
      res <- inheritedAttr(page, byNum, "Resources").flatMap(deref)
      xobj <- res.m.get("XObject").flatMap(deref)
    } yield xobj.m.collect {
      case (name, PRef(n))
        if byNum.get(n).flatMap(_.dict)
          .exists(_.m.get("Subtype").contains(PName("Image"))) => name
    }.toSet).getOrElse(Set.empty)
  }

  // ---- content-stream interpretation: CTM + image/stroke rects ----

  /** 6-value PDF matrix [a b c d e f]; point map (x,y) → (ax+cy+e, bx+dy+f) */
  private final case class Mat(a: Double, b: Double, c: Double,
                               d: Double, e: Double, f: Double) {
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
    /** `m concat this` — m applied first (the `cm` composition rule) */
    def concat(m: Mat): Mat = Mat(
      m.a * a + m.b * c, m.a * b + m.b * d,
      m.c * a + m.d * c, m.c * b + m.d * d,
      m.e * a + m.f * c + e, m.e * b + m.f * d + f)
  }
  private val Identity = Mat(1, 0, 0, 1, 0, 0)

  /** one pass over a page's content: (placed image rects, stroked path
    * rects), both in page coordinates. Curve control points are included
    * in the path bbox — an over-approximation that only widens rects, on
    * the safe side for a "is there a figure here" signal. */
  private def interpretRects(content: Array[Byte],
                             imageNames: Set[String]): (Seq[Rect], Seq[Rect]) = {
    val images = mutable.ArrayBuffer.empty[Rect]
    val strokes = mutable.ArrayBuffer.empty[Rect]
    val lex = new Lexer(content, 0, content.length)
    val stack = mutable.ArrayBuffer.empty[PVal]
    var ctm = Identity
    val ctmStack = mutable.ArrayBuffer.empty[Mat]

    // current path bbox in page coords (points transformed at construction)
    var px0, py0 = Double.MaxValue
    var px1, py1 = Double.MinValue
    var hasPath = false
    def addPoint(x: Double, y: Double): Unit = {
      val (tx, ty) = ctm(x, y)
      px0 = math.min(px0, tx); py0 = math.min(py0, ty)
      px1 = math.max(px1, tx); py1 = math.max(py1, ty)
      hasPath = true
    }
    def clearPath(): Unit = {
      px0 = Double.MaxValue; py0 = Double.MaxValue
      px1 = Double.MinValue; py1 = Double.MinValue; hasPath = false
    }
    def num(i: Int): Double = stack.lift(stack.length - i) match {
      case Some(PNum(n)) => n; case _ => 0.0
    }
    def unitSquareRect(): Rect = {
      val corners = Seq(ctm(0, 0), ctm(1, 0), ctm(0, 1), ctm(1, 1))
      Rect(corners.map(_._1).min, corners.map(_._2).min,
        corners.map(_._1).max, corners.map(_._2).max)
    }

    var tok = lex.token()
    while (tok != null) {
      tok match {
        case op: Op =>
          op.name match {
            case "q" => ctmStack += ctm
            case "Q" => if (ctmStack.nonEmpty) {
              ctm = ctmStack.remove(ctmStack.length - 1)
            }
            case "cm" => if (stack.length >= 6) {
              ctm = ctm.concat(Mat(num(6), num(5), num(4), num(3), num(2), num(1)))
            }
            case "Do" => stack.lastOption.collect {
              case PName(n) if imageNames(n) => images += unitSquareRect()
            }
            case "BI" =>
              // inline image: rect from the CTM, then skip the binary
              // payload (ID …bytes… EI) the lexer cannot tokenize
              images += unitSquareRect()
              val id = indexOf(content, "ID", lex.pos)
              val ei = if (id < 0) -1 else indexOf(content, "EI", id + 2)
              lex.pos = if (ei < 0) content.length else ei + 2
            case "m" | "l" => if (stack.length >= 2) addPoint(num(2), num(1))
            case "c" => if (stack.length >= 6) {
              addPoint(num(6), num(5)); addPoint(num(4), num(3))
              addPoint(num(2), num(1))
            }
            case "v" | "y" => if (stack.length >= 4) {
              addPoint(num(4), num(3)); addPoint(num(2), num(1))
            }
            case "re" => if (stack.length >= 4) {
              val (x, y, w, h) = (num(4), num(3), num(2), num(1))
              addPoint(x, y); addPoint(x + w, y); addPoint(x, y + h)
              addPoint(x + w, y + h)
            }
            case "S" | "s" | "B" | "B*" | "b" | "b*" =>
              if (hasPath) strokes += Rect(px0, py0, px1, py1)
              clearPath()
            case "f" | "F" | "f*" | "n" => clearPath()
            case _ => () // text/color/other operators: rect-irrelevant
          }
          stack.clear()
        case v => stack += v
      }
      tok = lex.token()
    }
    (images.toSeq, strokes.toSeq)
  }
}
