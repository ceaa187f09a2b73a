package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ingest.{PdfIngest, VisualDetector}
import graft.ingest.VisualDetector.Rect

/** F21 — visual-candidate detection (`ingest/VisualDetector.scala`) on PDFs
  * assembled from scratch: real image XObjects placed through `cm`, real
  * stroked paths. Reference rules: `src/pdf-visual/detector.ts` (thresholds
  * :27-48, corner logos :112-126, image rule :154-201, stroke-only device
  * :213-233, crop fallback :283-300). All expected rects below are
  * hand-computed from those rules. Page is US Letter (612×792, area
  * 484 704) throughout.
  */
class VisualDetectorSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  // ---- assembler: one page, optional image XObject resource ----

  private def obj(num: Int, body: String): String = s"$num 0 obj\n$body\nendobj\n"

  private def pdf(content: String, nImages: Int = 1): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    // MediaBox on the Pages node: also exercises attribute inheritance
    sb ++= obj(2,
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    val xobj = (1 to nImages).map(i => s"/Im$i ${4 + i} 0 R").mkString(" ")
    sb ++= obj(3, s"<< /Type /Page /Parent 2 0 R " +
      s"/Resources << /XObject << $xobj >> >> /Contents 4 0 R >>")
    val data = content.getBytes(StandardCharsets.ISO_8859_1)
    sb ++= s"4 0 obj\n<< /Length ${data.length} >>\nstream\n$content\nendstream\nendobj\n"
    (1 to nImages).foreach { i =>
      sb ++= s"${4 + i} 0 obj\n<< /Subtype /Image /Width 8 /Height 8 " +
        "/Length 3 >>\nstream\nabc\nendstream\nendobj\n"
    }
    sb ++= "trailer\n<< /Root 1 0 R /Size 9 >>\n%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def single(bytes: Array[Byte]): VisualDetector.PageResult = {
    val rs = VisualDetector.detect(bytes)
    assert(rs.size === 1)
    rs.head
  }

  private def assertRect(actual: Option[Rect], expected: Rect): Unit = {
    assert(actual.isDefined)
    val a = actual.get
    assert(math.abs(a.x0 - expected.x0) < 1e-9 &&
      math.abs(a.y0 - expected.y0) < 1e-9 &&
      math.abs(a.x1 - expected.x1) < 1e-9 &&
      math.abs(a.y1 - expected.y1) < 1e-9,
      s"$a !~ $expected")
  }

  // ---- image rule ----

  test("large image block (>=10% of page) fires; crop = union padded 8%/12pt") {
    // 200x300 at (100,300): ratio 60000/484704 = 0.1238 >= 0.1
    val r = single(pdf("q 200 0 0 300 100 300 cm /Im1 Do Q"))
    assert(r.isCandidate)
    // pad: x max(12, 200*.08=16)=16, y max(12, 300*.08=24)=24
    assertRect(r.cropRect, Rect(84, 276, 316, 624))
  }

  test("two medium images below 10% each fire on the 15% total rule") {
    // each 150x260 = 39000 → ratio 0.0805 (< 0.1), total 0.161 >= 0.15
    val content = "q 150 0 0 260 50 100 cm /Im1 Do Q " +
      "q 150 0 0 260 350 100 cm /Im2 Do Q"
    val r = single(pdf(content, nImages = 2))
    assert(r.isCandidate)
    // union (50,100)-(500,360): w=450 → xPad 36; h=260 → yPad 20.8
    assertRect(r.cropRect, Rect(50 - 36, 100 - 20.8, 500 + 36, 360 + 20.8))
  }

  test("one medium image below both thresholds does not fire") {
    val r = single(pdf("q 150 0 0 260 50 100 cm /Im1 Do Q"))
    assert(!r.isCandidate && r.cropRect.isEmpty)
  }

  test("corner logo (small, touching both edge bands of a corner) is suppressed") {
    // 90x90 at top-left (10,690): ratio 8100/484704 = 0.0167 <= 0.03,
    // x0=10 within left band (91.8), y1=780 within top band (>= 673.2)
    // — suppressed even though 90x90 passes the size floor; alone on the
    // page, no candidate. The same block mid-page is just ineffective
    // (ratio 0.0167 < 0.1 max-rule) — also no candidate, but via the
    // threshold, not suppression: pair it with a medium image and only
    // the mid-page variant's area joins the 15% total.
    val logo = single(pdf("q 90 0 0 90 10 690 cm /Im1 Do Q"))
    assert(!logo.isCandidate)
    // medium image alone: total 0.0805; + mid-page 90x90 (0.0167): 0.097
    // still below 0.15 → the decisive copy is which side of 0.15 the THIRD
    // block lands: corner copy contributes 0, mid-page copy contributes
    val base = "q 150 0 0 260 50 100 cm /Im1 Do Q " +
      "q 150 0 0 260 350 100 cm /Im2 Do Q"
    // both mediums total 0.161 — remove one corner of margin by shrinking:
    // use 150x220 each → 33000·2/484704 = 0.1362 < 0.15; third block decides
    val borderline = "q 150 0 0 220 50 100 cm /Im1 Do Q " +
      "q 150 0 0 220 350 100 cm /Im2 Do Q "
    val withCorner = single(pdf(
      borderline + "q 90 0 0 90 10 690 cm /Im3 Do Q", nImages = 3))
    val withMid = single(pdf(
      borderline + "q 90 0 0 90 260 400 cm /Im3 Do Q", nImages = 3))
    assert(!withCorner.isCandidate) // 0.1362 — logo contributed nothing
    assert(withMid.isCandidate)     // 0.1362 + 0.0167 = 0.153 >= 0.15
    assert(base.nonEmpty)
  }

  test("near-full-page image: candidate, but crop falls back to full page (None)") {
    // 580x760 at (16,16): ratio 0.909 > 0.85 → NOT effective (the 85% cap),
    // so use 540x700 at (36,46): ratio 0.7798 — candidate; padded union
    // (12.8,-10→clamp) covers > 85% of the page → None
    val r = single(pdf("q 540 0 0 700 36 46 cm /Im1 Do Q"))
    assert(r.isCandidate && r.cropRect.isEmpty)
  }

  test("oversized (>85% of page) image blocks are not effective") {
    val r = single(pdf("q 600 0 0 780 6 6 cm /Im1 Do Q"))
    assert(!r.isCandidate)
  }

  // ---- CTM machinery ----

  test("nested cm compose; q/Q restores; non-image Do names are ignored") {
    // 0.5-scale then 400x400 at (100,200) → effective 200x200 at (50,100):
    // ratio 40000/484704 = 0.0825 < 0.1 alone... use 500x500 → 250x250 at
    // (50,100): 62500/484704 = 0.129 >= 0.1 → candidate
    val content = "q 0.5 0 0 0.5 0 0 cm q 500 0 0 500 100 200 cm /Im1 Do Q " +
      "Q q 10 0 0 10 0 0 cm /NotAnImage Do Q"
    val r = single(pdf(content))
    assert(r.isCandidate)
    // 250x250 at (50,100): pad 20 → (30,80)-(320,370)
    assertRect(r.cropRect, Rect(30, 80, 320, 370))
  }

  // ---- vector rule ----

  test("five effective stroke rects fire the vector rule; four do not") {
    def strokes(n: Int): String = (0 until n)
      .map(i => s"${50 + i * 100} 50 40 40 re S").mkString(" ")
    assert(single(pdf(strokes(5))).isCandidate)
    assert(!single(pdf(strokes(4))).isCandidate)
    // crop of the 5-stroke page: union (50,50)-(490,90), w=440 h=40 →
    // xPad 35.2, yPad 12 (floor)
    assertRect(single(pdf(strokes(5))).cropRect,
      Rect(50 - 35.2, 38, 490 + 35.2, 102))
  }

  test("fill-only paints and tiny strokes do not count") {
    // five filled rects (f) + five sub-floor strokes (10x10 < 20x20)
    val fills = (0 until 5).map(i => s"${50 + i * 100} 50 40 40 re f").mkString(" ")
    val tiny = (0 until 5).map(i => s"${50 + i * 100} 150 10 10 re S").mkString(" ")
    assert(!single(pdf(s"$fills $tiny")).isCandidate)
  }

  test("stroked path from m/l segments counts with its bbox") {
    // an open polyline 100..400 x 100..300 stroked, 5 copies shifted
    val paths = (0 until 5).map { i =>
      val dy = i * 5
      s"100 ${100 + dy} m 400 ${150 + dy} l 250 ${300 + dy} l S"
    }.mkString(" ")
    val r = single(pdf(paths))
    assert(r.isCandidate)
    // union (100,100)-(400,320): w=300→xPad 24, h=220→yPad 17.6
    assertRect(r.cropRect, Rect(76, 82.4, 424, 337.6))
  }

  test("image candidate skips the vector signal (crop from images only)") {
    val strokes = (0 until 5).map(i => s"${30 + i * 110} 700 40 40 re S").mkString(" ")
    val r = single(pdf(s"q 200 0 0 300 100 300 cm /Im1 Do Q $strokes"))
    assert(r.isCandidate)
    // same crop as the image-only case — strokes contributed nothing
    assertRect(r.cropRect, Rect(84, 276, 316, 624))
  }

  // ---- tolerance + the Spark twin ----

  test("non-PDF bytes and text-only pages degrade to no candidates") {
    assert(VisualDetector.detect("not a pdf".getBytes) === Seq.empty)
    assert(VisualDetector.detect(Array[Byte](1, 2, 3)) === Seq.empty)
    val r = single(pdf("BT /F1 12 Tf 72 720 Td (just text) Tj ET"))
    assert(!r.isCandidate)
  }

  test("PdfFixtures modes decide as the closed-form registry oracle expects") {
    import graft.ingest.PdfFixtures
    // mode 0 (doc 10): 180x300 image at (50,200) — candidate, crop padded
    val m0 = single(PdfFixtures.syntheticPdf(10))
    assert(m0.isCandidate)
    assertRect(m0.cropRect, Rect(50 - 14.4, 176, 230 + 14.4, 524))
    // mode 1 (doc 6): 110x200 at (80,150) — below both image thresholds
    assert(!single(PdfFixtures.syntheticPdf(6)).isCandidate)
    // mode 2: doc 22 → n=3+22%4=5 strokes at y=50+22%3=80 — candidate;
    //         doc 12 → n=3 — not
    val m2 = single(PdfFixtures.syntheticPdf(22))
    assert(m2.isCandidate)
    assertRect(m2.cropRect, Rect(50 - 35.2, 80 - 12, 490 + 35.2, 120 + 12))
    assert(!single(PdfFixtures.syntheticPdf(12)).isCandidate)
    // mode 3: even doc 8 text-only → not; odd doc 13 full-page image →
    // candidate with the full-page crop fallback (None)
    assert(!single(PdfFixtures.syntheticPdf(8)).isCandidate)
    val m3 = single(PdfFixtures.syntheticPdf(13))
    assert(m3.isCandidate && m3.cropRect.isEmpty)
    // mode 4 (doc 4): two mediums total 0.1362 + suppressed corner logo —
    // NOT a candidate (a broken suppression would flip this to 0.153 >= 0.15)
    assert(!single(PdfFixtures.syntheticPdf(4)).isCandidate)
  }

  test("visualCandidatesDF: one row per page, crop columns null off-candidates") {
    import spark.implicits._
    val figure = pdf("q 200 0 0 300 100 300 cm /Im1 Do Q")
    val plain = pdf("BT (text) Tj ET")
    val raw = Seq(("/d/fig.pdf", figure), ("/d/plain.pdf", plain))
      .toDF("filePath", "content")
    val rows = PdfIngest.visualCandidatesDF(spark, raw)
      .orderBy("filePath", "page")
      .collect()
    assert(rows.length === 2)
    val fig = rows(0)
    assert(fig.getString(0) === "/d/fig.pdf" && fig.getInt(1) === 1 &&
      fig.getBoolean(2) && fig.getDouble(3) === 84.0 &&
      fig.getDouble(6) === 624.0)
    val pl = rows(1)
    assert(pl.getString(0) === "/d/plain.pdf" && !pl.getBoolean(2) &&
      pl.isNullAt(3) && pl.isNullAt(6))
  }
}
