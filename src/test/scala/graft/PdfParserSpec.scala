package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.embed.HashedEmbedder
import graft.ingest.{Ingest, PdfIngest, PdfTextParser}

/** S6 — byte-level PDF text extraction (`ingest/PdfTextParser.scala`),
  * exercised on PDFs assembled from scratch in this spec: real object
  * syntax, a real page tree, real FlateDecode streams. Reference behavior:
  * `src/parser/pdf-extract.ts:79-153` (mupdf items → filter pipeline). */
class PdfParserSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  // ---- minimal PDF assembler (object numbers fixed by the caller) ----

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def obj(num: Int, body: String): String = s"$num 0 obj\n$body\nendobj\n"

  private def streamObj(num: Int, content: String, compress: Boolean): String = {
    val data =
      if (compress) deflate(content.getBytes(StandardCharsets.ISO_8859_1))
      else content.getBytes(StandardCharsets.ISO_8859_1)
    val filter = if (compress) " /Filter /FlateDecode" else ""
    s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
      new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
  }

  /** two-page PDF; page objects appear in BYTE order 3,4 but the tree's
    * /Kids order is [4, 3] — page 1 is object 4. Optional Info /Title. */
  private def twoPagePdf(p1: String, p2: String, compress: Boolean,
                         title: Option[String] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [4 0 R 3 0 R] /Count 2 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    sb ++= obj(4, "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    sb ++= streamObj(5, p2, compress)
    sb ++= streamObj(6, p1, compress)
    title.foreach(t => sb ++= obj(7, s"<< /Title ($t) /Producer (graft-spec) >>"))
    sb ++= "trailer\n<< /Root 1 0 R /Size 8 >>\n%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def onePagePdf(content: String, compress: Boolean = false): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= streamObj(4, content, compress)
    sb ++= "trailer\n<< /Root 1 0 R /Size 5 >>\n%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  // ---- parser unit behavior ----

  test("page order follows the /Kids tree, not byte order; Flate decodes") {
    val pdf = twoPagePdf(
      "BT /F1 12 Tf 72 720 Td (page one text) Tj ET",
      "BT /F1 12 Tf 72 720 Td (page two text) Tj ET",
      compress = true)
    val items = PdfTextParser.parseItems(pdf)
    assert(items.map(i => (i.page, i.text)) ===
      Seq((1, "page one text"), (2, "page two text")))
    assert(items.head.x === 72.0 && items.head.y === 720.0 &&
      items.head.fontSize === 12.0)
  }

  test("positioning: Tm scale, Td/TD/T* line moves, multiple shows keep X order") {
    val content =
      """BT
        |/F1 10 Tf
        |2 0 0 2 100 700 Tm
        |(first) Tj
        |( second) Tj
        |0 -20 TD
        |(next line) Tj
        |T*
        |(third line) Tj
        |ET""".stripMargin
    val items = PdfTextParser.parseItems(onePagePdf(content))
    assert(items.map(_.text) === Seq("first", " second", "next line", "third line"))
    // Tm d=2 doubles the effective font size
    assert(items.head.fontSize === 20.0)
    // the second show advanced past the first on the same line
    assert(items(1).x > items(0).x && items(1).y === items(0).y)
    // TD moved down 20; T* re-applied the leading set by TD
    assert(items(2).y === 700.0 - 20 && items(3).y === 700.0 - 40)
  }

  test("string forms: escapes, octal, nested parens, hex, UTF-16BE, TJ kerning") {
    val content =
      "BT /F1 10 Tf 10 700 Td " +
        "(esc \\(x\\) \\\\ \\101 (nested)) Tj " +
        "0 -20 Td <48656C6C6F> Tj " +
        "0 -20 Td <FEFF00480069> Tj " +
        "0 -20 Td [(kern) -250 (gap) 10 (close)] TJ " +
        "ET"
    val items = PdfTextParser.parseItems(onePagePdf(content))
    assert(items.map(_.text) === Seq(
      "esc (x) \\ A (nested)", "Hello", "Hi", "kern gapclose"))
  }

  test("Info /Title wins over outline titles; absent → None") {
    val pdf = twoPagePdf("BT (a) Tj ET", "BT (b) Tj ET", compress = false,
      title = Some("Volcano Geology Handbook"))
    assert(PdfTextParser.docTitle(pdf) === Some("Volcano Geology Handbook"))
    assert(PdfTextParser.docTitle(
      twoPagePdf("BT (a) Tj ET", "BT (b) Tj ET", compress = false)) === None)
  }

  test("unsupported filters and garbage emit nothing, never garbage or throws") {
    val badFilter = onePagePdf("BT (x) Tj ET").map(identity)
    val s = new String(badFilter, StandardCharsets.ISO_8859_1)
      .replace("<< /Length", "<< /Filter /DCTDecode /Length")
    assert(PdfTextParser.parseItems(
      s.getBytes(StandardCharsets.ISO_8859_1)) === Seq.empty)
    assert(PdfTextParser.parseItems(Array[Byte](1, 2, 3, 4)) === Seq.empty)
    assert(PdfTextParser.parseItems(
      "not a pdf at all".getBytes(StandardCharsets.UTF_8)) === Seq.empty)
    // truncated mid-object
    assert(PdfTextParser.parseItems(
      onePagePdf("BT (x) Tj ET").take(40)) === Seq.empty)
  }

  test("multi-stream /Contents arrays concatenate in order") {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>")
    sb ++= streamObj(4, "BT /F1 10 Tf 10 700 Td (part one) Tj", compress = false)
    sb ++= streamObj(5, "0 -20 Td (part two) Tj ET", compress = false)
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) === Seq("part one", "part two"))
    assert(items(1).y < items(0).y) // the Td state carried across streams
  }

  // ---- the Spark extraction pipeline ----

  test("pdfDocsDF: extracted text in page order; rawHash matches the sync manifest") {
    import spark.implicits._
    val pdf = twoPagePdf(
      "BT /F1 12 Tf 72 720 Td (Volcano geology explains magma chambers.) Tj " +
        "0 -20 Td (Basalt forms from rapidly cooling lava flows.) Tj ET",
      "BT /F1 12 Tf 72 720 Td (Second page discusses eruption dynamics.) Tj ET",
      compress = true, title = Some("Geology"))
    val raw = Seq(("/p/doc.pdf", pdf)).toDF("filePath", "content")
    val row = PdfIngest.pdfDocsDF(spark, raw, () => new HashedEmbedder(64))
      .as[Ingest.Doc].collect().head
    assert(row.content ===
      "Volcano geology explains magma chambers. Basalt forms from rapidly cooling lava flows." +
        "\n\nSecond page discusses eruption dynamics.")
    // the stored hash must be the manifest's view of the FILE — decoded
    // bytes — or sync would re-upsert every PDF forever
    assert(row.rawHash ===
      Some(Ingest.sha256Hex(new String(pdf, StandardCharsets.UTF_8))))
    assert(row.titleOverride === Some("Geology"))
  }

  test("pdfDocsDF: a parse-empty pdf yields no row (zero-chunk semantics)") {
    import spark.implicits._
    val raw = Seq(("/p/broken.pdf", Array[Byte](1, 2, 3)))
      .toDF("filePath", "content")
    assert(PdfIngest.pdfDocsDF(spark, raw,
      () => new HashedEmbedder(64)).count() === 0L)
  }
}
