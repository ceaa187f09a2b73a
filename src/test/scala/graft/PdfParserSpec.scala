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

  // ---- ASCII/RLE filters and filter chains ----

  /** one-page PDF whose content stream carries pre-encoded `data` with an
    * explicit `/Filter …` (and optional extra dict entries) */
  private def filteredPdf(data: Array[Byte], filterSpec: String): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= s"4 0 obj\n<< /Length ${data.length} $filterSpec >>\nstream\n"
    sb ++= new String(data, StandardCharsets.ISO_8859_1)
    sb ++= "\nendstream\nendobj\n%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** reference ASCII85 encoder (ISO 32000 §7.4.3, including the `z`
    * shorthand and partial-group padding) for round-trip fixtures */
  private def a85(raw: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val n = math.min(4, raw.length - i)
      var v = 0L
      (0 until 4).foreach(j =>
        v = (v << 8) | (if (i + j < raw.length) raw(i + j) & 0xFF else 0))
      if (n == 4 && v == 0) sb += 'z'
      else {
        val cs = new Array[Char](5)
        var x = v
        (4 to 0 by -1).foreach { j => cs(j) = ('!' + (x % 85).toInt).toChar; x /= 85 }
        sb ++= new String(cs, 0, n + 1)
      }
      i += n
    }
    sb.toString
  }

  test("ASCIIHexDecode: pairs, whitespace, EOD, odd-digit pad; bad char refused") {
    def hex(s: String) = PdfTextParser.asciiHexDecode(
      s.getBytes(StandardCharsets.ISO_8859_1)).map(_.toSeq)
    assert(hex("48 65 6C\n6c6F>") === Some("Hello".getBytes.toSeq))
    assert(hex("48656") === Some(Seq[Byte](0x48, 0x65, 0x60))) // odd pads 0
    assert(hex("4865>trailing ignored") === Some(Seq[Byte](0x48, 0x65)))
    assert(hex("48!65>") === None) // corrupt: refuse whole
  }

  test("ASCII85Decode: round-trips arbitrary bytes incl. z groups and partials") {
    val rnd = new scala.util.Random(7)
    (0 until 40).foreach { k =>
      val raw = new Array[Byte](k)
      rnd.nextBytes(raw)
      if (k >= 8) java.util.Arrays.fill(raw, 2, 6, 0.toByte) // force a z group
      val enc = (a85(raw) + "~>").getBytes(StandardCharsets.ISO_8859_1)
      assert(PdfTextParser.ascii85Decode(enc).map(_.toSeq) === Some(raw.toSeq),
        s"len $k")
    }
    // leading <~ framing, embedded whitespace, missing EOD all tolerated
    val enc2 = ("<~" + a85("graft".getBytes).grouped(3).mkString("\n"))
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextParser.ascii85Decode(enc2).map(_.toSeq) ===
      Some("graft".getBytes.toSeq))
    // corrupt: group overflow, 1-char final group, z inside a group
    assert(PdfTextParser.ascii85Decode("uuuuu".getBytes) === None)
    assert(PdfTextParser.ascii85Decode("!!!!!#".getBytes) === None)
    assert(PdfTextParser.ascii85Decode("!!z!!".getBytes) === None)
  }

  test("RunLengthDecode: literal + repeat runs, EOD; truncated run refused") {
    val enc = Array[Byte](2, 'a', 'b', 'c', (257 - 4).toByte, 'd', 0, 'e', 128.toByte, 99)
    assert(PdfTextParser.runLengthDecode(enc).map(new String(_)) ===
      Some("abcdddde")) // the 99 after EOD never decodes
    assert(PdfTextParser.runLengthDecode(Array[Byte](5, 'a', 'b')) === None)
    assert(PdfTextParser.runLengthDecode(Array[Byte](200.toByte)) === None)
  }

  test("filter chains apply in array order with a parallel DecodeParms array") {
    val content = "BT /F1 12 Tf 10 700 Td (chained and fine) Tj ET"
    // [/ASCII85Decode /FlateDecode]: the PostScript-derived double wrap
    val wrapped = (a85(deflate(content.getBytes(StandardCharsets.ISO_8859_1)))
      + "~>").getBytes(StandardCharsets.ISO_8859_1)
    val pdf = filteredPdf(wrapped, "/Filter [/ASCII85Decode /FlateDecode]")
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("chained and fine"))
    // RunLength alone, via the abbreviated name
    def rle(raw: Array[Byte]): Array[Byte] = { // literal-only encoding
      val out = new ByteArrayOutputStream()
      raw.grouped(128).foreach { g => out.write(g.length - 1); out.write(g) }
      out.write(128); out.toByteArray
    }
    val pdf2 = filteredPdf(rle(content.getBytes(StandardCharsets.ISO_8859_1)),
      "/Filter /RL")
    assert(PdfTextParser.parseItems(pdf2).map(_.text) === Seq("chained and fine"))
    // a chain member we cannot decode still refuses the whole stream
    val pdf3 = filteredPdf(wrapped, "/Filter [/ASCII85Decode /DCTDecode]")
    assert(PdfTextParser.parseItems(pdf3) === Seq.empty)
    // hex-wrapped flate with the predictor parms in the PARALLEL slot
    val raw = "BT /F1 12 Tf 10 700 Td (hex flate) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val hexed = (deflate(raw).map("%02X".format(_)).mkString + ">")
      .getBytes(StandardCharsets.ISO_8859_1)
    val pdf4 = filteredPdf(hexed,
      "/Filter [/ASCIIHexDecode /FlateDecode] /DecodeParms [null null]")
    assert(PdfTextParser.parseItems(pdf4).map(_.text) === Seq("hex flate"))
  }

  // ---- flate predictors (/DecodeParms) ----

  /** PNG-predictor-encode `raw` (Colors=1, 8 bpc): each row prefixed by a
    * filter tag, cycling through Sub/Up/Average/Paeth/None so every branch
    * of the decoder is exercised; rows padded with spaces (harmless in a
    * content stream) */
  private def pngPredict(raw: Array[Byte], rowLen: Int): Array[Byte] = {
    val pad = (rowLen - raw.length % rowLen) % rowLen
    val padded = raw ++ Array.fill(pad)(' '.toByte)
    val out = new ByteArrayOutputStream()
    val filters = Array(1, 2, 3, 4, 0)
    for (r <- 0 until padded.length / rowLen) {
      val ft = filters(r % filters.length)
      out.write(ft)
      for (i <- 0 until rowLen) {
        val cur = padded(r * rowLen + i) & 0xFF
        val left = if (i >= 1) padded(r * rowLen + i - 1) & 0xFF else 0
        val up = if (r > 0) padded((r - 1) * rowLen + i) & 0xFF else 0
        val ul = if (r > 0 && i >= 1) padded((r - 1) * rowLen + i - 1) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        out.write((cur - pred) & 0xFF)
      }
    }
    out.toByteArray
  }

  private def predictorPdf(content: String, parms: String,
                           encode: Array[Byte] => Array[Byte]): Array[Byte] = {
    val data = deflate(encode(content.getBytes(StandardCharsets.ISO_8859_1)))
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= s"4 0 obj\n<< /Length ${data.length} /Filter /FlateDecode " +
      s"/DecodeParms $parms >>\nstream\n" +
      new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("PNG predictors (Sub/Up/Average/Paeth/None rows) decode exactly") {
    val content = "BT /F1 12 Tf 72 720 Td (predictor row filters survive) Tj " +
      "0 -20 Td (across many rows of the stream) Tj ET"
    val pdf = predictorPdf(content,
      "<< /Predictor 12 /Columns 16 >>", pngPredict(_, 16))
    assert(PdfTextParser.parseItems(pdf).map(_.text) ===
      Seq("predictor row filters survive", "across many rows of the stream"))
  }

  test("TIFF predictor 2 (horizontal differencing) decodes exactly") {
    def tiffPredict(raw: Array[Byte]): Array[Byte] = {
      val rowLen = 16
      val pad = (rowLen - raw.length % rowLen) % rowLen
      val padded = raw ++ Array.fill(pad)(' '.toByte)
      val out = padded.clone()
      for (r <- 0 until padded.length / rowLen; i <- (rowLen - 1) to 1 by -1)
        out(r * rowLen + i) =
          ((padded(r * rowLen + i) - padded(r * rowLen + i - 1)) & 0xFF).toByte
      out
    }
    val pdf = predictorPdf("BT /F1 12 Tf 72 720 Td (tiff differenced) Tj ET",
      "<< /Predictor 2 /Columns 16 >>", tiffPredict)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("tiff differenced"))
  }

  test("a bad predictor tag or unresolvable DecodeParms emits nothing") {
    // filter tag 9 is not a PNG row filter: refuse the stream
    val pdf = predictorPdf("BT (x) Tj ET", "<< /Predictor 12 /Columns 16 >>",
      raw => { val e = pngPredict(raw, 16); e(0) = 9; e })
    assert(PdfTextParser.parseItems(pdf) === Seq.empty)
    // DecodeParms as an indirect ref is out of subset: nothing, not garbage
    val pdf2 = predictorPdf("BT (x) Tj ET", "9 0 R", pngPredict(_, 16))
    assert(PdfTextParser.parseItems(pdf2) === Seq.empty)
  }

  test("a trailing partial predictor row refuses the stream whole") {
    // truncated mid-row: the decodable prefix must NOT be emitted as if it
    // were the document (same posture as the bad-filter-tag refusal)
    val png = predictorPdf("BT /F1 12 Tf 72 720 Td (will be truncated) Tj ET",
      "<< /Predictor 12 /Columns 16 >>", raw => pngPredict(raw, 16).dropRight(3))
    assert(PdfTextParser.parseItems(png) === Seq.empty)
    val tiff = predictorPdf("BT /F1 12 Tf 72 720 Td (also truncated) Tj ET",
      "<< /Predictor 2 /Columns 16 >>", raw => {
        val rowLen = 16
        val pad = (rowLen - raw.length % rowLen) % rowLen
        val padded = raw ++ Array.fill(pad)(' '.toByte)
        val out = padded.clone()
        for (r <- 0 until padded.length / rowLen; i <- (rowLen - 1) to 1 by -1)
          out(r * rowLen + i) =
            ((padded(r * rowLen + i) - padded(r * rowLen + i - 1)) & 0xFF).toByte
        out.dropRight(5)
      })
    assert(PdfTextParser.parseItems(tiff) === Seq.empty)
  }

  // ---- LZWDecode ----

  /** pack a code sequence MSB-first at the widths the PDF LZW state machine
    * implies (9 bits after Clear, early-change growth) — only used for the
    * spec-example vector, which never leaves 9 bits */
  private def pack9(codes: Seq[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var buf = 0L; var cnt = 0
    codes.foreach { c =>
      buf = (buf << 9) | c; cnt += 9
      while (cnt >= 8) { out.write(((buf >> (cnt - 8)) & 0xFF).toInt); cnt -= 8 }
    }
    if (cnt > 0) out.write(((buf << (8 - cnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** standard LZW encoder (EarlyChange=1) for round-trip coverage past the
    * 9-bit spec example: width grows when nextCode reaches 1 << width */
  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var buf = 0L; var cnt = 0; var width = 9
    def emit(code: Int): Unit = {
      buf = (buf << width) | code; cnt += width
      while (cnt >= 8) { out.write(((buf >> (cnt - 8)) & 0xFF).toInt); cnt -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[Vector[Byte], Int]
    (0 until 256).foreach(i => dict(Vector(i.toByte)) = i)
    var nextCode = 258
    emit(256) // leading Clear, as PDF producers emit
    var cur = Vector.empty[Byte]
    raw.foreach { b =>
      val ext = cur :+ b
      if (dict.contains(ext)) cur = ext
      else {
        emit(dict(cur))
        dict(ext) = nextCode; nextCode += 1
        if (width < 12 && nextCode >= (1 << width)) width += 1
        cur = Vector(b)
      }
    }
    if (cur.nonEmpty) emit(dict(cur))
    emit(257) // EOD
    if (cnt > 0) out.write(((buf << (8 - cnt)) & 0xFF).toInt)
    out.toByteArray
  }

  test("lzwDecode reproduces the ISO 32000 §7.4.4.2 example sequence") {
    // input 45 45 45 45 45 65 45 45 45 45 (hex) →
    // codes 256 0x45 258 258 0x65 259 0x45 257
    val encoded = pack9(Seq(256, 0x45, 258, 258, 0x65, 259, 0x45, 257))
    assert(PdfTextParser.lzwDecode(encoded).map(_.toSeq) ===
      Some(Seq[Byte](0x45, 0x45, 0x45, 0x45, 0x45, 0x65, 0x45, 0x45, 0x45, 0x45)))
    // an out-of-table code (no KwKwK justification) refuses the stream
    assert(PdfTextParser.lzwDecode(pack9(Seq(256, 300, 257))) === None)
  }

  test("LZWDecode streams extract end-to-end (width growth exercised)") {
    // enough distinct material to push the encoder past 511 entries and
    // through the early-change 9→10 bit switch
    val lines = (0 until 40).map(i =>
      s"0 -12 Td (lzw line $i with some repeating repeating text) Tj").mkString(" ")
    val content = s"BT /F1 10 Tf 72 760 Td (first lzw line) Tj $lines ET"
    val data = lzwEncode(content.getBytes(StandardCharsets.ISO_8859_1))
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= s"4 0 obj\n<< /Length ${data.length} /Filter /LZWDecode >>\nstream\n" +
      new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) ===
      "first lzw line" +: (0 until 40).map(i =>
        s"lzw line $i with some repeating repeating text"))
  }

  // ---- /ObjStm object streams (PDF 1.5+ compressed objects) ----

  /** assemble an /ObjStm whose children are the given (num, body) direct
    * values, flate-compressed like every real producer emits them */
  private def objStm(num: Int, kids: Seq[(Int, String)]): String = {
    val bodies = kids.map(_._2)
    val offsets = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = kids.zip(offsets)
      .map { case ((n, _), off) => s"$n $off" }.mkString(" ")
    val payload = (header + "\n" + bodies.mkString("\n"))
      .getBytes(StandardCharsets.ISO_8859_1)
    val first = header.length + 1
    val data = deflate(payload)
    s"$num 0 obj\n<< /Type /ObjStm /N ${kids.length} /First $first " +
      s"/Length ${data.length} /Filter /FlateDecode >>\nstream\n" +
      new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
  }

  test("ObjStm: catalog, page tree, and font dicts inside an object stream") {
    // the modern-producer layout: ONLY the content and CMap streams are
    // top-level objects; everything structural lives compressed in 10 0 obj
    val sb = new StringBuilder
    sb ++= "%PDF-1.5\n"
    sb ++= objStm(10, Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>"),
      5 -> "<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R >>"))
    sb ++= streamObj(4, "BT /F1 12 Tf 72 720 Td <0102> Tj ET", compress = false)
    sb ++= streamObj(6, testCMap, compress = true)
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) === Seq("Hi")) // page tree AND ToUnicode found
  }

  test("ObjStm: a child redefining a top-level object wins by document order") {
    val sb = new StringBuilder
    sb ++= "%PDF-1.5\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= streamObj(4, "BT /F1 12 Tf 72 720 Td (old text) Tj ET",
      compress = false)
    // incremental update appended as an ObjStm: page 3 now points at 7
    sb ++= objStm(10, Seq(
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>"))
    sb ++= streamObj(7, "BT /F1 12 Tf 72 720 Td (new text) Tj ET",
      compress = false)
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) === Seq("new text"))
  }

  test("ObjStm: malformed headers and truncated offsets refuse, never garble") {
    // header claims 3 pairs but holds 2 → whole container refused, and the
    // file still parses via its top-level fallback page
    def file(stm: String): Array[Byte] = {
      val sb = new StringBuilder
      sb ++= "%PDF-1.5\n"
      sb ++= stm
      sb ++= obj(3, "<< /Type /Page /Contents 4 0 R >>")
      sb ++= streamObj(4, "BT /F1 12 Tf 72 720 Td (fallback) Tj ET",
        compress = false)
      sb ++= "%%EOF\n"
      sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    }
    val short = {
      val data = deflate("1 0 5 8\n<< >>\n<< >>"
        .getBytes(StandardCharsets.ISO_8859_1))
      s"10 0 obj\n<< /Type /ObjStm /N 3 /First 8 /Length ${data.length} " +
        "/Filter /FlateDecode >>\nstream\n" +
        new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    }
    assert(PdfTextParser.parseItems(file(short)).map(_.text) === Seq("fallback"))
    // an offset past the decoded data drops that child only
    val far = {
      val data = deflate("8 99999\n<< /X 1 >>"
        .getBytes(StandardCharsets.ISO_8859_1))
      s"11 0 obj\n<< /Type /ObjStm /N 1 /First 8 /Length ${data.length} " +
        "/Filter /FlateDecode >>\nstream\n" +
        new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    }
    assert(PdfTextParser.parseItems(file(far)).map(_.text) === Seq("fallback"))
  }

  // ---- inline images and Form XObjects ----

  test("inline image binary is skipped whole, never lexed into text") {
    // the payload contains "(fake) Tj" and an unbalanced "(" — either
    // would corrupt the stream if the bytes reached the lexer
    val payload = "(fake) Tj ( ÿ "
    val content = "BT /F1 12 Tf 72 720 Td (before) Tj ET " +
      s"BI /W 2 /H 2 /CS /G /BPC 8 ID $payload\nEI " +
      "BT /F1 12 Tf 72 700 Td (after) Tj ET"
    val pdf = filteredPdf(content.getBytes(StandardCharsets.ISO_8859_1), "")
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("before", "after"))
  }

  test("Form XObjects: Do recurses with the form's fonts, CTM-placed") {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Fx1 7 0 R >> /Font << /F1 5 0 R >> >> >>")
    // page text + a translated form invocation (q/Q isolates the cm)
    sb ++= streamObj(4,
      "BT /F1 12 Tf 72 720 Td (page text) Tj ET " +
        "q 1 0 0 1 100 500 cm /Fx1 Do Q " +
        "BT /F1 12 Tf 72 600 Td (more page) Tj ET", compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    // the form has its OWN font resource with a ToUnicode (01 02 → Hi)
    sb ++= obj(7, {
      val body = "BT /G1 10 Tf 1 0 0 1 10 20 Tm <0102> Tj ET"
      s"<< /Type /XObject /Subtype /Form /BBox [0 0 200 100] " +
        s"/Resources << /Font << /G1 8 0 R >> >> /Length ${body.length} >>" +
        s"\nstream\n$body\nendstream"
    })
    sb ++= obj(8, "<< /Type /Font /Subtype /Type1 /ToUnicode 9 0 R >>")
    sb ++= streamObj(9, testCMap, compress = true)
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) === Seq("page text", "Hi", "more page"))
    val hi = items.find(_.text == "Hi").get
    assert(hi.x === 110.0 && hi.y === 520.0) // form Tm (10,20) + cm (100,500)
  }

  test("self-referencing forms terminate via the depth guard") {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Fx1 7 0 R >> >> >>")
    sb ++= streamObj(4, "/Fx1 Do BT /F1 9 Tf 5 5 Td (alive) Tj ET",
      compress = false)
    val loop = "BT /F1 8 Tf 1 1 Td (inner) Tj ET /Fx1 Do"
    sb ++= s"7 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 9 9] " +
      s"/Length ${loop.length} >>\nstream\n$loop\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    // depth 0..4 of recursion → 5 "inner" items, then the guard cuts off
    assert(items.count(_.text == "inner") === 5)
    assert(items.exists(_.text == "alive"))
  }

  // ---- /ToUnicode CMaps (single-byte) ----

  private def cmapPdf(content: String, cmap: String): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> >>")
    sb ++= streamObj(4, content, compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      "/ToUnicode 6 0 R >>")
    sb ++= streamObj(6, cmap, compress = true) // CMaps are usually flated
    sb ++= obj(7, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    sb ++= "%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private val testCMap =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<00> <FF>
      |endcodespacerange
      |2 beginbfchar
      |<01> <0048>
      |<02> <0069>
      |endbfchar
      |2 beginbfrange
      |<10> <12> <0061>
      |<20> <21> [<0058> <0059>]
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end
      |end""".stripMargin

  test("ToUnicode bfchar/bfrange decode shows; unmapped bytes fall back") {
    // 01 02 → "Hi" (bfchar), 10 11 12 → "abc" (incrementing bfrange),
    // 20 21 → "XY" (array bfrange), 41 → "A" (unmapped → Latin-1)
    val pdf = cmapPdf(
      "BT /F1 12 Tf 72 720 Td <01021011122021 41> Tj ET", testCMap)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("HiabcXYA"))
  }

  test("Tf font switches swap the active CMap; BOM'd UTF-16 still wins") {
    val pdf = cmapPdf(
      "BT /F1 12 Tf 72 720 Td <0102> Tj " +
        "/F2 12 Tf 0 -20 Td <4869> Tj " +          // F2 has no ToUnicode
        "/F1 12 Tf 0 -20 Td <FEFF014C0151> Tj ET", // BOM: already unicode
      testCMap)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("Hi", "Hi", "Ōő"))
  }

  test("parseCMap handles bfrange with a multi-unit base prefix") {
    val cm = PdfTextParser.parseCMap(
      ("1 beginbfrange\n<05> <06> <00660066006C>\nendbfrange")
        .getBytes(StandardCharsets.ISO_8859_1))
    // base "ffl": the LAST UTF-16 unit increments across the range
    assert(cm.width === 1)
    assert(cm.m((1, 0x05)) === "ffl" && cm.m((1, 0x06)) === "ffm")
  }

  // ---- /ToUnicode CMaps (2-byte codespace: CID-keyed subset fonts) ----

  private val testCMap2 =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0003> <0048>
      |<0004> <0069>
      |endbfchar
      |2 beginbfrange
      |<0010> <0012> <0061>
      |<0020> <0021> [<0058> <0059>]
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end
      |end""".stripMargin

  test("2-byte ToUnicode CMaps decode CID-font shows pairwise") {
    // <0003><0004> → "Hi", <0010..0012> → "abc", <0020><0021> → "XY"
    val pdf = cmapPdf(
      "BT /F1 12 Tf 72 720 Td <000300040010001100120020 0021> Tj ET", testCMap2)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("HiabcXY"))
  }

  test("2-byte shows drop unmapped codes and trailing odd bytes, never garble") {
    // 0999 is unmapped (dropped); the trailing lone byte 42 is dropped too
    val pdf = cmapPdf(
      "BT /F1 12 Tf 72 720 Td <0003 0999 0004 42> Tj ET", testCMap2)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("Hi"))
  }

  test("width-mismatched entries and >4-byte codespaces are refused") {
    // codespace says 1 byte but the bfchar codes are 2-byte → entry dropped,
    // no usable map
    val conflict = PdfTextParser.parseCMap(
      ("1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfchar\n<0003> <0048>\nendbfchar")
        .getBytes(StandardCharsets.ISO_8859_1))
    assert(conflict.isEmpty)
    // 3-byte codespaces are IN subset now (round 10) — the mapping parses
    val wide = PdfTextParser.parseCMap(
      ("1 begincodespacerange\n<000000> <FFFFFF>\nendcodespacerange\n" +
        "1 beginbfchar\n<000003> <0048>\nendbfchar")
        .getBytes(StandardCharsets.ISO_8859_1))
    assert(wide.m((3, 3)) === "H")
    // 5-byte bounds stay refused
    val tooWide = PdfTextParser.parseCMap(
      ("1 begincodespacerange\n<0000000000> <FFFFFFFFFF>\nendcodespacerange\n" +
        "1 beginbfchar\n<0000000003> <0048>\nendbfchar")
        .getBytes(StandardCharsets.ISO_8859_1))
    assert(tooWide.isEmpty)
    // a font whose CMap has no usable mappings falls back to byte decoding
    val pdf = cmapPdf("BT /F1 12 Tf 72 720 Td (Plain) Tj ET",
      "1 begincodespacerange\n<0000000000> <FFFFFFFFFF>\nendcodespacerange")
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("Plain"))
  }

  // ---- mixed 1+2-byte codespaces (Shift-JIS-shaped legacy CJK CMaps) ----

  private val testCMapMixed =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |2 begincodespacerange
      |<00> <80>
      |<8140> <FFFC>
      |endcodespacerange
      |3 beginbfchar
      |<41> <0041>
      |<8160> <301C>
      |<8276> <0057>
      |endbfchar
      |1 beginbfrange
      |<8250> <8259> <FF10>
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end
      |end""".stripMargin

  test("mixed 1+2 codespaces segment shows at the in-range width") {
    val cm = PdfTextParser.parseCMap(
      testCMapMixed.getBytes(StandardCharsets.ISO_8859_1))
    assert(cm.widths === List(1, 2) && cm.width === 0)
    // <41> is a 1-byte code (range <00><80>); <8160>/<8276>/<8250..> are
    // 2-byte codes (range <8140><FFFC>): one string mixes both widths
    val pdf = cmapPdf(
      "BT /F1 12 Tf 72 720 Td <41 8160 8250 8251 8276 41> Tj ET",
      testCMapMixed)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("A〜０１WA"))
  }

  test("mixed codespaces drop unmapped and out-of-range bytes, never garble") {
    // <42>: in the 1-byte range but unmapped → dropped; <9041>: 0x90 is no
    // 1-byte code, the pair IS in <8140><FFFC> but unmapped → dropped as a
    // pair (so the following <8160> stays aligned and decodes); trailing
    // <FD>: outside the 1-byte range with no byte to pair → resync drop
    val pdf = cmapPdf(
      "BT /F1 12 Tf 72 720 Td <41 42 9041 8160 FD> Tj ET", testCMapMixed)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("A〜"))
  }

  // ---- CID fonts with NO /ToUnicode: embedded TrueType 'cmap' recovery ----

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** minimal sfnt whose only table is a 'cmap' holding the given
    * (platformID, encodingID, subtable-bytes) records */
  private def sfntWithCmap(records: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val cmap = new ByteArrayOutputStream()
    cmap.write(be16(0)); cmap.write(be16(records.length))
    var off = 4 + 8 * records.length
    records.foreach { case (p, e, sub) =>
      cmap.write(be16(p)); cmap.write(be16(e)); cmap.write(be32(off))
      off += sub.length
    }
    records.foreach { case (_, _, sub) => cmap.write(sub) }
    val body = cmap.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(be32(0x00010000L)); out.write(be16(1))         // sfnt, 1 table
    out.write(be16(16)); out.write(be16(0)); out.write(be16(0))
    out.write("cmap".getBytes(StandardCharsets.ISO_8859_1))
    out.write(be32(0)); out.write(be32(28)); out.write(be32(body.length))
    out.write(body)
    out.toByteArray
  }

  /** format-4 subtable via the idDelta path: each (unicode → gid) pair is
    * its own single-code segment, plus the mandatory 0xFFFF terminator */
  private def cmap4Subtable(pairs: Seq[(Int, Int)]): Array[Byte] = {
    val segs = pairs.sortBy(_._1) :+ (0xFFFF -> 0)
    val n = segs.length
    val sub = new ByteArrayOutputStream()
    sub.write(be16(4)); sub.write(be16(16 + 8 * n)); sub.write(be16(0))
    sub.write(be16(2 * n)); sub.write(be16(2)); sub.write(be16(1)); sub.write(be16(0))
    segs.foreach { case (c, _) => sub.write(be16(c)) }       // endCodes
    sub.write(be16(0))                                       // reservedPad
    segs.foreach { case (c, _) => sub.write(be16(c)) }       // startCodes
    segs.foreach { case (c, g) =>                            // idDelta
      sub.write(be16(if (c == 0xFFFF) 1 else (g - c) & 0xFFFF)) }
    segs.foreach(_ => sub.write(be16(0)))                    // idRangeOffset
    sub.toByteArray
  }

  private def ttfWithCmap4(pairs: Seq[(Int, Int)]): Array[Byte] =
    sfntWithCmap(Seq((3, 1, cmap4Subtable(pairs))))

  /** format-4 subtable exercising the idRangeOffset → glyphIdArray path:
    * one segment [start, start+gids.length−1] whose glyphs come from the
    * trailing array (idDelta 0), plus the terminator */
  private def cmap4RangeSubtable(start: Int, gids: Seq[Int]): Array[Byte] = {
    val sub = new ByteArrayOutputStream()
    sub.write(be16(4)); sub.write(be16(16 + 16 + 2 * gids.length)); sub.write(be16(0))
    sub.write(be16(4)); sub.write(be16(2)); sub.write(be16(1)); sub.write(be16(0))
    sub.write(be16(start + gids.length - 1)); sub.write(be16(0xFFFF)) // endCodes
    sub.write(be16(0))                                                // pad
    sub.write(be16(start)); sub.write(be16(0xFFFF))                   // startCodes
    sub.write(be16(0)); sub.write(be16(1))                            // idDelta
    // seg 0's offset word sits 4 bytes before the glyphIdArray
    sub.write(be16(4)); sub.write(be16(0))                            // idRangeOffset
    gids.foreach(g => sub.write(be16(g)))                             // glyphIdArray
    sub.toByteArray
  }

  /** format-12 subtable: sequential-gid groups (start, end, startGid) */
  private def cmap12Subtable(groups: Seq[(Int, Int, Int)]): Array[Byte] = {
    val sub = new ByteArrayOutputStream()
    sub.write(be16(12)); sub.write(be16(0))
    sub.write(be32(16 + 12 * groups.length)); sub.write(be32(0))
    sub.write(be32(groups.length))
    groups.foreach { case (s, e, g) =>
      sub.write(be32(s)); sub.write(be32(e)); sub.write(be32(g)) }
    sub.toByteArray
  }

  /** one-page PDF with a Type0/Identity-H/CIDFontType2 font embedding
    * `ttf` as /FontFile2, NO /ToUnicode; optional /CIDToGIDMap stream */
  private def cidFontPdf(content: String, ttf: Array[Byte],
                         cidToGid: Option[Array[Byte]] = None,
                         fontFileKey: String = "FontFile2"): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.6\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, compress = false)
    val c2g = cidToGid.map(_ => " /CIDToGIDMap 8 0 R").getOrElse("")
    sb ++= obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
    sb ++= obj(6, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake " +
      s"/FontDescriptor 7 0 R$c2g >>")
    sb ++= obj(7, s"<< /Type /FontDescriptor /FontName /Fake /$fontFileKey 9 0 R >>")
    cidToGid.foreach { m =>
      sb ++= s"8 0 obj\n<< /Length ${m.length} >>\nstream\n" +
        new String(m, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    }
    sb ++= s"9 0 obj\n<< /Length ${ttf.length} >>\nstream\n" +
      new String(ttf, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("TrueTypeCmap: format-4 parse and smallest-codepoint inversion") {
    import graft.ingest.TrueTypeCmap
    val ttf = ttfWithCmap4(Seq('H'.toInt -> 3, 'i'.toInt -> 4,
      0x3042 -> 5, 0x00A0 -> 6, ' '.toInt -> 6)) // gid 6 shared: space + nbsp
    val u2g = TrueTypeCmap.unicodeToGlyph(ttf)
    assert(u2g === Map('H'.toInt -> 3, 'i'.toInt -> 4, 0x3042 -> 5,
      0x00A0 -> 6, ' '.toInt -> 6))
    val g2u = TrueTypeCmap.glyphToUnicode(ttf)
    assert(g2u(3) === "H" && g2u(5) === "あ")
    assert(g2u(6) === " ") // smallest codepoint wins for the shared glyph
    assert(TrueTypeCmap.unicodeToGlyph("nonsense".getBytes) === Map.empty)
  }

  test("TrueTypeCmap: idRangeOffset glyph arrays, format 12, preference") {
    import graft.ingest.TrueTypeCmap
    // format 4 via the glyphIdArray path (non-contiguous gids force it)
    val range = sfntWithCmap(Seq((3, 1,
      cmap4RangeSubtable('a'.toInt, Seq(7, 0, 9))))) // 'b' → gid 0: absent
    assert(TrueTypeCmap.unicodeToGlyph(range) ===
      Map('a'.toInt -> 7, 'c'.toInt -> 9))
    // format 12 carries supplementary-plane codes; surrogate-paired back
    val f12 = sfntWithCmap(Seq((3, 10,
      cmap12Subtable(Seq((0x41, 0x43, 10), (0x1F600, 0x1F601, 20))))))
    assert(TrueTypeCmap.unicodeToGlyph(f12) ===
      Map(0x41 -> 10, 0x42 -> 11, 0x43 -> 12, 0x1F600 -> 20, 0x1F601 -> 21))
    assert(TrueTypeCmap.glyphToUnicode(f12)(20) === "😀")
    // a font carrying BOTH picks the (3,10) format-12 subtable
    val both = sfntWithCmap(Seq(
      (3, 1, cmap4Subtable(Seq('X'.toInt -> 99))),
      (3, 10, cmap12Subtable(Seq((0x41, 0x41, 5))))))
    assert(TrueTypeCmap.unicodeToGlyph(both) === Map(0x41 -> 5))
  }

  test("CID font with no ToUnicode: text recovered from the font's cmap") {
    val ttf = ttfWithCmap4(Seq('H'.toInt -> 3, 'i'.toInt -> 4, 0x3042 -> 5))
    // Identity CIDToGIDMap (absent → default): show codes ARE glyph ids
    val pdf = cidFontPdf(
      "BT /F1 12 Tf 72 720 Td <0003 0004 0005 0999> Tj ET", ttf)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("Hiあ"))
  }

  test("CID font: CIDToGIDMap stream remaps show codes before the cmap") {
    val ttf = ttfWithCmap4(Seq('H'.toInt -> 3, 'i'.toInt -> 4))
    // cid 1 → gid 3 ('H'), cid 2 → gid 4 ('i'); cid 0/3 → gid 0 (missing)
    val map = Array[Byte](0, 0, 0, 3, 0, 4, 0, 0)
    val pdf = cidFontPdf(
      "BT /F1 12 Tf 72 720 Td <0001 0002 0003> Tj ET", ttf, Some(map))
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("Hi"))
  }

  test("undecodable Type0 shows DROP (empty map), never byte-garble") {
    // CFF descendant (FontFile3): out of subset — glyph-id shows must not
    // fall back to Latin-1 byte decoding (that garbles)
    val ttf = ttfWithCmap4(Seq('H'.toInt -> 3))
    val pdf = cidFontPdf("BT /F1 12 Tf 72 720 Td <00480069> Tj ET", ttf,
      fontFileKey = "FontFile3")
    assert(PdfTextParser.parseItems(pdf) === Seq.empty)
  }

  // ---- simple-font /Encoding /Differences (the pdftex/LaTeX shape) ----

  test("Differences arrays re-seat codes to named glyphs; gaps byte-decode") {
    // the classic pdftex T1 re-seating: 12→fi 13→fl, quotes at 16/17,
    // 123→endash, a uniXXXX name, and .notdef explicitly dropping a code
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4,
      "BT /F1 12 Tf 72 720 Td <0C0D 10 41 2D 11 7B 1D 1E> Tj ET",
      compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /CMR10 " +
      "/Encoding << /Type /Encoding /Differences " +
      "[12 /fi /fl 16 /quoteleft /quoteright 123 /endash " +
      "29 /uni2020 /.notdef] >> >>")
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    // 0C→ﬁ 0D→ﬂ 10→‘ 41→'A' (gap: byte fallback) 2D→'-' 11→’ 7B→–
    // 1D→† (uni2020) 1E→.notdef dropped
    assert(items.map(_.text) === Seq("ﬁﬂ‘A-’–†"))
  }

  test("WinAnsi and MacRoman base encodings re-map the upper byte range") {
    def onePage(fontBody: String, hexShow: String): Array[Byte] = {
      val sb = new StringBuilder
      sb ++= "%PDF-1.4\n"
      sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>")
      sb ++= streamObj(4, s"BT /F1 12 Tf 72 720 Td <$hexShow> Tj ET",
        compress = false)
      sb ++= obj(5, fontBody)
      sb ++= "%%EOF\n"
      sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    }
    // cp1252: 93/94 curly quotes, 96 endash, 80 euro; 41='A' unchanged;
    // 8D is undefined in Annex D → dropped
    val win = onePage("<< /Type /Font /Subtype /TrueType /BaseFont /Arial " +
      "/Encoding /WinAnsiEncoding >>", "93 41 94 20 96 80 8D")
    assert(PdfTextParser.parseItems(win).map(_.text) === Seq("“A” –€"))
    // MacRoman: 8A=ä D0=– DE=ﬁ A5=•; ASCII unchanged; as /BaseEncoding
    // inside an /Encoding dict with a Differences overlay on top (C7→/fl
    // overrides «)
    val mac = onePage("<< /Type /Font /Subtype /Type1 /BaseFont /Times " +
      "/Encoding << /BaseEncoding /MacRomanEncoding " +
      "/Differences [199 /fl] >> >>", "8A 42 D0 DE A5 C7")
    assert(PdfTextParser.parseItems(mac).map(_.text) === Seq("äB–ﬁ•ﬂ"))
  }

  test("StandardEncoding curly quotes; Type3 fonts route through Differences") {
    def onePage(fontBody: String, show: String): Array[Byte] = {
      val sb = new StringBuilder
      sb ++= "%PDF-1.4\n"
      sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>")
      sb ++= streamObj(4, s"BT /F1 12 Tf 72 720 Td $show Tj ET",
        compress = false)
      sb ++= obj(5, fontBody)
      sb ++= "%%EOF\n"
      sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    }
    // StandardEncoding: 0x27/0x60 are CURLY quotes, 0xAE the fi ligature,
    // 0xD5 undefined (dropped); ASCII letters unchanged
    val std = onePage("<< /Type /Font /Subtype /Type1 /BaseFont /Courier " +
      "/Encoding /StandardEncoding >>", "<60 41 27 AE D5>")
    assert(PdfTextParser.parseItems(std).map(_.text) === Seq("‘A’ﬁ"))
    // a Type3 font's REQUIRED /Encoding /Differences decodes the same way
    val t3 = onePage("<< /Type /Font /Subtype /Type3 " +
      "/FontBBox [0 0 10 10] /FontMatrix [0.01 0 0 0.01 0 0] " +
      "/CharProcs << >> /Encoding << /Differences [65 /dagger /bullet] >> >>",
      "<4142>")
    assert(PdfTextParser.parseItems(t3).map(_.text) === Seq("†•"))
  }

  test("a ToUnicode map still wins over a Differences array") {
    // font carries BOTH: ToUnicode says 01→H 02→i, Differences says
    // 1→A 2→B — §9.10.2 prefers /ToUnicode for text extraction
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, "BT /F1 12 Tf 72 720 Td <0102> Tj ET",
      compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R " +
      "/Encoding << /Differences [1 /A /B] >> >>")
    sb ++= streamObj(6, testCMap, compress = true)
    sb ++= "%%EOF\n"
    assert(PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1)).map(_.text) ===
      Seq("Hi"))
    import graft.ingest.GlyphNames
    assert(GlyphNames.toUnicode("adieresis") === Some("ä"))
    assert(GlyphNames.toUnicode("uni00E4") === Some("ä"))
    assert(GlyphNames.toUnicode("uni00660069") === Some("fi")) // multi-group
    assert(GlyphNames.toUnicode("u1F600") === Some("😀"))
    assert(GlyphNames.toUnicode("nosuchglyph") === None)
    assert(GlyphNames.toUnicode("uniD800") === None) // surrogate: invalid
    assert(GlyphNames.toUnicode("union") === None)   // not a hex form
  }

  test("fonts inherit /Resources from ancestor Pages nodes") {
    // /Resources lives on the Pages node; the page itself has none — the
    // /Parent walk must still find /F1's ToUnicode (ISO 32000 §7.7.3.4)
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= streamObj(4, "BT /F1 12 Tf 72 720 Td <0102> Tj ET", compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R >>")
    sb ++= streamObj(6, testCMap, compress = true)
    sb ++= "%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) === Seq("Hi"))
  }

  // ---- built-in encodings from embedded font programs (§9.6.6) ----

  /** minimal Type1C CFF assembler (TN #5176 structures, offSize 1).
    * Offsets are written as fixed-width 4-byte DICT ints so the Top
    * DICT's length is independent of their values. */
  private def cffIndex(entries: Seq[Array[Byte]]): Array[Byte] = {
    if (entries.isEmpty) return Array[Byte](0, 0)
    val offs = entries.scanLeft(1)((a, e) => a + e.length)
    Array[Byte]((entries.size >> 8).toByte, (entries.size & 0xFF).toByte, 1) ++
      offs.map(_.toByte).toArray ++ entries.flatten.toArray
  }

  private def dictInt(v: Int, op: Int): Array[Byte] =
    Array[Byte](29, (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte,
      v.toByte, op.toByte)

  /** `charset` = raw charset table bytes (or None = predefined ISOAdobe,
    * offset 0); `encoding` = raw encoding table bytes (or None =
    * predefined Standard, offset 0); `extraStrings` become SIDs 391+;
    * `extraTop` prepends extra Top DICT tokens (e.g. a ROS). */
  private def mkCffRaw(charset: Option[Array[Byte]], nGlyphs: Int,
                       encoding: Option[Array[Byte]],
                       extraStrings: Seq[String] = Nil,
                       extraTop: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val header = Array[Byte](1, 0, 4, 1)
    val nameIdx = cffIndex(Seq("TestFont".getBytes("US-ASCII")))
    def topDict(encOff: Int, csOff: Int, cstrOff: Int): Array[Byte] =
      extraTop ++ dictInt(csOff, 15) ++ dictInt(encOff, 16) ++ dictInt(cstrOff, 17)
    val topIdxLen = cffIndex(Seq(topDict(0, 0, 0))).length
    val stringIdx = cffIndex(extraStrings.map(_.getBytes("US-ASCII")))
    val base = header.length + nameIdx.length + topIdxLen + stringIdx.length
    val encOff = if (encoding.isDefined) base else 0
    val csOff =
      if (charset.isDefined) base + encoding.map(_.length).getOrElse(0) else 0
    val cstrOff = base + encoding.map(_.length).getOrElse(0) +
      charset.map(_.length).getOrElse(0)
    header ++ nameIdx ++ cffIndex(Seq(topDict(encOff, csOff, cstrOff))) ++
      stringIdx ++ encoding.getOrElse(Array.emptyByteArray) ++
      charset.getOrElse(Array.emptyByteArray) ++
      cffIndex(Seq.fill(nGlyphs)(Array[Byte](14))) // endchar charstrings
  }

  /** format-0 charset (explicit SIDs for GID 1..n) convenience */
  private def mkCff(sids: Seq[Int], encoding: Option[Array[Byte]],
                    extraStrings: Seq[String] = Nil): Array[Byte] =
    mkCffRaw(
      Some(Array[Byte](0) ++
        sids.flatMap(s => Seq((s >> 8).toByte, (s & 0xFF).toByte)).toArray),
      sids.length + 1, encoding, extraStrings)

  /** one-page PDF with a simple font whose program is embedded via
    * `fontFileKey`; the font dict itself names no /Encoding unless
    * `encodingEntry` adds one */
  private def embeddedFontPdf(content: String, font: Array[Byte],
                              fontFileKey: String = "FontFile3",
                              streamSubtype: String = " /Subtype /Type1C",
                              encodingEntry: String = ""): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.5\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Test" +
      s"$encodingEntry /FontDescriptor 6 0 R >>")
    sb ++= obj(6, s"<< /Type /FontDescriptor /FontName /Test /$fontFileKey 7 0 R >>")
    sb ++= s"7 0 obj\n<< /Length ${font.length}$streamSubtype >>\nstream\n" +
      new String(font, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("Type1C builtin encoding: CFF Encoding∘Charset names decode shows") {
    // GID1=quoteright(SID 8) GID2=fi(SID 109) GID3=A(SID 34)
    // GID4=uni2603(SID 391, via the String INDEX); 0x42 has no slot →
    // byte fallback
    val enc = Array[Byte](0, 4, 0x01, 0x02, 0x41, 0x05)
    val cff = mkCff(Seq(8, 109, 34, 391), Some(enc), Seq("uni2603"))
    val pdf = embeddedFontPdf("BT /F1 12 Tf 72 720 Td <01 02 41 05 42> Tj ET", cff)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("’ﬁA☃B"))
  }

  test("Type1C predefined Standard encoding routes through Annex D") {
    val cff = mkCff(Seq(8, 109, 34), encoding = None)
    val pdf = embeddedFontPdf("BT /F1 12 Tf 72 720 Td <60 41 27> Tj ET", cff)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("‘A’"))
  }

  test("a /Differences overlay wins over the builtin base") {
    val enc = Array[Byte](0, 1, 0x41) // builtin: 0x41 → GID1 = A
    val cff = mkCff(Seq(34), Some(enc))
    val pdf = embeddedFontPdf("BT /F1 12 Tf 72 720 Td <41 42> Tj ET", cff,
      encodingEntry = " /Encoding << /Differences [65 /bullet] >>")
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("•B"))
  }

  test("CFF charset/encoding range formats, supplements, predefined charset") {
    // charset format 1: GIDs 1..3 ← one range starting at SID 34 (A,B,C);
    // encoding format 1 + supplement bit: codes 10..12 → GIDs 1..3,
    // supplement maps 0x20 → SID 1 (space) directly
    val cs1 = Array[Byte](1, 0, 34, 2)
    val enc1 = Array[Byte](0x81.toByte, 1, 10, 2, 1, 0x20, 0, 1)
    assert(graft.ingest.CffFont.builtinEncoding(mkCffRaw(Some(cs1), 4, Some(enc1)))
      === Some(graft.ingest.CffFont.NamesBuiltin(
        Map(10 -> "A", 11 -> "B", 12 -> "C", 0x20 -> "space"))))
    // charset format 2 (16-bit nLeft), same range semantics
    val cs2 = Array[Byte](2, 0, 34, 0, 2)
    assert(graft.ingest.CffFont.builtinEncoding(mkCffRaw(Some(cs2), 4, Some(enc1)))
      === Some(graft.ingest.CffFont.NamesBuiltin(
        Map(10 -> "A", 11 -> "B", 12 -> "C", 0x20 -> "space"))))
    // predefined ISOAdobe charset (offset 0): GID i → SID i
    val encA = Array[Byte](0, 2, 0x30, 0x31) // codes '0','1' → GIDs 1,2
    assert(graft.ingest.CffFont.builtinEncoding(mkCffRaw(None, 3, Some(encA)))
      === Some(graft.ingest.CffFont.NamesBuiltin(
        Map(0x30 -> "space", 0x31 -> "exclam"))))
  }

  test("CID-keyed (ROS) and malformed CFF refuse; non-Type1C FontFile3 ignored") {
    val enc = Array[Byte](0, 1, 0x41)
    // ROS = registry/ordering/supplement operands then the (12 30) op
    val rosTop = Array[Byte](29, 0, 0, 1, 0x87.toByte, 29, 0, 0, 1, 0x88.toByte,
      29, 0, 0, 0, 0, 12, 30)
    assert(graft.ingest.CffFont.builtinEncoding(
      mkCffRaw(Some(Array[Byte](0, 0, 34)), 2, Some(enc), Nil, rosTop)).isEmpty)
    assert(graft.ingest.CffFont.builtinEncoding(Array[Byte](1, 0)).isEmpty)
    assert(graft.ingest.CffFont.builtinEncoding(
      "OTTO not a bare cff".getBytes(StandardCharsets.US_ASCII)).isEmpty)
    // a FontFile3 stream NOT tagged /Type1C (e.g. OpenType) is never
    // parsed: shows keep the plain byte decode
    val cff = mkCff(Seq(34), Some(enc))
    val pdf = embeddedFontPdf("BT /F1 12 Tf 72 720 Td <41> Tj ET", cff,
      streamSubtype = " /Subtype /OpenType")
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("A"))
  }

  // ---- CIDFontType0C (CID-keyed CFF composite fonts) ----

  /** DICT integer operand WITHOUT an operator (for multi-operand ops) */
  private def opnd(v: Int): Array[Byte] =
    Array[Byte](29, (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** composite-font one-pager: Type0/Identity-H → CIDFontType0 descendant
    * → /FontFile3 tagged /CIDFontType0C, no /ToUnicode */
  private def cidCffFontPdf(content: String, cff: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.6\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, compress = false)
    sb ++= obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /T-Identity-H " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
    sb ++= obj(6, "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /T " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
      "/Supplement 0 >> /FontDescriptor 7 0 R >>")
    sb ++= obj(7, "<< /Type /FontDescriptor /FontName /T /FontFile3 8 0 R >>")
    sb ++= s"8 0 obj\n<< /Length ${cff.length} /Subtype /CIDFontType0C >>\nstream\n" +
      new String(cff, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("CIDFontType0C: name-preserving Identity CIDs decode via the charset") {
    // ROS (Adobe=391, Identity=392, 0); GIDs 1..3 carry CIDs 393..395 =
    // the String-INDEX SIDs of uni0048/uni0069/uni2603 — show codes under
    // Identity-H ARE those CIDs
    val ros = opnd(391) ++ opnd(392) ++ opnd(0) ++ Array[Byte](12, 30)
    val cs = Array[Byte](0) ++ Seq(393, 394, 395).flatMap(s =>
      Seq((s >> 8).toByte, (s & 0xFF).toByte)).toArray
    val strings = Seq("Adobe", "Identity", "uni0048", "uni0069", "uni2603")
    val cff = mkCffRaw(Some(cs), 4, None, strings, ros)
    // unit: the CID-keyed reader surfaces ROS strings + GID→CID
    val ck = graft.ingest.CffFont.cidKeyed(cff).get
    assert(ck.registry === "Adobe" && ck.ordering === "Identity")
    assert(ck.gidToCid.toSeq === Seq(0, 393, 394, 395))
    // end-to-end: 0189 018A 018B = CIDs 393/394/395 → "Hi☃"; an unmapped
    // CID (0999) drops pairwise, never byte-garbles
    val pdf = cidCffFontPdf(
      "BT /F1 12 Tf 72 720 Td <0189018A018B0999> Tj ET", cff)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("Hi☃"))
  }

  test("CIDFontType0C refuse classes DROP: registry-ordered and opaque CIDs") {
    // Adobe-Japan1 shape: ordering != Identity → CID→unicode needs the
    // collection's UCS-2 tables (not shipped) → shows drop pairwise
    val rosJp = opnd(391) ++ opnd(392) ++ opnd(0) ++ Array[Byte](12, 30)
    val csNum = Array[Byte](0) ++ Seq(1200, 1201).flatMap(s =>
      Seq((s >> 8).toByte, (s & 0xFF).toByte)).toArray
    val jp = mkCffRaw(Some(csNum), 3, None, Seq("Adobe", "Japan1"), rosJp)
    assert(graft.ingest.CffFont.cidKeyed(jp).get.ordering === "Japan1")
    assert(PdfTextParser.parseItems(cidCffFontPdf(
      "BT /F1 12 Tf 72 720 Td <04B004B1> Tj ET", jp)) === Seq.empty)
    // opaque Identity subset (CID=GID): the small CIDs would "resolve"
    // through the STANDARD strings (CID 34 = "A") — the String-INDEX-only
    // rule must refuse rather than emit that false decode
    val csSeq = Array[Byte](0, 0, 34, 0, 35) // GID1→CID34, GID2→CID35
    val opaque = mkCffRaw(Some(csSeq), 3, None, Seq("Adobe", "Identity"), rosJp)
    assert(graft.ingest.CffFont.cidKeyed(opaque).get.ordering === "Identity")
    assert(PdfTextParser.parseItems(cidCffFontPdf(
      "BT /F1 12 Tf 72 720 Td <00220023> Tj ET", opaque)) === Seq.empty)
  }

  test("fixture modes 13 (CID-CFF), 14 (AESV3), 15 (mixed 1+3 CMap) round-trip the text") {
    import graft.ingest.PdfTextFixtures
    val lines = Seq("Hello CID keyed world.", "Second line here.", "")
    for (mode <- Seq(13L, 14L, 15L)) {
      val got = PdfTextParser.parseItems(PdfTextFixtures.textPdf(mode, lines))
      assert(got.map(_.text) === lines.filter(_.nonEmpty), s"mode $mode")
    }
    // the mixed-width class with genuinely wide characters: ASCII rides
    // the 1-byte range, é/“/” take 3-byte codes in <800000><FFFFFF> —
    // a fixed-width consumer garbles this line
    val wide = Seq("café “quoted” text", "", "")
    val got = PdfTextParser.parseItems(PdfTextFixtures.textPdf(15L, wide))
    assert(got.map(_.text) === wide.filter(_.nonEmpty))
  }

  test("3- and 4-byte uniform /ToUnicode codespaces decode; oversized bounds refuse") {
    import graft.ingest.PdfTextParser.parseCMap
    val cm3 = parseCMap(("begincmap\n1 begincodespacerange\n" +
      "<000000> <FFFFFF>\nendcodespacerange\n" +
      "2 beginbfchar\n<800001> <0041>\n<800002> <0042>\nendbfchar\n" +
      "endcmap").getBytes("ISO-8859-1"))
    assert(cm3.widths === List(3))
    assert(cm3.m((3, 0x800001)) === "A" && cm3.m((3, 0x800002)) === "B")
    val cm4 = parseCMap(("begincmap\n1 begincodespacerange\n" +
      "<00000000> <0010FFFF>\nendcodespacerange\n" +
      "1 beginbfrange\n<00000100> <00000102> <0061>\nendbfrange\n" +
      "endcmap").getBytes("ISO-8859-1"))
    assert(cm4.widths === List(4))
    assert(cm4.m((4, 0x100)) === "a" && cm4.m((4, 0x102)) === "c")
    // a 4-byte hi above Int.MaxValue, and a 5-byte bound: both refuse
    assert(parseCMap(("begincmap\n1 begincodespacerange\n" +
      "<00000000> <FFFFFFFF>\nendcodespacerange\nendcmap")
      .getBytes("ISO-8859-1")).isEmpty)
    assert(parseCMap(("begincmap\n1 begincodespacerange\n" +
      "<0000000000> <FFFFFFFFFF>\nendcodespacerange\nendcmap")
      .getBytes("ISO-8859-1")).isEmpty)
  }

  test("CFF format equivalence: charset 0/1/2 and encoding 0/1 agree") {
    // one font, four spellings: explicit-SID charset vs range charsets,
    // code-list encoding vs range encoding — the parsed builtin map must
    // be identical (consecutive SIDs 200..204 = aacute..aring at codes
    // 40..44, where both the range and list forms can express it)
    val sids = Seq(200, 201, 202, 203, 204)
    val cs0 = Array[Byte](0) ++ sids.flatMap(s =>
      Seq((s >> 8).toByte, (s & 0xFF).toByte)).toArray
    val cs1 = Array[Byte](1, 0, 200.toByte, 4)
    val cs2 = Array[Byte](2, 0, 200.toByte, 0, 4)
    val enc0 = Array[Byte](0, 5, 40, 41, 42, 43, 44)
    val enc1 = Array[Byte](1, 1, 40, 4)
    val expected = graft.ingest.CffFont.builtinEncoding(
      mkCffRaw(Some(cs0), 6, Some(enc0)))
    assert(expected.exists {
      case graft.ingest.CffFont.NamesBuiltin(m) =>
        m === Map(40 -> "aacute", 41 -> "acircumflex", 42 -> "adieresis",
          43 -> "agrave", 44 -> "aring")
      case _ => false
    })
    for (cs <- Seq(cs1, cs2); enc <- Seq(enc0, enc1))
      assert(graft.ingest.CffFont.builtinEncoding(
        mkCffRaw(Some(cs), 6, Some(enc))) === expected, s"cs=${cs.toSeq}")
  }

  test("CFF standard strings: ASCII block cross-validates against Annex D") {
    // StandardEncoding assigns codes 32..126 to SIDs 1..95 in order, so
    // the table's ASCII block must reproduce Annex D exactly (including
    // the curly-quote seats at 0x27/0x60)
    for (code <- 32 to 126) {
      val name = graft.ingest.CffFont.StdStrings(code - 31)
      val expect = graft.ingest.BaseEncodings.standard
        .getOrElse(code, code.toChar.toString)
      assert(graft.ingest.GlyphNames.toUnicode(name) === Some(expect),
        s"code $code → $name")
    }
    assert(graft.ingest.CffFont.StdStrings.length === 229)
  }

  test("Type1 /FontFile cleartext: dup-put array and StandardEncoding form") {
    val dupProg =
      "%!PS-AdobeFont-1.0: Test 001.001\n/FontName /Test def\n" +
        "/Encoding 256 array\n0 1 255 {1 index exch /.notdef put} for\n" +
        "dup 34 /fi put\ndup 65 /emdash put\nreadonly def\n" +
        "/Private 2 dict dup begin end def\ncurrentfile eexec\n" +
        "BINARYBINARYBINARY"
    val pdf = embeddedFontPdf("BT /F1 12 Tf 72 720 Td <22 41 42> Tj ET",
      dupProg.getBytes(StandardCharsets.ISO_8859_1),
      fontFileKey = "FontFile", streamSubtype = "")
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq("ﬁ—B"))

    val stdProg = "%!PS\n/Encoding StandardEncoding def\ncurrentfile eexec\nXX"
    val pdf2 = embeddedFontPdf("BT /F1 12 Tf 72 720 Td <60 41 27> Tj ET",
      stdProg.getBytes(StandardCharsets.ISO_8859_1),
      fontFileKey = "FontFile", streamSubtype = "")
    assert(PdfTextParser.parseItems(pdf2).map(_.text) === Seq("‘A’"))
  }

  test("Type1 PFB segments; puts beyond the encoding block never leak in") {
    def pfbSeg(kind: Int, data: Array[Byte]): Array[Byte] =
      Array[Byte](0x80.toByte, kind.toByte, (data.length & 0xFF).toByte,
        ((data.length >> 8) & 0xFF).toByte, ((data.length >> 16) & 0xFF).toByte,
        ((data.length >> 24) & 0xFF).toByte) ++ data
    val ascii = ("/FontName /Test def /Encoding 256 array " +
      "dup 65 /bullet put readonly def " +
      // a LATER array also using dup-put must not contaminate codes
      "/OtherArray 4 array dup 66 /dagger put def").getBytes(StandardCharsets.US_ASCII)
    val pfb = pfbSeg(1, ascii) ++ pfbSeg(2, Array[Byte](1, 2, 3)) ++
      pfbSeg(3, Array.emptyByteArray)
    assert(graft.ingest.Type1Font.builtinEncoding(pfb) ===
      Some(graft.ingest.CffFont.NamesBuiltin(Map(65 -> "bullet"))))
    // no /Encoding at all → None (byte fallback preserved)
    assert(graft.ingest.Type1Font.builtinEncoding(
      "%!PS nothing here".getBytes(StandardCharsets.US_ASCII)).isEmpty)
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
