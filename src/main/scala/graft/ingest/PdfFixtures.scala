package graft.ingest

import java.nio.charset.StandardCharsets

/** Deterministic single-page PDF assembler for the F21 registry query
  * (`m_visual_candidates`): every `doc_id` maps to genuine PDF bytes whose
  * image/stroke geometry follows a closed-form rule, so a DuckDB oracle can
  * recompute the expected [[VisualDetector]] decision (candidate flag + crop
  * rect) without parsing anything — the same bytes-are-real/oracle-is-
  * closed-form pattern as `m_decode_bmp`/`m_decode_wav`. The assembled files
  * are real enough to exercise the whole byte path: object scan, Pages-node
  * `/MediaBox` inheritance, `/Resources → /XObject` image resolution, CTM
  * tracking (`cm` + `Do`), and path construction/stroke ops.
  *
  * Geometry rule (page is US Letter 612×792, area 484 704; decision
  * thresholds are the reference's, `src/pdf-visual/detector.ts:27-48`):
  *
  *  - mode 0 (`doc_id % 5 == 0`) — one large image, `w = 180 + (doc_id %
  *    10)·20` × 300 at (50,200): area ratio 0.111–0.223 ≥ 0.1 → candidate;
  *    crop = rect padded by max(12, 0.08·side) per axis.
  *  - mode 1 — one medium image, `w = 100 + (doc_id % 5)·10` × 200 at
  *    (80,150): max ratio ≤ 0.0578 < 0.1, total < 0.15 → not a candidate.
  *  - mode 2 — `n = 3 + doc_id % 4` stroked 40×40 rects in a row at
  *    `y = 50 + (doc_id % 3)·30`: candidate iff n ≥ 5 (the
  *    VectorStrokeCountThreshold rule); crop = padded row union, x1
  *    clamped to the page edge when n = 6.
  *  - mode 3, even `doc_id` — text only → not a candidate; odd — one
  *    near-full-page image 540×700 at (36,46) (ratio 0.78): candidate whose
  *    padded crop covers > 85% of the page → full-page fallback (null crop).
  *  - mode 4 — two 150×220 images (total ratio 0.1362 < 0.15) plus a 90×90
  *    corner logo at (10,690): the logo is suppressed
  *    (`detector.ts:112-126`), so NOT a candidate — if suppression broke,
  *    the total would cross 0.15 and the flag would flip, so the oracle
  *    pins suppression as decision-relevant.
  */
object PdfFixtures {

  def syntheticPdf(docId: Long): Array[Byte] = {
    val mode = (docId % 5).toInt
    mode match {
      case 0 =>
        val w = 180 + (docId % 10) * 20
        onePage(s"q $w 0 0 300 50 200 cm /Im1 Do Q", nImages = 1)
      case 1 =>
        val w = 100 + (docId % 5) * 10
        onePage(s"q $w 0 0 200 80 150 cm /Im1 Do Q", nImages = 1)
      case 2 =>
        val n = 3 + (docId % 4).toInt
        val y = 50 + (docId % 3) * 30
        onePage((0 until n).map(i => s"${50 + i * 100} $y 40 40 re S").mkString(" "))
      case 3 =>
        if (docId % 2 == 0) onePage("BT /F1 12 Tf 72 720 Td (text only) Tj ET")
        else onePage("q 540 0 0 700 36 46 cm /Im1 Do Q", nImages = 1)
      case _ =>
        onePage("q 150 0 0 220 50 100 cm /Im1 Do Q " +
          "q 150 0 0 220 350 100 cm /Im2 Do Q " +
          "q 90 0 0 90 10 690 cm /Im3 Do Q", nImages = 3)
    }
  }

  /** one US-Letter page; `/MediaBox` rides the Pages node so every document
    * also exercises attribute inheritance */
  private def onePage(content: String, nImages: Int = 0): Array[Byte] = {
    def obj(num: Int, body: String): String = s"$num 0 obj\n$body\nendobj\n"
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2,
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    val res =
      if (nImages == 0) ""
      else "/Resources << /XObject << " +
        (1 to nImages).map(i => s"/Im$i ${4 + i} 0 R").mkString(" ") + " >> >> "
    sb ++= obj(3, s"<< /Type /Page /Parent 2 0 R $res/Contents 4 0 R >>")
    val data = content.getBytes(StandardCharsets.ISO_8859_1)
    sb ++= s"4 0 obj\n<< /Length ${data.length} >>\nstream\n$content\nendstream\nendobj\n"
    (1 to nImages).foreach { i =>
      sb ++= s"${4 + i} 0 obj\n<< /Subtype /Image /Width 8 /Height 8 " +
        "/Length 3 >>\nstream\nabc\nendstream\nendobj\n"
    }
    sb ++= s"trailer\n<< /Root 1 0 R /Size ${5 + nImages} >>\n%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }
}

/** S6 registry fixture: one-page PDFs carrying the given pre-split text
  * lines as BOM'd UTF-16BE hex shows (exact round-trip for any string),
  * with the FILE STRUCTURE varying by `doc_id % 6` while the text stays
  * invariant — so one closed-form oracle (the lines themselves) pins the
  * whole decode subsystem under the driver's harness on every run:
  *
  *  - mode 0: plain uncompressed content stream
  *  - mode 1: FlateDecode
  *  - mode 2: `[/ASCIIHexDecode /FlateDecode]` filter chain
  *  - mode 3: RunLengthDecode
  *  - mode 4: /ObjStm layout (catalog/page tree inside a flated object
  *    stream — the modern-producer default)
  *  - mode 5: RC4 R=3 standard-security-handler encryption (empty user
  *    password) over a flated stream
  *
  * Any decoder regression changes the extracted text for one-sixth of the
  * corpus and breaks the hash compare. */
object PdfTextFixtures {
  import java.nio.charset.StandardCharsets.ISO_8859_1

  def textPdf(docId: Long, lines: Seq[String]): Array[Byte] = {
    val shows = lines.zipWithIndex.filter(_._1.nonEmpty).map { case (l, i) =>
      val hex = ("\uFEFF" + l).map(c => f"${c.toInt}%04X").mkString
      s"1 0 0 1 72 ${720 - 24 * i} Tm <$hex> Tj"
    }.mkString(" ")
    val raw = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    (docId % 6) match {
      case 0 => classic(raw, "")
      case 1 => classic(deflate(raw), " /Filter /FlateDecode")
      case 2 => classic(hexEnc(deflate(raw)),
        " /Filter [/ASCIIHexDecode /FlateDecode]")
      case 3 => classic(rle(raw), " /Filter /RunLengthDecode")
      case 4 => objStmLayout(deflate(raw))
      case _ => encrypted(deflate(raw))
    }
  }

  private val structural = Seq(
    1 -> "<< /Type /Catalog /Pages 2 0 R >>",
    2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
    3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")

  private def obj(num: Int, body: String): String =
    s"$num 0 obj\n$body\nendobj\n"
  private def streamObj(num: Int, data: Array[Byte], filter: String): String =
    s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
      new String(data, ISO_8859_1) + "\nendstream\nendobj\n"

  private def classic(data: Array[Byte], filter: String): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    structural.foreach { case (n, b) => sb ++= obj(n, b) }
    sb ++= streamObj(4, data, filter)
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  private def objStmLayout(content: Array[Byte]): Array[Byte] = {
    val bodies = structural.map(_._2)
    val offsets = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = structural.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ")
    val payload = (header + "\n" + bodies.mkString("\n")).getBytes(ISO_8859_1)
    val stm = deflate(payload)
    val sb = new StringBuilder("%PDF-1.5\n")
    sb ++= s"10 0 obj\n<< /Type /ObjStm /N ${structural.length} " +
      s"/First ${header.length + 1} /Length ${stm.length} " +
      "/Filter /FlateDecode >>\nstream\n" +
      new String(stm, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= streamObj(4, content, " /Filter /FlateDecode")
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  // RC4 R=3 empty-user-password fixture constants (forward algorithms
  // shared with PdfDecrypt — the decrypt leg is independently pinned by
  // PdfDecryptSpec's own forward twins)
  private val oEntry = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)
  private val fileId = Array.tabulate[Byte](16)(i => (i * 11 + 5).toByte)
  private val pPerm = -44
  private lazy val fileKey =
    PdfDecrypt.fileKeyR234(oEntry, pPerm, fileId, 16, 3, encryptMetadata = true)
  private lazy val uEntry = PdfDecrypt.userValueR234(fileKey, 3, fileId)

  /** §7.6.2 Algorithm 1 per-object key (num, gen 0) */
  private def objKey(num: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array[Byte]((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte, 0, 0))
    md.digest().take(math.min(fileKey.length + 5, 16))
  }

  private def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  private def encrypted(content: Array[Byte]): Array[Byte] = {
    val enc = PdfDecrypt.rc4(objKey(4), content)
    val sb = new StringBuilder("%PDF-1.4\n")
    structural.foreach { case (n, b) => sb ++= obj(n, b) }
    sb ++= streamObj(4, enc, " /Filter /FlateDecode")
    sb ++= obj(8, "<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/O <${hex(oEntry)}> /U <${hex(uEntry)}> /P $pPerm >>")
    sb ++= s"trailer\n<< /Root 1 0 R /Size 9 /Encrypt 8 0 R " +
      s"/ID [<${hex(fileId)}> <${hex(fileId)}>] >>\n%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def hexEnc(raw: Array[Byte]): Array[Byte] =
    (raw.map("%02X".format(_)).mkString + ">").getBytes(ISO_8859_1)

  /** literal-only RunLength encoding (runs ≤ 128 + EOD) */
  private def rle(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    raw.grouped(128).foreach { g => out.write(g.length - 1); out.write(g) }
    out.write(128)
    out.toByteArray
  }
}
