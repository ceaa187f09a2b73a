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
  *  - mode 6: an embedded Type1C (CFF) font whose BUILT-IN encoding
  *    re-seats every distinct character to an arbitrary byte code
  *    (glyph names in uniXXXX form through the CFF String INDEX) \u2014 the
  *    dvips/dvipdfmx shape; byte-fallback decoding would emit re-seated
  *    garbage, so only a correct [[CffFont]] Encoding \u2218 Charset walk
  *    reproduces the text
  *  - mode 7: AES-128-CBC crypt filters (V=4/R=4 /StdCF /AESV2) over a
  *    flated stream
  *  - mode 8: a 2-byte /ToUnicode CMap (the CID-keyed composite-font
  *    show shape: codes consumed pairwise through bfchar entries)
  *  - mode 9: LZWDecode (clear-table-per-code stream \u2014 valid LZW that
  *    pins the decoder's reset/width machinery)
  *  - mode 10: FlateDecode with a /DecodeParms PNG Up predictor
  *  - mode 11: the text behind a /Form XObject Do under an identity CTM
  *  - mode 12: a simple-font /Encoding /Differences array of uniXXXX
  *    names re-seating every character (the pdftex/LaTeX shape)
  *  - mode 13: a CIDFontType0C composite font (Identity-H, CID-keyed CFF
  *    in /FontFile3, NO /ToUnicode) whose Identity-ordered CIDs are
  *    String-INDEX SIDs of uniXXXX names — the name-preserving
  *    Type1→CID repackaging class; only the CffFont.cidKeyed charset
  *    walk (codes = CIDs = SIDs → names → AGL) reproduces the text
  *  - mode 14: AES-256-CBC V=5/R=6 /AESV3 encryption (empty user
  *    password, Algorithm-2.B iterated hash, file key wrapped in /UE)
  *  - mode 15: a MIXED 1+3-byte /ToUnicode codespace (the GB18030/
  *    UTF-8-shaped multi-width class): ASCII shows as 1-byte codes in
  *    <00><7F>, everything else as 3-byte codes in <800000><FFFFFF> —
  *    each show position must be consumed at the shortest declared
  *    width whose range contains it
  *
  * Any decoder regression changes the extracted text for one-sixteenth
  * of the corpus and breaks the hash compare. */
object PdfTextFixtures {
  import java.nio.charset.StandardCharsets.ISO_8859_1

  def textPdf(docId: Long, lines: Seq[String]): Array[Byte] = {
    val shows = lines.zipWithIndex.filter(_._1.nonEmpty).map { case (l, i) =>
      val hex = ("\uFEFF" + l).map(c => f"${c.toInt}%04X").mkString
      s"1 0 0 1 72 ${720 - 24 * i} Tm <$hex> Tj"
    }.mkString(" ")
    val raw = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    (docId % 16) match {
      case 0 => classic(raw, "")
      case 1 => classic(deflate(raw), " /Filter /FlateDecode")
      case 2 => classic(hexEnc(deflate(raw)),
        " /Filter [/ASCIIHexDecode /FlateDecode]")
      case 3 => classic(rle(raw), " /Filter /RunLengthDecode")
      case 4 => objStmLayout(deflate(raw))
      case 5 => encrypted(deflate(raw))
      case 6 => type1cBuiltin(lines.filter(_.nonEmpty), raw)
      case 7 => aesV2Encrypted(deflate(raw))
      case 8 => twoByteCMapPdf(lines.filter(_.nonEmpty), raw)
      case 9 => classic(lzwEnc(raw), " /Filter /LZWDecode")
      case 10 => classic(deflate(pngUp(raw, 48)),
        " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 48 >>")
      case 11 => formXObjectPdf(raw)
      case 12 => differencesPdf(lines.filter(_.nonEmpty), raw)
      case 13 => cidCffPdf(lines.filter(_.nonEmpty), raw)
      case 14 => aesV3Encrypted(deflate(raw))
      case _ => threeByteCMapPdf(lines.filter(_.nonEmpty), raw)
    }
  }

  /** mode 6: every distinct character across the lines gets a fresh
    * 1-byte code (1-based, first-appearance order); the CFF's built-in
    * encoding maps code \u2192 GID and the charset maps GID \u2192 a String-INDEX
    * SID whose name is the character's uniXXXX form. Falls back to the
    * Flate shape when the text needs more than 255 codes or leaves the
    * BMP (the 1-byte/uni-form domain) \u2014 the extracted text is identical
    * either way, so the oracle is unaffected. */
  private def type1cBuiltin(text: Seq[String], rawUtf16: Array[Byte]): Array[Byte] = {
    val chars = text.flatten.distinct
    if (chars.length > 255 || chars.exists(_.isSurrogate))
      return classic(deflate(rawUtf16), " /Filter /FlateDecode")
    val code = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val shows = text.zipWithIndex.map { case (l, i) =>
      val hex = l.map(c => f"${code(c)}%02X").mkString
      s"1 0 0 1 72 ${720 - 24 * i} Tm <$hex> Tj"
    }.mkString(" ")
    val content = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    val font = cffWithBuiltin(chars.map(c => f"uni${c.toInt}%04X"))
    val sb = new StringBuilder("%PDF-1.5\n")
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, "")
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Seated " +
      "/FontDescriptor 6 0 R >>")
    sb ++= obj(6, "<< /Type /FontDescriptor /FontName /Seated /FontFile3 7 0 R >>")
    sb ++= s"7 0 obj\n<< /Length ${font.length} /Subtype /Type1C >>\nstream\n" +
      new String(font, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  /** minimal Type1C program (TN #5176): GID i+1 carries `names(i)` via a
    * format-0 charset of String-INDEX SIDs (391+i) and a format-0
    * built-in encoding assigning code i+1 \u2192 GID i+1. Offsets are written
    * as fixed-width 4-byte DICT ints so the Top DICT length is
    * independent of their values. */
  private def cffWithBuiltin(names: Seq[String]): Array[Byte] = {
    def index2(entries: Seq[Array[Byte]]): Array[Byte] = {
      // offSize 2 keeps the writer valid for any corpus-sized name set
      if (entries.isEmpty) return Array[Byte](0, 0)
      val offs = entries.scanLeft(1)((a, e) => a + e.length)
      Array[Byte]((entries.size >> 8).toByte, (entries.size & 0xFF).toByte, 2) ++
        offs.flatMap(o => Seq((o >> 8).toByte, (o & 0xFF).toByte)).toArray ++
        entries.flatten.toArray
    }
    def dictInt(v: Int, op: Int): Array[Byte] =
      Array[Byte](29, (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte,
        v.toByte, op.toByte)
    val n = names.length
    val header = Array[Byte](1, 0, 4, 1)
    val nameIdx = index2(Seq("SeatedFont".getBytes(ISO_8859_1)))
    def topDict(encOff: Int, csOff: Int, cstrOff: Int): Array[Byte] =
      dictInt(csOff, 15) ++ dictInt(encOff, 16) ++ dictInt(cstrOff, 17)
    val topIdxLen = index2(Seq(topDict(0, 0, 0))).length
    val stringIdx = index2(names.map(_.getBytes(ISO_8859_1)))
    val base = header.length + nameIdx.length + topIdxLen + stringIdx.length
    val encoding = Array[Byte](0, n.toByte) ++
      (1 to n).map(_.toByte).toArray // format 0: code i \u2192 GID i
    val charset = Array[Byte](0) ++
      (0 until n).flatMap { i =>
        val sid = 391 + i
        Seq((sid >> 8).toByte, (sid & 0xFF).toByte)
      }.toArray
    val encOff = base
    val csOff = encOff + encoding.length
    val cstrOff = csOff + charset.length
    header ++ nameIdx ++ index2(Seq(topDict(encOff, csOff, cstrOff))) ++
      stringIdx ++ encoding ++ charset ++
      index2(Seq.fill(n + 1)(Array[Byte](14))) // endchar charstrings
  }

  // ---- mode 7: AES-128-CBC crypt filters (V=4/R=4 /StdCF /AESV2) ----

  /** §7.6.2 Algorithm 1 per-object key with the AES "sAlT" suffix —
    * forward twin of Decryptor.objKey, re-derived from the spec text */
  private def aesObjKey(fileKey: Array[Byte], num: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array[Byte]((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte, 0, 0))
    md.update(Array[Byte](0x73, 0x41, 0x6C, 0x54))
    md.digest().take(math.min(fileKey.length + 5, 16))
  }

  private def aesV2Encrypted(content: Array[Byte]): Array[Byte] = {
    val key = PdfDecrypt.fileKeyR234(oEntry, pPerm, fileId, 16, 4,
      encryptMetadata = true)
    val u = PdfDecrypt.userValueR234(key, 4, fileId)
    val enc = PdfDecrypt.aesCbcEncrypt(aesObjKey(key, 4),
      Array.fill[Byte](16)(0x5A), content)
    val sb = new StringBuilder("%PDF-1.6\n")
    structural.foreach { case (n, b) => sb ++= obj(n, b) }
    sb ++= streamObj(4, enc, " /Filter /FlateDecode")
    sb ++= obj(8, "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
      s"/StmF /StdCF /StrF /StdCF /O <${hex(oEntry)}> /U <${hex(u)}> " +
      s"/P $pPerm >>")
    sb ++= s"trailer\n<< /Root 1 0 R /Size 9 /Encrypt 8 0 R " +
      s"/ID [<${hex(fileId)}> <${hex(fileId)}>] >>\n%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  // ---- mode 8: 2-byte /ToUnicode CMap (the CID-keyed composite shape) ----

  /** every distinct char gets a 2-byte code (1-based); shows are 4-hex-digit
    * code strings decoded pairwise through a bfchar CMap. Non-BMP text
    * falls back to the Flate shape (same text either way). */
  private def twoByteCMapPdf(text: Seq[String], rawUtf16: Array[Byte]): Array[Byte] = {
    val chars = text.flatten.distinct
    if (chars.length > 0xFFFE || chars.exists(_.isSurrogate))
      return classic(deflate(rawUtf16), " /Filter /FlateDecode")
    val code = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val shows = text.zipWithIndex.map { case (l, i) =>
      val hx = l.map(c => f"${code(c)}%04X").mkString
      s"1 0 0 1 72 ${720 - 24 * i} Tm <$hx> Tj"
    }.mkString(" ")
    val content = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    val bfchars = chars.grouped(100).map { grp =>
      s"${grp.length} beginbfchar\n" + grp.map(c =>
        f"<${code(c)}%04X> <${c.toInt}%04X>").mkString("\n") + "\nendbfchar"
    }.mkString("\n")
    val cmap = ("/CIDInit /ProcSet findresource begin\nbegincmap\n" +
      "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      bfchars + "\nendcmap\nend").getBytes(ISO_8859_1)
    val sb = new StringBuilder("%PDF-1.6\n")
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, "")
    sb ++= obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fixture " +
      "/Encoding /Identity-H /ToUnicode 9 0 R >>")
    sb ++= streamObj(9, cmap, "")
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  // ---- mode 15: mixed 1+3-byte /ToUnicode codespace (GB18030-shaped) ----

  /** ASCII characters show as 1-byte codes in <00><7F> (identity), all
    * others as 3-byte codes in <800000><FFFFFF> — the multi-width CMap
    * segmentation class: a decoder that consumes at a fixed width (or
    * ignores the 3-byte space) garbles every line containing both. Text
    * outside the (surrogate-free, ≤0xFFFE wide chars) domain falls back
    * to the Flate shape — the extracted text is identical either way, so
    * the oracle is unaffected. */
  private def threeByteCMapPdf(text: Seq[String], rawUtf16: Array[Byte]): Array[Byte] = {
    val chars = text.flatten.distinct
    val wide = chars.filter(_ >= 0x80)
    if (wide.length > 0xFFFE || chars.exists(_.isSurrogate))
      return classic(deflate(rawUtf16), " /Filter /FlateDecode")
    val code3 = wide.zipWithIndex.map { case (c, i) => c -> (0x800000 + i) }.toMap
    def hexOf(c: Char): String =
      if (c < 0x80) f"${c.toInt}%02X" else f"${code3(c)}%06X"
    val shows = text.zipWithIndex.map { case (l, i) =>
      s"1 0 0 1 72 ${720 - 24 * i} Tm <${l.map(hexOf).mkString}> Tj"
    }.mkString(" ")
    val content = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    def bfBlock(grp: Seq[Char], codeHex: Char => String): String =
      s"${grp.length} beginbfchar\n" + grp.map(c =>
        s"<${codeHex(c)}> <${f"${c.toInt}%04X"}>").mkString("\n") + "\nendbfchar"
    val ascii = chars.filter(_ < 0x80)
    val blocks =
      ascii.grouped(100).map(g => bfBlock(g, c => f"${c.toInt}%02X")).toSeq ++
      wide.grouped(100).map(g => bfBlock(g, c => f"${code3(c)}%06X")).toSeq
    val cmap = ("/CIDInit /ProcSet findresource begin\nbegincmap\n" +
      "2 begincodespacerange\n<00> <7F>\n<800000> <FFFFFF>\nendcodespacerange\n" +
      blocks.mkString("\n") + "\nendcmap\nend").getBytes(ISO_8859_1)
    val sb = new StringBuilder("%PDF-1.6\n")
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, "")
    sb ++= obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fixture " +
      "/Encoding /Identity-H /ToUnicode 9 0 R >>")
    sb ++= streamObj(9, cmap, "")
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  // ---- mode 9: LZWDecode ----

  /** valid (if maximally naive) LZW: a ClearTable before every literal
    * code keeps the table empty and the width at 9 bits — exercises the
    * decoder's reset/width machinery without re-implementing compression */
  private def lzwEnc(raw: Array[Byte]): Array[Byte] = {
    val codes = raw.flatMap(b => Seq(256, b & 0xFF)) :+ 257
    val out = new java.io.ByteArrayOutputStream
    var acc = 0L; var nb = 0
    codes.foreach { c =>
      acc = (acc << 9) | c; nb += 9
      while (nb >= 8) { out.write(((acc >> (nb - 8)) & 0xFF).toInt); nb -= 8 }
    }
    if (nb > 0) out.write(((acc << (8 - nb)) & 0xFF).toInt)
    out.toByteArray
  }

  // ---- mode 10: PNG Up predictor under Flate ----

  /** forward PNG Up filter (tag 2 per row): diff against the prior row;
    * content is space-padded to a whole row count (trailing spaces are
    * lexically inert), matching the decoder's whole-rows-only contract */
  private def pngUp(raw: Array[Byte], cols: Int): Array[Byte] = {
    val padded = raw ++ Array.fill((cols - raw.length % cols) % cols)(' '.toByte)
    val out = new java.io.ByteArrayOutputStream
    var prior = new Array[Byte](cols)
    padded.grouped(cols).foreach { r =>
      out.write(2)
      r.indices.foreach(i => out.write((r(i) - prior(i)) & 0xFF))
      prior = r
    }
    out.toByteArray
  }

  // ---- mode 11: /Form XObject indirection ----

  /** the text lives in a /Subtype /Form stream reached via Do under an
    * identity CTM — pins the recursion and its coordinate placement */
  private def formXObjectPdf(raw: Array[Byte]): Array[Byte] = {
    val pageContent = "q 1 0 0 1 0 0 cm /Fx Do Q".getBytes(ISO_8859_1)
    val sb = new StringBuilder("%PDF-1.4\n")
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Fx 6 0 R >> >> >>")
    sb ++= streamObj(4, pageContent, "")
    sb ++= s"6 0 obj\n<< /Subtype /Form /Length ${raw.length} >>\nstream\n" +
      new String(raw, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  // ---- mode 12: simple-font /Encoding /Differences re-seating ----

  /** every distinct char re-seated to a 1-byte code via a /Differences
    * array of uniXXXX glyph names — the pdftex/LaTeX shape; byte-fallback
    * decoding would garble every show */
  private def differencesPdf(text: Seq[String], rawUtf16: Array[Byte]): Array[Byte] = {
    val chars = text.flatten.distinct
    if (chars.length > 255 || chars.exists(_.isSurrogate))
      return classic(deflate(rawUtf16), " /Filter /FlateDecode")
    val code = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val shows = text.zipWithIndex.map { case (l, i) =>
      val hx = l.map(c => f"${code(c)}%02X").mkString
      s"1 0 0 1 72 ${720 - 24 * i} Tm <$hx> Tj"
    }.mkString(" ")
    val content = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    val diffs = chars.map(c => f"/uni${c.toInt}%04X").mkString(" ")
    val sb = new StringBuilder("%PDF-1.4\n")
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, "")
    sb ++= obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Seated " +
      s"/Encoding << /Type /Encoding /Differences [1 $diffs] >> >>")
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  // ---- mode 13: CIDFontType0C (CID-keyed CFF, Identity-H, no /ToUnicode) ----

  /** every distinct char gets GID i+1 whose charset CID is the
    * String-INDEX SID of its uniXXXX name (SIDs 391="Adobe",
    * 392="Identity" for the /ROS, then 393+i per glyph) — the
    * name-preserving Type1→CID repackaging shape. Shows are 2-byte CID
    * codes under /Identity-H. Decoding needs the full CffFont.cidKeyed
    * walk: code = CID = SID → name → AGL; byte or pairwise-blind decoding
    * yields nothing. Non-BMP / oversized texts fall back to Flate (text
    * identical either way, oracle unaffected). */
  private def cidCffPdf(text: Seq[String], rawUtf16: Array[Byte]): Array[Byte] = {
    val chars = text.flatten.distinct
    if (chars.length > 1000 || chars.exists(_.isSurrogate))
      return classic(deflate(rawUtf16), " /Filter /FlateDecode")
    val cidOf = chars.zipWithIndex.map { case (c, i) => c -> (393 + i) }.toMap
    val shows = text.zipWithIndex.map { case (l, i) =>
      val hx = l.map(c => f"${cidOf(c)}%04X").mkString
      s"1 0 0 1 72 ${720 - 24 * i} Tm <$hx> Tj"
    }.mkString(" ")
    val content = s"BT /F1 12 Tf $shows ET".getBytes(ISO_8859_1)
    val font = cidKeyedCff(chars.map(c => f"uni${c.toInt}%04X"))
    val sb = new StringBuilder("%PDF-1.5\n")
    sb ++= obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    sb ++= obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    sb ++= obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >>")
    sb ++= streamObj(4, content, "")
    sb ++= obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /SeatedCID " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
    sb ++= obj(6, "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /SeatedCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
      "/Supplement 0 >> /FontDescriptor 7 0 R >>")
    sb ++= obj(7, "<< /Type /FontDescriptor /FontName /SeatedCID /FontFile3 8 0 R >>")
    sb ++= s"8 0 obj\n<< /Length ${font.length} /Subtype /CIDFontType0C >>\nstream\n" +
      new String(font, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  /** minimal CID-keyed CFF (TN #5176 §18): Top DICT carries
    * ROS(391, 392, 0), an explicit format-0 charset mapping GID i+1 →
    * CID 393+i, endchar charstrings, and the §18-required FDArray (one
    * empty-Private font DICT) + FDSelect (format 3, one range). The
    * String INDEX holds "Adobe", "Identity", then the glyph names, so
    * SID 391+k resolves them in order. Offsets are fixed-width 4-byte
    * DICT ints so the Top DICT length is independent of their values. */
  private def cidKeyedCff(names: Seq[String]): Array[Byte] = {
    def index2(entries: Seq[Array[Byte]]): Array[Byte] = {
      if (entries.isEmpty) return Array[Byte](0, 0)
      val offs = entries.scanLeft(1)((a, e) => a + e.length)
      Array[Byte]((entries.size >> 8).toByte, (entries.size & 0xFF).toByte, 2) ++
        offs.flatMap(o => Seq((o >> 8).toByte, (o & 0xFF).toByte)).toArray ++
        entries.flatten.toArray
    }
    def int5(v: Int): Array[Byte] =
      Array[Byte](29, (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val n = names.length
    val header = Array[Byte](1, 0, 4, 1)
    val nameIdx = index2(Seq("SeatedCIDFont".getBytes(ISO_8859_1)))
    def topDict(csOff: Int, cstrOff: Int, fdaOff: Int, fdsOff: Int): Array[Byte] =
      int5(391) ++ int5(392) ++ int5(0) ++ Array[Byte](12, 30) ++ // ROS
        int5(csOff) ++ Array[Byte](15) ++
        int5(cstrOff) ++ Array[Byte](17) ++
        int5(fdaOff) ++ Array[Byte](12, 36) ++
        int5(fdsOff) ++ Array[Byte](12, 37)
    val topIdxLen = index2(Seq(topDict(0, 0, 0, 0))).length
    val stringIdx = index2(
      (Seq("Adobe", "Identity") ++ names).map(_.getBytes(ISO_8859_1)))
    val base = header.length + nameIdx.length + topIdxLen + stringIdx.length
    val charset = Array[Byte](0) ++
      (0 until n).flatMap { i =>
        val cid = 393 + i
        Seq((cid >> 8).toByte, (cid & 0xFF).toByte)
      }.toArray
    val charstrings = index2(Seq.fill(n + 1)(Array[Byte](14))) // endchar
    // FDSelect format 3: one range covering every glyph → font DICT 0
    val fdSelect = Array[Byte](3, 0, 1, 0, 0, 0,
      ((n + 1) >> 8).toByte, ((n + 1) & 0xFF).toByte)
    val csOff = base
    val cstrOff = csOff + charset.length
    val fdsOff = cstrOff + charstrings.length
    val fdaOff = fdsOff + fdSelect.length
    // FDArray: one font DICT whose Private points at a 2-byte empty dict
    // directly after the INDEX (size 0 is tolerated by lenient readers)
    val fdArray = index2(Seq(int5(0) ++ int5(fdaOff) ++ Array[Byte](18)))
    header ++ nameIdx ++ index2(Seq(topDict(csOff, cstrOff, fdaOff, fdsOff))) ++
      stringIdx ++ charset ++ charstrings ++ fdSelect ++ fdArray
  }

  // ---- mode 14: AES-256 V=5/R=6 /AESV3 crypt filters ----

  // fixed salts/key make the fixture deterministic; U/UE are derived by
  // the FORWARD halves of ISO 32000-2 §7.6.4 (Algorithm 2.B hash, file
  // key wrapped under the intermediate key with a zero IV)
  private val v5FileKey = Array.tabulate[Byte](32)(i => (i * 13 + 7).toByte)
  private val v5ValSalt = Array.tabulate[Byte](8)(i => (i * 3 + 1).toByte)
  private val v5KeySalt = Array.tabulate[Byte](8)(i => (i * 5 + 2).toByte)
  private lazy val v5U =
    PdfDecrypt.hash2B(Array.emptyByteArray, v5ValSalt, Array.emptyByteArray) ++
      v5ValSalt ++ v5KeySalt
  private lazy val v5UE = {
    val iKey =
      PdfDecrypt.hash2B(Array.emptyByteArray, v5KeySalt, Array.emptyByteArray)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(iKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(v5FileKey)
  }

  private def aesV3Encrypted(content: Array[Byte]): Array[Byte] = {
    // V=5 uses ONE file key for every object (no per-object derivation)
    val enc = PdfDecrypt.aesCbcEncrypt(v5FileKey,
      Array.fill[Byte](16)(0x3C), content)
    val oEntry48 = Array.tabulate[Byte](48)(i => (i * 9 + 4).toByte)
    val sb = new StringBuilder("%PDF-2.0\n")
    structural.foreach { case (n, b) => sb ++= obj(n, b) }
    sb ++= streamObj(4, enc, " /Filter /FlateDecode")
    sb ++= obj(8, "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
      s"/StmF /StdCF /StrF /StdCF /O <${hex(oEntry48)}> /U <${hex(v5U)}> " +
      s"/UE <${hex(v5UE)}> /P -44 >>")
    sb ++= s"trailer\n<< /Root 1 0 R /Size 9 /Encrypt 8 0 R " +
      s"/ID [<${hex(fileId)}> <${hex(fileId)}>] >>\n%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
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

/** Deterministic PDFs with EMBEDDED IMAGE XObjects, the [[PdfImages]]
  * fixture family. One page painted by the content stream; the image's
  * encoding rotates by doc_id % 14 through the raster shapes a crawled
  * corpus carries (0 raw RGB, 1 Flate, 2 Flate+PNG-predictor, 3
  * baseline-JPEG DCTDecode, 4 AHx+Flate chain, 5 CCITT G4 — half with
  * /Decode [1 0] over the inverted plane, 6 inline BI…ID…EI, 7
  * generic-region JBIG2, 8 SYMBOL-CODED JBIG2, 9 a refused-JPX +
  * decodable-sibling page, 10 REFINED JBIG2, 11 HUFFMAN-dictionary
  * JBIG2 — collective bitmaps uncompressed or MMR, 12 /JBIG2Globals
  * shared-dictionary JBIG2, 13 CUSTOM-TABLE Huffman JBIG2 — §7.4.13
  * code table segments), while every pixel
  * stays a closed form of (doc_id, x, y) — so a DuckDB oracle replays luma
  * statistics for the WHOLE rotation, DCT and G4 included (the JPEG
  * fixture is DC-exact, see [[graft.ops.Jpeg]]; G4 and JBIG2 are lossless
  * by construction). */
object PdfImageFixtures {
  import java.nio.charset.StandardCharsets.ISO_8859_1

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

  /** PNG Up predictor rows (Predictor 12), colors=1 bpc=8 */
  private def pngUpRows(raw: Array[Byte], cols: Int): Array[Byte] = {
    val nRows = raw.length / cols
    val out = new Array[Byte]((cols + 1) * nRows)
    var r = 0
    while (r < nRows) {
      out(r * (cols + 1)) = 2 // Up
      var c = 0
      while (c < cols) {
        val cur = raw(r * cols + c) & 0xff
        val up = if (r == 0) 0 else raw((r - 1) * cols + c) & 0xff
        out(r * (cols + 1) + 1 + c) = ((cur - up) & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  // closed-form pixel rules (shared with the oracle SQL)
  private[graft] def rgbDims(docId: Long): (Int, Int) =
    ((4 + docId % 5).toInt, (3 + docId % 4).toInt)
  private[graft] def grayDims(docId: Long): (Int, Int) = rgbDims(docId)
  private[graft] def ccittDims(docId: Long): (Int, Int) =
    ((8 + docId % 5).toInt, (6 + docId % 3).toInt)
  private[graft] def jbig2Dims(docId: Long): (Int, Int) =
    ((8 + docId % 6).toInt, (5 + docId % 4).toInt)
  /** symbol-coded class: (glyph width, page width = 4 glyphs, height) */
  private[graft] def symDims(docId: Long): (Int, Int, Int) = {
    val gw = (2 + docId % 3).toInt
    (gw, 4 * gw, (5 + docId % 4).toInt)
  }
  private[graft] def grayPx(did: Int, x: Int, y: Int): Int =
    (did + 5 * x + 11 * y) % 256
  private[graft] def ccittBlack(did: Int, x: Int, y: Int): Boolean =
    (did + 3 * x + 5 * y) % 7 < 3
  private[graft] def jbig2Black(did: Int, x: Int, y: Int): Boolean =
    (did + 5 * x + 3 * y) % 11 < 4
  /** period-2·gw pattern: glyph k covers columns [k·gw, (k+1)·gw), so four
    * placed instances of the two glyphs tile the page and the COMPOSED
    * raster is this closed form of page coordinates */
  private[graft] def symBlack(did: Int, gw: Int, x: Int, y: Int): Boolean =
    (did + 5 * (x % (2 * gw)) + 3 * y) % 11 < 4

  /** refined-JBIG2 class (c = 10): glyph gw × h, page = 3 glyphs wide */
  private[graft] def refDims(docId: Long): (Int, Int, Int) = {
    val gw = (3 + docId % 3).toInt
    (gw, 3 * gw, (5 + docId % 4).toInt)
  }
  /** page closed form for the refined class: third k of the page holds
    * the base glyph (k=0), the REFAGG-refined dictionary symbol
    * (k=1: base ⊕ ((x+y)%5=0)) or the per-instance IARI refinement
    * (k=2: base ⊕ ((x·y)%7=0)); refinement coding is lossless so the
    * composed raster IS this form */
  private[graft] def refBlack(did: Int, gw: Int, x: Int, y: Int): Boolean = {
    val lx = x % gw
    val base = jbig2Black(did, lx, y)
    (x / gw) match {
      case 0 => base
      case 1 => base != ((lx + y) % 5 == 0)
      case _ => base != ((lx * y) % 7 == 0)
    }
  }

  private def rgbSamples(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val (w, h) = rgbDims(docId)
    val out = new Array[Byte](3 * w * h)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(i) = ((did + x * y) % 256).toByte
        out(i + 1) = ((2 * did + 3 * x + 5 * y) % 256).toByte
        out(i + 2) = ((did + 7 * x + 13 * y) % 256).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  private def graySamples(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val (w, h) = grayDims(docId)
    Array.tabulate(w * h)(i => grayPx(did, i % w, i / w).toByte)
  }

  private def ccittPlane(docId: Long): (Array[Boolean], Int, Int) = {
    val did = (docId % 256).toInt
    val (w, h) = ccittDims(docId)
    (Array.tabulate(w * h)(i => ccittBlack(did, i % w, i / w)), w, h)
  }

  /** assemble a one-page PDF whose /Im0 is `data` with `imgDict` extras */
  private def assemble(data: Array[Byte], w: Int, h: Int,
                       imgDict: String): Array[Byte] = {
    val content = s"q $w 0 0 $h 0 0 cm /Im0 Do Q".getBytes(ISO_8859_1)
    val sb = new StringBuilder("%PDF-1.4\n")
    def obj(num: Int, body: String): Unit =
      sb ++= s"$num 0 obj\n$body\nendobj\n": Unit
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Im0 5 0 R >> >> >>")
    sb ++= s"4 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      new String(content, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h $imgDict /Length ${data.length} >>\nstream\n" +
      new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  /** inline-image page: the raster lives INSIDE the content stream
    * (§8.9.7 BI…ID…EI with abbreviated keys), raw gray samples */
  private def assembleInline(docId: Long): Array[Byte] = {
    val (w, h) = grayDims(docId)
    val pre = s"q $w 0 0 $h 0 0 cm BI /W $w /H $h /BPC 8 /CS /G ID "
      .getBytes(ISO_8859_1)
    val post = " EI Q".getBytes(ISO_8859_1)
    val content = pre ++ graySamples(docId) ++ post
    val sb = new StringBuilder("%PDF-1.4\n")
    def obj(num: Int, body: String): Unit =
      sb ++= s"$num 0 obj\n$body\nendobj\n": Unit
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    sb ++= s"4 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      new String(content, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  /** two-image page: /Im0 is a REFUSED /JPXDecode member (deliberate —
    * JPX stays out of subset), /Im1 the decodable raw-gray sibling. Pins
    * refusal semantics: the JPX image is skipped, its sibling decodes,
    * page text machinery untouched — a regression that turns refusal into
    * garbling (or drops siblings) breaks the oracle's row count. */
  private def assembleJpxSibling(docId: Long): Array[Byte] = {
    val (w, h) = grayDims(docId)
    val jpx = Array.tabulate(24)(i => ((docId + 7 * i) % 256).toByte)
    val content = s"q $w 0 0 $h 0 0 cm /Im0 Do /Im1 Do Q".getBytes(ISO_8859_1)
    val gray = deflate(graySamples(docId))
    val sb = new StringBuilder("%PDF-1.4\n")
    def obj(num: Int, body: String): Unit =
      sb ++= s"$num 0 obj\n$body\nendobj\n": Unit
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Im0 5 0 R /Im1 6 0 R >> >> >>")
    sb ++= s"4 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      new String(content, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h /ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      s"/Filter /JPXDecode /Length ${jpx.length} >>\nstream\n" +
      new String(jpx, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"6 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h /ColorSpace /DeviceGray /BitsPerComponent 8 " +
      s"/Filter /FlateDecode /Length ${gray.length} >>\nstream\n" +
      new String(gray, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  /** one-page PDF whose JBIG2 image keeps its symbol DICTIONARY in a
    * separate /JBIG2Globals stream (ISO 32000 §7.4.7 — the multi-page
    * scanned shape where every page shares one dictionary); the globals
    * stream itself is Flate-coded so its own /Filter chain is exercised */
  private def assembleJbig2Globals(docId: Long, globals: Array[Byte],
                                   page: Array[Byte], w: Int,
                                   h: Int): Array[Byte] = {
    val content = s"q $w 0 0 $h 0 0 cm /Im0 Do Q".getBytes(ISO_8859_1)
    val gz = deflate(globals)
    val sb = new StringBuilder("%PDF-1.4\n")
    def obj(num: Int, body: String): Unit =
      sb ++= s"$num 0 obj\n$body\nendobj\n": Unit
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Im0 5 0 R >> >> >>")
    sb ++= s"4 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      new String(content, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h /ColorSpace /DeviceGray /BitsPerComponent 1 " +
      "/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals 6 0 R >> " +
      s"/Length ${page.length} >>\nstream\n" +
      new String(page, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"6 0 obj\n<< /Filter /FlateDecode /Length ${gz.length} >>\nstream\n" +
      new String(gz, ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= "%%EOF\n"
    sb.toString.getBytes(ISO_8859_1)
  }

  /** the rotation entry point: a complete PDF whose embedded image's
    * encoding class is doc_id % 14 */
  def imagePdf(docId: Long): Array[Byte] = (docId % 14) match {
    case 0 =>
      val (w, h) = rgbDims(docId)
      assemble(rgbSamples(docId), w, h,
        "/ColorSpace /DeviceRGB /BitsPerComponent 8")
    case 1 =>
      val (w, h) = rgbDims(docId)
      assemble(deflate(rgbSamples(docId)), w, h,
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode")
    case 2 =>
      val (w, h) = grayDims(docId)
      assemble(deflate(pngUpRows(graySamples(docId), w)), w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode " +
          s"/DecodeParms << /Predictor 12 /Colors 1 /Columns $w >>")
    case 3 =>
      val jp = graft.ops.Jpeg.encodeJpeg(docId)
      val w = (24 + (docId % 2) * 8).toInt
      val h = (16 + (docId % 3) * 8).toInt
      assemble(jp, w, h,
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode")
    case 4 =>
      val (w, h) = grayDims(docId)
      assemble(hexEnc(deflate(graySamples(docId))), w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 8 " +
          "/Filter [/ASCIIHexDecode /FlateDecode]")
    case 5 =>
      val (plane, w, h) = ccittPlane(docId)
      // half the class carries /Decode [1 0] over the INVERTED plane —
      // the two inversions cancel, so the same oracle pins that the
      // /Decode array is actually applied (a decoder ignoring it emits
      // inverted luma and breaks the hash for this half)
      val inverted = (docId / 10) % 2 == 1
      val enc = if (inverted) plane.map(!_) else plane
      assemble(CcittG4.encode(enc, w, h), w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
          "/Filter /CCITTFaxDecode " +
          s"/DecodeParms << /K -1 /Columns $w /Rows $h >>" +
          (if (inverted) " /Decode [1 0]" else ""))
    case 6 => assembleInline(docId)
    case 7 =>
      val did = (docId % 256).toInt
      val (w, h) = jbig2Dims(docId)
      val plane = Array.tabulate(w * h)(i => jbig2Black(did, i % w, i / w))
      // alternate the region coder across the corpus: arithmetic template 0
      // (with TPGDON on half of those) and MMR — all lossless, one oracle
      val mmr = (docId / 10) % 2 == 0
      val tpgdon = (docId / 10) % 4 == 1
      assemble(Jbig2.encodeEmbedded(plane, w, h, mmr = mmr, tpgdon = tpgdon),
        w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode")
    case 8 =>
      // SYMBOL-CODED JBIG2 (the jbig2enc scanned-text shape): a 2-glyph
      // dictionary + text region tiling the page with 4 instances — the
      // composed raster is the closed form symBlack over page coords
      val did = (docId % 256).toInt
      val (gw, w, h) = symDims(docId)
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      // rotate the §6.4.5 placement variants across the corpus: plain
      // TOPLEFT one-row strips, BOTTOMLEFT corners, multi-strip
      // (SBSTRIPS=4 with per-instance IAIT offsets), and TRANSPOSED
      // (swapped S/T axes, the vertical-text shape) — the composed
      // raster is identical, so ONE oracle pins all four coded shapes
      val variant = (docId / 10) % 4
      assemble(Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
          bottomLeft = variant == 1,
          logStrips = if (variant == 2) 2 else 0,
          transposed = variant == 3), w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode")
    case 10 =>
      // REFINED JBIG2 (§6.3): dictionary A's prototype, a REFAGG-refined
      // dictionary symbol (dictionary B, single-instance aggregate), and a
      // per-instance IARI refinement placed side by side — the three
      // thirds of the page follow the refBlack closed form, template
      // rotated across the corpus
      val did = (docId % 256).toInt
      val (gw, w, h) = refDims(docId)
      def bits(third: Int): Array[Boolean] =
        Array.tabulate(gw * h)(i => refBlack(did, gw, third * gw + i % gw, i / gw))
      val g0 = Jbig2.Glyph(gw, h, bits(0))
      val g1 = Jbig2.Glyph(gw, h, bits(1))
      val stream = Jbig2.encodeEmbeddedRefined(IndexedSeq(g0), Seq((0, g1)),
        Seq((0, 0, 0, None), (1, gw, 0, None), (0, 2 * gw, 0, Some(bits(2)))),
        w, h, rTemplate = ((docId / 11) % 2).toInt)
      assemble(stream, w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode")
    case 11 =>
      // HUFFMAN-DICTIONARY JBIG2 (§6.5 SDHUFF=1, standard Annex-B tables):
      // the class-8 glyph/placement shape with the dictionary coded via
      // height-class COLLECTIVE BITMAPS (§6.5.9) — uncompressed for half
      // the corpus, MMR for the other half — and the text region still
      // arithmetic; the composed raster follows the same symBlack form,
      // so ONE oracle pins both collective-bitmap codings
      val did = (docId % 256).toInt
      val (gw, w, h) = symDims(docId)
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      assemble(Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
          huffDict = ((docId / 12) % 2).toInt), w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode")
    case 12 =>
      // /JBIG2Globals: same composed raster as classes 8/11 but the
      // symbol dictionary travels in a SHARED out-of-band stream the
      // image's /DecodeParms points at — the multi-page scanner shape;
      // the dictionary coding alternates arithmetic / Huffman across the
      // corpus so the globals route is pinned for both
      val did = (docId % 256).toInt
      val (gw, w, h) = symDims(docId)
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      val (globals, page) = Jbig2.encodeEmbeddedSymbolsGlobals(glyphs, places,
        w, h, huffDict = if ((docId / 13) % 2 == 0) -1 else 0)
      assembleJbig2Globals(docId, globals, page, w, h)
    case 13 =>
      // CUSTOM-TABLE Huffman JBIG2 (§7.4.13 / §B.2): the class-8/11
      // glyph/placement shape, but the dictionary's DH/DW/BMSIZE coding
      // tables are BUILT from the stream's own value sets and travel as
      // code table segments (SDHUFFDH/DW selection 3 + the custom-BMSIZE
      // flag) — the self-describing custom-table shape; collective
      // bitmaps alternate uncompressed / MMR across the corpus, and the
      // TEXT region alternates arithmetic / SBHUFF-all-custom (FS/DS/DT
      // selection 3 + the §7.4.4.5 runcode symbol-ID table), so one
      // oracle pins both dictionary codings AND both text coders through
      // the custom tables
      val did = (docId % 256).toInt
      val (gw, w, h) = symDims(docId)
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      assemble(Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
          huffDict = ((docId / 14) % 2).toInt, customTables = true,
          huffText = (docId / 28) % 2 == 1), w, h,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode")
    case _ => assembleJpxSibling(docId)
  }

  /** near-dup fixture: ONE 8×8 gray Flate image whose pixels follow the
    * md5 rule of [[graft.ops.Multimodal.encodeBmpGray]] (keyed, optional
    * single-pixel perturbation) — so PDFs whose keys collide carry
    * hamming-close embedded images and the banded-hamming pair oracle can
    * enumerate every pair closed-form. */
  def grayImagePdf(key: Long, perturb: Boolean): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      val base = md.digest(s"$key:$x:$y".getBytes("UTF-8"))(0) & 0xff
      val v = if (perturb && x == 2 && y == 4) (base + 128) % 256 else base
      v.toByte
    }
    assemble(deflate(px), 8, 8,
      "/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode")
  }
}
