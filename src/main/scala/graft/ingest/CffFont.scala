package graft.ingest

/** CFF / Type1C (Compact Font Format, Adobe TN #5176) built-in encoding
  * reader. A simple font embedded as `/FontFile3 /Subtype /Type1C` whose
  * font dict carries NO named /Encoding resolves show codes through the
  * font program's OWN Encoding ∘ Charset tables (ISO 32000 §9.6.6 step
  * "the font's built-in encoding") — the dvips/dvipdfmx/older-pdftex
  * shape the reference reads through mupdf's font machinery
  * (`src/parser/pdf-extract.ts:79-153`). Without this, those shows can
  * only byte-decode, which garbles exactly the re-seated glyphs.
  *
  * What is read (all public TN #5176 structures):
  *  - the header + Name INDEX + Top DICT INDEX + String INDEX walk
  *  - Top DICT operators: charset (15), Encoding (16), CharStrings (17);
  *    a ROS (12 30) marks a CID-keyed font → None from
  *    [[builtinEncoding]] (its charset maps glyphs to CIDs, not names —
  *    no built-in code→name exists); [[cidKeyed]] reads that shape
  *    instead (ROS strings + GID→CID charset) for the Type0 route
  *  - Charset formats 0/1/2 and the predefined ISOAdobe charset (id 0);
  *    the predefined Expert charsets (1/2) are refused
  *  - Encoding formats 0/1, each with optional supplements; predefined
  *    Standard (0) is reported as [[StandardBuiltin]] so the caller uses
  *    the Annex-D StandardEncoding table; predefined Expert (1) refused
  *  - SID → glyph name via the 391 standard strings (the text-relevant
  *    ISOAdobe range 0–228 is tabulated; Expert-set SIDs 229+ resolve
  *    only through the font's String INDEX) or the String INDEX
  *
  * Refuse-don't-garble: any structural inconsistency (truncated INDEX,
  * offsets out of bounds, unknown format byte) yields None and the
  * caller keeps its existing fallback.
  */
private[graft] object CffFont {

  private[graft] sealed trait Builtin
  /** predefined Standard encoding: caller should use Annex D's table */
  private[graft] case object StandardBuiltin extends Builtin
  /** explicit code → glyph-name map (may be partial; unknown SIDs omitted) */
  private[graft] final case class NamesBuiltin(codeToName: Map[Int, String])
    extends Builtin

  /** the font program's built-in encoding, or None = not recoverable
    * (CID-keyed, Expert-encoded, or structurally unsound) */
  def builtinEncoding(cff: Array[Byte]): Option[Builtin] =
    try parse(cff)
    catch { case scala.util.control.NonFatal(_) => None }

  /** A CID-keyed CFF's text-relevant structures: the /ROS registry and
    * ordering strings, the charset's GID → CID array, and an SID → string
    * resolver (standard strings ∘ String INDEX). The caller decides
    * whether the CIDs are name-recoverable (see PdfTextParser's
    * cidFontCMap: Identity-ordered fonts whose CIDs are live SIDs). */
  private[graft] final case class CidKeyed(registry: String, ordering: String,
      gidToCid: Array[Int], sidName: Int => Option[String])

  /** CID-keyed CFF (TN #5176 §18) reader, or None = not CID-keyed /
    * structurally unsound. Requires an EXPLICIT charset (predefined
    * charsets are invalid in CIDFonts — §18: "the charset data … must be
    * a charset"), which for a CID font maps GID → CID. */
  def cidKeyed(cff: Array[Byte]): Option[CidKeyed] =
    try parseCid(cff)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseCid(d: Array[Byte]): Option[CidKeyed] = {
    if (d.length < 4) return None
    val hdrSize = d(2) & 0xFF
    val (_, afterNames) = readIndex(d, hdrSize)
    val (topDicts, afterTop) = readIndex(d, afterNames)
    val top = topDicts.headOption.map(parseDict).getOrElse(return None)
    val ros = top.getOrElse((12, 30), return None) // no ROS ⇒ not CID-keyed
    val (strings, _) = readIndex(d, afterTop)
    def sidName(sid: Int): Option[String] =
      if (sid < 0) None
      else if (sid < StdStrings.length) Some(StdStrings(sid))
      else if (sid < 391) None
      else strings.lift(sid - 391)
        .map(b => new String(b, java.nio.charset.StandardCharsets.US_ASCII))
    val registry = ros.lift(0).flatMap(v => sidName(v.toInt)).getOrElse(return None)
    val ordering = ros.lift(1).flatMap(v => sidName(v.toInt)).getOrElse(return None)
    val charStringsOff = top.get((0, 17)).flatMap(_.headOption).map(_.toInt)
      .getOrElse(return None)
    val nGlyphs = be16(d, charStringsOff)
    val charsetOff = top.get((0, 15)).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    if (charsetOff <= 2) return None // predefined charset: invalid in a CIDFont
    val cids = charsetSids(d, charsetOff, nGlyphs).getOrElse(return None)
    Some(CidKeyed(registry, ordering, cids, sidName))
  }

  private def parse(d: Array[Byte]): Option[Builtin] = {
    if (d.length < 4) return None
    val hdrSize = d(2) & 0xFF
    val (_, afterNames) = readIndex(d, hdrSize)
    val (topDicts, afterTop) = readIndex(d, afterNames)
    val top = topDicts.headOption.map(parseDict).getOrElse(return None)
    if (top.contains((12, 30))) return None // ROS ⇒ CID-keyed
    val (strings, _) = readIndex(d, afterTop)

    val charStringsOff = top.get((0, 17)).flatMap(_.headOption).map(_.toInt)
      .getOrElse(return None)
    val nGlyphs = be16(d, charStringsOff)

    val encodingOff = top.get((0, 16)).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val charsetOff = top.get((0, 15)).flatMap(_.headOption).map(_.toInt).getOrElse(0)

    encodingOff match {
      case 0 => Some(StandardBuiltin)
      case 1 => None // predefined Expert encoding
      case off =>
        val sidOf = charsetSids(d, charsetOff, nGlyphs).getOrElse(return None)
        def name(sid: Int): Option[String] =
          if (sid < StdStrings.length) Some(StdStrings(sid))
          else if (sid < 391) None // Expert-set SID outside the tabulated range
          else strings.lift(sid - 391)
            .map(b => new String(b, java.nio.charset.StandardCharsets.US_ASCII))
        customEncoding(d, off).map { case (codeToGid, supplements) =>
          val viaCharset = codeToGid.flatMap { case (code, gid) =>
            sidOf.lift(gid).filter(_ >= 0).flatMap(name).map(code -> _)
          }
          // supplements map codes to SIDs directly, overriding the ranges
          val viaSup = supplements.flatMap { case (code, sid) =>
            name(sid).map(code -> _)
          }
          NamesBuiltin(viaCharset ++ viaSup)
        }
    }
  }

  /** Encoding formats 0/1 (+ optional supplement list when bit 7 of the
    * format byte is set): returns (code→GID, supplement code→SID) */
  private def customEncoding(d: Array[Byte], off: Int)
      : Option[(Map[Int, Int], Map[Int, Int])] = {
    val fmtByte = d(off) & 0xFF
    val hasSup = (fmtByte & 0x80) != 0
    var pos = off + 1
    val codeToGid = scala.collection.mutable.Map.empty[Int, Int]
    (fmtByte & 0x7F) match {
      case 0 =>
        val nCodes = d(pos) & 0xFF; pos += 1
        for (gid <- 1 to nCodes) {
          codeToGid(d(pos) & 0xFF) = gid; pos += 1
        }
      case 1 =>
        val nRanges = d(pos) & 0xFF; pos += 1
        var gid = 1
        for (_ <- 0 until nRanges) {
          val first = d(pos) & 0xFF
          val nLeft = d(pos + 1) & 0xFF
          pos += 2
          for (c <- first to first + nLeft) { codeToGid(c) = gid; gid += 1 }
        }
      case _ => return None
    }
    val sup = scala.collection.mutable.Map.empty[Int, Int]
    if (hasSup) {
      val nSups = d(pos) & 0xFF; pos += 1
      for (_ <- 0 until nSups) {
        sup(d(pos) & 0xFF) = be16(d, pos + 1)
        pos += 3
      }
    }
    Some((codeToGid.toMap, sup.toMap))
  }

  /** GID → SID array of length nGlyphs (GID 0 = .notdef = SID 0).
    * Predefined: 0 = ISOAdobe (identity); 1/2 = Expert → None. */
  private def charsetSids(d: Array[Byte], off: Int,
                          nGlyphs: Int): Option[Array[Int]] = {
    if (off == 0) return Some(Array.tabulate(nGlyphs)(i => if (i < 229) i else -1))
    if (off == 1 || off == 2) return None
    val sids = new Array[Int](nGlyphs)
    sids(0) = 0
    var gid = 1
    var pos = off + 1
    (d(off) & 0xFF) match {
      case 0 =>
        while (gid < nGlyphs) { sids(gid) = be16(d, pos); pos += 2; gid += 1 }
      case f @ (1 | 2) =>
        while (gid < nGlyphs) {
          val first = be16(d, pos)
          val nLeft = if (f == 1) d(pos + 2) & 0xFF else be16(d, pos + 2)
          pos += (if (f == 1) 3 else 4)
          var k = 0
          while (k <= nLeft && gid < nGlyphs) {
            sids(gid) = first + k; gid += 1; k += 1
          }
        }
      case _ => return None
    }
    Some(sids)
  }

  // ---- CFF primitives ----

  /** INDEX at `pos`: (entries, position after the INDEX) */
  private[graft] def readIndex(d: Array[Byte],
                                pos: Int): (Vector[Array[Byte]], Int) = {
    val count = be16(d, pos)
    if (count == 0) return (Vector.empty, pos + 2)
    val offSize = d(pos + 2) & 0xFF
    require(offSize >= 1 && offSize <= 4, s"bad offSize $offSize")
    val offBase = pos + 3
    def off(i: Int): Int = {
      var v = 0
      var k = 0
      while (k < offSize) { v = (v << 8) | (d(offBase + i * offSize + k) & 0xFF); k += 1 }
      v
    }
    val dataBase = offBase + (count + 1) * offSize - 1 // offsets are 1-based
    val entries = (0 until count).map { i =>
      java.util.Arrays.copyOfRange(d, dataBase + off(i), dataBase + off(i + 1))
    }.toVector
    (entries, dataBase + off(count))
  }

  /** DICT: operator (b0, b1) → operand list. Single-byte operators key as
    * (0, op); escaped ones as (12, op). Reals are parsed (BCD nibbles)
    * but only integral operands matter to the offsets read here. */
  private[graft] def parseDict(bytes: Array[Byte]): Map[(Int, Int), List[Double]] = {
    val out = scala.collection.mutable.Map.empty[(Int, Int), List[Double]]
    val operands = scala.collection.mutable.ListBuffer.empty[Double]
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      if (b0 <= 21) {
        val key =
          if (b0 == 12) { i += 1; (12, bytes(i) & 0xFF) }
          else (0, b0)
        out(key) = operands.toList
        operands.clear()
        i += 1
      } else if (b0 == 28) {
        operands += ((bytes(i + 1) << 8) | (bytes(i + 2) & 0xFF)).toShort.toDouble
        i += 3
      } else if (b0 == 29) {
        operands += (((bytes(i + 1) & 0xFF) << 24) | ((bytes(i + 2) & 0xFF) << 16) |
          ((bytes(i + 3) & 0xFF) << 8) | (bytes(i + 4) & 0xFF)).toDouble
        i += 5
      } else if (b0 == 30) { // real: BCD nibbles until 0xF terminator
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < bytes.length) {
          val b = bytes(i) & 0xFF
          for (nib <- Seq(b >> 4, b & 0xF) if !done) nib match {
            case n if n <= 9 => sb += ('0' + n).toChar
            case 0xA => sb += '.'
            case 0xB => sb += 'E'
            case 0xC => sb ++= "E-"
            case 0xE => sb += '-'
            case 0xF => done = true
            case _ => () // 0xD reserved
          }
          i += 1
        }
        operands += (try sb.toString.toDouble catch { case _: NumberFormatException => 0.0 })
      } else if (b0 >= 32 && b0 <= 246) {
        operands += (b0 - 139).toDouble; i += 1
      } else if (b0 >= 247 && b0 <= 250) {
        operands += ((b0 - 247) * 256 + (bytes(i + 1) & 0xFF) + 108).toDouble; i += 2
      } else if (b0 >= 251 && b0 <= 254) {
        operands += (-(b0 - 251) * 256 - (bytes(i + 1) & 0xFF) - 108).toDouble; i += 2
      } else i += 1 // reserved byte: skip
    }
    out.toMap
  }

  private def be16(d: Array[Byte], pos: Int): Int =
    ((d(pos) & 0xFF) << 8) | (d(pos + 1) & 0xFF)

  /** Standard strings (TN #5176 Appendix A), the text-relevant ISOAdobe
    * range: SIDs 0–228. Expert-set SIDs (229–390: small caps, oldstyle
    * figures, version strings) have no AGL unicode and are left to the
    * String INDEX / refusal path. */
  private[graft] val StdStrings: Vector[String] = Vector(
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash",
    "zero", "one", "two", "three", "four", "five", "six", "seven",
    "eight", "nine", "colon", "semicolon", "less", "equal", "greater",
    "question", "at") ++
    ('A' to 'Z').map(_.toString) ++ Vector(
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft") ++
    ('a' to 'z').map(_.toString) ++ Vector(
    "braceleft", "bar", "braceright", "asciitilde",
    "exclamdown", "cent", "sterling", "fraction", "yen", "florin",
    "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl",
    "endash", "dagger", "daggerdbl", "periodcentered", "paragraph",
    "bullet", "quotesinglbase", "quotedblbase", "quotedblright",
    "guillemotright", "ellipsis", "perthousand", "questiondown",
    "grave", "acute", "circumflex", "tilde", "macron", "breve",
    "dotaccent", "dieresis", "ring", "cedilla", "hungarumlaut",
    "ogonek", "caron", "emdash", "AE", "ordfeminine", "Lslash",
    "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash",
    "oslash", "oe", "germandbls", "onesuperior", "logicalnot", "mu",
    "trademark", "Eth", "onehalf", "plusminus", "Thorn", "onequarter",
    "divide", "brokenbar", "degree", "thorn", "threequarters",
    "twosuperior", "registered", "minus", "eth", "multiply",
    "threesuperior", "copyright", "Aacute", "Acircumflex", "Adieresis",
    "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute", "Ecircumflex",
    "Edieresis", "Egrave", "Iacute", "Icircumflex", "Idieresis",
    "Igrave", "Ntilde", "Oacute", "Ocircumflex", "Odieresis", "Ograve",
    "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis", "Ugrave",
    "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex",
    "adieresis", "agrave", "aring", "atilde", "ccedilla", "eacute",
    "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex",
    "odieresis", "ograve", "otilde", "scaron", "uacute", "ucircumflex",
    "udieresis", "ugrave", "yacute", "ydieresis", "zcaron")
}
