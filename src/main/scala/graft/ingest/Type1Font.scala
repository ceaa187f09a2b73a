package graft.ingest

/** Type1 font-program (/FontFile) built-in encoding reader. A Type1
  * font's /Encoding lives in the CLEARTEXT portion of the program
  * (Adobe Type 1 Font Format §2.3) — either the literal token
  * `StandardEncoding` or a `256 array` built with
  * `dup <code> /<glyphname> put` entries — so no eexec decryption is
  * needed to recover it. ISO 32000 §9.6.6 makes this the base encoding
  * for a simple font whose dict names no /Encoding; the reference gets
  * it from mupdf (`src/parser/pdf-extract.ts:79-153`).
  *
  * Accepted containers: the raw PDF /FontFile stream layout (cleartext
  * then binary, /Length1 marking the split — here the split is found by
  * the `eexec` keyword, so /Length1 is not required) and PFB segmented
  * files (0x80-tagged blocks; ASCII segments concatenated).
  *
  * Refuse-don't-garble: no /Encoding in the cleartext, or an /Encoding
  * that is neither StandardEncoding nor dup-put entries, yields None
  * and the caller keeps its byte-decode fallback.
  */
private[graft] object Type1Font {

  /** the program's built-in encoding in [[CffFont.Builtin]] form */
  def builtinEncoding(bytes: Array[Byte]): Option[CffFont.Builtin] =
    try {
      val text = cleartext(bytes)
      val at = text.indexOf("/Encoding")
      if (at < 0) return None
      val tail = text.substring(at + "/Encoding".length)
      // the whole-array form: `/Encoding StandardEncoding def`
      if (tail.dropWhile(_.isWhitespace).startsWith("StandardEncoding"))
        return Some(CffFont.StandardBuiltin)
      // the dup-put form, ended by the array's closing `readonly def`
      // (or eexec if the font omits readonly); puts after that boundary
      // belong to other arrays and must not leak in
      val endR = tail.indexOf("readonly def")
      val endE = tail.indexOf("eexec")
      val end = Seq(endR, endE).filter(_ >= 0).minOption.getOrElse(tail.length)
      val block = tail.substring(0, end)
      val put = """dup\s+(\d+)\s*/([^\s/{}()\[\]<>]+)\s+put""".r
      val m = put.findAllMatchIn(block).flatMap { mm =>
        val code = mm.group(1).toInt
        if (code >= 0 && code <= 255) Some(code -> mm.group(2)) else None
      }.toMap
      if (m.isEmpty) None else Some(CffFont.NamesBuiltin(m))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** the cleartext portion: PFB ASCII segments, or everything before
    * `eexec` (Latin-1 so bytes round-trip) */
  private def cleartext(bytes: Array[Byte]): String = {
    val s =
      if (bytes.nonEmpty && (bytes(0) & 0xFF) == 0x80) {
        val sb = new StringBuilder
        var i = 0
        var ok = true
        while (ok && i + 6 <= bytes.length && (bytes(i) & 0xFF) == 0x80) {
          val kind = bytes(i + 1) & 0xFF
          val len = (bytes(i + 2) & 0xFF) | ((bytes(i + 3) & 0xFF) << 8) |
            ((bytes(i + 4) & 0xFF) << 16) | ((bytes(i + 5) & 0xFF) << 24)
          if (kind == 3 || len < 0 || i + 6 + len > bytes.length) ok = false
          else {
            if (kind == 1)
              sb ++= new String(bytes, i + 6, len,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            i += 6 + len
          }
        }
        sb.toString
      } else new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val ee = s.indexOf("eexec")
    if (ee >= 0) s.substring(0, ee + "eexec".length) else s
  }
}
