package graft.ingest

/** Glyph→unicode recovery from an embedded TrueType/OpenType font's
  * 'cmap' table.
  *
  * A CID-keyed PDF font with no usable /ToUnicode shows glyph ids, which
  * are meaningless without the font's own tables. But the font's 'cmap'
  * maps unicode→glyph (it exists so renderers can find glyphs), so
  * INVERTING it recovers text — the route the reference's mupdf backend
  * takes (`src/parser/pdf-extract.ts:79-153` delegates to mupdf's font
  * machinery). The sfnt container and subtable formats are public specs:
  * ISO/IEC 14496-22 §5.2 / the OpenType 'cmap' chapter. Subset-embedded
  * fonts routinely retain 'cmap' (it is tiny next to glyf), which is why
  * the inversion works on real files.
  *
  * Supported subtables, in preference order: (3,10) format 12 — full
  * unicode; (3,1) format 4 — BMP; (0,*) any unicode platform; (3,0)
  * symbol. Formats parsed: 4, 12, 6, 0. Refuse-don't-garble: any
  * out-of-bounds offset, unknown version, or unknown format yields an
  * empty map, and the caller falls back to emitting nothing.
  */
private[graft] object TrueTypeCmap {

  /** total mapping-entry cap: a subset font's cmap is small; a full CJK
    * font tops out around the BMP. Anything claiming more is either not
    * a real font or not worth materializing per-document. */
  private val MaxEntries = 65536

  /** unicode codepoint → glyph id from the best available subtable;
    * empty on anything malformed or out of subset */
  def unicodeToGlyph(b: Array[Byte]): Map[Int, Int] = {
    try {
      def u8(i: Int): Int = b(i) & 0xFF
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
      if (b.length < 12) return Map.empty
      val ver = u32(0)
      // 0x00010000, 'true' (old Apple), 'OTTO' (CFF-flavoured sfnt)
      if (ver != 0x00010000L && ver != 0x74727565L && ver != 0x4F54544FL)
        return Map.empty
      val numTables = u16(4)
      var cmapOff = -1
      var i = 0
      while (i < numTables && cmapOff < 0) {
        val e = 12 + 16 * i
        if (e + 16 > b.length) return Map.empty
        if (u32(e) == 0x636D6170L) cmapOff = u32(e + 8).toInt // 'cmap'
        i += 1
      }
      if (cmapOff < 0 || cmapOff < 12 || cmapOff + 4 > b.length) return Map.empty
      val nRec = u16(cmapOff + 2)
      var best = -1
      var bestRank = 0
      var j = 0
      while (j < nRec) {
        val r = cmapOff + 4 + 8 * j
        if (r + 8 > b.length) return Map.empty
        val rank = (u16(r), u16(r + 2)) match {
          case (3, 10) => 4
          case (3, 1)  => 3
          case (0, _)  => 2
          case (3, 0)  => 1
          case _       => 0 // platform-specific (1,*) etc.: not unicode
        }
        if (rank > bestRank) { bestRank = rank; best = cmapOff + u32(r + 4).toInt }
        j += 1
      }
      if (bestRank == 0 || best < 0 || best + 6 > b.length) return Map.empty

      val out = scala.collection.mutable.Map.empty[Int, Int]
      def put(code: Int, gid: Int): Boolean = {
        if (gid != 0 && code != 0xFFFF) out(code) = gid
        out.size <= MaxEntries
      }
      u16(best) match {
        case 4 =>
          val segX2 = u16(best + 6)
          val segs = segX2 / 2
          val endAt = best + 14
          val startAt = endAt + segX2 + 2
          val deltaAt = startAt + segX2
          val rangeAt = deltaAt + segX2
          if (segX2 <= 0 || rangeAt + segX2 > b.length) return Map.empty
          var s = 0
          while (s < segs) {
            val end = u16(endAt + 2 * s)
            val start = u16(startAt + 2 * s)
            val delta = u16(deltaAt + 2 * s)
            val ro = u16(rangeAt + 2 * s)
            var c = start
            while (c <= end) {
              val gid =
                if (ro == 0) (c + delta) & 0xFFFF
                else {
                  // spec: the offset is relative to ITS OWN word's address
                  val at = rangeAt + 2 * s + ro + 2 * (c - start)
                  if (at + 2 > b.length) 0
                  else {
                    val g = u16(at)
                    if (g == 0) 0 else (g + delta) & 0xFFFF
                  }
                }
              if (!put(c, gid)) return Map.empty
              c += 1
            }
            s += 1
          }
        case 12 =>
          if (best + 16 > b.length) return Map.empty
          val nGroups = u32(best + 12)
          if (nGroups < 0 || nGroups > MaxEntries) return Map.empty
          var g = 0
          while (g < nGroups) {
            val at = best + 16 + 12 * g
            if (at + 12 > b.length) return Map.empty
            val start = u32(at).toInt
            val end = u32(at + 4).toInt
            val gid0 = u32(at + 8).toInt
            if (start < 0 || end < start || end > 0x10FFFF) return Map.empty
            var c = start
            while (c <= end) {
              if (!put(c, gid0 + (c - start))) return Map.empty
              c += 1
            }
            g += 1
          }
        case 6 =>
          if (best + 10 > b.length) return Map.empty
          val first = u16(best + 6)
          val cnt = u16(best + 8)
          if (best + 10 + 2 * cnt > b.length) return Map.empty
          var k = 0
          while (k < cnt) {
            if (!put(first + k, u16(best + 10 + 2 * k))) return Map.empty
            k += 1
          }
        case 0 =>
          if (best + 6 + 256 > b.length) return Map.empty
          var c = 0
          while (c < 256) { if (!put(c, u8(best + 6 + c))) return Map.empty; c += 1 }
        case _ => return Map.empty
      }
      out.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** glyph id → unicode string (surrogate-paired past the BMP). Several
    * codepoints can share a glyph (e.g. space variants); the SMALLEST
    * wins — deterministic, and the canonical character is conventionally
    * the lowest-coded one. */
  def glyphToUnicode(b: Array[Byte]): Map[Int, String] =
    unicodeToGlyph(b)
      .groupMapReduce(_._2)(_._1)(math.min)
      .map { case (gid, cp) => gid -> new String(Character.toChars(cp)) }
}
