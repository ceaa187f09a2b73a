package graft.ingest

/** Glyph-name → unicode resolution for simple-font /Encoding /Differences
  * arrays (ISO 32000 §9.6.6 + the public Adobe Glyph List). A Type1 or
  * TrueType simple font may re-map byte codes to named glyphs; pdftex/
  * LaTeX output does this pervasively (OT1/T1 layouts re-seat ligatures,
  * quotes, and accented letters), so byte-fallback decoding garbles
  * exactly the characters a reader notices. Resolution order follows the
  * AGL algorithm: `uniXXXX`/`uXXXX[XX]` hex forms first, then the named
  * table (the AGL subset covering Latin/Western European typography —
  * the complete list is public; this subset is the part simple text
  * fonts actually use), then None (caller keeps the byte fallback).
  */
private[graft] object GlyphNames {

  def toUnicode(name: String): Option[String] = {
    // AGL `uni` form: ONE OR MORE 4-hex BMP groups concatenated
    // (uni00660069 = "fi"); surrogate values are invalid in the form
    if (name.startsWith("uni") && name.length > 3 &&
        (name.length - 3) % 4 == 0) {
      val hex = name.substring(3)
      if (hex.forall(isHex)) {
        val units = hex.grouped(4).map(Integer.parseInt(_, 16)).toSeq
        if (units.forall(u => u < 0xD800 || u > 0xDFFF))
          return Some(units.map(_.toChar).mkString)
      }
    }
    // AGL `u` form: exactly 4–6 hex digits, one codepoint
    if (name.startsWith("u") && name.length >= 5 && name.length <= 7) {
      val hex = name.substring(1)
      if (hex.forall(isHex)) {
        val cp = Integer.parseInt(hex, 16)
        if ((cp < 0xD800 || cp > 0xDFFF) && cp <= 0x10FFFF)
          return Some(new String(Character.toChars(cp)))
      }
    }
    // single-letter / digit-like names ARE their character for ASCII
    if (name.length == 1 && name.charAt(0).isLetterOrDigit)
      return Some(name)
    agl.get(name)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** AGL subset: ASCII names, Latin-1 supplement, Latin Extended-A used
    * in Western European text, typographic punctuation, f-ligatures. */
  private val agl: Map[String, String] = Map(
    // ASCII punctuation and symbols
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
    "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
    "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
    "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
    "hyphen" -> "-", "period" -> ".", "slash" -> "/", "colon" -> ":",
    "semicolon" -> ";", "less" -> "<", "equal" -> "=", "greater" -> ">",
    "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    // digits
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
    "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
    "eight" -> "8", "nine" -> "9",
    // typographic punctuation (the pdftex re-seats)
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "dagger" -> "†", "daggerdbl" -> "‡", "ellipsis" -> "…",
    "perthousand" -> "‰", "minute" -> "′", "second" -> "″",
    "guilsinglleft" -> "‹", "guilsinglright" -> "›",
    "guillemotleft" -> "«", "guillemotright" -> "»",
    "exclamdown" -> "¡", "questiondown" -> "¿",
    "fraction" -> "⁄", "minus" -> "−",
    // f-ligatures
    "fi" -> "ﬁ", "fl" -> "ﬂ", "ff" -> "ﬀ",
    "ffi" -> "ﬃ", "ffl" -> "ﬄ",
    // currency / signs / Latin-1 symbols
    "cent" -> "¢", "sterling" -> "£", "currency" -> "¤",
    "yen" -> "¥", "florin" -> "ƒ", "Euro" -> "€",
    "section" -> "§", "copyright" -> "©",
    "registered" -> "®", "trademark" -> "™",
    "degree" -> "°", "plusminus" -> "±", "micro" -> "µ",
    "mu" -> "µ", "paragraph" -> "¶",
    "periodcentered" -> "·", "multiply" -> "×",
    "divide" -> "÷", "logicalnot" -> "¬", "brokenbar" -> "¦",
    "ordfeminine" -> "ª", "ordmasculine" -> "º",
    "onequarter" -> "¼", "onehalf" -> "½",
    "threequarters" -> "¾", "onesuperior" -> "¹",
    "twosuperior" -> "²", "threesuperior" -> "³",
    "macron" -> "¯", "cedilla" -> "¸", "dieresis" -> "¨",
    "acute" -> "´", "circumflex" -> "ˆ", "tilde" -> "˜",
    "caron" -> "ˇ", "breve" -> "˘", "dotaccent" -> "˙",
    "ring" -> "˚", "ogonek" -> "˛", "hungarumlaut" -> "˝",
    // Latin-1 letters, lowercase
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å",
    "ae" -> "æ", "ccedilla" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecircumflex" -> "ê",
    "edieresis" -> "ë", "igrave" -> "ì", "iacute" -> "í",
    "icircumflex" -> "î", "idieresis" -> "ï", "eth" -> "ð",
    "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
    "ocircumflex" -> "ô", "otilde" -> "õ",
    "odieresis" -> "ö", "oslash" -> "ø", "ugrave" -> "ù",
    "uacute" -> "ú", "ucircumflex" -> "û",
    "udieresis" -> "ü", "yacute" -> "ý", "thorn" -> "þ",
    "ydieresis" -> "ÿ", "germandbls" -> "ß",
    // Latin-1 letters, uppercase
    "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â",
    "Atilde" -> "Ã", "Adieresis" -> "Ä", "Aring" -> "Å",
    "AE" -> "Æ", "Ccedilla" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecircumflex" -> "Ê",
    "Edieresis" -> "Ë", "Igrave" -> "Ì", "Iacute" -> "Í",
    "Icircumflex" -> "Î", "Idieresis" -> "Ï", "Eth" -> "Ð",
    "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
    "Ocircumflex" -> "Ô", "Otilde" -> "Õ",
    "Odieresis" -> "Ö", "Oslash" -> "Ø", "Ugrave" -> "Ù",
    "Uacute" -> "Ú", "Ucircumflex" -> "Û",
    "Udieresis" -> "Ü", "Yacute" -> "Ý", "Thorn" -> "Þ",
    // Latin Extended-A names common in Western European text
    "OE" -> "Œ", "oe" -> "œ", "Scaron" -> "Š",
    "scaron" -> "š", "Zcaron" -> "Ž", "zcaron" -> "ž",
    "Ydieresis" -> "Ÿ", "Lslash" -> "Ł", "lslash" -> "ł",
    "dotlessi" -> "ı",
    // occasionally-differenced whitespace / specials
    "nbspace" -> " ", "softhyphen" -> "­",
    "sfthyphen" -> "­", "middot" -> "·",
    "apple" -> "", ".notdef" -> "")
}

/** Byte → unicode tables for the two named simple-font base encodings
  * whose upper ranges DIVERGE from Latin-1 (ISO 32000 Annex D). Only the
  * diverging codes are tabulated — everything absent falls back to the
  * Latin-1 byte decode, which is already correct for it. Codes Annex D
  * leaves undefined map to "" (drop, never garble); so do the legacy Mac
  * math-symbol slots Annex D's text encoding omits. */
private[graft] object BaseEncodings {

  /** WinAnsiEncoding = cp1252: only 0x80–0x9F differs from Latin-1 */
  val winAnsi: Map[Int, String] = Map(
    0x80 -> "€", 0x81 -> "", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
    0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ", 0x89 -> "‰",
    0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ", 0x8D -> "", 0x8E -> "Ž",
    0x8F -> "", 0x90 -> "", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
    0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—", 0x98 -> "˜",
    0x99 -> "™", 0x9A -> "š", 0x9B -> "›", 0x9C -> "œ", 0x9D -> "",
    0x9E -> "ž", 0x9F -> "Ÿ")

  /** MacRomanEncoding: the entire 0x80–0xFF half is its own layout */
  val macRoman: Map[Int, String] = Map(
    0x80 -> "Ä", 0x81 -> "Å", 0x82 -> "Ç", 0x83 -> "É", 0x84 -> "Ñ",
    0x85 -> "Ö", 0x86 -> "Ü", 0x87 -> "á", 0x88 -> "à", 0x89 -> "â",
    0x8A -> "ä", 0x8B -> "ã", 0x8C -> "å", 0x8D -> "ç", 0x8E -> "é",
    0x8F -> "è", 0x90 -> "ê", 0x91 -> "ë", 0x92 -> "í", 0x93 -> "ì",
    0x94 -> "î", 0x95 -> "ï", 0x96 -> "ñ", 0x97 -> "ó", 0x98 -> "ò",
    0x99 -> "ô", 0x9A -> "ö", 0x9B -> "õ", 0x9C -> "ú", 0x9D -> "ù",
    0x9E -> "û", 0x9F -> "ü", 0xA0 -> "†", 0xA1 -> "°", 0xA2 -> "¢",
    0xA3 -> "£", 0xA4 -> "§", 0xA5 -> "•", 0xA6 -> "¶", 0xA7 -> "ß",
    0xA8 -> "®", 0xA9 -> "©", 0xAA -> "™", 0xAB -> "´", 0xAC -> "¨",
    0xAD -> "", 0xAE -> "Æ", 0xAF -> "Ø", 0xB0 -> "", 0xB1 -> "±",
    0xB2 -> "", 0xB3 -> "", 0xB4 -> "¥", 0xB5 -> "µ", 0xB6 -> "",
    0xB7 -> "", 0xB8 -> "", 0xB9 -> "", 0xBA -> "", 0xBB -> "ª",
    0xBC -> "º", 0xBD -> "", 0xBE -> "æ", 0xBF -> "ø", 0xC0 -> "¿",
    0xC1 -> "¡", 0xC2 -> "¬", 0xC3 -> "", 0xC4 -> "ƒ", 0xC5 -> "",
    0xC6 -> "", 0xC7 -> "«", 0xC8 -> "»", 0xC9 -> "…", 0xCA -> " ",
    0xCB -> "À", 0xCC -> "Ã", 0xCD -> "Õ", 0xCE -> "Œ", 0xCF -> "œ",
    0xD0 -> "–", 0xD1 -> "—", 0xD2 -> "“", 0xD3 -> "”", 0xD4 -> "‘",
    0xD5 -> "’", 0xD6 -> "÷", 0xD7 -> "", 0xD8 -> "ÿ", 0xD9 -> "Ÿ",
    0xDA -> "⁄", 0xDB -> "¤", 0xDC -> "‹", 0xDD -> "›", 0xDE -> "ﬁ",
    0xDF -> "ﬂ", 0xE0 -> "‡", 0xE1 -> "·", 0xE2 -> "‚", 0xE3 -> "„",
    0xE4 -> "‰", 0xE5 -> "Â", 0xE6 -> "Ê", 0xE7 -> "Á", 0xE8 -> "Ë",
    0xE9 -> "È", 0xEA -> "Í", 0xEB -> "Î", 0xEC -> "Ï", 0xED -> "Ì",
    0xEE -> "Ó", 0xEF -> "Ô", 0xF0 -> "", 0xF1 -> "Ò", 0xF2 -> "Ú",
    0xF3 -> "Û", 0xF4 -> "Ù", 0xF5 -> "ı", 0xF6 -> "ˆ", 0xF7 -> "˜",
    0xF8 -> "¯", 0xF9 -> "˘", 0xFA -> "˙", 0xFB -> "˚", 0xFC -> "¸",
    0xFD -> "˝", 0xFE -> "˛", 0xFF -> "ˇ")

  /** StandardEncoding (the PostScript-era Annex D column): ASCII except
    * 0x27/0x60 are the CURLY quotes, and the upper half is its own
    * sparse layout (ligatures, accents as spacing glyphs, old-style
    * punctuation slots). Undefined slots → "" (drop). */
  val standard: Map[Int, String] = Map(
    0x27 -> "’", 0x60 -> "‘",
    0xA1 -> "¡", 0xA2 -> "¢", 0xA3 -> "£", 0xA4 -> "⁄", 0xA5 -> "¥",
    0xA6 -> "ƒ", 0xA7 -> "§", 0xA8 -> "¤", 0xA9 -> "'", 0xAA -> "“",
    0xAB -> "«", 0xAC -> "‹", 0xAD -> "›", 0xAE -> "ﬁ", 0xAF -> "ﬂ",
    0xB0 -> "", 0xB1 -> "–", 0xB2 -> "†", 0xB3 -> "‡", 0xB4 -> "·",
    0xB5 -> "", 0xB6 -> "¶", 0xB7 -> "•", 0xB8 -> "‚", 0xB9 -> "„",
    0xBA -> "”", 0xBB -> "»", 0xBC -> "…", 0xBD -> "‰", 0xBE -> "",
    0xBF -> "¿", 0xC0 -> "", 0xC1 -> "`", 0xC2 -> "´", 0xC3 -> "ˆ",
    0xC4 -> "˜", 0xC5 -> "¯", 0xC6 -> "˘", 0xC7 -> "˙", 0xC8 -> "¨",
    0xC9 -> "", 0xCA -> "˚", 0xCB -> "¸", 0xCC -> "", 0xCD -> "˝",
    0xCE -> "˛", 0xCF -> "ˇ", 0xD0 -> "—",
    0xE1 -> "Æ", 0xE3 -> "ª", 0xE8 -> "Ł", 0xE9 -> "Ø", 0xEA -> "Œ",
    0xEB -> "º", 0xF1 -> "æ", 0xF5 -> "ı", 0xF8 -> "ł", 0xF9 -> "ø",
    0xFA -> "œ", 0xFB -> "ß") ++
    // every remaining 0x80–0xFF slot is undefined in this column: drop
    (0x80 to 0xFF).filterNot(c => Set(
      0xA1, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xAB,
      0xAC, 0xAD, 0xAE, 0xAF, 0xB1, 0xB2, 0xB3, 0xB4, 0xB6, 0xB7, 0xB8,
      0xB9, 0xBA, 0xBB, 0xBC, 0xBD, 0xBF, 0xC1, 0xC2, 0xC3, 0xC4, 0xC5,
      0xC6, 0xC7, 0xC8, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xD0, 0xE1, 0xE3,
      0xE8, 0xE9, 0xEA, 0xEB, 0xF1, 0xF5, 0xF8, 0xF9, 0xFA, 0xFB)
      .contains(c)).map(_ -> "").toMap

  def forName(name: String): Option[Map[Int, String]] = name match {
    case "WinAnsiEncoding"  => Some(winAnsi)
    case "MacRomanEncoding" => Some(macRoman)
    case "StandardEncoding" => Some(standard)
    case _ => None
  }
}
