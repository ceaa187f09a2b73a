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
    if (name.startsWith("uni") && name.length >= 7) {
      val hex = name.substring(3, 7)
      if (hex.forall(isHex)) return Some(Integer.parseInt(hex, 16).toChar.toString)
    }
    if (name.startsWith("u") && name.length >= 5 && name.length <= 7) {
      val hex = name.substring(1)
      if (hex.forall(isHex)) {
        val cp = Integer.parseInt(hex, 16)
        if (cp >= 0 && cp <= 0x10FFFF)
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
