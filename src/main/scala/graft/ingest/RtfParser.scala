package graft.ingest

import scala.collection.mutable

/** RTF → plain-text extraction — the fifth document format next to PDF /
  * DOCX / HTML / EPUB (enterprise corpora are full of WordPad/Outlook-era
  * .rtf). Pure recursive-descent over the public RTF 1.9 token grammar
  * (control word, control symbol, group, text), dependency-free:
  *
  *  - destination groups that carry no body text are SKIPPED whole:
  *    `{\*\...}` (the spec's "ignore if unknown" marker), fonttbl,
  *    colortbl, stylesheet, info, pict, header/footer variants;
  *  - `\par` / `\line` / `\sect` → newline; `\tab` → space; `\~` → space;
  *  - `\'hh` → byte via Windows-1252 (the format's default charset —
  *    NOT Latin-1: 0x80–0x9F are real characters there);
  *  - `\uN` → code point, consuming the `\ucN`-many fallback chars that
  *    follow (default 1, scoped per group like RTF state);
  *  - `\\ \{ \}` unescape; unknown control words are ignored.
  *
  * Refuse-don't-garble: input not starting `{\rtf` → "". Unbalanced
  * groups tolerate EOF (the good prefix extracts). Paragraph breaks
  * collapse to blank-line-separated blocks like the other parsers. */
object RtfParser {

  private val SkipDestinations = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "listtable", "listoverridetable",
    "generator", "themedata")

  /** cp1252's 0x80–0x9F block (the part that differs from ISO-8859-1) */
  private val Cp1252High: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  def toText(rtf: String): String = {
    if (rtf == null || !rtf.startsWith("{\\rtf")) return ""
    val out = new StringBuilder
    val ucStack = mutable.ArrayBuffer[Int](1) // \ucN is group-scoped
    var skipDepth = 0   // > 0 → inside a skipped destination group
    var pendingSkip = 0 // fallback chars to swallow after \uN
    var i = 0
    val n = rtf.length
    // character data (plain chars, \'hh, escaped specials) consumes the
    // \ucN fallback budget after a \uN; control-word OUTPUT (\par, \tab)
    // is exempt — the spec's skippable data is characters and \'hh
    // escapes, not control words
    def emit(c: Char): Unit =
      if (skipDepth == 0) {
        if (pendingSkip > 0) pendingSkip -= 1 else out += c
      }
    def emitCtl(c: Char): Unit = if (skipDepth == 0) out += c
    while (i < n) {
      rtf.charAt(i) match {
        case '{' =>
          // a group boundary ENDS any pending \uN fallback run: the spec
          // forbids braces inside the skippable data, so a budget carried
          // across would be consumed by the group's own control words and
          // swallow real text after them (e.g. `\uc2 Δ{\b bo}ld` losing
          // the 'b')
          pendingSkip = 0
          ucStack += ucStack.last
          if (skipDepth > 0) skipDepth += 1
          else {
            // lookahead: {\*\dest ...} or {\fonttbl ...} → skip the group
            var j = i + 1
            var star = false
            if (j < n && rtf.charAt(j) == '\\' && j + 1 < n && rtf.charAt(j + 1) == '*') {
              star = true; j += 2
              while (j < n && rtf.charAt(j) == '\\' && j + 1 < n &&
                     !rtf.charAt(j + 1).isLetter) j += 2 // tolerate symbols
            }
            if (j < n && rtf.charAt(j) == '\\') {
              var k = j + 1
              val sb = new StringBuilder
              while (k < n && rtf.charAt(k).isLetter) { sb += rtf.charAt(k); k += 1 }
              if (star || SkipDestinations(sb.toString)) skipDepth = 1
            }
          }
          i += 1
        case '}' =>
          pendingSkip = 0 // group close ends a fallback run, same as open
          if (ucStack.length > 1) ucStack.remove(ucStack.length - 1): Unit
          if (skipDepth > 0) skipDepth -= 1
          i += 1
        case '\\' if i + 1 < n =>
          val c1 = rtf.charAt(i + 1)
          if (c1 == '\\' || c1 == '{' || c1 == '}') { emit(c1); i += 2 }
          else if (c1 == '~') { emit(' '); i += 2 }
          else if (c1 == '\'' && i + 3 < n) {
            val hex = rtf.substring(i + 2, i + 4)
            try {
              val b = Integer.parseInt(hex, 16)
              emit(Cp1252High.getOrElse(b, b.toChar))
            } catch { case _: NumberFormatException => () }
            i += 4
          } else if (c1.isLetter) {
            var k = i + 1
            val sb = new StringBuilder
            while (k < n && rtf.charAt(k).isLetter) { sb += rtf.charAt(k); k += 1 }
            var neg = false
            if (k < n && rtf.charAt(k) == '-') { neg = true; k += 1 }
            val ns = new StringBuilder
            while (k < n && rtf.charAt(k).isDigit) { ns += rtf.charAt(k); k += 1 }
            if (k < n && rtf.charAt(k) == ' ') k += 1 // delimiter space consumed
            val num = if (ns.isEmpty) None
              else Some((if (neg) -1 else 1) * ns.toString.toLong)
            // \ucN fallback accounting per the spec: "an RTF control word
            // is counted as one character for skipping purposes" — so
            // while a \uN's budget is pending, a control word consumes ONE
            // slot and its output is suppressed (it IS the fallback, e.g.
            // `\uc1 舲\line`). Two deliberate deviations for robust
            // extraction of non-compliant input:
            //  - a following \uN is never swallowed as fallback — it
            //    RESETS the stale budget and emits (writers that set the
            //    fallback lazily produce consecutive \u with no fallback;
            //    skipping the second would lose real text);
            //  - \uc applies its state change even when it lands in the
            //    skipped slot (dropping it would corrupt all later runs).
            val inFallback = pendingSkip > 0 && sb.toString != "u"
            if (inFallback) pendingSkip -= 1
            sb.toString match {
              case "par" | "line" | "sect" => if (!inFallback) emitCtl('\n')
              case "tab" => if (!inFallback) emitCtl(' ')
              case "uc" => ucStack(ucStack.length - 1) =
                num.getOrElse(1L).toInt.max(0)
              case "u" => num.foreach { cp =>
                // RTF \u is a SIGNED 16-bit value; emitting directly (not
                // via emit()) is what cancels any stale budget — the new
                // ucStack.last assignment below starts this \u's own run
                val v = (cp.toInt & 0xFFFF).toChar
                if (skipDepth == 0) {
                  out += v
                  pendingSkip = ucStack.last
                }
              }
              case _ => () // formatting word: ignored
            }
            i = k
          } else i += 2 // unknown control symbol
        case '\r' | '\n' => i += 1 // raw newlines are NOT text in RTF
        case c =>
          emit(c)
          i += 1
      }
    }
    // blocks: \par newlines → blank-line-separated trimmed paragraphs
    out.toString.split("\n").map(_.trim).filter(_.nonEmpty).mkString("\n\n")
  }

  /** deterministic fixture: proper header with skipped fonttbl/colortbl/
    * info destinations, escaped specials, and the given paragraphs */
  def fixture(docId: Long, paras: Seq[String]): String = {
    def esc(s: String) =
      s.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}")
    val body = paras.map(p => s"${esc(p)}\\par").mkString("\n")
    s"""{\\rtf1\\ansi\\deff0
       |{\\fonttbl{\\f0\\fswiss Helvetica;}{\\f1\\fmodern Courier;}}
       |{\\colortbl;\\red0\\green0\\blue0;}
       |{\\info{\\title Doc $docId}{\\author fixture}}
       |{\\*\\generator graft $docId;}
       |\\f0\\fs24
       |$body
       |}""".stripMargin
  }
}
