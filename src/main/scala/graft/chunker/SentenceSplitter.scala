package graft.chunker

import java.text.BreakIterator
import java.util.Locale
import scala.collection.mutable.ArrayBuffer

/** Sentence splitting for semantic chunking (reference
  * `src/chunker/sentence-splitter.ts:42-205`): fenced/inline code is
  * protected behind NUL-delimited placeholders, paragraphs split on blank
  * lines / newline-before-nonspace, markdown headings become single
  * sentences, sentence boundaries come from the JVM's UAX#29 implementation
  * (`java.text.BreakIterator`, the platform twin of `Intl.Segmenter('und')`),
  * and code is restored afterwards.
  *
  * Atomic ranges ([start,end) UTF-16 offsets, e.g. DOCX table rows) are
  * validated (ordered, non-overlapping, in-bounds, non-empty — throws) and
  * kept as indivisible units (reference `:148-205`).
  */
object SentenceSplitter {

  final case class SentenceUnit(text: String, atomic: Boolean)
  final case class AtomicRange(start: Int, end: Int)

  private val CodeBlockPh = "\uE000CODE_BLOCK\uE000"
  private val InlineCodePh = "\uE000INLINE_CODE\uE000"

  private val FencedRe = "(?s)```.*?```".r
  private val InlineRe = "`[^`]+`".r
  private val ParagraphSplit = "\n{2,}|\n(?=\\S)|(?<=\uE000)\n"
  private val HeadingRe = "^#{1,6}\\s.*".r

  private final case class CodeBlock(placeholder: String, content: String)

  private def extractCode(text: String): (String, Seq[CodeBlock]) = {
    val blocks = ArrayBuffer.empty[CodeBlock]
    var processed = text
    var idx = 0
    for (m <- FencedRe.findAllIn(text).toList) {
      val ph = s"$CodeBlockPh$idx$CodeBlockPh"
      blocks += CodeBlock(ph, m)
      processed = processed.replaceFirst(java.util.regex.Pattern.quote(m), java.util.regex.Matcher.quoteReplacement(ph))
      idx += 1
    }
    for (m <- InlineRe.findAllIn(processed).toList) {
      val ph = s"$InlineCodePh$idx$InlineCodePh"
      blocks += CodeBlock(ph, m)
      processed = processed.replaceFirst(java.util.regex.Pattern.quote(m), java.util.regex.Matcher.quoteReplacement(ph))
      idx += 1
    }
    (processed, blocks.toSeq)
  }

  private def restoreCode(s: String, blocks: Seq[CodeBlock]): String =
    blocks.foldLeft(s)((acc, b) => acc.replace(b.placeholder, b.content))

  private def breakSentences(paragraph: String): Seq[String] = {
    val it = BreakIterator.getSentenceInstance(Locale.ROOT)
    it.setText(paragraph)
    val out = ArrayBuffer.empty[String]
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      val seg = paragraph.substring(start, end).trim
      if (seg.nonEmpty) out += seg
      start = end
      end = it.next()
    }
    out.toSeq
  }

  /** split plain text into trimmed, non-empty sentences */
  def splitIntoSentences(text: String): Seq[String] = {
    if (text == null || text.trim.isEmpty) return Seq.empty
    val (processed, blocks) = extractCode(text)
    val paragraphs = processed.split(ParagraphSplit)
    val sentences = ArrayBuffer.empty[String]
    for (p <- paragraphs) {
      val t = p.trim
      if (t.nonEmpty) {
        if (HeadingRe.pattern.matcher(t).matches()) sentences += t
        else sentences ++= breakSentences(t)
      }
    }
    sentences.map(restoreCode(_, blocks)).map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def validateRanges(text: String, ranges: Seq[AtomicRange]): Unit = {
    var prevEnd = 0
    for (r <- ranges) {
      val valid = r.start >= 0 && r.start < r.end && r.end <= text.length && r.start >= prevEnd
      if (!valid)
        throw new IllegalArgumentException(
          s"Invalid atomic range [${r.start}, ${r.end}) for text length ${text.length}")
      prevEnd = r.end
    }
  }

  /** split while keeping atomic ranges indivisible */
  def splitIntoSentenceUnits(text: String,
                             ranges: Seq[AtomicRange] = Seq.empty): Seq[SentenceUnit] = {
    validateRanges(text, ranges)
    if (ranges.isEmpty)
      return splitIntoSentences(text).map(SentenceUnit(_, atomic = false))
    val units = ArrayBuffer.empty[SentenceUnit]
    var cursor = 0
    def ordinary(s: String): Unit =
      units ++= splitIntoSentences(s).map(SentenceUnit(_, atomic = false))
    for (r <- ranges) {
      ordinary(text.substring(cursor, r.start))
      val atomicText = text.substring(r.start, r.end).trim
      if (atomicText.isEmpty)
        throw new IllegalArgumentException(s"Invalid atomic range [${r.start}, ${r.end}): empty text")
      units += SentenceUnit(atomicText, atomic = true)
      cursor = r.end
    }
    ordinary(text.substring(cursor))
    units.toSeq
  }
}
