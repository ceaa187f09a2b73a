package graft.chunker

import scala.collection.mutable.ArrayBuffer

import graft.chunker.SentenceSplitter.AtomicRange

/** S7 upstream — atomic-range PRODUCTION from table-structured input.
  *
  * The reference turns DOCX tables into per-data-row atomic blocks of
  * `Header: value` lines and assembles them into (content, atomicRanges)
  * (`src/parser/docx-parser.ts:166-274`). This is its text-boundary twin
  * over GitHub-flavored markdown pipe tables — the fixture format that
  * reaches a Spark pipeline after binary extraction:
  *
  *  - prose paragraphs → ordinary (splittable) blocks;
  *  - a SUPPORTED table (header + separator + ≥1 data row, uniform column
  *    count — the analog of `isSupportedTable`'s uniform-no-spanning check)
  *    emits one ATOMIC block per data row: `Header: value` lines joined by
  *    newline, empty headers falling back to `Column N`;
  *  - an unsupported table degrades to one ordinary block of its cell text
  *    (the reference's `collectTextTokens` fallback) — structure is lost
  *    but content is never dropped;
  *  - blocks join with "\n\n" and every atomic block records its
  *    [start, end) range in the final content (`convertDocxDocumentToText`,
  *    docx-parser.ts:259-274), ready for
  *    [[SentenceSplitter.splitIntoSentenceUnits]] / MaxMinChunker.
  */
object TableBlockParser {

  final case class Block(text: String, atomic: Boolean)
  final case class Parsed(content: String, ranges: Seq[AtomicRange])

  /** single-line normalize: collapse whitespace runs, trim (the reference's
    * `normalizeSingleLine`/`normalizeTextContent`) */
  private def normalize(s: String): String = s.replaceAll("\\s+", " ").trim

  private def parseRowCells(line: String): Seq[String] = {
    val inner = line.trim.stripPrefix("|").stripSuffix("|")
    inner.split("\\|", -1).map(normalize).toSeq
  }

  private def isSeparatorRow(cells: Seq[String]): Boolean =
    cells.nonEmpty && cells.forall(_.matches(":?-{3,}:?"))

  /** a table block from its raw `|`-prefixed lines */
  private def emitTable(tableLines: Seq[String]): Seq[Block] = {
    val rows = tableLines.map(parseRowCells)
    val nCols = rows.headOption.map(_.size).getOrElse(0)
    val supported = rows.size >= 3 && nCols > 0 &&
      isSeparatorRow(rows(1)) && rows.forall(_.size == nCols)
    if (!supported) {
      // degrade to prose: all cell tokens, structure dropped, content kept
      val text = normalize(rows.flatten.filterNot(c => isSeparatorRow(Seq(c)))
        .mkString(" "))
      return if (text.isEmpty) Seq.empty else Seq(Block(text, atomic = false))
    }
    val headers = rows.head.zipWithIndex.map { case (h, i) =>
      if (h.nonEmpty) h else s"Column ${i + 1}"
    }
    rows.drop(2).map { cells =>
      Block(headers.zip(cells).map { case (h, v) => s"$h: $v" }.mkString("\n"),
        atomic = true)
    }
  }

  /** markdown → ordered blocks (prose split on blank lines; `|`-led line
    * runs parsed as tables) */
  def blocks(markdown: String): Seq[Block] = {
    if (markdown == null) return Seq.empty
    val out = ArrayBuffer.empty[Block]
    val prose = ArrayBuffer.empty[String]
    val table = ArrayBuffer.empty[String]
    def flushProse(): Unit = {
      val text = normalize(prose.mkString(" "))
      if (text.nonEmpty) out += Block(text, atomic = false)
      prose.clear()
    }
    def flushTable(): Unit = {
      if (table.nonEmpty) { out ++= emitTable(table.toSeq); table.clear() }
    }
    for (line <- markdown.split("\n", -1)) {
      val t = line.trim
      if (t.startsWith("|")) { flushProse(); table += line }
      else {
        flushTable()
        if (t.isEmpty) flushProse() else prose += line
      }
    }
    flushTable(); flushProse()
    out.toSeq
  }

  /** assemble blocks into (content, atomic ranges) — the exact fold of the
    * reference's `convertDocxDocumentToText` */
  def parse(markdown: String): Parsed = {
    val sb = new StringBuilder
    val ranges = ArrayBuffer.empty[AtomicRange]
    for (b <- blocks(markdown)) {
      if (sb.nonEmpty) sb.append("\n\n")
      val start = sb.length
      sb.append(b.text)
      if (b.atomic) ranges += AtomicRange(start, sb.length)
    }
    Parsed(sb.toString, ranges.toSeq)
  }
}
