package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** S7 — byte-level DOCX parsing, pure JVM.
  *
  * The reference converts DOCX through mammoth → HTML → a block emitter that
  * rewrites tables into per-row `Header: value` atomic blocks
  * (`src/parser/docx-parser.ts:166-274`). Here the binary stage is
  * from-scratch over the public OOXML format (ECMA-376): a `.docx` is a ZIP
  * whose `word/document.xml` holds the body — paragraphs (`w:p` → runs
  * `w:r`/`w:t`), heading styles (`w:pStyle`), and tables
  * (`w:tbl`/`w:tr`/`w:tc`). [[toMarkdown]] renders that to GitHub-flavored
  * markdown (headings, prose, pipe tables), which the EXISTING
  * [[graft.chunker.TableBlockParser]] then turns into atomic-range blocks —
  * the one implementation of the atomic semantics, now fed by real bytes.
  *
  * Table fidelity rules (mirroring `isSupportedTable`'s uniform-no-spanning
  * check): a table with row-spans (`w:vMerge`), column-spans (`w:gridSpan`),
  * or ragged rows degrades to a prose block of its cell text — structure
  * lost, content never dropped. Cell text containing `|` swaps it for `/`
  * (the pipe-table twin has no escape syntax).
  *
  * [[docTitle]] reads `docProps/core.xml`'s Dublin Core `dc:title` — the
  * F11 "metadata" provenance for DOCX.
  *
  * Parsing is StAX (JDK built-in, streaming — no document tree for a
  * 100 MB file), with DTD/external-entity resolution disabled.
  */
object DocxParser {

  private sealed trait Block
  private final case class Para(style: String, text: String) extends Block
  private final case class Table(rows: Seq[Seq[String]], spans: Boolean) extends Block

  private def reader(xml: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  private def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return Some(out.toByteArray)
        }
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  /** document body → markdown; empty string when the bytes are not a DOCX.
    * Footnote and endnote CONTENT follows the body as one line per note —
    * mammoth's `convertToHtml` default includes both as trailing lists and
    * the reference's block emitter flattens list items to bare lines
    * (`src/parser/index.ts:496`, `docx-parser.ts:78-119`), so dropping
    * them would lose indexed text the reference retains. */
  def toMarkdown(bytes: Array[Byte]): String =
    try {
      val body = zipEntry(bytes, "word/document.xml").map(bodyMarkdown).getOrElse("")
      val notes =
        Seq("word/footnotes.xml" -> "footnote", "word/endnotes.xml" -> "endnote")
          .flatMap { case (path, tag) =>
            zipEntry(bytes, path).toSeq.flatMap(noteLines(_, tag))
          }
      (Seq(body).filter(_.nonEmpty) ++
        (if (notes.nonEmpty) Seq(notes.mkString("\n")) else Nil)).mkString("\n\n")
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** one trimmed line per real note in document order; the separator /
    * continuation pseudo-notes (`w:type`) carry no content and are
    * skipped, as is any note that renders to whitespace */
  private def noteLines(xml: Array[Byte], tag: String): Seq[String] = {
    val r = reader(xml)
    val out = mutable.ArrayBuffer.empty[String]
    var cur: StringBuilder = null
    var inText = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case `tag` =>
              val noteType = (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == "type")
                .map(r.getAttributeValue)
              // absent or "normal" = a real note; separator /
              // continuationSeparator / continuationNotice are chrome
              cur = if (noteType.forall(_ == "normal")) new StringBuilder else null
            case "t" => inText = true
            case "tab" | "br" if cur != null => cur += ' '
            case "p" if cur != null && cur.nonEmpty => cur += ' '
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS if inText && cur != null =>
            cur ++= r.getText
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inText = false
            case `tag` if cur != null =>
              val text = cur.toString.replaceAll("\\s+", " ").trim
              if (text.nonEmpty) out += text
              cur = null
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Dublin Core title from docProps/core.xml, when present and non-empty */
  def docTitle(bytes: Array[Byte]): Option[String] =
    try zipEntry(bytes, "docProps/core.xml").flatMap { xml =>
      val r = reader(xml)
      try {
        var inTitle = false
        val sb = new StringBuilder
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT
              if r.getLocalName == "title" => inTitle = true
            case XMLStreamConstants.END_ELEMENT
              if r.getLocalName == "title" =>
              val t = sb.toString.trim
              return if (t.nonEmpty) Some(t) else None
            case XMLStreamConstants.CHARACTERS if inTitle => sb ++= r.getText
            case _ => ()
          }
        }
        None
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- document.xml walk ----

  private def bodyMarkdown(xml: Array[Byte]): String = {
    val r = reader(xml)
    val blocks = mutable.ArrayBuffer.empty[Block]
    // paragraph state
    var para: StringBuilder = null
    var style = ""
    var inText = false
    // table state (nested tables flatten into the enclosing cell)
    var tblDepth = 0
    var rows: mutable.ArrayBuffer[Seq[String]] = null
    var row: mutable.ArrayBuffer[String] = null
    var cell: StringBuilder = null
    var spans = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "tbl" =>
              tblDepth += 1
              if (tblDepth == 1) { rows = mutable.ArrayBuffer.empty; spans = false }
            case "tr" if tblDepth == 1 => row = mutable.ArrayBuffer.empty
            case "tc" if tblDepth == 1 => cell = new StringBuilder
            case "gridSpan" | "vMerge" if tblDepth >= 1 => spans = true
            case "p" => para = new StringBuilder; style = ""
            case "pStyle" if para != null =>
              style = (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == "val")
                .map(r.getAttributeValue).getOrElse("")
            case "t" => inText = true
            case "tab" | "br" if para != null => para += ' '
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS if inText && para != null =>
            para ++= r.getText
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inText = false
            case "p" if para != null =>
              val text = para.toString.replaceAll("\\s+", " ").trim
              if (cell != null) { if (text.nonEmpty) { if (cell.nonEmpty) cell += ' '; cell ++= text } }
              else if (text.nonEmpty) blocks += Para(style, text)
              para = null
            case "tc" if tblDepth == 1 && cell != null =>
              row += cell.toString; cell = null
            case "tr" if tblDepth == 1 && row != null =>
              rows += row.toSeq; row = null
            case "tbl" =>
              tblDepth -= 1
              if (tblDepth == 0 && rows != null) {
                blocks += Table(rows.toSeq, spans); rows = null
              }
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    blocks.map(renderBlock).filter(_.nonEmpty).mkString("\n\n")
  }

  private val Heading = "(?i)heading(\\d+)".r

  private def renderBlock(b: Block): String = b match {
    case Para(style, text) => style match {
      case "Title" => s"# $text"
      case Heading(n) => ("#" * math.min(n.toInt, 6)) + " " + text
      case _ => text
    }
    case Table(rows, spans) =>
      val uniform = rows.nonEmpty && rows.forall(_.size == rows.head.size) &&
        rows.head.nonEmpty
      if (spans || !uniform || rows.size < 2)
        // degrade to prose: structure lost, content kept (reference
        // collectTextTokens fallback)
        rows.flatten.mkString(" ").replaceAll("\\s+", " ").trim
      else {
        def line(cells: Seq[String]) =
          cells.map(_.replace("|", "/")).mkString("| ", " | ", " |")
        (line(rows.head) +:
          rows.head.map(_ => "| ---").mkString("", " ", " |") +:
          rows.tail.map(line)).mkString("\n")
      }
  }
}
