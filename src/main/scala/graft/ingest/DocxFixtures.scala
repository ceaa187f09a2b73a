package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S7 registry fixture: real DOCX containers (ZIP + OOXML body) carrying
  * the given text lines, so the driver's oracle pins the whole byte path
  * — ZIP walk, StAX body parse, heading styles, uniform-table pipe
  * rendering, and footnote extraction — on every run (the same
  * bytes-are-real / oracle-is-closed-form pattern as
  * [[PdfTextFixtures]]). Every document carries every subsystem:
  *
  *   # Heading {id}        ← w:pStyle Heading1
  *   {line...}             ← one w:p per non-blank line
  *   | K | V | table       ← uniform 2×2 w:tbl
  *   Note {id}.            ← word/footnotes.xml (separator skipped)
  */
object DocxFixtures {

  def textDocx(docId: Long, lines: Seq[String]): Array[Byte] = {
    def esc(s: String) = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val paras = lines.map(_.trim).filter(_.nonEmpty)
      .map(l => s"<w:p><w:r><w:t>${esc(l)}</w:t></w:r></w:p>").mkString
    val body =
      s"""<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>""" +
        s"""<w:r><w:t>Heading $docId</w:t></w:r></w:p>""" + paras +
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>K</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:p><w:r><w:t>V</w:t></w:r></w:p></w:tc></w:tr>" +
        "<w:tr><w:tc><w:p><w:r><w:t>Doc</w:t></w:r></w:p></w:tc>" +
        s"<w:tc><w:p><w:r><w:t>$docId</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
    val W = """xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main""""
    val documentXml =
      s"""<?xml version="1.0" encoding="UTF-8"?><w:document $W><w:body>$body</w:body></w:document>"""
    val footnotesXml =
      s"""<?xml version="1.0" encoding="UTF-8"?><w:footnotes $W>""" +
        """<w:footnote w:type="separator" w:id="-1"><w:p/></w:footnote>""" +
        s"""<w:footnote w:id="1"><w:p><w:r><w:t>Note $docId.</w:t></w:r></w:p></w:footnote>""" +
        "</w:footnotes>"
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("word/document.xml", documentXml)
    entry("word/footnotes.xml", footnotesXml)
    zip.close()
    bos.toByteArray
  }
}
