package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.chunker.TableBlockParser
import graft.ingest.DocxParser

/** S7 — byte-level DOCX parsing (`ingest/DocxParser.scala`), on documents
  * assembled from scratch: a real ZIP container with real OOXML body XML.
  * Reference behavior: `src/parser/docx-parser.ts:166-274` (mammoth → block
  * emitter → per-row atomic table blocks). */
class DocxParserSpec extends AnyFunSuite {

  private val W =
    """xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main""""

  private def docx(bodyXml: String, coreTitle: Option[String] = None,
                   extraEntries: Seq[(String, String)] = Nil): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("word/document.xml",
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<w:document $W><w:body>$bodyXml</w:body></w:document>""".stripMargin)
    coreTitle.foreach { t =>
      entry("docProps/core.xml",
        s"""<?xml version="1.0"?>
           |<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
           | xmlns:dc="http://purl.org/dc/elements/1.1/">
           |<dc:title>$t</dc:title><dc:creator>spec</dc:creator>
           |</cp:coreProperties>""".stripMargin)
    }
    extraEntries.foreach { case (name, content) => entry(name, content) }
    zip.close()
    bos.toByteArray
  }

  private def p(text: String, style: Option[String] = None): String = {
    val pr = style.map(s => s"""<w:pPr><w:pStyle w:val="$s"/></w:pPr>""").getOrElse("")
    s"<w:p>$pr<w:r><w:t>$text</w:t></w:r></w:p>"
  }

  private def tbl(rows: Seq[Seq[String]], spanFirstCell: Boolean = false): String =
    "<w:tbl>" + rows.zipWithIndex.map { case (cells, ri) =>
      "<w:tr>" + cells.zipWithIndex.map { case (c, ci) =>
        val pr = if (spanFirstCell && ri == 0 && ci == 0)
          """<w:tcPr><w:gridSpan w:val="2"/></w:tcPr>""" else ""
        s"<w:tc>$pr${p(c)}</w:tc>"
      }.mkString + "</w:tr>"
    }.mkString + "</w:tbl>"

  test("paragraphs, heading styles and Title render as markdown") {
    val md = DocxParser.toMarkdown(docx(
      p("Annual Report", style = Some("Title")) +
        p("Overview", style = Some("Heading1")) +
        p("Revenue grew in every region this year.") +
        p("Details", style = Some("Heading2")) +
        p("Multiple runs ") +
        "<w:p><w:r><w:t>joined</w:t></w:r><w:r><w:t xml:space=\"preserve\"> here</w:t></w:r></w:p>"))
    assert(md ===
      "# Annual Report\n\n# Overview\n\n" +
        "Revenue grew in every region this year.\n\n## Details\n\n" +
        "Multiple runs\n\njoined here")
  }

  test("uniform table → pipe table → per-row ATOMIC blocks via TableBlockParser") {
    val md = DocxParser.toMarkdown(docx(
      p("Quarterly results follow.") +
        tbl(Seq(Seq("Region", "Revenue"), Seq("EMEA", "120"), Seq("APAC", "90")))))
    assert(md.contains("| Region | Revenue |"))
    assert(md.contains("| EMEA | 120 |"))
    // integration with the one atomic-semantics implementation: each data
    // row becomes an indivisible Header: value block
    val parsed = TableBlockParser.parse(md)
    assert(parsed.ranges.size === 2)
    val atomicTexts = parsed.ranges.map(r =>
      parsed.content.substring(r.start, r.end))
    assert(atomicTexts === Seq("Region: EMEA\nRevenue: 120",
      "Region: APAC\nRevenue: 90"))
  }

  test("spanning and ragged tables degrade to prose — content kept, structure lost") {
    val spanning = DocxParser.toMarkdown(docx(
      tbl(Seq(Seq("Merged"), Seq("a", "b")), spanFirstCell = true)))
    assert(!spanning.contains("|") && spanning === "Merged a b")
    val ragged = DocxParser.toMarkdown(docx(
      tbl(Seq(Seq("H1", "H2"), Seq("only-one")))))
    assert(!ragged.contains("|") && ragged === "H1 H2 only-one")
  }

  test("pipe characters in cells cannot break the table shape") {
    val md = DocxParser.toMarkdown(docx(
      tbl(Seq(Seq("Key", "Value"), Seq("ratio", "a|b")))))
    val parsed = TableBlockParser.parse(md)
    assert(parsed.ranges.size === 1)
    assert(parsed.content.contains("Value: a/b"))
  }

  test("docTitle reads Dublin Core; absent core.xml → None; garbage → empty") {
    assert(DocxParser.docTitle(docx(p("x"), Some("The Handbook")))
      === Some("The Handbook"))
    assert(DocxParser.docTitle(docx(p("x"))) === None)
    assert(DocxParser.toMarkdown("not a zip".getBytes(StandardCharsets.UTF_8)) === "")
    assert(DocxParser.docTitle(Array[Byte](80, 75, 1, 2)) === None)
  }

  test("nested tables flatten into the enclosing cell text") {
    val inner = "<w:tbl><w:tr><w:tc>" + p("inner") + "</w:tc></w:tr></w:tbl>"
    val md = DocxParser.toMarkdown(docx(
      "<w:tbl><w:tr>" +
        s"<w:tc>${p("outer")}$inner</w:tc><w:tc>${p("right")}</w:tc>" +
        "</w:tr><w:tr>" +
        s"<w:tc>${p("a")}</w:tc><w:tc>${p("b")}</w:tc>" +
        "</w:tr></w:tbl>"))
    val parsed = TableBlockParser.parse(md)
    assert(parsed.ranges.size === 1)
    assert(parsed.content.contains("outer inner: a"))
  }

  test("footnote and endnote content follows the body; separators skipped") {
    // mammoth's convertToHtml default includes both note streams as
    // trailing lists; the reference flattens list items to bare lines
    // (index.ts:496, docx-parser.ts:78-119) — so must we
    val fn =
      s"""<?xml version="1.0"?><w:footnotes $W>
         |<w:footnote w:type="separator" w:id="-1"><w:p><w:r><w:t>___</w:t></w:r></w:p></w:footnote>
         |<w:footnote w:type="continuationSeparator" w:id="0"><w:p/></w:footnote>
         |<w:footnote w:id="1"><w:p><w:r><w:t>First note.</w:t></w:r></w:p>
         |<w:p><w:r><w:t>Second paragraph.</w:t></w:r></w:p></w:footnote>
         |<w:footnote w:type="normal" w:id="2"><w:p><w:r><w:t>Typed normal note.</w:t></w:r></w:p></w:footnote>
         |</w:footnotes>""".stripMargin
    val en =
      s"""<?xml version="1.0"?><w:endnotes $W>
         |<w:endnote w:type="separator" w:id="-1"><w:p/></w:endnote>
         |<w:endnote w:id="1"><w:p><w:r><w:t>The endnote.</w:t></w:r></w:p></w:endnote>
         |</w:endnotes>""".stripMargin
    val md = DocxParser.toMarkdown(docx(p("Body paragraph."),
      extraEntries = Seq("word/footnotes.xml" -> fn, "word/endnotes.xml" -> en)))
    assert(md ===
      "Body paragraph.\n\nFirst note. Second paragraph.\nTyped normal note.\nThe endnote.")
    // a document with only separator notes is unchanged
    val sepOnly =
      s"""<?xml version="1.0"?><w:footnotes $W>
         |<w:footnote w:type="separator" w:id="-1"><w:p><w:r><w:t>___</w:t></w:r></w:p></w:footnote>
         |</w:footnotes>""".stripMargin
    assert(DocxParser.toMarkdown(docx(p("Only body."),
      extraEntries = Seq("word/footnotes.xml" -> sepOnly))) === "Only body.")
  }
}
