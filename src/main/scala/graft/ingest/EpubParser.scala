package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** EPUB (OCF container, ISO/IEC 23736 / IDPF) → markdown extraction — the
  * ebook member of the document-source family (S6 PDF, S7 DOCX, S8 HTML).
  * The reference ingests PDFs/DOCX/HTML only (`src/parser/parser.ts`), but
  * an EPUB is exactly the composition of machinery this repo already has:
  * an OCF **zip** container ([[ZipSource]]) holding an OPF package manifest
  * (StAX, same hardened parser config as [[DocxParser]]) whose spine orders
  * **XHTML** chapters ([[HtmlParser]] → markdown).
  *
  * Contract (refuse-don't-garble, matching the other parsers):
  *  - `META-INF/container.xml` → first `<rootfile full-path=…>` is the OPF;
  *  - OPF `<manifest>` maps id → href (resolved against the OPF directory),
  *    `<spine>` orders chapters by idref; `<dc:title>` is the book title;
  *  - missing container / OPF / malformed XML → empty result, never garbage;
  *  - a spine idref whose manifest entry or member is absent is skipped
  *    (the rest of the book still extracts — tolerant like the HTML stage).
  *
  * Scale shape: pure bytes → String, runs inside mapPartitions; one
  * container is one row's work, embarrassingly parallel across a corpus.
  */
object EpubParser {

  final case class Chapter(href: String, markdown: String)

  /** ONE container walk: (dc:title, ordered spine chapters) — callers
    * needing both (ingest) pay the zip inflation and OPF parse once */
  def book(bytes: Array[Byte]): (Option[String], Seq[Chapter]) = {
    val members: Map[String, Array[Byte]] =
      ZipSource.entries(bytes).map(m => m.name -> m.body).toMap
    val opfPath = members.get("META-INF/container.xml")
      .flatMap(b => rootfilePath(new String(b, StandardCharsets.UTF_8)))
    (for {
      path <- opfPath
      opfBytes <- members.get(path)
    } yield {
      val opf = parseOpf(new String(opfBytes, StandardCharsets.UTF_8))
      val baseDir = path.lastIndexOf('/') match {
        case -1 => ""
        case i  => path.substring(0, i + 1)
      }
      val chs = opf.spine.flatMap { idref =>
        for {
          href <- opf.manifest.get(idref)
          body <- members.get(resolve(baseDir, href))
        } yield Chapter(href,
          HtmlParser.toMarkdown(new String(body, StandardCharsets.UTF_8)))
      }
      (opf.title, chs)
    }).getOrElse((None, Nil))
  }

  /** ordered spine chapters rendered to markdown */
  def chapters(bytes: Array[Byte]): Seq[Chapter] = book(bytes)._2

  /** whole-book markdown: non-empty chapters joined by blank lines */
  def toMarkdown(bytes: Array[Byte]): String =
    chapters(bytes).map(_.markdown).filter(_.nonEmpty).mkString("\n\n")

  /** `<dc:title>` from the OPF metadata (book-level title provenance,
    * feeding the F11 title-extraction chain) */
  def title(bytes: Array[Byte]): Option[String] = book(bytes)._1

  // ------------------------------------------------------------ OPF/XML --

  private[graft] final case class Opf(manifest: Map[String, String],
                                       spine: Seq[String], title: Option[String])

  private def reader(xml: String) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.StringReader(xml))
  }

  /** container.xml: first <rootfile> full-path attribute */
  private[graft] def rootfilePath(xml: String): Option[String] =
    try {
      val r = reader(xml)
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "rootfile") {
            var i = 0
            while (i < r.getAttributeCount) {
              if (r.getAttributeLocalName(i) == "full-path")
                return Some(r.getAttributeValue(i)).filter(_.nonEmpty)
              i += 1
            }
          }
        }
        None
      } finally r.close()
    } catch { case _: Exception => None }

  private[graft] def parseOpf(xml: String): Opf =
    try {
      val manifest = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val spine = scala.collection.mutable.ArrayBuffer.empty[String]
      var title: Option[String] = None
      var inTitle = false
      val sb = new StringBuilder
      val r = reader(xml)
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "item" =>
                var (id, href) = ("", "")
                var i = 0
                while (i < r.getAttributeCount) {
                  r.getAttributeLocalName(i) match {
                    case "id"   => id = r.getAttributeValue(i)
                    case "href" => href = r.getAttributeValue(i)
                    case _      => ()
                  }
                  i += 1
                }
                if (id.nonEmpty && href.nonEmpty) manifest(id) = href
              case "itemref" =>
                var i = 0
                while (i < r.getAttributeCount) {
                  if (r.getAttributeLocalName(i) == "idref")
                    spine += r.getAttributeValue(i)
                  i += 1
                }
              case "title" if title.isEmpty => inTitle = true; sb.clear()
              case _ => ()
            }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
                if inTitle => sb ++= r.getText
            case XMLStreamConstants.END_ELEMENT
                if inTitle && r.getLocalName == "title" =>
              inTitle = false
              val t = sb.toString.trim
              if (t.nonEmpty) title = Some(t)
            case _ => ()
          }
        }
      } finally r.close()
      Opf(manifest.toMap, spine.toSeq, title)
    } catch { case _: Exception => Opf(Map.empty, Nil, None) }

  /** resolve an href against the OPF directory ("OEBPS/"), normalizing
    * one level of "./" and "../" segments (the forms real books use) */
  private[graft] def resolve(baseDir: String, href: String): String = {
    val raw = if (href.startsWith("/")) href.substring(1) else baseDir + href
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    raw.split('/').foreach {
      case "" | "." => ()
      case ".."     => if (out.nonEmpty) out.remove(out.length - 1): Unit
      case seg      => out += seg
    }
    out.mkString("/")
  }

  // ------------------------------------------------------------ fixture --

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Real EPUB fixture: OCF-conformant zip whose FIRST member is the
    * uncompressed `mimetype` (per OCF §3.3 — readers sniff it at a fixed
    * offset), container.xml, an OPF with one manifest/spine entry per
    * chapter plus a non-spine stylesheet (manifest-only members must NOT
    * extract), and XHTML chapters with prolog + doctype. Chapters are
    * (title, paragraphs). */
  def fixture(docId: Long, chapterSpecs: Seq[(String, Seq[String])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def putStored(name: String, body: Array[Byte]): Unit = {
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(body.length)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      e.setCrc(crc.getValue)
      zip.putNextEntry(e); zip.write(body); zip.closeEntry()
    }
    def put(name: String, text: String): Unit = {
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.DEFLATED)
      zip.putNextEntry(e)
      zip.write(text.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    zip.setMethod(ZipEntry.DEFLATED)
    putStored("mimetype", "application/epub+zip".getBytes(StandardCharsets.US_ASCII))
    put("META-INF/container.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |  <rootfiles>
        |    <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |  </rootfiles>
        |</container>""".stripMargin)
    val items = chapterSpecs.indices.map(i =>
      s"""<item id="ch$i" href="ch$i.xhtml" media-type="application/xhtml+xml"/>""")
    val refs = chapterSpecs.indices.map(i => s"""<itemref idref="ch$i"/>""")
    put("OEBPS/content.opf",
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
         |  <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
         |    <dc:identifier id="uid">graft-$docId</dc:identifier>
         |    <dc:title>Book $docId</dc:title>
         |    <dc:language>en</dc:language>
         |  </metadata>
         |  <manifest>
         |    ${items.mkString("\n    ")}
         |    <item id="css" href="style/main.css" media-type="text/css"/>
         |  </manifest>
         |  <spine>
         |    ${refs.mkString("\n    ")}
         |  </spine>
         |</package>""".stripMargin)
    put("OEBPS/style/main.css", "body { margin: 0 }")
    chapterSpecs.zipWithIndex.foreach { case ((title, paras), i) =>
      val body = paras.map(p => s"  <p>${xmlEscape(p)}</p>").mkString("\n")
      put(s"OEBPS/ch$i.xhtml",
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<!DOCTYPE html>
           |<html xmlns="http://www.w3.org/1999/xhtml">
           |<head><title>${xmlEscape(title)}</title></head>
           |<body>
           |  <h1>${xmlEscape(title)}</h1>
           |$body
           |</body>
           |</html>""".stripMargin)
    }
    zip.close()
    bos.toByteArray
  }
}
