package graft.ingest

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** WARC (ISO 28500 / WARC/1.0-1.1) record reader — the container format
  * web-scale training corpora actually arrive in (Common Crawl ships
  * WARC). Beyond-reference source breadth: the reference ingests loose
  * files; a 100 TB pipeline ingests archive containers.
  *
  * Supported (the Common Crawl shape):
  *  - sequential records: `WARC/1.x` version line, CRLF header block,
  *    `Content-Length`-delimited body, CRLF CRLF separator
  *  - whole-file gzip (1F 8B magic — java's GZIPInputStream reads
  *    concatenated per-record members transparently, which is exactly
  *    how Common Crawl files are laid out)
  *  - `response` records carrying an HTTP response: the HTTP status
  *    line + headers are stripped to expose the payload
  *    (`httpBody`); other record types (warcinfo, request, metadata)
  *    are surfaced with their raw body so callers can filter
  *
  * Refuse-don't-garble: a malformed version line, header block, or
  * Content-Length (including a truncated tail — routine in crawl data)
  * ends the walk at the last GOOD record; the prefix is kept. Pure
  * bytes → records; the corpus path runs it inside a flatMap over a
  * binaryFile scan, one pass, no driver involvement.
  */
object WarcSource {

  final case class WarcRecord(warcType: String, targetUri: String,
                              contentType: String, body: Array[Byte]) {
    /** for HTTP response records: the payload past the HTTP header
      * block; identity for everything else */
    def httpBody: Array[Byte] =
      if (!contentType.startsWith("application/http")) body
      else {
        val sep = indexOfDoubleCrlf(body)
        if (sep < 0) body else java.util.Arrays.copyOfRange(body, sep + 4, body.length)
      }
  }

  /** all records of a WARC file (gzip-wrapped or plain) */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
        gunzip(bytes)
      else bytes
    val out = mutable.ArrayBuffer.empty[WarcRecord]
    var i = 0
    var ok = true
    while (ok && i < data.length) {
      // skip inter-record CRLFs
      while (i < data.length && (data(i) == '\r' || data(i) == '\n')) i += 1
      if (i >= data.length) ok = false
      else {
        val hdrEnd = indexOfDoubleCrlf(data, i)
        if (hdrEnd < 0) ok = false
        else {
          val header = new String(data, i, hdrEnd - i, StandardCharsets.ISO_8859_1)
          val lines = header.split("\r\n")
          if (!lines.headOption.exists(_.startsWith("WARC/"))) ok = false
          else {
            def field(name: String): String = lines.iterator.drop(1)
              .map(_.split(":", 2))
              .collectFirst { case Array(k, v) if k.trim.equalsIgnoreCase(name) => v.trim }
              .getOrElse("")
            val len = try field("Content-Length").toLong.toInt
                      catch { case _: NumberFormatException => -1 }
            val bodyStart = hdrEnd + 4
            if (len < 0 || bodyStart + len > data.length) {
              // bad length or truncated tail: stop at the last good record
              ok = false
            } else {
              out += WarcRecord(field("WARC-Type"), field("WARC-Target-URI"),
                field("Content-Type"),
                java.util.Arrays.copyOfRange(data, bodyStart, bodyStart + len))
              i = bodyStart + len
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** the extraction pipeline unit: every `response` record's HTML
    * payload through [[HtmlParser]] — (uri, markdown) pairs, parse-empty
    * pages dropped (zero-chunk semantics) */
  def htmlDocs(bytes: Array[Byte]): Seq[(String, String)] =
    records(bytes).filter(_.warcType == "response").flatMap { r =>
      val md = HtmlParser.toMarkdown(
        new String(r.httpBody, StandardCharsets.UTF_8))
      if (md.isEmpty) None else Some(r.targetUri -> md)
    }

  /** WET files (Common Crawl's pre-extracted text distribution) are the
    * same container with `conversion` records carrying plain text — no
    * HTTP layer, no HTML parse */
  def wetDocs(bytes: Array[Byte]): Seq[(String, String)] =
    records(bytes).filter(_.warcType == "conversion")
      .map(r => r.targetUri -> new String(r.body, StandardCharsets.UTF_8).trim)
      .filter(_._2.nonEmpty)

  private def indexOfDoubleCrlf(data: Array[Byte], from: Int = 0): Int = {
    var i = from
    while (i + 3 < data.length) {
      if (data(i) == '\r' && data(i + 1) == '\n' &&
          data(i + 2) == '\r' && data(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** gunzip keeping whatever decompressed cleanly — a corrupt or
    * truncated member yields its good prefix (the caller's record walk
    * then stops at the last whole record), never an exception */
  private[ingest] def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  // ---- fixture assembly (registry oracle twin of PdfTextFixtures) ----

  /** a real WARC file wrapping `pages` as HTTP response records (plus a
    * warcinfo record and an HTTP `request` record that extraction must
    * skip); whole-file-gzipped for odd docIds — Common Crawl's layout */
  def fixture(docId: Long, pages: Seq[(String, String)]): Array[Byte] = {
    def rec(typ: String, uri: String, ctype: String,
            body: Array[Byte]): Array[Byte] = {
      val sb = new java.io.ByteArrayOutputStream()
      val hdr = (s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        s"Content-Type: $ctype\r\nContent-Length: ${body.length}\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1)
      sb.write(hdr, 0, hdr.length)
      sb.write(body, 0, body.length)
      sb.write('\r'); sb.write('\n'); sb.write('\r'); sb.write('\n')
      sb.toByteArray
    }
    val recs = scala.collection.mutable.ArrayBuffer(
      rec("warcinfo", "", "application/warc-fields",
        s"software: graft-fixture\nrun: $docId\n"
          .getBytes(StandardCharsets.ISO_8859_1)))
    pages.zipWithIndex.foreach { case ((uri, html), k) =>
      recs += rec("request", uri, "application/http; msgtype=request",
        s"GET /$k HTTP/1.1\r\nHost: fixture\r\n\r\n"
          .getBytes(StandardCharsets.ISO_8859_1))
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        .getBytes(StandardCharsets.UTF_8)
      recs += rec("response", uri, "application/http; msgtype=response", http)
    }
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(data); g.close()
      bos.toByteArray
    }
    (docId % 4) match {
      case 0 | 2 => recs.toArray.flatten // plain
      case 1     => gz(recs.toArray.flatten) // whole-file gzip
      case _     =>
        // ONE GZIP MEMBER PER RECORD, concatenated — Common Crawl's actual
        // .warc.gz layout (records are individually seekable); the reader's
        // multi-member gunzip must reassemble the full stream
        recs.toArray.flatMap(gz)
    }
  }
}
