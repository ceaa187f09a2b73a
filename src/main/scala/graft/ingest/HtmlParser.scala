package graft.ingest

/** HTML → markdown-ish text extraction (reference S8:
  * `src/parser/html-parser.ts:69-130` — JSDOM + Readability + Turndown).
  * This JVM slice implements the same CONTRACT with a dependency-free
  * extractor: scripts/styles/head dropped, headings become ATX `#` lines,
  * list items become `-` bullets, paragraphs/blocks become paragraph breaks,
  * remaining tags stripped, basic entities decoded, and failure degrades
  * gracefully to "" (never throws — reference behavior).
  *
  * Pure String → String: runs driver-side for single ingest_data calls and
  * inside mapPartitions for bulk HTML corpora.
  */
object HtmlParser {

  private val DropBlocks = Seq("script", "style", "head", "noscript", "template")

  def extractTitle(html: String): Option[String] =
    "(?is)<title[^>]*>(.*?)</title>".r.findFirstMatchIn(html)
      .map(m => decodeEntities(stripTags(m.group(1))).trim)
      .filter(_.nonEmpty)

  def toMarkdown(html: String): String = {
    try {
      var s = html
      for (tag <- DropBlocks)
        s = s.replaceAll(s"(?is)<$tag[^>]*>.*?</$tag>", " ")
      s = s.replaceAll("(?is)<!--.*?-->", " ")
      // headings → ATX
      for (i <- 1 to 6)
        s = s.replaceAll(s"(?is)<h$i[^>]*>(.*?)</h$i>", "\n\n" + ("#" * i) + " $1\n\n")
      // list items → bullets; code fences preserved
      s = s.replaceAll("(?is)<li[^>]*>(.*?)</li>", "\n- $1")
      s = s.replaceAll("(?is)<pre[^>]*>(.*?)</pre>", "\n\n```\n$1\n```\n\n")
      s = s.replaceAll("(?is)<code[^>]*>(.*?)</code>", "`$1`")
      // block boundaries → paragraph breaks
      s = s.replaceAll("(?i)<(p|div|section|article|br|tr|table|ul|ol|blockquote)[^>]*/?>", "\n\n")
      s = stripTags(s)
      s = decodeEntities(s)
      // collapse whitespace but keep paragraph structure
      s = s.replaceAll("[ \\t]+", " ")
      s = s.replaceAll(" *\\n *", "\n")
      s = s.replaceAll("\\n{3,}", "\n\n")
      s.trim
    } catch { case _: Exception => "" } // graceful '' on failure (ref :69-130)
  }

  private def stripTags(s: String): String = s.replaceAll("(?s)<[^>]*>", " ")

  private def decodeEntities(s: String): String = s
    .replace("&nbsp;", " ")
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
    .replace("&amp;", "&") // LAST — else "&amp;lt;" double-decodes to "<"
}
