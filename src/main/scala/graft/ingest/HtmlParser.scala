package graft.ingest

import scala.collection.mutable

/** HTML → markdown-ish text extraction (reference S8:
  * `src/parser/html-parser.ts:69-130` — JSDOM + Readability + Turndown).
  * This JVM slice implements the same CONTRACT dependency-free, in three
  * stages mirroring the reference's pipeline:
  *
  *  1. a TOLERANT tokenizer → element tree (unclosed/mismatched tags
  *     close implicitly; raw-text elements consume to their end tag;
  *     never throws — malformed input degrades to text)
  *  2. Readability-style noise removal and MAIN-CONTENT selection:
  *     structural boilerplate (`nav/aside/footer/header/form/iframe`…)
  *     and "unlikely candidate" class/id containers (sidebar, comment,
  *     banner, share, related…) are dropped; the best-scoring
  *     `<article>`/`<main>` region (text length × (1 − link density),
  *     the core of Readability's candidate score) replaces the body when
  *     it carries a meaningful share of the text, else body is kept —
  *     the reference's own fallback when Readability finds no article
  *  3. Turndown-style rendering: ATX headings, `-` list items, fenced
  *     `pre`, backticked `code`, paragraph breaks at block boundaries,
  *     entities decoded (named subset + numeric), whitespace collapsed
  *
  * Pure String → String: runs driver-side for single ingest_data calls
  * and inside mapPartitions for bulk HTML corpora.
  */
object HtmlParser {

  // ---- public API ----

  def extractTitle(html: String): Option[String] =
    "(?is)<title[^>]*>(.*?)</title>".r.findFirstMatchIn(html)
      .map(m => decodeEntities(m.group(1).replaceAll("(?s)<[^>]*>", " ")).trim)
      .filter(_.nonEmpty)

  def toMarkdown(html: String): String =
    try {
      val root = parse(html)
      prune(root)
      val content = selectMain(root)
      val sb = new StringBuilder
      render(content, sb, inPre = false)
      tidy(sb.toString)
    } catch { case _: Exception => "" } // graceful '' on failure (ref :69-130)

  // ---- tree model ----

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Elem(name: String, attrs: Map[String, String],
                                children: mutable.ArrayBuffer[Node]) extends Node

  private val VoidTags = Set("br", "hr", "img", "input", "meta", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style", "textarea", "title",
    "noscript", "template")

  // ---- stage 1: tolerant parse ----

  private val AttrRe =
    """([a-zA-Z][a-zA-Z0-9_-]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  private def parse(html: String): Elem = {
    val lower = html.toLowerCase // once — per-script lowering is O(n²)
    val root = Elem("#root", Map.empty, mutable.ArrayBuffer.empty)
    val stack = mutable.ArrayBuffer[Elem](root)
    def top = stack.last
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { top.children += Text(html.substring(i)); i = n }
      else {
        if (lt > i) top.children += Text(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt + 1)
          if (end < 0) i = n
          else {
            val name = html.substring(lt + 2, end).trim.toLowerCase
            // implicit closing: pop to the nearest matching open element
            val at = stack.lastIndexWhere(_.name == name)
            if (at > 0) stack.remove(at, stack.length - at)
            i = end + 1
          }
        } else {
          val end = html.indexOf('>', lt + 1)
          if (end < 0) { top.children += Text(html.substring(lt)); i = n }
          else {
            val inner = html.substring(lt + 1, end)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val sp = body.indexWhere(c => c.isWhitespace)
            val name = (if (sp < 0) body else body.substring(0, sp)).toLowerCase
            if (name.isEmpty || !name.head.isLetter) {
              // not a tag ("<<<", "< 3"): literal text, as browsers do
              top.children += Text(html.substring(lt, end + 1))
              i = end + 1
            } else {
              val attrs =
                if (sp < 0) Map.empty[String, String]
                else AttrRe.findAllMatchIn(body.substring(sp)).map { m =>
                  m.group(1).toLowerCase ->
                    Option(m.group(2)).orElse(Option(m.group(3)))
                      .orElse(Option(m.group(4))).getOrElse("")
                }.toMap
              val el = Elem(name, attrs, mutable.ArrayBuffer.empty)
              top.children += el
              i = end + 1
              if (RawTextTags(name)) {
                // consume raw text to the matching close tag
                val close = lower.indexOf(s"</$name", i)
                val stop = if (close < 0) n else close
                el.children += Text(html.substring(i, stop))
                i = if (close < 0) n
                    else math.max(close, html.indexOf('>', close)) + 1
              } else if (!selfClose && !VoidTags(name) && stack.length < 256)
                // depth cap: pathological nesting flattens into siblings,
                // bounding the later recursive passes (prune/score/render
                // recurse on tree depth; a StackOverflowError is an Error
                // the graceful-degrade catch would NOT absorb)
                stack += el
            }
          }
        }
      }
    }
    root
  }

  // ---- stage 2: noise removal + main-content selection ----

  /** structural boilerplate Readability removes outright */
  private val DropTags = Set("script", "style", "head", "noscript",
    "template", "nav", "aside", "footer", "header", "form", "iframe",
    "svg", "button", "select", "textarea")

  /** Readability's unlikely-candidates heuristic (class/id substrings),
    * overridden by content-ish markers on the same element */
  private val UnlikelyRe =
    ("(?i)sidebar|comment|banner|advert|\\bad[s-]|menu|footer|masthead|" +
      "share|social|sponsor|popup|related|promo|breadcrumb|pagination|pager").r
  private val MaybeRe = "(?i)article|body|main|content|page".r

  private def isNoise(el: Elem): Boolean = {
    if (DropTags(el.name)) return true
    if (el.name == "body" || el.name == "article" || el.name == "main" ||
        el.name == "html" || el.name == "a") return false
    val marker = el.attrs.getOrElse("class", "") + " " + el.attrs.getOrElse("id", "")
    UnlikelyRe.findFirstIn(marker).isDefined && MaybeRe.findFirstIn(marker).isEmpty
  }

  private def prune(el: Elem): Unit = {
    val kept = el.children.filter {
      case e: Elem => !isNoise(e)
      case _ => true
    }
    el.children.clear()
    el.children ++= kept
    el.children.foreach { case e: Elem => prune(e); case _ => () }
  }

  private def textLen(n: Node, inLink: Boolean = false): (Int, Int) = n match {
    case Text(s) =>
      val l = s.replaceAll("\\s+", " ").trim.length
      (l, if (inLink) l else 0)
    case e: Elem =>
      e.children.foldLeft((0, 0)) { case ((t, a), c) =>
        val (ct, ca) = textLen(c, inLink || e.name == "a")
        (t + ct, a + ca)
      }
  }

  /** the rendered region: best `<article>`/`<main>` by
    * length × (1 − link density) when it carries ≥ 20% of the page text,
    * else `<body>`, else the whole tree (the reference's body fallback) */
  private def selectMain(root: Elem): Elem = {
    def find(el: Elem, name: String): Seq[Elem] =
      (if (el.name == name) Seq(el) else Nil) ++
        el.children.collect { case e: Elem => find(e, name) }.flatten
    def score(el: Elem): Double = {
      val (t, link) = textLen(el)
      if (t == 0) 0.0 else t * (1.0 - link.toDouble / t)
    }
    val body = find(root, "body").headOption.getOrElse(root)
    val candidates = find(root, "article") ++ find(root, "main")
    val best = candidates.sortBy(-score(_)).headOption
    best.filter(b => score(b) >= 0.2 * math.max(score(body), 1.0)).getOrElse(body)
  }

  // ---- stage 3: markdown rendering ----

  private val BlockTags = Set("p", "div", "section", "article", "main",
    "table", "tr", "ul", "ol", "blockquote", "figure", "figcaption",
    "body", "html", "#root", "hr", "dl", "dt", "dd")

  private def render(n: Node, sb: StringBuilder, inPre: Boolean): Unit = n match {
    case Text(s) =>
      // entities decode everywhere — inside <pre> only TAGS are literal
      sb ++= decodeEntities(s)
    case e: Elem => e.name match {
      case h if h.length == 2 && h(0) == 'h' && h(1).isDigit && h(1) != '0' =>
        sb ++= "\n\n" + ("#" * (h(1) - '0')) + " "
        e.children.foreach(render(_, sb, inPre)); sb ++= "\n\n"
      case "li" =>
        sb ++= "\n- "; e.children.foreach(render(_, sb, inPre)); sb ++= "\n"
      case "pre" =>
        sb ++= "\n\n```\n"
        e.children.foreach(render(_, sb, inPre = true))
        sb ++= "\n```\n\n"
      case "code" if !inPre =>
        sb += '`'; e.children.foreach(render(_, sb, inPre)); sb += '`'
      case "code" => e.children.foreach(render(_, sb, inPre))
      case "br" => sb += '\n'
      case "title" => () // extracted separately, never part of content
      case b if BlockTags(b) =>
        sb ++= "\n\n"; e.children.foreach(render(_, sb, inPre)); sb ++= "\n\n"
      case "td" | "th" => // cell boundary = word boundary
        e.children.foreach(render(_, sb, inPre)); sb += ' '
      case "a" | "span" | "em" | "strong" | "b" | "i" | "u" | "small" |
           "sup" | "sub" | "mark" | "abbr" | "time" | "cite" | "q" =>
        e.children.foreach(render(_, sb, inPre)) // true inline: no boundary
      case _ => // unknown tags were always word boundaries (old stripTags)
        sb += ' '; e.children.foreach(render(_, sb, inPre)); sb += ' '
    }
  }

  private def tidy(s: String): String = {
    var t = s
    t = t.replaceAll("[ \\t]+", " ")
    t = t.replaceAll(" *\\n *", "\n")
    t = t.replaceAll("\\n{3,}", "\n\n")
    t.trim
  }

  private def decodeEntities(s: String): String = {
    val numeric = "&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});".r
    val base = numeric.replaceAllIn(s, m => {
      val g = m.group(1)
      val cp = try {
        if (g.startsWith("x") || g.startsWith("X")) Integer.parseInt(g.substring(1), 16)
        else Integer.parseInt(g)
      } catch { case _: NumberFormatException => -1 }
      if (cp >= 0x20 && cp <= 0x10FFFF && (cp < 0xD800 || cp > 0xDFFF))
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      else ""
    })
    base
      .replace("&nbsp;", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&") // LAST — else "&amp;lt;" double-decodes to "<"
  }
}
