package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.BatchPlanner
import graft.ingest.HtmlParser

class ParserSpec extends AnyFunSuite {

  // ---- HTML parser (S8 contract) ----

  test("html: headings, lists, code, entities convert; scripts dropped") {
    val html =
      """<html><head><title>Page &amp; Title</title><style>x{}</style></head>
        |<body><script>evil()</script>
        |<h1>Main Heading</h1>
        |<p>First paragraph with &quot;quotes&quot; &lt;tags&gt;.</p>
        |<ul><li>item one</li><li>item two</li></ul>
        |<pre>val x = 1</pre>
        |<p>Inline <code>foo()</code> here.</p>
        |</body></html>""".stripMargin
    val md = HtmlParser.toMarkdown(html)
    assert(md.contains("# Main Heading"))
    assert(md.contains("- item one"))
    assert(md.contains("```\nval x = 1\n```"))
    assert(md.contains("`foo()`"))
    assert(md.contains("\"quotes\" <tags>"))
    assert(!md.contains("evil"))
    assert(!md.contains("<p>"))
    assert(HtmlParser.extractTitle(html) === Some("Page & Title"))
  }

  test("html: boilerplate containers drop; article main content wins") {
    // Readability semantics: nav/footer/aside and unlikely-candidate
    // class containers are noise; the <article> region replaces the body
    val html =
      """<html><body>
        |<nav><a href="/">Home</a><a href="/docs">Docs</a><a href="/blog">Blog</a></nav>
        |<div class="sidebar"><a href="/x">Related link</a><a href="/y">Другая</a></div>
        |<article>
        |<h1>Shuffle Tuning</h1>
        |<p>Partition counts should track the data volume so that each task
        |processes a cache-friendly slice of the shuffled stream without spilling.</p>
        |</article>
        |<footer>Copyright corp. All rights reserved.</footer>
        |</body></html>""".stripMargin
    val md = HtmlParser.toMarkdown(html)
    assert(md.contains("# Shuffle Tuning"))
    assert(md.contains("cache-friendly slice"))
    assert(!md.contains("Home"))       // nav dropped
    assert(!md.contains("Related"))    // unlikely class dropped
    assert(!md.contains("Copyright"))  // footer dropped
    // body fallback: no article → body text (minus noise) is kept
    val plain = HtmlParser.toMarkdown(
      "<body><nav>menu</nav><p>Just a paragraph of text.</p></body>")
    assert(plain === "Just a paragraph of text.")
    assert(!plain.contains("menu"))
    // a content-marked class is NOT noise even if it also says sidebar
    val both = HtmlParser.toMarkdown(
      """<body><div class="sidebar content"><p>Kept text.</p></div></body>""")
    assert(both.contains("Kept text."))
  }

  test("html: table cells keep word boundaries; numeric entities decode") {
    val md = HtmlParser.toMarkdown(
      "<table><tr><td>alpha</td><td>beta</td></tr></table><p>&#8212;&#x2014;</p>")
    assert(md.contains("alpha beta"))
    assert(md.contains("——"))
    // entities decode inside <pre> too — only TAGS are literal there
    assert(HtmlParser.toMarkdown("<pre>a &lt; b</pre>").contains("a < b"))
  }

  test("html: pathological nesting and fuzz inputs never throw") {
    // 50k-deep nesting would overflow the recursive passes without the
    // parser's depth cap (StackOverflowError is NOT a catchable Exception)
    val deep = "<div>" * 50000 + "core text" + "</div>" * 50000
    assert(HtmlParser.toMarkdown(deep).contains("core text"))
    val rnd = new scala.util.Random(7)
    val alphabet = "<>/ab \"'=!-&#;x"
    for (_ <- 0 until 200) {
      val junk = Seq.fill(rnd.nextInt(400))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(HtmlParser.toMarkdown(junk) !== null) // must not throw
    }
  }

  test("robots.txt: RFC 9309 precedence, anchors, groups, comments") {
    import graft.ingest.RobotsTxt
    val rules = RobotsTxt.parse(
      """# global rules
        |User-agent: *
        |Disallow: /private/   # trailing comment
        |Allow: /private/public/
        |Disallow: /*.pdf$
        |Disallow:
        |
        |User-agent: alpha
        |User-agent: beta
        |Disallow: /shared/
        |Crawl-delay: 10
        |""".stripMargin)
    assert(rules.allowed("webcrawler", "/open"))
    assert(!rules.allowed("webcrawler", "/private/x"))
    assert(rules.allowed("webcrawler", "/private/public/x")) // longest wins
    assert(!rules.allowed("webcrawler", "/a/b.pdf"))
    assert(rules.allowed("webcrawler", "/a/b.pdfx")) // $ anchor
    // consecutive User-agent lines share one rule group; matching a
    // specific group REPLACES the * group entirely
    assert(!rules.allowed("AlphaBot", "/shared/x"))
    assert(!rules.allowed("beta", "/shared/x"))
    assert(rules.allowed("alpha", "/private/x")) // * rules don't apply
    // no robots at all / empty = allow
    assert(RobotsTxt.parse("").allowed("x", "/anything"))
  }

  // ---- WARC source (the Common Crawl container shape) ----

  test("warc: record walk, http strip, gzip, truncated tail, type filter") {
    import graft.ingest.WarcSource
    val page = "<html><body><p>Crawled paragraph text.</p></body></html>"
    val plain = WarcSource.fixture(2L, // even → plain
      Seq("https://a.test/x" -> page, "https://a.test/y" -> page))
    val recs = WarcSource.records(plain)
    // warcinfo + (request + response) × 2
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "request", "response", "request", "response"))
    assert(recs(2).targetUri === "https://a.test/x")
    // the HTTP header block is stripped from response payloads
    assert(new String(recs(2).httpBody, "UTF-8") === page)
    // gzip-wrapped files (odd ids) parse identically
    val gz = WarcSource.fixture(3L, Seq("https://a.test/x" -> page))
    assert(gz.take(2).map(_ & 0xFF).toSeq === Seq(0x1F, 0x8B))
    assert(WarcSource.records(gz).map(_.warcType) ===
      Seq("warcinfo", "request", "response"))
    // truncated tail: the good prefix survives, the partial record drops
    val cut = plain.take(plain.length - (page.length / 2))
    val partial = WarcSource.records(cut)
    assert(partial.length === 4 && partial.map(_.warcType).count(_ == "response") === 1)
    // extraction keeps only response records and drops parse-empty pages
    val docs = WarcSource.htmlDocs(plain)
    assert(docs.map(_._1) === Seq("https://a.test/x", "https://a.test/y"))
    docs.foreach { case (_, md) => assert(md === "Crawled paragraph text.") }
    // garbage is refused whole, never throws
    assert(WarcSource.records("not a warc at all".getBytes) === Seq.empty)
    // a truncated gzip container yields its good prefix, never throws
    val gzCut = WarcSource.records(gz.take(gz.length * 2 / 3))
    assert(gzCut.length <= 3)
    assert(WarcSource.records(Array[Byte](0x1F, 0x8B.toByte, 1, 2)) === Seq.empty)
    // WET shape: conversion records ARE the text (no HTTP, no HTML)
    val wetBody = "Pre-extracted text of the page.\nSecond line."
    val wet = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://a.test/x\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${wetBody.length}\r\n\r\n$wetBody\r\n\r\n").getBytes
    assert(WarcSource.wetDocs(wet) === Seq("https://a.test/x" -> wetBody))
    assert(WarcSource.wetDocs(plain) === Seq.empty) // responses ≠ conversions
  }

  test("tar: ustar walk, type/extension filters, gzip, checksum gate") {
    import graft.ingest.TarSource
    val docs = Seq("a.md" -> "Alpha doc text.", "b.txt" -> "Beta doc text.",
      "c.md" -> "Gamma doc text.")
    val plain = TarSource.fixture(2L, docs) // even → plain
    // directory + .bin members are skipped; text members extracted in order
    assert(TarSource.textDocs(plain) === docs)
    assert(TarSource.entries(plain).map(_.name) ===
      Seq("a.md", "b.txt", "c.md", "assets/blob.bin"))
    // gzip variant parses identically
    val gz = TarSource.fixture(3L, docs)
    assert(gz.take(2).map(_ & 0xFF).toSeq === Seq(0x1F, 0x8B))
    assert(TarSource.textDocs(gz) === docs)
    // the system tar agrees on the member list (independent validation)
    val f = Files.createTempFile("fixture", ".tar")
    Files.write(f, plain)
    val pb = new ProcessBuilder("tar", "-tf", f.toString)
    try {
      val proc = pb.start()
      val listed = scala.io.Source.fromInputStream(proc.getInputStream)
        .getLines().toList
      assert(proc.waitFor() === 0)
      assert(listed === Seq("corpus2/", "a.md", "b.txt", "c.md", "assets/blob.bin"))
    } catch { case _: java.io.IOException => () } // no tar binary: skip
    // a corrupted header byte fails the checksum → walk stops there
    val bad = plain.clone()
    bad(0) = 'X'.toByte
    assert(TarSource.entries(bad) === Seq.empty)
    assert(TarSource.entries("short".getBytes) === Seq.empty)
  }

  test("zip: stored and deflated members, filters, truncated tail") {
    import graft.ingest.ZipSource
    val docs = Seq("a.md" -> "Alpha zip text.", "b.txt" -> "Beta zip text.")
    val stored = ZipSource.fixture(2L, docs)
    val deflated = ZipSource.fixture(3L, docs)
    assert(ZipSource.textDocs(stored) === docs)
    assert(ZipSource.textDocs(deflated) === docs)
    // the system unzip agrees with our member view of the STORED archive
    val f = Files.createTempFile("fixture", ".zip")
    Files.write(f, stored)
    try {
      val proc = new ProcessBuilder("unzip", "-l", f.toString).start()
      val listing = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      assert(proc.waitFor() === 0)
      docs.foreach { case (n, _) => assert(listing.contains(n)) }
    } catch { case _: java.io.IOException => () } // no unzip binary: skip
    // truncation keeps the good prefix, never throws
    val cut = ZipSource.textDocs(deflated.take(deflated.length / 2))
    assert(cut.length <= docs.length)
    assert(ZipSource.entries("PK garbage".getBytes) === Seq.empty)
  }

  test("epub: container → opf spine → xhtml chapters in order; title; tolerance") {
    import graft.ingest.EpubParser
    val book = EpubParser.fixture(7L, Seq(
      ("Intro", Seq("First paragraph.", "Uses < and & chars.")),
      ("Methods", Seq("Second chapter body."))))
    // mimetype member is FIRST and stored uncompressed (OCF §3.3): the
    // magic "application/epub+zip" must appear literally at offset 38 of a
    // well-formed EPUB (30-byte local header + 8-byte name).
    assert(new String(book.slice(38, 58), "US-ASCII") === "application/epub+zip")
    val chapters = EpubParser.chapters(book)
    assert(chapters.map(_.href) === Seq("ch0.xhtml", "ch1.xhtml"))
    assert(chapters(0).markdown ===
      "# Intro\n\nFirst paragraph.\n\nUses < and & chars.")
    assert(chapters(1).markdown === "# Methods\n\nSecond chapter body.")
    assert(EpubParser.toMarkdown(book) ===
      "# Intro\n\nFirst paragraph.\n\nUses < and & chars.\n\n# Methods\n\nSecond chapter body.")
    assert(EpubParser.title(book) === Some("Book 7"))
    // manifest-only members (the stylesheet) never extract as chapters
    assert(!EpubParser.toMarkdown(book).contains("margin"))
    // refuse-don't-garble: garbage, truncation, missing container
    assert(EpubParser.toMarkdown("not a zip".getBytes) === "")
    assert(EpubParser.toMarkdown(book.take(60)) === "")
    val bare = graft.ingest.ZipSource.fixture(2L, Seq("a.md" -> "x"))
    assert(EpubParser.toMarkdown(bare) === "") // zip but no container.xml
    // a spine idref with no manifest entry skips, rest still extracts
    assert(EpubParser.parseOpf("<package><spine><itemref idref='ghost'/></spine></package>")
      .spine === Seq("ghost"))
    assert(EpubParser.resolve("OEBPS/", "../img/x.png") === "img/x.png")
    assert(EpubParser.resolve("OEBPS/", "./ch1.xhtml") === "OEBPS/ch1.xhtml")
    assert(EpubParser.resolve("", "ch1.xhtml") === "ch1.xhtml")
  }

  test("rtf: destinations skipped, escapes and charset decoded, tolerance") {
    import graft.ingest.RtfParser
    val doc = RtfParser.fixture(3L, Seq("First paragraph here.", "Second one."))
    assert(RtfParser.toText(doc) === "First paragraph here.\n\nSecond one.")
    // fonttbl/info/generator content never leaks into text
    val t = RtfParser.toText(doc)
    assert(!t.contains("Helvetica") && !t.contains("fixture") && !t.contains("graft"))
    // escaped specials round-trip
    assert(RtfParser.toText(RtfParser.fixture(1L, Seq("""a \ b { c } d"""))) ===
      """a \ b { c } d""")
    // cp1252 hex escapes: \'e9 = é, \'99 = ™ (the 0x80–0x9F block)
    assert(RtfParser.toText("""{\rtf1 caf\'e9\par}""") === "café")
    assert(RtfParser.toText("""{\rtf1 brand\'99\par}""") === "brand™")
    // \uN with fallback skipping (\uc1 default): 916 = Δ, '?' swallowed
    // NB: "\ u" spelled via concatenation — Scala interprets \uXXXX even
    // inside triple quotes
    assert(RtfParser.toText("{\\rtf1 \\" + "u916?delta\\par}") === "Δdelta")
    assert(RtfParser.toText("{\\rtf1\\uc2 \\" + "u916??x\\par}") === "Δx")
    // consecutive \u with NO interleaved fallback chars (lazy writers):
    // each new \u cancels the prior unconsumed budget — the stale budget
    // must not swallow the following real text
    assert(RtfParser.toText("{\\rtf1 \\" + "u26085\\" + "u26412? abc\\par}")
      === "日本 abc")
    // spec: a control word counts as ONE skippable fallback character —
    // a \par/\line/\tab landing in the \uc budget is consumed (its output
    // suppressed), and the text after it survives
    assert(RtfParser.toText("{\\rtf1 a\\" + "u916\\par b\\par}") === "aΔb")
    assert(RtfParser.toText("{\\rtf1 \\" + "u916\\tab x\\par}") === "Δx")
    assert(RtfParser.toText("{\\rtf1\\uc1 \\" + "u916\\line delta\\par}")
      === "Δdelta")
    // a group boundary ends the fallback run: with \uc2 and no fallback
    // chars before the group, the budget must NOT leak into it and
    // swallow the group's first text char
    assert(RtfParser.toText("{\\rtf1\\uc2 \\" + "u916{\\b bo}ld\\par}")
      === "Δbold")
    // \tab and \~ are spaces; \line breaks a paragraph
    assert(RtfParser.toText("""{\rtf1 a\tab b\~c\line d\par}""") === "a b c\n\nd")
    // refuse-don't-garble
    assert(RtfParser.toText("plain text, not rtf") === "")
    assert(RtfParser.toText(null) === "")
    // truncated input (unbalanced groups, cut mid-body) keeps the good
    // prefix, never throws
    assert(RtfParser.toText(doc.dropRight(8)).startsWith("First paragraph"))
    assert(RtfParser.toText(doc.take(40)) === "") // cut inside the header
  }

  test("html: malformed input degrades to text, never throws") {
    assert(HtmlParser.toMarkdown("<h1>unclosed <div <<<") !== null)
    assert(HtmlParser.toMarkdown("") === "")
    assert(HtmlParser.extractTitle("no title here") === None)
  }

  // ---- batch outlier deferral (F2 contract) ----

  test("uniform batch defers nothing") {
    val (main, deferred) = BatchPlanner.planBatch(Seq.fill(16)(100))
    assert(main.size === 16 && deferred.isEmpty)
  }

  test("one long outlier is deferred; amplification bounded after") {
    val lengths = Seq.fill(15)(50) :+ 5000
    val (main, deferred) = BatchPlanner.planBatch(lengths)
    assert(deferred === Seq(15))
    val ls = main.map(lengths(_).toDouble)
    val amp = ls.size * math.pow(ls.max, 2) / ls.map(l => l * l).sum
    assert(amp <= BatchPlanner.MaxAmplification)
  }

  test("all-different lengths: eviction stops once under the cap") {
    val lengths = Seq(10, 20, 30, 40, 50, 2000, 3000)
    val (main, deferred) = BatchPlanner.planBatch(lengths)
    assert(main.nonEmpty)
    assert((main ++ deferred).sorted === lengths.indices.toSeq)
    val ls = main.map(lengths(_).toDouble)
    if (ls.size > 1)
      assert(ls.size * math.pow(ls.max, 2) / ls.map(l => l * l).sum
        <= BatchPlanner.MaxAmplification)
  }

  test("batch of one never defers") {
    assert(BatchPlanner.planBatch(Seq(99999)) === ((Seq(0), Seq())))
  }

  // ---- streaming utf8-lossy hash (manifest/rawHash path) ----

  test("utf8LossyHashHex: byte-exact parity with the materialized round-trip") {
    import graft.ingest.Ingest
    def reference(b: Array[Byte]): String =
      Ingest.sha256Hex(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    val fixed: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "plain ascii".getBytes("UTF-8"),
      "héllo wörld — ✓ 漢字 🚀".getBytes("UTF-8"),
      Array[Byte](0x41, 0xC3.toByte),                  // truncated 2-byte seq at EOF
      Array[Byte](0xC3.toByte, 0x28, 0x42),            // malformed continuation
      Array[Byte](0xF0.toByte, 0x9F.toByte, 0x92.toByte), // truncated 4-byte seq
      Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte), // CESU surrogate half
      Array.fill[Byte](3)(0xFF.toByte) ++ "tail".getBytes("UTF-8"))
    fixed.foreach(b => assert(Ingest.utf8LossyHashHex(b) === reference(b)))
    // buffer-boundary sweep: a 4-byte emoji repeated so sequences straddle
    // every offset of the 8 KiB decode buffer, plus malformed bytes mixed in
    val rocket = "🚀".getBytes("UTF-8")
    (0 until 4).foreach { pad =>
      val b = Array.fill[Byte](pad)('x'.toByte) ++
        Array.fill(3000)(rocket).flatten ++ Array[Byte](0xC3.toByte)
      assert(Ingest.utf8LossyHashHex(b) === reference(b))
    }
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val b = Array.fill[Byte](rnd.nextInt(40000))(rnd.nextInt(256).toByte)
      assert(Ingest.utf8LossyHashHex(b) === reference(b))
    }
  }
}
