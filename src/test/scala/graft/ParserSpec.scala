package graft

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
}
