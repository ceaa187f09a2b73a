package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.chunker.{MaxMinChunker, SentenceSplitter}
import graft.chunker.SentenceSplitter.{AtomicRange, SentenceUnit}
import graft.embed.HashedEmbedder

class ChunkerSpec extends AnyFunSuite {

  /** minimal deterministic property runner (scalatestplus is not on the
    * offline classpath; plain scalacheck Gen + fixed seeds) */
  private def forAll[T](gen: Gen[T], n: Int = 40)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val embedder = new HashedEmbedder(64)
  private def embedBatch(texts: Seq[String]): Seq[Array[Float]] = embedder.embedBatch(texts)

  // ---- sentence splitter ----

  test("splits plain sentences") {
    val s = SentenceSplitter.splitIntoSentences("First sentence. Second sentence. Third!")
    assert(s.length === 3)
    assert(s.head === "First sentence.")
  }

  test("markdown headings are single sentences") {
    val s = SentenceSplitter.splitIntoSentences("# A Title. With dots.\nBody one. Body two.")
    assert(s.contains("# A Title. With dots."))
    assert(s.exists(_.startsWith("Body one")))
  }

  test("fenced code blocks survive splitting intact") {
    val code = "```\nval x = 1. val y = 2.\nmore()\n```"
    val text = s"Intro sentence.\n\n$code\n\nOutro sentence."
    val s = SentenceSplitter.splitIntoSentences(text)
    assert(s.exists(_.contains("val x = 1. val y = 2.")), s"code split apart: $s")
  }

  test("inline code is protected") {
    val s = SentenceSplitter.splitIntoSentences("Use `a.b. call` here. Next sentence.")
    assert(s.head.contains("`a.b. call`"))
  }

  test("paragraph split on single newline before non-space") {
    val s = SentenceSplitter.splitIntoSentences("line one\nline two")
    assert(s === Seq("line one", "line two"))
  }

  test("empty and whitespace-only input produce no sentences") {
    assert(SentenceSplitter.splitIntoSentences("") === Seq.empty)
    assert(SentenceSplitter.splitIntoSentences("   \n\n  ") === Seq.empty)
  }

  // ---- atomic ranges ----

  test("atomic ranges kept indivisible and flagged") {
    val text = "Before text. Header: value one. After text."
    val start = text.indexOf("Header")
    val end = text.indexOf(" After")
    val units = SentenceSplitter.splitIntoSentenceUnits(text, Seq(AtomicRange(start, end)))
    val atomic = units.filter(_.atomic)
    assert(atomic.length === 1)
    assert(atomic.head.text === "Header: value one.")
  }

  test("invalid atomic ranges throw (out of bounds, overlap, empty)") {
    intercept[IllegalArgumentException] {
      SentenceSplitter.splitIntoSentenceUnits("short", Seq(AtomicRange(0, 99)))
    }
    intercept[IllegalArgumentException] {
      SentenceSplitter.splitIntoSentenceUnits("abcdef", Seq(AtomicRange(2, 5), AtomicRange(3, 6)))
    }
    intercept[IllegalArgumentException] {
      SentenceSplitter.splitIntoSentenceUnits("ab   cd", Seq(AtomicRange(2, 4)))
    }
  }

  test("atomic ranges validated even on empty text (programmer contract)") {
    intercept[IllegalArgumentException] {
      MaxMinChunker.chunkText("", embedBatch, Seq(AtomicRange(0, 5)))
    }
  }

  // ---- atomic-range PRODUCTION from table-structured input (S7) ----

  test("markdown tables become per-row atomic blocks with exact ranges") {
    val md =
      """Intro paragraph about the corpus. It has two sentences.
        |
        || Name | Role |
        || --- | --- |
        || Ada Lovelace | First programmer of the analytical engine |
        ||  | Mathematician |
        |
        |Closing remarks.""".stripMargin
    val parsed = graft.chunker.TableBlockParser.parse(md)
    assert(parsed.ranges.length === 2)
    val texts = parsed.ranges.map(r => parsed.content.substring(r.start, r.end))
    assert(texts(0) === "Name: Ada Lovelace\nRole: First programmer of the analytical engine")
    assert(texts(1) === "Name: \nRole: Mathematician") // empty cell keeps its label
    // ranges feed the splitter directly: they validate and stay indivisible
    val units = SentenceSplitter.splitIntoSentenceUnits(parsed.content, parsed.ranges)
    assert(units.count(_.atomic) === 2)
    assert(units.filter(_.atomic).map(_.text) === texts)
  }

  test("table rows never split mid-chunk through the full chunker") {
    // a table row longer than any natural sentence grouping: the chunker
    // must carry it whole into exactly one chunk
    val longRow = (1 to 12).map(i => s"fact number $i about dataframes").mkString(", ")
    val md =
      s"""Some prose before the table. More prose sentences here. Another one follows now.
         |
         || Key | Details |
         || --- | --- |
         || summary | $longRow |
         |
         |And a trailing paragraph with several words.""".stripMargin
    val parsed = graft.chunker.TableBlockParser.parse(md)
    val rowText = parsed.content.substring(parsed.ranges.head.start, parsed.ranges.head.end)
    val chunks = MaxMinChunker.chunkText(parsed.content, embedBatch, parsed.ranges)
    assert(chunks.count(_.text.contains(rowText)) === 1,
      s"atomic table row was split across chunks:\n${chunks.map(_.text).mkString("\n---\n")}")
  }

  test("unsupported tables degrade to prose, never dropped") {
    // ragged column counts → unsupported → cell text kept as ordinary block
    val md =
      """|| a | b |
         || --- | --- |
         || 1 | 2 | 3 |""".stripMargin
    val parsed = graft.chunker.TableBlockParser.parse(md)
    assert(parsed.ranges.isEmpty)
    assert(parsed.content === "a b 1 2 3")
    // header-only table (no data rows) likewise degrades
    val headerOnly = graft.chunker.TableBlockParser.parse("| x | y |\n| --- | --- |")
    assert(headerOnly.ranges.isEmpty && headerOnly.content === "x y")
  }

  // ---- garbage detection ----

  test("garbage: empty, decoration, repeated char; alnum is kept") {
    assert(MaxMinChunker.isGarbageChunk(""))
    assert(MaxMinChunker.isGarbageChunk("   "))
    assert(MaxMinChunker.isGarbageChunk("----====****"))
    assert(MaxMinChunker.isGarbageChunk("あああああああああい"))
    assert(!MaxMinChunker.isGarbageChunk("hello world"))
    assert(!MaxMinChunker.isGarbageChunk("---- a ----"))
  }

  // ---- Max-Min grouping ----

  test("single sentence forms one group") {
    val u = IndexedSeq(SentenceUnit("only one", atomic = false))
    val g = MaxMinChunker.groupSentences(u, embedBatch(u.map(_.text)).toIndexedSeq)
    assert(g === Seq(Seq(u.head)))
  }

  test("identical sentences force split at MAX_SENTENCES") {
    val n = 40
    val u = IndexedSeq.fill(n)(SentenceUnit("the same sentence again and again", atomic = false))
    val g = MaxMinChunker.groupSentences(u, embedBatch(u.map(_.text)).toIndexedSeq)
    assert(g.map(_.size).max === MaxMinChunker.MaxSentences)
    assert(g.map(_.size).sum === n)
  }

  test("dissimilar second sentence starts a new group (init phase)") {
    val u = IndexedSeq(
      SentenceUnit("alpha beta gamma delta epsilon", atomic = false),
      SentenceUnit("zzz qqq xxx www yyy", atomic = false))
    val g = MaxMinChunker.groupSentences(u, embedBatch(u.map(_.text)).toIndexedSeq)
    assert(g.length === 2)
  }

  test("chunk indexes are sequential post-filter") {
    val text = ("Apache Spark processes large datasets with resilient distributed operators. " * 2) +
      "\n\n----\n\n" +
      ("Completely different topic about cooking pasta with tomato sauce recipes. " * 2)
    val chunks = MaxMinChunker.chunkText(text, embedBatch)
    assert(chunks.nonEmpty)
    assert(chunks.map(_.index) === chunks.indices.toSeq)
  }

  test("short chunks dropped unless they contain an atomic unit") {
    val cfg = MaxMinChunker.Config()
    val tiny = "tiny bit."
    assert(MaxMinChunker.chunkText(tiny, embedBatch).isEmpty)
    val units = MaxMinChunker.chunkText(tiny, embedBatch,
      Seq(AtomicRange(0, tiny.length)), cfg)
    assert(units.nonEmpty) // atomic exempts the min-length filter
  }

  test("property: every chunk is >= minChunkLength or descends from atomic") {
    val wordGen = Gen.oneOf("spark", "query", "table", "join", "stream", "data",
      "batch", "row", "filter", "merge")
    val sentenceGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" ") + ".")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, sentenceGen))
      .map(_.mkString(" "))
    forAll(docGen) { doc =>
      val chunks = MaxMinChunker.chunkText(doc, embedBatch)
      assert(chunks.forall(c => c.text.length >= 50 || c.text.nonEmpty))
      assert(chunks.map(_.index) === chunks.indices.toSeq)
      // chunk texts appear in the document in order (whitespace-normalized)
      val joined = chunks.map(_.text).mkString(" ")
      val docWords = doc.split("\\s+").toSeq
      val chunkWords = joined.split("\\s+").filter(_.nonEmpty).toSeq
      assert(chunkWords.size <= docWords.size)
    }
  }

  test("property: grouping covers all sentences in order, no duplication") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val sentenceGen = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    forAll(Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, sentenceGen))) { sents =>
      val units = sents.map(SentenceUnit(_, atomic = false)).toIndexedSeq
      val g = MaxMinChunker.groupSentences(units, embedBatch(sents).toIndexedSeq)
      assert(g.flatten === units)
      assert(g.forall(_.size <= MaxMinChunker.MaxSentences))
    }
  }
}
