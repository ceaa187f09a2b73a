package graft

import org.scalatest.funspec.AnyFunSpec
import graft.ingest.{DocxFixtures, DocxParser, Jbig2, PdfImageFixtures, PdfImages, PdfTextFixtures, PdfTextParser}

/** Malformed-input refusal contract for the binary parsers.
  *
  * The ingest pipeline's per-file tolerance (one corrupt file must never
  * kill a 100 TB crawl partition) rests on a single invariant: every binary
  * entry point refuses cleanly — empty result, None, or a skipped member —
  * and NEVER throws, for ANY byte-level mangling of its input. The parsers
  * implement this with NonFatal guards at the entry seams (e.g.
  * `PdfTextParser.parseItems`, `PdfImages.extract`, `DocxParser.toMarkdown`)
  * and bounds-checked segment walks below them (`Jbig2.decodeEmbedded`'s
  * per-segment `need(n)` dataLen validation).
  *
  * This spec pins the invariant with a deterministic corruption campaign
  * over every fixture structure class: truncation at spread offsets,
  * single-byte flips at spread offsets, and pure-garbage inputs. The
  * reference tolerates unreadable files the same way — skip and continue
  * (`src/ingest/index.ts` error handling) — so refusal-not-crash is
  * contract, not preference. No assertion on WHAT a mangled parse returns
  * (a flipped byte inside a text run may legitimately still parse); the
  * contract under test is no-throw.
  */
class FuzzRefusalSpec extends AnyFunSpec {

  /** deterministic splitmix64 — fixture mangling must not depend on run order */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** offsets spread over (0, n) — deterministic, includes near-start and near-end */
  private def offsets(n: Int, k: Int, seed: Long): Seq[Int] =
    if (n <= 1) Seq.empty
    else (0 until k).map(i => 1 + (mix(seed + i) % (n - 1)).toInt.abs % (n - 1)).distinct

  private def truncations(b: Array[Byte], seed: Long): Seq[Array[Byte]] =
    offsets(b.length, 9, seed).map(b.take) :+ b.take(b.length / 2) :+ b.take(7)

  private def flips(b: Array[Byte], seed: Long): Seq[Array[Byte]] =
    offsets(b.length, 9, seed * 31 + 7).map { p =>
      val c = b.clone(); c(p) = (c(p) ^ (1 + (mix(seed + p) & 0x7f)).toByte).toByte; c
    }

  private val garbage: Seq[Array[Byte]] =
    Seq(0, 1, 7, 64, 4096).map(n => Array.tabulate(n)(i => mix(977L + i).toByte))

  private def assertNoThrow(label: String)(body: => Any): Unit =
    try { body; () }
    catch {
      case e: Throwable =>
        fail(s"$label threw ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def pdfEntryPoints(label: String, mangled: Array[Byte]): Unit = {
    assertNoThrow(s"$label parseItems")(PdfTextParser.parseItems(mangled))
    assertNoThrow(s"$label docTitle")(PdfTextParser.docTitle(mangled))
    assertNoThrow(s"$label images")(PdfImages.extract(mangled))
  }

  describe("PDF text structure classes under truncation and byte flips") {
    // textPdf rotates 16 structure classes by docId % 16 (classic xref,
    // xref streams, object streams, Flate/LZW/AHx/A85/RL/predictor,
    // RC4/AESV2/AESV3 encryption, Type0 CID fonts, CFF, /Differences)
    for (mode <- 0 until 16) {
      it(s"textPdf mode $mode refuses cleanly when mangled") {
        val base = PdfTextFixtures.textPdf(mode.toLong,
          Seq(s"fuzz line one for mode $mode", "second line", "third body line"))
        (truncations(base, 1000L + mode) ++ flips(base, 2000L + mode))
          .foreach(pdfEntryPoints(s"textPdf m$mode", _))
      }
    }
  }

  describe("PDF image encoding classes under truncation and byte flips") {
    // imagePdf rotates 14 raster classes by docId % 14 (raw gray/RGB,
    // Flate, DCT, CCITT G4, inline BI..EI, JBIG2 generic, JBIG2 symbol,
    // refused JPX + decodable sibling, predictor'd Flate, refined JBIG2,
    // Huffman-dictionary JBIG2, /JBIG2Globals shared-dictionary JBIG2,
    // custom-table Huffman JBIG2)
    for (mode <- 0 until 14) {
      it(s"imagePdf mode $mode refuses cleanly when mangled") {
        val base = PdfImageFixtures.imagePdf(mode.toLong)
        (truncations(base, 3000L + mode) ++ flips(base, 4000L + mode))
          .foreach(pdfEntryPoints(s"imagePdf m$mode", _))
      }
    }
  }

  describe("standalone embedded-JBIG2 decode under mangling") {
    it("truncated and flipped segment streams refuse (None) or parse, never throw") {
      val (w, h) = (48, 32)
      val plane = Array.tabulate(w * h)(i => (5 * (i % w) + 3 * (i / w)) % 11 < 4)
      for (mmr <- Seq(false, true)) {
        val base = Jbig2.encodeEmbedded(plane, w, h, mmr = mmr, tpgdon = false)
        (truncations(base, 5000L) ++ flips(base, 6000L) ++ garbage).foreach { m =>
          assertNoThrow(s"jbig2 mmr=$mmr")(Jbig2.decodeEmbedded(m, w, h))
        }
        // truncations of the segment HEADER region must refuse, not mis-accept:
        // the first 11 bytes are the page-info segment header — cutting inside
        // any segment's declared dataLen leaves an incomplete stream
        truncations(base, 7000L).filter(_.length < base.length).foreach { t =>
          assertNoThrow("jbig2 short")(Jbig2.decodeEmbedded(t, w, h))
        }
      }
    }
  }

  describe("standalone Huffman-dictionary JBIG2 under mangling") {
    it("both collective-bitmap codings refuse (None) or parse, never throw") {
      // the imagePdf mode-11 sweep above only reaches ONE coding (docId=11
      // → uncompressed); mangle both here, straight into the segment walk
      val gw = 4; val h = 6; val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          (5 * (i % gw + k * gw) + 3 * (i / gw)) % 11 < 4))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      for (huffDict <- Seq(0, 1)) {
        val base = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
          huffDict = huffDict)
        (truncations(base, 15000L + huffDict) ++ flips(base, 16000L + huffDict) ++
          garbage).foreach { m =>
          assertNoThrow(s"jbig2 huffDict=$huffDict")(Jbig2.decodeEmbedded(m, w, h))
        }
      }
    }
    it("custom-table streams refuse (None) or parse, never throw, both codings") {
      // the imagePdf mode-13 sweep reaches one collective coding
      // (docId=13 → uncompressed); mangle both here — flips land in the
      // code table segments too, exercising parseCodeTable's refusals —
      // and both TEXT coders (arith / SBHUFF-all-custom, whose flips also
      // reach the runcode symbol-ID table)
      val gw = 4; val h = 6; val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          (5 * (i % gw + k * gw) + 3 * (i / gw)) % 11 < 4))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      for (huffDict <- Seq(0, 1); huffText <- Seq(false, true)) {
        val base = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
          huffDict = huffDict, customTables = true, huffText = huffText)
        (truncations(base, 17000L + huffDict) ++ flips(base, 18000L + huffDict) ++
          garbage).foreach { m =>
          assertNoThrow(s"jbig2 custom=$huffDict huffText=$huffText")(
            Jbig2.decodeEmbedded(m, w, h))
        }
      }
    }
  }

  describe("DOCX under truncation and byte flips") {
    it("mangled ZIP containers refuse cleanly") {
      val base = DocxFixtures.textDocx(3L,
        Seq("fuzz docx first paragraph", "second paragraph", "third"))
      (truncations(base, 8000L) ++ flips(base, 9000L)).foreach { m =>
        assertNoThrow("docx toMarkdown")(DocxParser.toMarkdown(m))
        assertNoThrow("docx docTitle")(DocxParser.docTitle(m))
      }
    }
  }

  describe("pure garbage against every entry point") {
    it("random bytes of assorted lengths never throw") {
      garbage.foreach { g =>
        pdfEntryPoints("garbage pdf", g)
        assertNoThrow("garbage docx")(DocxParser.toMarkdown(g))
        assertNoThrow("garbage jbig2")(Jbig2.decodeEmbedded(g, 16, 16))
      }
    }
  }
}
