package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.embed.HashedEmbedder
import graft.ingest.PdfBoundaryFilter
import graft.ingest.PdfBoundaryFilter.Config

/** F16 header/footer removal semantics (reference pdf-filter.ts:273-636),
  * over pre-extracted (doc_id, page, y, font_size, line) rows. */
class PdfFilterSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  /** doc 1: 5 pages, repeating small-font header+footer at extreme Y, varied
    * body. doc 2: 2 pages only (under minPages). doc 3: 5 pages with varied
    * (non-repeating) boundary lines in normal font mid-page. */
  private def fixture() = {
    val rows = Seq.newBuilder[(Long, Int, Double, Double, String)]
    for (p <- 0 until 5) {
      rows += ((1L, p, 99.0, 5.0, "ACME Corp Annual Report"))
      rows += ((1L, p, 70.0, 12.0, s"unique body alpha ${p * 37} about spark joins"))
      rows += ((1L, p, 50.0, 12.0, s"more body text ${p * 91} on partitions"))
      // footers vary by page number but share boilerplate — the case exact
      // text matching misses and semantic similarity catches (median
      // pairwise cosine 0.88 with the hashed embedder)
      rows += ((1L, p, 1.0, 5.0, s"Page ${p + 1} of 5 ACME Corp Confidential"))
    }
    for (p <- 0 until 2) {
      rows += ((2L, p, 99.0, 5.0, "ACME Corp Annual Report"))
      rows += ((2L, p, 50.0, 12.0, s"short doc body $p"))
      rows += ((2L, p, 1.0, 5.0, s"Page ${p + 1}"))
    }
    val varied = Seq("wholly different opener", "risotto rice recipe",
      "graph coloring proofs", "tide tables for june", "volcanic soil chemistry")
    for (p <- 0 until 5) {
      rows += ((3L, p, 80.0, 12.0, varied(p)))
      rows += ((3L, p, 50.0, 12.0, s"doc3 body line $p"))
      rows += ((3L, p, 20.0, 12.0, varied(4 - p) + " closing"))
    }
    rows.result().toDF("doc_id", "page", "y", "font_size", "line")
  }

  test("block hints flag small-font extreme-Y lines; short docs produce none") {
    val hints = PdfBoundaryFilter.blockHints(fixture())
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: median font of {5,12,12,5}×5 = 8.5; 0.7×8.5 = 5.95 > 5 → both
    // boundary Ys qualify (99 > 0.9×99, 1 < 0.1×99)
    assert(hints(1L).getAs[Double]("median_font") === 8.5)
    assert(hints(1L).getAs[Seq[Long]]("header_ys") === Seq(99L))
    assert(hints(1L).getAs[Seq[Long]]("footer_ys") === Seq(1L))
    // doc 3: all fonts equal → nothing under 0.7×median
    assert(hints(3L).getAs[Seq[Long]]("header_ys") === Seq.empty)
    assert(hints(3L).getAs[Seq[Long]]("footer_ys") === Seq.empty)
    // doc 2 is under minPages → excluded from detection entirely
    assert(!hints.contains(2L))
  }

  test("repeating boundaries detected and stripped; varied boundaries kept") {
    val items = fixture()
    val patterns = PdfBoundaryFilter.boundaryPatterns(items, () => new HashedEmbedder(64))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // doc 1: identical headers (cos 1.0) and near-identical footers → removed
    assert(patterns(1L).getAs[Boolean]("remove_first"))
    assert(patterns(1L).getAs[Double]("header_sim") > 0.99)
    assert(patterns(1L).getAs[Boolean]("remove_last"))
    // doc 3: unrelated boundary sentences → below threshold, kept
    assert(!patterns(3L).getAs[Boolean]("remove_first"))
    assert(!patterns(3L).getAs[Boolean]("remove_last"))
    // doc 2: under minPages → no pattern row at all
    assert(!patterns.contains(2L))

    val stripped = PdfBoundaryFilter.stripBoundaries(items,
      PdfBoundaryFilter.boundaryPatterns(items, () => new HashedEmbedder(64)))
    val byDocPage = stripped.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("page")) -> r.getAs[String]("text"))
      .toMap
    // doc 1 pages keep ONLY the two body lines, top-to-bottom order
    assert(byDocPage((1L, 0)) === "unique body alpha 0 about spark joins more body text 0 on partitions")
    assert(!byDocPage((1L, 3)).contains("ACME") && !byDocPage((1L, 3)).contains("Page"))
    // doc 3 pages untouched (all three lines, ordered by Y desc)
    assert(byDocPage((3L, 1)) === "risotto rice recipe doc3 body line 1 tide tables for june closing")
    // doc 2 untouched despite its repeating header (no detection under minPages)
    assert(byDocPage((2L, 0)).startsWith("ACME Corp Annual Report"))
  }

  test("block hints boost the threshold only where a candidate Y agrees") {
    val items = fixture()
    // similarityThreshold above 1.0 is unreachable: detection can only
    // happen through the hint-boosted threshold. doc 1's boundaries sit on
    // hinted Ys → boosted to 0.9, sim 1.0 → detected. doc 3 has no hints →
    // stays on the unreachable base threshold.
    val cfg = Config(similarityThreshold = 1.01, boostedThreshold = 0.9)
    val patterns = PdfBoundaryFilter.boundaryPatterns(items, () => new HashedEmbedder(64), cfg)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(patterns(1L).getAs[Boolean]("remove_first"))
    assert(!patterns(3L).getAs[Boolean]("remove_first"))
  }

  test("center-page sampling is a clamped window on page rank") {
    // 9 pages 0..8: center 4, half-sample 2 → pages 2..6
    val nine = (0 until 9).flatMap(p => Seq((7L, p, 50.0, 10.0, s"line $p")))
      .toDF("doc_id", "page", "y", "font_size", "line")
    val sampled = PdfBoundaryFilter.sampledPages(nine)
      .select("page").as[Int].collect().toSet
    assert(sampled === Set(2, 3, 4, 5, 6))
  }

  test("F15 line assembly: out-of-order jittered items regroup into reading order") {
    // items arrive scrambled (extraction order is not reading order, and a
    // shuffle destroys it anyway): two visual lines with ±0.3 Y jitter, a
    // word from line 2 interleaved first, an empty item to drop
    val items = Seq(
      // (doc, page, x, y, font_size, item)
      (1L, 0, 60.0, 49.8, 10.0, "world"),
      (1L, 0, 10.0, 80.2, 12.0, "Hello"),
      (1L, 0, 35.0, 79.9, 12.0, "brave"),
      (1L, 0, 10.0, 50.3, 10.0, "goodbye"),
      (1L, 0, 60.0, 80.0, 12.0, "new"),
      (1L, 0, 20.0, 50.0, 10.0, ""),
      // second page, single line
      (1L, 1, 10.0, 90.0, 12.0, "Appendix")
    ).toDF("doc_id", "page", "x", "y", "font_size", "item")

    val lines = PdfBoundaryFilter.assembleLines(items)
    val byKey = lines.collect()
      .map(r => (r.getAs[Int]("page"), r.getAs[Double]("y")) -> r).toMap
    assert(byKey((0, 80.0)).getAs[String]("line") === "Hello brave new")
    assert(byKey((0, 50.0)).getAs[String]("line") === "goodbye world")
    assert(byKey((0, 80.0)).getAs[Double]("font_size") === 12.0)
    assert(byKey((0, 50.0)).getAs[Double]("font_size") === 10.0)

    // page join: lines top-to-bottom (Y desc), pages joined with blank lines
    val doc = PdfBoundaryFilter.joinPages(lines).collect().head
    assert(doc.getAs[String]("text") ===
      "Hello brave new\ngoodbye world\n\nAppendix")
  }
}
