package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F16 — header/footer removal over pre-extracted page text, corpus-wide.
  *
  * The reference runs this per-PDF on mupdf output
  * (`src/parser/pdf-filter.ts:273-636`); here the same two-stage detection
  * runs as one DataFrame pipeline over EVERY document at once, on rows of
  * `(doc_id, page, y, font_size, line)` — one line item per row, Y inverted
  * (larger = nearer the top), the text boundary SURVEY §7 draws for binary
  * parsing.
  *
  * Stage 1 — block-attribute hints (`detectBlockAttributeCandidates`,
  * pdf-filter.ts:330-403): sample pages from the CENTER of each document
  * (cover/TOC/index live at the edges), take the median font size of the
  * sampled items, and flag rounded Y positions whose items are BOTH small
  * (fontSize < 0.7 × median) AND extreme (top or bottom 10% of the page
  * height). Pure relational work — one shuffle on doc_id.
  *
  * Stage 2 — boundary-sentence patterns (`detectSentencePatterns`,
  * pdf-filter.ts:493-576): embed the first and last line of every sampled
  * page, take the MEDIAN pairwise cosine per document per boundary
  * (median, not mean — robust to one odd page), and mark the boundary for
  * removal when similarity ≥ 0.85 — or ≥ 0.75 when a stage-1 hint agrees
  * (`detectBoundaryPattern`'s boosted threshold). Semantic similarity is
  * what handles variable content like "7 of 75" page footers that exact
  * text matching misses.
  *
  * Strip (`filterPageBoundarySentences`, pdf-filter.ts:593-636): drop the
  * first/last line of EVERY page of a detected document; documents with
  * fewer than `minPages` pages are returned untouched.
  */
object PdfBoundaryFilter {

  final case class Config(minPages: Int = 3, samplePages: Int = 5,
                          similarityThreshold: Double = 0.85,
                          boostedThreshold: Double = 0.75)

  /** F15 — item-level line assembly (reference `joinPageItems`,
    * `src/parser/pdf-filter.ts:48-69`): positioned text items
    * `(doc_id, page, x, y, font_size, item)` group into lines by ROUNDED Y
    * (same rounded Y = same visual line, tolerating sub-pixel jitter), items
    * within a line read left-to-right (X asc, item text as the tiebreak —
    * the reference relies on extraction order, which a distributed shuffle
    * does not preserve), lines read top-to-bottom (Y desc, the consumer's
    * sort). One map-side-combinable aggregation; empty items are dropped.
    * Output is F16's input shape: `(doc_id, page, y, font_size, line)` with
    * y = the line's rounded Y and font_size = the line's largest glyph. */
  def assembleLines(items: DataFrame): DataFrame =
    items.filter(col("item") =!= "")
      .withColumn("ry", round(col("y")).cast("long"))
      .groupBy("doc_id", "page", "ry")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("x"), col("item")))),
          x => x.getField("item")), " ").as("line"),
        max(col("font_size")).as("font_size"))
      .select(col("doc_id"), col("page"), col("ry").cast("double").as("y"),
        col("font_size"), col("line"))

  /** reference `joinFilteredPages` (`pdf-filter.ts:71-82`): page text =
    * its lines top-to-bottom joined with newlines (trimmed), document text =
    * non-empty pages in page order joined with blank lines */
  def joinPages(lines: DataFrame): DataFrame =
    lines
      .groupBy("doc_id", "page")
      .agg(trim(array_join(transform(
        array_sort(collect_list(struct((-col("y")).as("ny"), col("line")))),
        x => x.getField("line")), "\n")).as("page_text"))
      .filter(length(col("page_text")) > 0)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("page"), col("page_text")))),
        x => x.getField("page_text")), "\n\n").as("text"))

  /** center-page sample per document (reference `sampleCenterPages`,
    * pdf-filter.ts:271-280): pages ranked in order, window of
    * `samplePages` centered on floor(n/2), clamped to [0, n). Documents
    * under `minPages` produce no rows (detection declines them). */
  def sampledPages(items: DataFrame, cfg: Config = Config()): DataFrame = {
    val pages = items.select("doc_id", "page").distinct()
    val byDoc = Window.partitionBy("doc_id")
    pages
      .withColumn("idx", row_number().over(byDoc.orderBy("page")) - 1)
      .withColumn("n_pages", count(lit(1)).over(byDoc))
      .withColumn("start",
        greatest(lit(0), floor(col("n_pages") / 2) - lit(cfg.samplePages / 2)))
      .filter(col("n_pages") >= cfg.minPages &&
        col("idx") >= col("start") &&
        col("idx") < least(col("n_pages"), col("start") + cfg.samplePages))
      .select("doc_id", "page")
  }

  /** Stage 1: per-document block-attribute hints —
    * (doc_id, median_font, page_height, header_ys, footer_ys).
    * Candidate Y sets are sorted arrays of rounded Y positions. */
  def blockHints(items: DataFrame, cfg: Config = Config()): DataFrame = {
    val sampled = items.join(sampledPages(items, cfg), Seq("doc_id", "page"))
    // median over positive font sizes; page height estimated from max Y
    // (the fixture boundary carries no explicit pageHeight — the reference's
    // fallback branch, pdf-filter.ts:366-377)
    val stats = sampled.groupBy("doc_id").agg(
      expr("percentile(if(font_size > 0, font_size, null), 0.5)").as("median_font"),
      max(col("y")).as("page_height"))
    val small = col("font_size") < col("median_font") * 0.7
    sampled.join(stats, Seq("doc_id"))
      .groupBy("doc_id")
      .agg(
        first(col("median_font")).as("median_font"),
        first(col("page_height")).as("page_height"),
        sort_array(collect_set(
          when(small && col("y") > col("page_height") * 0.9,
            round(col("y")).cast("long")))).as("header_ys"),
        sort_array(collect_set(
          when(small && col("y") < col("page_height") * 0.1,
            round(col("y")).cast("long")))).as("footer_ys"))
  }

  /** first (top) and last (bottom) line of each sampled page, tagged with
    * its boundary; the last line only exists when the page has > 1 line
    * (reference collects lastSentences only for pages with ≥ 2 sentences) */
  private def boundaryLines(items: DataFrame, cfg: Config): DataFrame = {
    val sampled = items.join(sampledPages(items, cfg), Seq("doc_id", "page"))
    val byPage = Window.partitionBy("doc_id", "page")
    val ranked = sampled
      .withColumn("rn", row_number().over(byPage.orderBy(col("y").desc, col("line"))))
      .withColumn("cnt", count(lit(1)).over(byPage))
    ranked.filter(col("rn") === 1)
      .select(col("doc_id"), lit("header").as("boundary"), col("line"),
        round(col("y")).cast("long").as("ry"))
      .union(ranked.filter(col("rn") === col("cnt") && col("cnt") > 1)
        .select(col("doc_id"), lit("footer").as("boundary"), col("line"),
          round(col("y")).cast("long").as("ry")))
  }

  /** Stage 2: per-document boundary detection —
    * (doc_id, remove_first, remove_last, header_sim, footer_sim).
    * Boundary lines are embedded in batched `mapPartitions` (the corpus may
    * hold millions of documents × 5 boundary lines each; the embed stage is
    * the same distributed seam as ingest), then reduced to a median pairwise
    * cosine per (doc, boundary). */
  def boundaryPatterns(items: DataFrame,
                       mkEmbedder: () => graft.embed.Embedder,
                       cfg: Config = Config()): DataFrame = {
    val withVec = graft.embed.EmbedStage.withEmbeddings(
      boundaryLines(items, cfg), "line", "vec", mkEmbedder)
    val medSimUdf = udf((vs: Seq[Seq[Float]]) => medianPairwiseSim(vs))
    val perBoundary = withVec.groupBy("doc_id", "boundary").agg(
      medSimUdf(collect_list(col("vec"))).as("sim"),
      collect_set(col("ry")).as("rys"),
      count(lit(1)).as("n"))
    val hints = blockHints(items, cfg)
    perBoundary.join(hints, Seq("doc_id"), "left_outer")
      .withColumn("hinted",
        when(col("boundary") === "header",
          arrays_overlap(col("rys"), col("header_ys")))
          .otherwise(arrays_overlap(col("rys"), col("footer_ys"))))
      .withColumn("threshold",
        when(coalesce(col("hinted"), lit(false)), cfg.boostedThreshold)
          .otherwise(cfg.similarityThreshold))
      // a boundary needs minPages sampled lines to call a pattern
      .withColumn("detected", col("n") >= cfg.minPages && col("sim") >= col("threshold"))
      .groupBy("doc_id")
      .agg(
        max(when(col("boundary") === "header", col("detected"))).as("remove_first"),
        max(when(col("boundary") === "footer", col("detected"))).as("remove_last"),
        max(when(col("boundary") === "header", col("sim"))).as("header_sim"),
        max(when(col("boundary") === "footer", col("sim"))).as("footer_sim"))
      .select(col("doc_id"),
        coalesce(col("remove_first"), lit(false)).as("remove_first"),
        coalesce(col("remove_last"), lit(false)).as("remove_last"),
        coalesce(col("header_sim"), lit(0.0)).as("header_sim"),
        coalesce(col("footer_sim"), lit(0.0)).as("footer_sim"))
  }

  /** strip detected boundaries from EVERY page of flagged documents and
    * re-join each page's surviving lines top-to-bottom with spaces —
    * (doc_id, page, text). Unflagged documents (including those under
    * minPages, which have no pattern row) pass through unchanged. */
  def stripBoundaries(items: DataFrame, patterns: DataFrame): DataFrame = {
    val byPage = Window.partitionBy("doc_id", "page")
    val ranked = items
      .withColumn("rn", row_number().over(byPage.orderBy(col("y").desc, col("line"))))
      .withColumn("cnt", count(lit(1)).over(byPage))
    ranked
      .join(patterns.select("doc_id", "remove_first", "remove_last"),
        Seq("doc_id"), "left_outer")
      .withColumn("rf", coalesce(col("remove_first"), lit(false)))
      .withColumn("rl", coalesce(col("remove_last"), lit(false)))
      .filter(!(col("rf") && col("rn") === 1) && !(col("rl") && col("rn") === col("cnt")))
      .groupBy("doc_id", "page")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("line")))),
        x => x.getField("line")), " ").as("text"))
  }

  /** median of all pairwise cosines (reference `medianPairwiseSimilarity`,
    * pdf-filter.ts:232-266: even count → mean of the two middle values) */
  private[ingest] def medianPairwiseSim(vs: Seq[Seq[Float]]): Double = {
    val sims = (for {
      i <- vs.indices
      j <- (i + 1) until vs.size
    } yield cosineScala(vs(i), vs(j))).sorted
    if (sims.isEmpty) 0.0
    else if (sims.size % 2 == 0) (sims(sims.size / 2 - 1) + sims(sims.size / 2)) / 2
    else sims(sims.size / 2)
  }

  private def cosineScala(a: Seq[Float], b: Seq[Float]): Double = {
    if (a.size != b.size || a.isEmpty) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.size) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
