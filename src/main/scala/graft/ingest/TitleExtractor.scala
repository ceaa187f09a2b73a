package graft.ingest

/** Per-format title extraction with provenance (reference
  * `src/parser/title-extractor.ts:34-190`; provenance values `:18-21`).
  * Formats in scope for the JVM slice: markdown and plain text (PDF/DOCX
  * binary parsing is modeled at the fixture/text boundary, SURVEY §7
  * non-goals).
  */
object TitleExtractor {

  final case class Title(value: String, source: String) // metadata | content | filename

  private val FrontmatterTitle =
    "(?s)\\A---\\s*\\n(.*?)\\n---".r
  private val TitleLine = "(?m)^title:\\s*(.+?)\\s*$".r
  private val H1 = "(?m)^#\\s+(.+?)\\s*$".r

  /** filename fallback: strip extension, `[-_]` → space
    * (reference `:170-190`) */
  def fromFilename(filePath: String): Title = {
    val base = filePath.substring(filePath.lastIndexOf('/') + 1)
    val noExt = base.replaceAll("\\.[^.]+$", "")
    Title(noExt.replaceAll("[-_]", " "), "filename")
  }

  /** markdown: frontmatter `title:` → first `# H1` → filename */
  def markdown(content: String, filePath: String): Title = {
    val fm = FrontmatterTitle.findFirstMatchIn(content)
      .flatMap(m => TitleLine.findFirstMatchIn(m.group(1)).map(_.group(1)))
    fm.map(Title(_, "metadata"))
      .orElse(H1.findFirstMatchIn(content).map(m => Title(m.group(1), "content")))
      .getOrElse(fromFilename(filePath))
  }

  /** txt: first line is the title iff followed by a blank line
    * (reference `:79-97`) */
  def text(content: String, filePath: String): Title = {
    val lines = content.split("\n", -1)
    if (lines.length >= 2 && lines(0).trim.nonEmpty && lines(1).trim.isEmpty)
      Title(lines(0).trim, "content")
    else fromFilename(filePath)
  }

  def forFile(content: String, filePath: String): Title = {
    val ext = filePath.substring(filePath.lastIndexOf('.') + 1).toLowerCase
    ext match {
      // docx content at this point IS markdown (DocxParser.toMarkdown);
      // its metadata title, when present, is applied upstream as an
      // override — this is the content-provenance fallback chain
      case "md" | "markdown" | "docx" => markdown(content, filePath)
      case _ => text(content, filePath)
    }
  }
}
