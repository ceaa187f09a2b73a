package graft.queries

/** Training-data-pipeline operator queries (dedup, similarity, text analysis,
  * multimodal) — filled in as graft.ops lands.
  */
object PipelineQueries {
  val qs: Seq[Q] = Seq()
}
