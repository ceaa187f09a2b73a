package graft.queries

/** Vector / FTS / hybrid-search operator queries — filled in as the search
  * modules land (see graft.search).
  */
object RagQueries {
  val qs: Seq[Q] = Seq()
}
