package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in graft.queries.Registry as (name, builder, oracleSql)
  * triples so the Spark implementation and its DuckDB oracle are maintained
  * side by side.
  */
object SparkEntry {

  /** Flagship: the full RAG dataflow on sf0.001 — ingest (sentence split →
    * Max-Min chunk → hashed embed) → hybrid search (ANN top-2k → gap
    * grouping → BM25 boost → re-rank → top-k). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Registry.byName.get("rag_e2e_search") match {
      case Some(q) => q.build(spark, dir)
      case None    => Registry.all.head.build(spark, dir)
    }
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted entries get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
