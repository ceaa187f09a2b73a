package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.search.Bm25

/** Persisted FTS index (postings + doc lengths + corpus stats) next to the
  * chunk table — the materialized form of `Bm25.buildIndex`, refreshed once
  * per mutation batch like the reference's FTS refresh inside `optimize()`
  * (S12: "a 100-file sync would otherwise perform 101 compactions",
  * `src/server/index.ts:546-549`). Queries then score from stored postings
  * instead of re-tokenizing the corpus.
  *
  * At 100 TB the postings table is written bucketed by `tok`; here it is
  * plain parquet with the same three-table shape.
  */
final class FtsIndexStore(spark: SparkSession, path: String) {

  private val postingsPath = path + "/postings"
  private val docLensPath = path + "/doclens"
  private val statsPath = path + "/stats"

  private def fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new HPath(statsPath))

  /** rebuild from the chunk table (one call per mutation batch) */
  def rebuild(chunks: DataFrame, idCols: Seq[String] = Seq("filePath", "chunkIndex"),
              textColName: String = "text"): Unit = {
    val idx = Bm25.buildIndex(chunks, idCols,
      Bm25.wordTokens(org.apache.spark.sql.functions.col(textColName)))
    idx.postings.write.mode(SaveMode.Overwrite).parquet(postingsPath)
    idx.docLens.write.mode(SaveMode.Overwrite).parquet(docLensPath)
    idx.stats.write.mode(SaveMode.Overwrite).parquet(statsPath)
  }

  def load(): Option[Bm25.Index] =
    if (!exists) None
    else Some(Bm25.Index(
      spark.read.parquet(postingsPath),
      spark.read.parquet(docLensPath),
      spark.read.parquet(statsPath)))

  def drop(): Unit = if (fs.exists(new HPath(path))) fs.delete(new HPath(path), true)
}
