package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Bm25

/** Persisted FTS index (postings + doc lengths + per-bucket corpus stats)
  * next to the chunk table — the materialized form of `Bm25.buildIndex`,
  * refreshed once per mutation batch like the reference's FTS refresh inside
  * `optimize()` (S12: "a 100-file sync would otherwise perform 101
  * compactions", `src/server/index.ts:546-549`). Queries score from stored
  * postings instead of re-tokenizing the corpus.
  *
  * With `numBuckets > 0` the index is partitioned by the SAME path-hash
  * bucket as the bucketed ChunkStore, and [[refreshBucket]] re-tokenizes
  * only one bucket — a single-file upsert costs 1/numBuckets of the corpus
  * for BOTH the chunk table and its index, which is what keeps per-document
  * updates cheap at 100 TB. Global BM25 stats stay exact: they are summed
  * from per-bucket partials at load time (tiny: numBuckets rows).
  */
final class FtsIndexStore(spark: SparkSession, path: String, numBuckets: Int = 0) {

  private def bucketed: Boolean = numBuckets > 0
  private val postingsPath = path + "/postings"
  private val docLensPath = path + "/doclens"
  private val statsPath = path + "/stats"

  private def fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new HPath(statsPath))

  private def idCols = Seq("filePath", "chunkIndex")

  private def buildParts(chunks: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val idx = Bm25.buildIndex(chunks, idCols, Bm25.wordTokens(col("text")))
    if (!bucketed) {
      (idx.postings, idx.docLens,
        idx.docLens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl")))
    } else {
      val bucketCol = pmod(graft.ops.Dedup.hash60(col("filePath")), lit(numBuckets.toLong))
      val statsByBucket = idx.docLens.withColumn("pbucket", bucketCol)
        .groupBy("pbucket")
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      (idx.postings.withColumn("pbucket", bucketCol),
        idx.docLens.withColumn("pbucket", bucketCol), statsByBucket)
    }
  }

  /** full rebuild from the chunk table (one call per mutation batch) */
  def rebuild(chunks: DataFrame): Unit = {
    val (postings, docLens, stats) = buildParts(chunks)
    if (bucketed) {
      postings.write.partitionBy("pbucket").mode(SaveMode.Overwrite).parquet(postingsPath)
      docLens.write.partitionBy("pbucket").mode(SaveMode.Overwrite).parquet(docLensPath)
    } else {
      postings.write.mode(SaveMode.Overwrite).parquet(postingsPath)
      docLens.write.mode(SaveMode.Overwrite).parquet(docLensPath)
    }
    stats.write.mode(SaveMode.Overwrite).parquet(statsPath)
  }

  /** incremental refresh of ONE bucket from that bucket's current chunks —
    * requires a bucketed index; stats for the bucket are replaced via a
    * read-modify-write of the tiny stats table */
  def refreshBucket(bucketChunks: DataFrame, bucket: Long): Unit = {
    require(bucketed, "refreshBucket requires a bucketed index")
    val idx = Bm25.buildIndex(bucketChunks, idCols, Bm25.wordTokens(col("text")))
    idx.postings.write.mode(SaveMode.Overwrite)
      .parquet(s"$postingsPath/pbucket=$bucket")
    idx.docLens.write.mode(SaveMode.Overwrite)
      .parquet(s"$docLensPath/pbucket=$bucket")
    val bucketStats = idx.docLens
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .withColumn("pbucket", lit(bucket))
      .select("pbucket", "n_docs", "sum_dl")
    val others =
      if (exists)
        spark.read.parquet(statsPath).filter(col("pbucket") =!= bucket)
          .select("pbucket", "n_docs", "sum_dl").collect().toSeq
      else Seq.empty
    val merged = spark.createDataFrame(
      spark.sparkContext.parallelize(others ++ bucketStats.collect().toSeq),
      bucketStats.schema)
    val tmp = statsPath + ".tmp-" + System.nanoTime()
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    if (fs.exists(new HPath(statsPath))) fs.delete(new HPath(statsPath), true)
    if (!fs.rename(new HPath(tmp), new HPath(statsPath)))
      throw new java.io.IOException(s"stats swap failed for $statsPath")
  }

  def load(): Option[Bm25.Index] =
    if (!exists) None
    else {
      val rawStats = spark.read.parquet(statsPath)
      val stats =
        if (rawStats.columns.contains("pbucket"))
          rawStats.agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
        else rawStats
      Some(Bm25.Index(
        spark.read.parquet(postingsPath),
        spark.read.parquet(docLensPath),
        stats))
    }

  def drop(): Unit = if (fs.exists(new HPath(path))) fs.delete(new HPath(path), true)
}
