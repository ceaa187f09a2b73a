package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.search.VectorSearch

/** Approximate-nearest-neighbor via signed-random-projection (SRP) LSH over
  * an embedding column — the scale path behind the same API as the
  * brute-force baseline (SURVEY §7 step 7).
  *
  * Hyperplanes are Rademacher (±1) vectors derived from the portable md5
  * hash (component(p, j) = +1 iff hash60(p ':' j) is even), so signatures
  * are reproducible in the DuckDB oracle. Bucket id = bit vector of
  * sign(v · h_p) over `planes` hyperplanes.
  *
  * Scale shape: bucketing is a per-row projection (no shuffle); the query
  * probes exactly one bucket (equality filter — partition-prunable if the
  * table is written bucketed/partitioned by `bucket`), and the brute-force
  * rerank runs over the bucket only, ~N/2^planes rows.
  */
object Similarity {

  /** deterministic ±1 hyperplane component via the portable hash */
  def planeComponent(p: Int, j: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (v % 2 == 0) 1.0 else -1.0
  }

  /** SRP bucket id for a vector column (planes ≤ 30) */
  def srpBucket(vecColName: String, dim: Int, planes: Int): Column = {
    val bitCols = (0 until planes).map { p =>
      val comps = (0 until dim)
        .map(j => s"element_at($vecColName, ${j + 1}) * ${planeComponent(p, j)}")
        .mkString(" + ")
      expr(s"CASE WHEN ($comps) > 0 THEN shiftleft(CAST(1 AS BIGINT), $p) ELSE 0L END")
    }
    bitCols.reduce(_ + _)
  }

  /** ANN top-k: probe the query's SRP bucket, brute-force rerank inside it.
    * Returns (idCol, score) sorted asc by dot distance. */
  def annTopK(df: DataFrame, idCol: String, vecColName: String, dim: Int,
              queryVec: Column, queryBucket: Column, planes: Int, k: Int): DataFrame = {
    val bucketed = df.withColumn("bucket", srpBucket(vecColName, dim, planes))
    bucketed.filter(col("bucket") === queryBucket)
      .withColumn("score", VectorSearch.dotDistance(col(vecColName), queryVec))
      .orderBy(col("score"), col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
