package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Hash portability: every hash is derived from md5 hex (first 15 nibbles →
  * 60-bit non-negative long), so the DuckDB oracle can reproduce signatures
  * bit-for-bit. At production scale these would be xxhash64/murmur — the
  * operator shapes are identical.
  *
  * Scale shapes:
  *  - MinHash signatures are computed per-row with array higher-order
  *    functions (transform + array_min): NO explode, NO shuffle — the
  *    signature projection runs at scan speed. Only the tiny banded
  *    candidate join shuffles, on (band, bandHash).
  *  - SimHash is likewise a per-row projection; near-dup pairing blocks on
  *    a 16-bit prefix before the hamming filter, bounding the self-join.
  *  - Exact dedup is one hash-groupBy (map-side combined).
  */
object Dedup {

  /** 60-bit portable hash of a string expression (SQL twin:
    * CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** word k-shingles as a distinct array column (per-row, no shuffle) */
  def wordShingles(textColName: String, k: Int): Column = {
    val words = s"regexp_extract_all(lower($textColName), '[a-z0-9]+', 0)"
    expr(
      s"""array_distinct(CASE WHEN size($words) >= $k THEN
         |  transform(sequence(0, size($words) - $k),
         |            i -> array_join(slice($words, i + 1, $k), ' '))
         |ELSE CAST(array() AS ARRAY<STRING>) END)""".stripMargin)
  }

  /** exact duplicate groups by normalized-content fingerprint */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** MinHash signature array: sig[i] = min over shingles of h_i(shingle),
    * h_i(s) = hash60(i || ':' || s). Empty shingle set → nulls. */
  def minhashSignature(shinglesCol: String, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { i =>
      expr(s"array_min(transform($shinglesCol, s -> " +
        s"CAST(conv(substring(md5(concat('$i:', s)), 1, 15), 16, 10) AS BIGINT)))")
    }
    array(sigs: _*)
  }

  /** LSH banding: explode signature into (bandId, bandHash) rows.
    * bands × rowsPerBand must equal the signature length. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => s"CAST(element_at($sigCol, ${b * rowsPerBand + r + 1}) AS STRING)")
        .mkString(", ")
      struct(lit(b).as("band"), expr(s"md5(concat_ws(',', $parts))").as("band_hash"))
    }
    df.select(col(idCol), explode(array(bandCols: _*)).as("bh"))
      .select(col(idCol), col("bh.band").as("band"), col("bh.band_hash").as("band_hash"))
  }

  /** candidate pairs sharing at least one LSH band (a < b) */
  def lshCandidatePairs(bandsDF: DataFrame, idCol: String): DataFrame = {
    val l = bandsDF.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
    val r = bandsDF.select(col("band"), col("band_hash"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** exact n-gram Jaccard pairs over a shingle posting join; emits
    * (id_a, id_b, jaccard) for pairs sharing >= 1 shingle. */
  def jaccardPairs(df: DataFrame, idCol: String, shinglesCol: String,
                   threshold: Double): DataFrame = {
    val sizes = df.select(col(idCol), size(col(shinglesCol)).as("n_sh"))
    val posts = df.select(col(idCol), explode(col(shinglesCol)).as("sh"))
    val l = posts.select(col("sh"), col(idCol).as("id_a"))
    val r = posts.select(col("sh"), col(idCol).as("id_b"))
    val inter = l.join(r, "sh").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash over distinct words: bit b set iff the signed sum of word-hash
    * bits is positive. Per-row projection (aggregate over the words array). */
  def simhash(textColName: String, bits: Int = 32): Column = {
    val words = s"array_distinct(regexp_extract_all(lower($textColName), '[a-z0-9]+', 0))"
    val hashes = s"transform($words, w -> " +
      s"CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT))"
    val bitCols = (0 until bits).map { b =>
      // sum of (+1|-1) per word for bit b, positive → bit set
      expr(s"""CASE WHEN aggregate($hashes, 0L,
              |  (acc, h) -> acc + CASE WHEN shiftright(h, $b) % 2 = 1 THEN 1L ELSE -1L END) > 0
              |THEN shiftleft(CAST(1 AS BIGINT), $b) ELSE 0L END""".stripMargin)
    }
    bitCols.reduce(_ + _)
  }

  /** near-dup pairs by SimHash: block on the top `prefixBits` bits, then
    * exact hamming distance <= maxHamming within each block. */
  def simhashPairs(df: DataFrame, idCol: String, simhashCol: String,
                   bits: Int, prefixBits: Int, maxHamming: Int): DataFrame = {
    val withBlock = df.withColumn("blk",
      expr(s"shiftright($simhashCol, ${bits - prefixBits})"))
    val l = withBlock.select(col("blk"), col(idCol).as("id_a"), col(simhashCol).as("sh_a"))
    val r = withBlock.select(col("blk"), col(idCol).as("id_b"), col(simhashCol).as("sh_b"))
    l.join(r, "blk").filter(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** embedding-cosine near-dup pairs (a < b, rounded cosine >= threshold) */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val l = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(graft.search.VectorSearch.cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
