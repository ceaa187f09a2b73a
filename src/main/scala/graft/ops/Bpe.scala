package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over a document corpus —
  * beyond-reference training-pipeline operator (the reference counts
  * tokens, `src/utils/token-counter.ts`, but never LEARNS a vocabulary;
  * a 100 TB pretraining pipeline trains its tokenizer from the corpus it
  * just cleaned, so the engine should too).
  *
  * Classic BPE (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units", ACL 2016) trains on the word-frequency dictionary,
  * not the corpus: one corpus-sized aggregation up front collapses 100 TB
  * of text into a vocab-sized table (zipfian — ~10⁷ distinct words), and
  * every merge iteration after that touches only vocab-sized state.
  *
  * The iteration here keeps the at-scale shape real implementations use —
  * DELTA-maintained pair counts, not a full recount per merge:
  *  - the argmax pair comes from a maintained `pairCounts` table
  *    (TakeOrdered 1, never a full sort);
  *  - only words CONTAINING the winning pair (a map-side higher-order
  *    `exists` filter, no shuffle) are re-paired: their before-pairs enter
  *    the delta negative, their after-merge pairs positive;
  *  - `pairCounts` absorbs the delta in one vocab-scale aggregation.
  * Cost per merge therefore follows the AFFECTED subset (for a zipfian
  * vocab, a sliver after the first few merges), while a naive recount pays
  * the whole symbol table 50 000 times. Both iterating tables are
  * `localCheckpoint(true)`ed per round with eager release of the superseded
  * blocks — the same lineage/memory discipline as
  * [[Dedup.connectedComponents]] (a reliable checkpoint replaces the local
  * one on a cluster). Production knob not taken here: batching the top-K
  * non-overlapping pairs per round to amortize the driver round-trip.
  *
  * Determinism: ties break on (count desc, left asc, right asc), and the
  * in-word replace is left-to-right non-overlapping — both pinned by
  * [[BpeSpec]]'s cross-validation against [[learnLocal]].
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  /** adjacent symbol pairs of `syms` as structs — pure HOF, no shuffle */
  private def adjacentPairs(syms: Column): Column =
    zip_with(slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** left-to-right non-overlapping replace of (left,right) → merged */
  private[ops] def mergeOnce(syms: Seq[String], left: String, right: String,
                             merged: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** word → initial symbol sequence (characters; a production byte-level
    * variant swaps in UTF-8 bytes here, same machinery) */
  private def charSymbols(word: String): Seq[String] = word.map(_.toString)

  /** Train `numMerges` BPE merges on the corpus behind `docs(textCol)`.
    * Stops early when the best remaining pair's count falls below
    * `minCount`. Returns the ordered merge table (rank ascending) — small
    * by construction (≤ numMerges rows), safe on the driver. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._

    // corpus → word-frequency dict (the ONE corpus-sized aggregation),
    // then words → char symbol sequences
    val mergeUdf = udf(mergeOnce _)
    var words = docs
      .select(explode(Dedup.wordsArray(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // split-on-empty can emit a trailing "" depending on the regex
      // engine's limit semantics — drop any empty symbols defensively
      .select(filter(split(col("w"), ""), c => length(c) > 0).as("syms"), col("cnt"))
      .filter(size(col("syms")) >= 2)
      .localCheckpoint(true)

    var pairCounts = words
      .select(explode(adjacentPairs(col("syms"))).as("p"), col("cnt"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("cnt"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // TakeOrdered(1) over vocab-scale pair counts; deterministic tiebreak
      val best = pairCounts.orderBy(desc("cnt"), asc("a"), asc("b")).head(1)
      if (best.isEmpty || best.head.getAs[Long]("cnt") < minCount) done = true
      else {
        val (l, r, c) = (best.head.getAs[String]("a"),
          best.head.getAs[String]("b"), best.head.getAs[Long]("cnt"))
        val m = l + r
        merges += Merge(rank, l, r, m, c)

        val hasPair = exists(adjacentPairs(col("syms")),
          p => p.getField("a") === lit(l) && p.getField("b") === lit(r))
        // map-side split: only words containing the pair re-pair
        val affected = words.filter(hasPair)
        val mergedAffected = affected.select(
          mergeUdf(col("syms"), lit(l), lit(r), lit(m)).as("syms"), col("cnt"))
        val delta = affected
          .select(explode(adjacentPairs(col("syms"))).as("p"), (-col("cnt")).as("cnt"))
          .union(mergedAffected
            .select(explode(adjacentPairs(col("syms"))).as("p"), col("cnt")))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("cnt").as("cnt"))

        val nextPairs = pairCounts.union(delta)
          .groupBy("a", "b").agg(sum("cnt").as("cnt"))
          .filter(col("cnt") > 0)
          .localCheckpoint(true)
        // union concatenates partition lists — without the (shuffle-free)
        // coalesce the words table doubles its partition count every merge
        // and the task count explodes exponentially by rank ~15
        val parts = spark.sparkContext.defaultParallelism
        val nextWords = words.filter(!hasPair).union(mergedAffected)
          .coalesce(parts)
          .localCheckpoint(true)
        // superseded rounds' blocks released eagerly (see Dedup CC notes)
        releaseCheckpoint(pairCounts); releaseCheckpoint(words)
        pairCounts = nextPairs; words = nextWords
        rank += 1
      }
    }
    releaseCheckpoint(pairCounts); releaseCheckpoint(words)
    merges.result()
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** BPE-encode `textCol` with a learned merge table: standard greedy
    * application by merge rank (always the LOWEST-rank applicable merge
    * next — how trained BPE vocabularies are applied at inference). The
    * merge table rides the closure (≤ vocab-size entries, broadcast by the
    * task serializer); per row this is pure JVM, no shuffle. */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val encodeUdf = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq.flatMap { w =>
        var syms = charSymbols(w)
        var go = true
        while (go && syms.length >= 2) {
          val candidates = syms.zip(syms.tail).flatMap(p => ranks.get(p))
          if (candidates.isEmpty) go = false
          else {
            val bestRank = candidates.min
            val m = merges(bestRank)
            syms = mergeOnce(syms, m.left, m.right, m.merged)
          }
        }
        syms
      }
    }
    docs.withColumn("tokens", encodeUdf(col(textCol)))
  }

  // ---- single-node reference twin (spec cross-validation only) ----

  /** sequential BPE with the same tiebreak and replace rules; the oracle
    * for [[learn]]'s distributed delta maintenance in [[BpeSpec]] */
  def learnLocal(wordCounts: Seq[(String, Long)], numMerges: Int,
                 minCount: Long = 2L): Seq[Merge] = {
    var words: Seq[(Seq[String], Long)] = wordCounts
      .filter(_._1.length >= 2).map { case (w, c) => (charSymbols(w), c) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      for ((syms, c) <- words; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minCount) done = true
        else {
          val m = l + r
          merges += Merge(rank, l, r, m, c)
          words = words.map { case (syms, n) => (mergeOnce(syms, l, r, m), n) }
          rank += 1
        }
      }
    }
    merges.result()
  }
}
