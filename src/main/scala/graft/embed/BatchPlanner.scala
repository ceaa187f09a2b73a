package graft.embed

import scala.collection.mutable.ArrayBuffer

/** Batch outlier deferral (reference F2, `src/embedder/index.ts:56-93`):
  * a batched model pads every input to the longest member, so one long
  * outlier amplifies wasted compute quadratically. While the estimated
  * padding amplification `n·maxLen² / Σ len²` exceeds the cap (1.5×), the
  * longest input is evicted and embedded solo later.
  *
  * Pure function over lengths — the decision logic is testable without any
  * model, and EmbedStage applies it inside each partition batch.
  */
object BatchPlanner {

  val MaxAmplification = 1.5 // reference src/embedder/index.ts:56

  /** returns (mainBatch indices, deferred indices) preserving input order */
  def planBatch(lengths: Seq[Int],
                maxAmplification: Double = MaxAmplification): (Seq[Int], Seq[Int]) = {
    val idx = lengths.indices.toBuffer
    val deferred = ArrayBuffer.empty[Int]
    def amplification(ids: collection.Seq[Int]): Double = {
      if (ids.size <= 1) 1.0
      else {
        val ls = ids.map(i => math.max(lengths(i), 1).toDouble)
        val mx = ls.max
        ids.size * mx * mx / ls.map(l => l * l).sum
      }
    }
    while (idx.size > 1 && amplification(idx) > maxAmplification) {
      val longest = idx.maxBy(i => (lengths(i), i))
      idx -= longest
      deferred += longest
    }
    (idx.toSeq, deferred.sorted.toSeq)
  }
}
