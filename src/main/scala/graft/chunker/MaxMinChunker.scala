package graft.chunker

import scala.collection.mutable.ArrayBuffer
import graft.chunker.SentenceSplitter.{AtomicRange, SentenceUnit}

/** Max-Min semantic chunking (reference `src/chunker/semantic-chunker.ts:
  * 182-320`, after "Max–Min semantic chunking of documents for RAG
  * application", Springer 2025 — paper parameters hardThreshold=0.6,
  * initConst=1.5, c=0.9).
  *
  * Decision rule per sentence s against the open chunk C:
  *   join iff maxSim(s, C) > max(c · minSim(C) · sigmoid(|C|), hardThreshold)
  * with an init phase for |C| = 1 (join iff initConst·sim > hardThreshold),
  * minSim computed over the last WINDOW_SIZE=5 members (O(1) per step), and
  * a forced split at MAX_SENTENCES=15.
  *
  * This is inherently sequential PER DOCUMENT — in the Spark pipeline it
  * runs inside mapPartitions/flatMapGroups with one document per call
  * (SURVEY §7 "what's hard" #1), never as a relational op.
  */
object MaxMinChunker {

  final case class Config(
      hardThreshold: Double = 0.6,
      initConst: Double = 1.5,
      c: Double = 0.9,
      minChunkLength: Int = 50)

  val WindowSize = 5
  val MaxSentences = 15

  final case class TextChunk(text: String, index: Int)

  private val DecorationRe =
    "^[-=_.*#|~`@!%^&*()\\[\\]{}\\\\/<>:+\\s]+$".r

  /** Garbage-chunk detection (reference `semantic-chunker.ts:65-84`):
    * empty → garbage; any alphanumeric → keep; decoration-only → garbage;
    * one char > 80% of text → garbage. */
  def isGarbageChunk(text: String): Boolean = {
    val t = text.trim
    if (t.isEmpty) return true
    // reference tests /[a-zA-Z0-9]/ — ASCII alphanumerics only
    if (t.exists(ch => (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')))
      return false
    if (DecorationRe.pattern.matcher(t).matches()) return true
    val counts = t.groupBy(identity).map(_._2.length)
    counts.max.toDouble / t.length > 0.8
  }

  def cosineSimilarity(a: Array[Float], b: Array[Float]): Double = {
    if (a.length != b.length || a.length == 0) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  private def minSimilarity(embs: ArrayBuffer[Array[Float]]): Double = {
    if (embs.length < 2) return 1.0
    val start = math.max(0, embs.length - WindowSize)
    var minSim = 1.0
    var i = start
    while (i < embs.length) {
      var j = i + 1
      while (j < embs.length) {
        val s = cosineSimilarity(embs(i), embs(j))
        if (s < minSim) minSim = s
        j += 1
      }
      i += 1
    }
    minSim
  }

  private def maxSimilarity(e: Array[Float], embs: ArrayBuffer[Array[Float]]): Double = {
    var maxSim = -1.0
    for (c <- embs) {
      val s = cosineSimilarity(e, c)
      if (s > maxSim) maxSim = s
    }
    maxSim
  }

  /** group sentences into chunks; pure, order-dependent */
  def groupSentences(sentences: IndexedSeq[SentenceUnit],
                     embeddings: IndexedSeq[Array[Float]],
                     cfg: Config = Config()): Seq[Seq[SentenceUnit]] = {
    if (sentences.isEmpty) return Seq.empty
    if (sentences.length == 1) return Seq(Seq(sentences.head))

    val groups = ArrayBuffer.empty[Seq[SentenceUnit]]
    var cur = ArrayBuffer.empty[SentenceUnit]
    var curEmb = ArrayBuffer.empty[Array[Float]]

    var i = 0
    while (i < sentences.length) {
      val s = sentences(i)
      val e = embeddings(i)
      if (cur.isEmpty) {
        cur += s; curEmb += e
      } else if (cur.length == 1) {
        val sim = cosineSimilarity(curEmb(0), e)
        if (cfg.initConst * sim > cfg.hardThreshold) { cur += s; curEmb += e }
        else {
          groups += cur.toSeq
          cur = ArrayBuffer(s); curEmb = ArrayBuffer(e)
        }
      } else if (cur.length >= MaxSentences) {
        groups += cur.toSeq
        cur = ArrayBuffer(s); curEmb = ArrayBuffer(e)
      } else {
        val minSim = minSimilarity(curEmb)
        val maxSim = maxSimilarity(e, curEmb)
        val threshold = math.max(cfg.c * minSim * sigmoid(curEmb.length.toDouble), cfg.hardThreshold)
        if (maxSim > threshold) { cur += s; curEmb += e }
        else {
          groups += cur.toSeq
          cur = ArrayBuffer(s); curEmb = ArrayBuffer(e)
        }
      }
      i += 1
    }
    if (cur.nonEmpty) groups += cur.toSeq
    groups.toSeq
  }

  /** full per-document chunking: split → embed → group → assemble + filter.
    * Chunk indexes are assigned AFTER the length/garbage filters (reference
    * `semantic-chunker.ts:156-176`). */
  def chunkText(text: String,
                embedBatch: Seq[String] => Seq[Array[Float]],
                atomicRanges: Seq[AtomicRange] = Seq.empty,
                cfg: Config = Config()): Seq[TextChunk] = {
    if (text == null || text.trim.isEmpty) {
      // supplied ranges are programmer contracts: fail fast even on empty text
      if (atomicRanges.nonEmpty) SentenceSplitter.splitIntoSentenceUnits(text, atomicRanges)
      return Seq.empty
    }
    val units = SentenceSplitter.splitIntoSentenceUnits(text, atomicRanges).toIndexedSeq
    if (units.isEmpty) return Seq.empty
    val embs = embedBatch(units.map(_.text)).toIndexedSeq
    val groups = groupSentences(units, embs, cfg)
    val out = ArrayBuffer.empty[TextChunk]
    var idx = 0
    for (g <- groups) {
      val chunkText = g.map(_.text).mkString(" ")
      val hasAtomic = g.exists(_.atomic)
      if ((hasAtomic || chunkText.length >= cfg.minChunkLength) && !isGarbageChunk(chunkText)) {
        out += TextChunk(chunkText, idx)
        idx += 1
      }
    }
    out.toSeq
  }
}
