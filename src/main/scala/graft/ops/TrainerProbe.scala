package graft.ops

/** Driver-materialization probe for the iterative tokenizer trainers
  * (BPE / WordPiece / Unigram-LM).
  *
  * The trainers are iterative-argmax loops by construction (the reference
  * buys this family from a native tokenizer library — Xenova transformers,
  * `src/features/embedding/embedder.ts` — so the loop shape has no
  * reference twin to diff against): each round ends in ONE driver-side
  * fetch whose size must be a pure function of the VOCAB knobs
  * (candidateFetch(batchK), |vocab|, seedSize, |alphabet|), never of the
  * corpus. That property is the whole 100 TB story for this family — the
  * corpus is touched once by the word-dict aggregation, and every round
  * after that moves vocab-scale data only.
  *
  * Every trainer reports each driver fetch here and [[record]] ASSERTS
  * rows <= bound at runtime — the AnnStress nLists pattern: a future edit
  * that turns a vocab-bounded head() into a corpus-bounded collect() fails
  * its first run, not a 100 TB run. [[maxRows]] exposes the worst observed
  * fetch to stress harnesses (TokStress) and specs; [[hook]] lets them
  * record per-round metrics without touching trainer code. */
private[graft] object TrainerProbe {
  /** worst observed fetch, JVM-global: concurrent trainers interleave into
    * ONE max — fine for the bound story (each fetch still asserts its own
    * bound), but per-trainer attribution assumes one trainer per JVM at a
    * time (every in-repo harness is single-trainer). */
  @volatile var maxRows: Long = 0L
  /** (label, round, rows, bound) — fired AFTER the bound assertion.
    * Installed only by single-threaded harnesses; trainers fire it from
    * their driver loop thread. Hook failures must never abort a trainer
    * (a harness that forgets to clear a throwing hook would otherwise
    * poison subsequent production runs), so [[record]] swallows them. */
  @volatile var hook: (String, Int, Long, Long) => Unit = null

  def record(label: String, round: Int, rows: Long, bound: Long): Unit = {
    require(rows <= bound,
      s"$label round $round materialized $rows driver rows — above the " +
        s"vocab bound $bound; this loop must never collect corpus-scale data")
    synchronized { if (rows > maxRows) maxRows = rows }
    val h = hook
    if (h != null)
      try h(label, round, rows, bound)
      catch {
        case e: Exception =>
          System.err.println(s"[trainer-probe] hook threw (ignored): $e")
      }
  }

  def reset(): Unit = synchronized { maxRows = 0L }
}
