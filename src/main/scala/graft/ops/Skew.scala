package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A shuffle equi-join partitions both sides by the join key, so a hot key —
  * or a key with fewer distinct values than there are reducers (`event_type`
  * has FIVE) — lands all of its rows on one task while the rest of the
  * cluster idles. At 100 TB that one task is the job. Two tools:
  *
  *  - [[saltedJoin]]: deterministic salting. The fact side's shuffle key
  *    becomes (key, salt) with salt drawn per-row from a hash in [0, S); the
  *    dim side is replicated S times, once per salt value, so every fact row
  *    still meets its dim row exactly once. A hot key's rows now spread over
  *    S reducers; the price is an S× copy of the (small) dim side — the
  *    classic trade when the dim is too big (or the planner unwilling) to
  *    broadcast outright but dwarfed by the fact side. The join result is
  *    IDENTICAL to the plain join, which is what the oracle checks.
  *  - AQE's runtime skew split (OptimizeSkewedJoin) handles the same problem
  *    adaptively for sort-merge/shuffled-hash joins when map-output sizes
  *    reveal a skewed partition — pinned by OpsSpec ("AQE splits a skewed
  *    shuffle partition"). Salting remains the static tool for the cases AQE
  *    can't touch: aggregation-with-join pipelines where the skew is known
  *    up front, or builds where per-partition memory (not time) is the limit.
  *
  * Reference has no distributed join at all (single-process TS on LanceDB);
  * this is the Spark-native posture for its join-shaped dataflows at scale.
  */
object Skew {

  /** Inner equi-join of `fact` to `dim` on `key`, salted S ways.
    *
    * @param saltBy deterministic per-row expression on the fact side (e.g. a
    *               primary key) hashed into [0, S) — deterministic so reruns
    *               and retries route a row identically (speculative tasks,
    *               result reproducibility)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltBy: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    // one dim copy per salt value: explode keeps this a narrow projection
    // (no shuffle on the dim side until the join's own exchange)
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash pins the shuffle-join path this operator exists for:
    // Catalyst would otherwise broadcast a small-stats dim and quietly
    // discard the salting (harmless, but then nothing is being exercised).
    // A hash join also skips the sort a merge join would pay on S× dim rows.
    saltedFact.join(saltedDim.hint("shuffle_hash"), Seq(key, "_salt"), "inner")
      .drop("_salt")
  }
}
