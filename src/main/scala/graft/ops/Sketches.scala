package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the 100 TB answer to "how many distinct
  * documents/urls/tokens" when an exact distinct would shuffle the full key
  * set. Two classic sketches, both built on the portable 60-bit md5 hash
  * ([[Dedup.hash60]]) so a SQL oracle replays them EXACTLY — unlike
  * `approx_count_distinct`, whose binary HLL++ state no second engine can
  * reproduce:
  *
  *  - **HyperLogLog** (Flajolet et al. 2007): 2^b registers, register =
  *    low b hash bits, rho = leading-zero run of the remaining 60−b bits
  *    plus one. The register table (register, max_rho) IS the sketch:
  *    map-side combinable (groupBy max), unionable across shards/days by
  *    the same groupBy-max — the property that matters at scale.
  *  - **KMV / bottom-k** (Bar-Yossef et al. 2002): the k smallest distinct
  *    hash values; estimate (k−1)·2^60 / h_(k). Merge = union the bottom-k
  *    sets and re-take the bottom k. TakeOrdered-shaped: no full sort.
  *
  * Estimator arithmetic sticks to cross-engine-stable forms: powers of two
  * are exact doubles, sums of ≤ m dyadic terms are rounded before
  * comparison, and every emitted float is round(…, 4).
  */
object Sketches {

  /** per-row (register, rho) projection — shared by the batch aggregate
    * and the streaming register maintenance (a streaming groupBy-max over
    * exactly these columns) */
  def hllRho(df: DataFrame, key: Column, b: Int): DataFrame =
    df.select(hllRhoCols(key, b): _*)

  /** HLL register table (register, max_rho) for a 2^b-register sketch over
    * `key`. One projection + one map-side-combinable aggregate — at 100 TB
    * this is a scan plus a 2^b-row shuffle. */
  def hllRegisters(df: DataFrame, key: Column, b: Int): DataFrame =
    hllRho(df, key, b).groupBy("register").agg(max("rho").as("max_rho"))

  /** HLL estimate from a register table: raw harmonic-mean estimator with
    * the standard small-range linear-counting correction (est ≤ 2.5 m and
    * empty registers exist → m·ln(m/V)). Emits the sketch parameters too,
    * so the row documents itself. */
  def hllEstimate(registers: DataFrame, b: Int): DataFrame =
    estimator(
      registers.agg(count(lit(1)).as("present"),
        sum(pow(lit(2.0), -col("max_rho"))).as("ssum")),
      b, keyCols = Nil)

  /** Per-group HLL estimates — the form distinct-counting actually takes
    * at scale ("distinct docs per domain/language/day"): one rho
    * projection keyed by group, a (group, register) max aggregate (still
    * map-side combinable; state = 2^b rows PER GROUP, not per corpus),
    * then the estimator evaluated group-wise. Same linear-counting branch
    * and rounding discipline as [[hllEstimate]]. */
  def hllGroupedEstimate(df: DataFrame, groupCol: Column, key: Column,
                         b: Int): DataFrame =
    estimator(
      df.select(groupCol.as("grp") +: hllRhoCols(key, b): _*)
        .groupBy("grp", "register").agg(max("rho").as("max_rho"))
        .groupBy("grp")
        .agg(count(lit(1)).as("present"),
          sum(pow(lit(2.0), -col("max_rho"))).as("ssum")),
      b, keyCols = Seq("grp"))

  /** the ONE copy of the estimator math (alpha, harmonic mean,
    * linear-counting branch, rounding), applied to an aggregated
    * (present, ssum) frame with optional carried key columns */
  private def estimator(agg: DataFrame, b: Int, keyCols: Seq[String]): DataFrame = {
    val m = (1L << b).toDouble
    val alpha =
      if (b == 4) 0.673 else if (b == 5) 0.697
      else if (b == 6) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    val keys = keyCols.map(col)
    agg
      .select(keys ++ Seq(
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("present")).as("n_zero"),
        (lit(alpha * m * m) / (col("ssum") + (lit(m) - col("present"))))
          .as("est_raw")): _*)
      .select(keys ++ Seq(col("m"), col("n_zero"),
        when(col("est_raw") <= lit(2.5 * m) && col("n_zero") > 0,
          round(lit(m) * log(lit(m) / col("n_zero")), 4))
          .otherwise(round(col("est_raw"), 4)).as("est"),
        when(col("est_raw") <= lit(2.5 * m) && col("n_zero") > 0,
          lit("linear")).otherwise(lit("hll")).as("method")): _*)
  }

  /** (register, rho) column pair for a key column — the scalar core of
    * [[hllRho]], reusable under any grouping */
  private def hllRhoCols(key: Column, b: Int): Seq[Column] = {
    require(b >= 2 && b <= 16, "register bits b must be in [2, 16]")
    val m = 1L << b
    val maxRho = 61 - b
    val h = Dedup.hash60(key)
    val w = shiftright(h, b) // exact h div 2^b on the non-negative hash
    Seq((h % m).as("register"),
      when(w === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(w))).cast("int").as("rho"))
  }

  /** Count-Min sketch (Cormode–Muthukrishnan 2005): depth×width counter
    * grid over the portable hash; row r's counter for a key is
    * hash60(r ":" key) mod width. The sketch table (r, idx, cnt) is
    * mergeable by plain summation — per-shard/per-day sketches union into
    * the corpus sketch — and its size is depth·width regardless of corpus
    * or vocabulary size: frequency estimation without a vocabulary-sized
    * shuffle. Estimates are one-sided (est ≥ true count, spec-pinned). */
  def cmsSketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    df.select(key.as("_k"))
      .select(col("_k"), explode(expr(
        s"sequence(0, ${depth - 1})")).as("r"))
      .select(col("r"),
        (Dedup.hash60(concat_ws(":", col("r"), col("_k"))) % width).as("idx"))
      .groupBy("r", "idx").agg(count(lit(1)).as("cnt"))
  }

  /** point lookups: min over rows of the addressed counters (0 when a
    * counter was never touched). `items` keeps its other columns. */
  def cmsLookup(sketch: DataFrame, items: DataFrame, keyCol: String,
                depth: Int, width: Int): DataFrame = {
    val probes = items.select(col(keyCol))
      .select(col(keyCol), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .select(col(keyCol), col("r"),
        (Dedup.hash60(concat_ws(":", col("r"), col(keyCol))) % width).as("idx"))
    // the grid holds ≤ depth·width rows by construction; the LIMIT makes
    // that bound visible to the planner (maxRows), so the broadcast is
    // provably safe at any corpus size — not a fact-table hint
    val est = probes
      .join(broadcast(sketch.limit(depth * width)), Seq("r", "idx"), "left_outer")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    items.join(est, keyCol)
  }

  /** KMV (bottom-k) distinct estimate over `key`: k smallest distinct
    * 60-bit hashes; (k−1)·2^60 / h_(k), exact when fewer than k distinct
    * values exist (the sketch then holds them all). */
  def kmvEstimate(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.select(Dedup.hash60(key).as("h")).distinct()
      .orderBy("h").limit(k) // TakeOrdered: no full sort at scale
      .agg(count(lit(1)).as("n_held"), max("h").as("kth_hash"))
      .select(lit(k.toLong).as("k"), col("n_held"), col("kth_hash"),
        when(col("n_held") < k, col("n_held").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * pow(lit(2.0), lit(60))
            / col("kth_hash"), 4)).as("est"))
  }
}
