package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time join operators the reference lacks but a training-data /
  * analytics pipeline needs: point-in-time (as-of) joins and bounded
  * range joins, both built on shuffle-once scale shapes.
  *
  * Scale rationale:
  *  - A naive as-of join is an inequality join (O(n·m) per key in most
  *    engines, and Spark would fall back to broadcast-nested-loop).
  *    [[asofJoin]] instead UNIONS the two sides tagged, shuffles ONCE on the
  *    key, and sweeps each key's timeline with `last_value(..., ignoreNulls)`
  *    — per-partition sort-merge work, no pair expansion, no skew blowup
  *    beyond what the key distribution itself has.
  *  - A bounded range join ("right rows within [l.ts+lo, l.ts+hi]")
  *    becomes an EQUI-join on (key, time-bucket) when the bucket width
  *    equals the window span: each left row can only match right rows in
  *    ≤ 2 adjacent buckets, so the left side explodes to those buckets and
  *    the exact predicate filters the residue. Catalyst gets a plain
  *    shuffled hash join it can plan, prune, and AQE-skew-split.
  */
object TimeJoins {

  /** For every left row, the latest right row of the same key with
    * `rightTs <= leftTs` (inclusive). Returns the left rows plus
    * `asof_<valueCol>` columns (null when no prior right row exists).
    *
    * Both sides must share the key column name; `payload` lists the right
    * columns to carry. One shuffle on `key`; per-key timeline sweep. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    // tag 0 sorts right rows BEFORE left rows at equal timestamps, making
    // the join inclusive (a right row AT leftTs is visible to it)
    val taggedRight = right.select(
      col(key) +: col(rightTs).as("_ats") +: lit(0).as("_tag") +:
        payload.map(c => col(c).as(s"_p_$c")) ++:
        lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      col(key) +: col(leftTs).as("_ats") +: lit(1).as("_tag") +:
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c")) ++:
        lCols.filterNot(_ == key).map(col): _*)
    val w = Window.partitionBy(key).orderBy(col("_ats"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = taggedRight.unionByName(taggedLeft)
      .select(
        (col(key) +: lCols.filterNot(_ == key).map(col)) ++
          Seq(col("_tag")) ++
          payload.map(c => last(col(s"_p_$c"), ignoreNulls = true).over(w)
            .as(s"asof_$c")): _*)
    swept.filter(col("_tag") === 1).drop("_tag")
  }

  /** For every left row, aggregate right rows of the same key with
    * `rightTs` in (leftTs + loSec, leftTs + hiSec] — exclusive lower,
    * inclusive upper (the "what followed this event" window). Produces the
    * left rows plus `n_matches`. Equi-join on (key, bucket) with bucket
    * width = window span, then the exact residual predicate. */
  def rangeCountJoin(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     loSec: Long, hiSec: Long): DataFrame = {
    require(hiSec > loSec, "empty range")
    val wUs = (hiSec - loSec) * 1000000L
    def bucket(c: Column): Column = floor(unix_micros(c) / wUs)
    val r = right.select(col(key).as("_rk"), bucket(col(rightTs)).as("_rb"),
      unix_micros(col(rightTs)).as("_rus"))
    val lExp = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_lb", explode(array_distinct(array(
        floor((col("_lus") + loSec * 1000000L) / wUs),
        floor((col("_lus") + hiSec * 1000000L) / wUs)))))
    val joined = lExp.join(r,
      lExp("_lb") === r("_rb") && lExp(key) === r("_rk") &&
        r("_rus") > lExp("_lus") + loSec * 1000000L &&
        r("_rus") <= lExp("_lus") + hiSec * 1000000L,
      "left_outer")
    joined
      .groupBy(left.columns.map(col): _*)
      .agg(sum(when(col("_rus").isNotNull, 1L).otherwise(0L)).as("n_matches"))
  }
}
