package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Map-side-combining top-k — the custom typed `Aggregator` seam SURVEY
  * §2.11 reserves for aggregation semantics the built-ins can't express
  * efficiently. The window formulation of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(...))`) must shuffle AND
  * sort EVERY row of every group before discarding all but k; this
  * aggregator's buffer is a bounded sorted vector of the k best entries,
  * so partial aggregation ships at most k rows per group per map
  * partition. At 100 TB that is the difference between a top-3 that moves
  * `3 × partitions × groups` rows across the wire and one that
  * sort-shuffles the fact table. (The existing `TakeOrderedAndProject`
  * pins cover GLOBAL top-k; this is the per-GROUP twin.)
  *
  * Ordering: price DESC, then the full ascending tiebreak — the synthetic
  * data's (l_orderkey, l_linenumber) is NOT unique (TESTDATA.md), so all
  * five columns participate, same as the window twin and the oracle.
  *
  * k is intentionally small (a buffer is k entries; merge is O(k) memory):
  * the class guards against quietly becoming a full sort in disguise.
  */
object TopKAggregator {
  /** one candidate row: the ranking key plus carried columns */
  final case class Entry(price: Double, okey: Long, lnum: Int,
                         pkey: Long, skey: Long)

  val ord: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.price, e.okey, e.lnum, e.pkey, e.skey))
}

final class TopKAggregator(k: Int)
    extends Aggregator[TopKAggregator.Entry, Seq[TopKAggregator.Entry], Seq[TopKAggregator.Entry]] {
  import TopKAggregator._
  require(k >= 1 && k <= 128, "k must be in 1..128 (bounded buffer by design)")

  def zero: Seq[Entry] = Vector.empty

  // insert-then-trim keeps the buffer sorted and ≤ k at all times; k is
  // tiny so the re-sort per row is cheaper than a heap's constant factor
  def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
    if (b.size == k && ord.gteq(a, b.last)) b // fast path: can't displace
    else ((b :+ a).sorted(ord)).take(k)

  def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] =
    (b1 ++ b2).sorted(ord).take(k)

  def finish(r: Seq[Entry]): Seq[Entry] = r

  // struct-array encoders (NOT kryo: the output must stay a queryable
  // array<struct<...>> so callers can posexplode it, and the buffer must
  // stay columnar for the partial-aggregation exchange)
  def bufferEncoder: Encoder[Seq[Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
}
