package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.TimeJoins

class TimeJoinsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row, per key") {
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 09:00:00")), // key 2 has no prior click
      (103L, 3L, ts("2024-01-01 08:00:00"))  // key 3 absent from right
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (1L, ts("2024-01-01 09:30:00")),
      (1L, ts("2024-01-01 11:59:59")),
      (1L, ts("2024-01-01 12:00:00")), // equal ts: inclusive
      (2L, ts("2024-01-01 09:30:00"))  // after key 2's purchase
    ).toDF("user_id", "ts")

    val out = TimeJoins.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("ts"))
      .select($"event_id", $"asof_ts").as[(Long, Option[Timestamp])]
      .collect().toMap
    assert(out(100L) === Some(ts("2024-01-01 09:30:00")))
    assert(out(101L) === Some(ts("2024-01-01 12:00:00"))) // inclusive at equal ts
    assert(out(102L) === None)
    assert(out(103L) === None)
  }

  test("rangeCountJoin counts right rows in (lo, hi] after each left row") {
    val purchases = Seq(
      (200L, 1L, ts("2024-01-01 10:00:00")),
      (201L, 2L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00")), // exclusive lower: not counted
      (1L, ts("2024-01-01 10:00:01")),
      (1L, ts("2024-01-01 10:29:59")), // crosses a bucket boundary, still in range
      (1L, ts("2024-01-01 10:30:00")), // inclusive upper: counted
      (1L, ts("2024-01-01 10:30:01")), // out of range
      (2L, ts("2024-01-01 09:59:59"))  // before: not counted
    ).toDF("user_id", "ts")

    val out = TimeJoins.rangeCountJoin(purchases, views, "user_id", "ts", "ts", 0L, 1800L)
      .select($"event_id", $"n_matches").as[(Long, Long)].collect().toMap
    assert(out(200L) === 3L)
    assert(out(201L) === 0L) // left row with zero matches is preserved
  }

  test("rangeCountJoin matches the brute-force count on random data") {
    val rnd = new scala.util.Random(13)
    // timestamps quantized to seconds so boundary cases (exactly lo / hi
    // after a left row) actually occur
    val left = (0 until 150).map(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong, new Timestamp(1700000000000L + rnd.nextInt(5000) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val right = (0 until 400).map(_ =>
      ((rnd.nextInt(4) + 1).toLong, new Timestamp(1700000000000L + rnd.nextInt(5000) * 1000L)))
      .toDF("user_id", "ts")

    val got = TimeJoins.rangeCountJoin(left, right, "user_id", "ts", "ts", 60L, 600L)
      .select($"event_id", $"n_matches").as[(Long, Long)].collect().toMap

    val r = right.as[(Long, Timestamp)].collect()
    val expected = left.as[(Long, Long, Timestamp)].collect().map { case (id, k, t) =>
      val lo = t.getTime + 60L * 1000
      val hi = t.getTime + 600L * 1000
      id -> r.count(p => p._1 == k && p._2.getTime > lo && p._2.getTime <= hi).toLong
    }.toMap
    assert(got === expected)
  }

  test("asofJoin matches the brute-force join on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val right = (0 until 300).map(_ =>
      ((rnd.nextInt(5) + 1).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("user_id", "ts")

    val got = TimeJoins.asofJoin(left, right, "user_id", "ts", "ts", Seq("ts"))
      .select($"event_id", $"asof_ts").as[(Long, Option[Timestamp])].collect().toMap

    val r = right.as[(Long, Timestamp)].collect()
    val expected = left.as[(Long, Long, Timestamp)].collect().map { case (id, k, t) =>
      val prior = r.filter(p => p._1 == k && !p._2.after(t)).map(_._2)
      id -> (if (prior.isEmpty) None else Some(prior.max((a: Timestamp, b: Timestamp) => a.compareTo(b))))
    }.toMap
    assert(got === expected)
  }
}
