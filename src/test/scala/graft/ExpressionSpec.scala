package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.Dedup
import graft.plans.FloatVectorDot

class ExpressionSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("FloatVectorDot equals reference double sum (codegen + interpreted)") {
    val rows = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val got = rows.select(FloatVectorDot($"a", $"b").as("d")).as[Double].collect()
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val want = Seq(
      ref(Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      ref(Array(0.1f, -0.2f), Array(0.3f, 0.4f)), 0.0)
    assert(got.toSeq === want)
  }

  test("FloatVectorDot: mismatched lengths use common prefix; nulls propagate") {
    val rows = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(10.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val got = rows.select(FloatVectorDot($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(10.0), None))
  }

  test("FloatVectorDot matches the zip_with+aggregate formulation bit-for-bit") {
    val rows = (0 until 50).map { i =>
      (Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6) / 7.0f),
        Array.tabulate(16)(j => ((i * 17 + j * 3) % 11 - 5) / 9.0f))
    }.toDF("a", "b")
    val hof = rows.select(aggregate(
      zip_with($"a".cast("array<double>"), $"b".cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x).as("d")).as[Double].collect()
    val native = rows.select(FloatVectorDot($"a", $"b").as("d")).as[Double].collect()
    assert(native.toSeq === hof.toSeq)
  }

  test("hash60 column expression equals hash60Scala") {
    val vals = Seq("a", "spark join", "", "日本語テキスト", "the quick brown fox")
    val fromCol = vals.toDF("s").select(Dedup.hash60($"s").as("h")).as[Long].collect()
    assert(fromCol.toSeq === vals.map(Dedup.hash60Scala))
  }
}
