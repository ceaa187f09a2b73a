package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.plans.GraftExtensions

class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.local(4)
    GraftExtensions.install(s)
    s
  }
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0D, (acc, v) -> acc + v)"

  // parquet-backed, not a LocalRelation: a literal input would be
  // constant-folded to a LocalRelation before the rule could be observed
  private lazy val vecs = {
    val dir = java.nio.file.Files.createTempDirectory("ext_vecs").toString
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(3.0f, 2.0f, 1.0f))
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("float_vector_dot is callable from plain SQL") {
    vecs.createOrReplaceTempView("extensions_vecs")
    val out = spark.sql(
      "SELECT float_vector_dot(a, b) AS d FROM extensions_vecs ORDER BY d")
      .as[Double].collect()
    val expected = vecs.select(graft.plans.FloatVectorDot($"a", $"b").as("d"))
      .orderBy("d").as[Double].collect()
    assert(out === expected)
  }

  test("optimizer rule rewrites the HOF dot product into FloatVectorDot") {
    val df = vecs.selectExpr(s"$hofDot AS d")
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.plans.FloatVectorDot])),
      s"expected FloatVectorDot in optimized plan:\n$optimized")
    // and the rewritten plan produces the bit-identical values
    val viaRule = df.as[Double].collect()
    val direct = vecs.select(graft.plans.FloatVectorDot($"a", $"b").as("d"))
      .as[Double].collect()
    assert(viaRule === direct)
  }

  test("rule leaves non-matching folds alone (float multiply, nonzero seed)") {
    // float multiply (no double casts) rounds per element — NOT bit-identical
    // to FloatVectorDot, so the rule must not touch it
    val floatMul = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS d")
    assert(!floatMul.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[graft.plans.FloatVectorDot])))
    val seeded = vecs.selectExpr(
      s"aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "1D, (acc, v) -> acc + v) AS d")
    assert(!seeded.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[graft.plans.FloatVectorDot])))
  }
}
