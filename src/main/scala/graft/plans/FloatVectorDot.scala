package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the hot inner loop of every vector
  * operator: dot product over two float arrays, accumulated left-to-right in
  * double (bit-identical to the zip_with+aggregate formulation it replaces,
  * and to the DuckDB oracle's sequential sum).
  *
  * This is the one place SURVEY §4 predicted a custom Expression would pay:
  * higher-order functions (`zip_with`/`aggregate`) evaluate their lambda
  * interpreted per element and allocate an intermediate array per row, which
  * dominates brute-force similarity scans. `doGenCode` emits a tight
  * primitive loop that stays inside whole-stage codegen — no allocation, no
  * virtual calls.
  *
  * Mismatched lengths use the shorter prefix (callers guard dimension
  * equality where it matters, e.g. cosine's zero-on-mismatch contract).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column API over float-array columns. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
