package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The declarative form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is correct but interpreted: higher-order functions evaluate a lambda
  * per element outside whole-stage codegen. For pairwise similarity the
  * engine evaluates O(pairs × dim) multiplies — the one place the
  * built-in operators genuinely can't express the semantics efficiently,
  * so a custom `Expression` with `doGenCode` is warranted (it compiles
  * to a tight primitive loop inside the generated stage).
  *
  * Contract: both children are `array<double>`; the sum runs in ascending
  * index order (identical to the fold order of the declarative form, so
  * results are bit-equal and oracle checks are unaffected). Null in
  * either input yields null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product of two `array<double>` columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
}
