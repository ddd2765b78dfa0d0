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
  * results are bit-equal and oracle checks are unaffected). Semantics match
  * the `aggregate(zip_with(...))` form exactly: null input, mismatched
  * lengths, or any null element yields null — a dimension-mismatched
  * embedding surfaces as null, never a silently-truncated similarity. The
  * well-formed case (equal-length, no null elements) still runs the tight
  * primitive loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // Null even for non-null inputs (length mismatch / null element).
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n && !$bad; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) {
              $bad = true;
            } else {
              $s += $a.getDouble($i) * $b.getDouble($i);
            }
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
        }
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
