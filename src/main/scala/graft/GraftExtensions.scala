package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session extension injecting the library's native expressions into the
  * SQL function registry, so `spark.sql("SELECT vec_dot(a, b) ...")`
  * works wherever the DataFrame API isn't in play (ad-hoc SQL through
  * `Engine.execute`, thrift-server-style surfaces).
  *
  * Wire up with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
  }
}

object GraftExtensions {
  /** (name, info, builder) triple for the vec_dot scalar function. */
  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    { args: Seq[Expression] =>
      require(args.length == 2, "vec_dot requires exactly 2 arguments")
      DotProduct(args.head, args(1))
    })
}
