package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, HeavyHittersAgg, HllRegistersAgg, MinHashAgg, ShingleWinnow, ShingleWinnowMd5, SimHashAgg, TopKAgg}

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
    ext.injectFunction(GraftExtensions.minhashDescriptor)
    ext.injectFunction(GraftExtensions.simhashDescriptor)
    ext.injectFunction(GraftExtensions.winnowDescriptor)
    ext.injectFunction(GraftExtensions.winnowMd5Descriptor)
    ext.injectFunction(GraftExtensions.topkDescriptor)
    ext.injectFunction(GraftExtensions.heavyHittersDescriptor)
    ext.injectFunction(GraftExtensions.hllRegistersDescriptor)
    // whole-operator tier: native as-of join (custom LogicalPlan ->
    // merge-scan SparkPlan) + its left-filter pushdown rule
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfFilterPushdown)
  }
}

object GraftExtensions {

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Constant-fold an argument to an Int (SQL passes sizes as literal
    * expressions). */
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(s"$what must be an integer, " +
          s"got $other")
    }
  }

  /** (name, info, builder) triple for the vec_dot scalar function. */
  val vecDotDescriptor: Descriptor = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    { args: Seq[Expression] =>
      require(args.length == 2, "vec_dot requires exactly 2 arguments")
      DotProduct(args.head, args(1))
    })

  /** `minhash_agg(token, numHashes)` — the signature-buffer aggregate. */
  val minhashDescriptor: Descriptor = (
    FunctionIdentifier("minhash_agg"),
    new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
    { args: Seq[Expression] =>
      require(args.length == 2,
        "minhash_agg requires (token, numHashes) arguments")
      MinHashAgg(args.head, litInt(args(1), "numHashes"))
    })

  /** `simhash_agg(token)` — the 64-bit sign-vote aggregate. */
  val simhashDescriptor: Descriptor = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    { args: Seq[Expression] =>
      require(args.length == 1, "simhash_agg requires (token) argument")
      SimHashAgg(args.head)
    })

  /** `topk_agg(score, id, k)` — the bounded top-k pair aggregate. */
  val topkDescriptor: Descriptor = (
    FunctionIdentifier("topk_agg"),
    new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
    { args: Seq[Expression] =>
      require(args.length == 3,
        "topk_agg requires (score, id, k) arguments")
      TopKAgg(args.head, args(1), litInt(args(2), "k"))
    })

  /** `heavyhitters_agg(item, m)` — bounded Misra-Gries frequent items. */
  val heavyHittersDescriptor: Descriptor = (
    FunctionIdentifier("heavyhitters_agg"),
    new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavyhitters_agg"),
    { args: Seq[Expression] =>
      require(args.length == 2,
        "heavyhitters_agg requires (item, m) arguments")
      HeavyHittersAgg(args.head, litInt(args(1), "m"))
    })

  /** `shingle_winnow(tokens, k, w)` — the winnowing fingerprint array. */
  val winnowDescriptor: Descriptor = (
    FunctionIdentifier("shingle_winnow"),
    new ExpressionInfo(classOf[ShingleWinnow].getName, "shingle_winnow"),
    { args: Seq[Expression] =>
      require(args.length == 3,
        "shingle_winnow requires (tokens, k, w) arguments")
      ShingleWinnow(args.head, litInt(args(1), "k"), litInt(args(2), "w"))
    })

  /** `shingle_winnow_md5(tokens, k, w)` — the engine-portable winnow:
    * distinct `fp·2^20 + pos` selection keys (md5 shingle hashes). */
  val winnowMd5Descriptor: Descriptor = (
    FunctionIdentifier("shingle_winnow_md5"),
    new ExpressionInfo(classOf[ShingleWinnowMd5].getName,
      "shingle_winnow_md5"),
    { args: Seq[Expression] =>
      require(args.length == 3,
        "shingle_winnow_md5 requires (tokens, k, w) arguments")
      ShingleWinnowMd5(args.head, litInt(args(1), "k"),
        litInt(args(2), "w"))
    })

  /** `hll_registers_agg(value)` — the 256-register HLL max-rank array. */
  val hllRegistersDescriptor: Descriptor = (
    FunctionIdentifier("hll_registers_agg"),
    new ExpressionInfo(classOf[HllRegistersAgg].getName,
      "hll_registers_agg"),
    { args: Seq[Expression] =>
      require(args.length == 1,
        "hll_registers_agg requires (value) argument")
      HllRegistersAgg(args.head).toAggregateExpression()
    })
}
