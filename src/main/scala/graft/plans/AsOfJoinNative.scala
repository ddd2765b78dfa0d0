package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute,
  AttributeReference, BindReferences, GenericInternalRow, JoinedRow,
  PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.GraftShims

/** NATIVE as-of join — the whole-operator Catalyst extension tier
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), complementing
  * the composed form in [[graft.ops.AsOf]] (union + carry-forward
  * window).
  *
  * Why a physical operator: the composed form materializes the union of
  * both sides through ONE window sort; the native exec instead asks
  * Catalyst for co-partitioned, (key, ts)-sorted children — the same
  * contract sort-merge join uses — and then streams BOTH sides through a
  * single merge scan per partition: no union row-blowup, no window
  * machinery, payload buffered one row at a time. Semantics are
  * identical (latest right row with `ts <= left.ts` per key, ties on
  * equal ts resolved by `tieBreak` ascending — last wins; null key/ts
  * rows never match) and are pinned to the composed form by
  * AsOfFuzzSpec.
  *
  * Registration: [[AsOfNative.asofJoin]] self-installs the strategy and
  * the pushdown rule into the session's `experimental` hooks;
  * [[graft.GraftExtensions]] injects them for
  * `spark.sql.extensions`-configured sessions.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    keyName: String,
    tsName: String,
    payload: Seq[String],
    tieBreak: Seq[String],
    asofAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofAttrs
  // the asof_* columns are GENERATED here, not consumed from children —
  // declared so CheckAnalysis doesn't demand them from the inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttrs)
  // the operator CONSUMES key/ts (+ right payload/tieBreak) even though
  // it carries them as names, not expressions — declared so
  // ColumnPruning never strips them from the children (it may still
  // prune every other unused column, which is exactly right)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == keyName || a.name == tsName) ++
        right.output.filter(a => a.name == keyName || a.name == tsName ||
          payload.contains(a.name) || tieBreak.contains(a.name)))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  /** Build with FRESH output attributes for the payload columns —
    * generated once here and carried as a constructor field so plan
    * copies (optimizer rewrites) keep the expression ids stable. */
  def create(left: LogicalPlan, right: LogicalPlan, keyName: String,
      tsName: String, payload: Seq[String],
      tieBreak: Seq[String]): AsOfJoinNode = {
    val attrs = payload.map { p =>
      val ra = right.output.find(_.name == p).getOrElse(
        throw new IllegalArgumentException(
          s"payload column $p not in right side: " +
            right.output.map(_.name).mkString(", ")))
      AttributeReference(s"asof_$p", ra.dataType, nullable = true)()
    }
    AsOfJoinNode(left, right, keyName, tsName, payload, tieBreak, attrs)
  }
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.output, planLater(n.left), planLater(n.right),
        n.keyName, n.tsName, n.payload, n.tieBreak) :: Nil
    case _ => Nil
  }
}

/** Filters over left-side columns commute with the as-of join (they only
  * decide WHICH left rows survive, never what each row's as-of payload
  * is) — push them below the node so they can keep sinking into the
  * scan. The pushdown a built-in operator gets from PushDownPredicates,
  * hand-rolled for the custom node. */
object AsOfFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(a.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(leftOnly.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Merge-scan as-of join executor. Children arrive co-partitioned on the
  * key (ClusteredDistribution, same mechanics as shuffled joins) and
  * sorted by (key, ts[, tieBreak on the right]); each partition is one
  * forward pass over both iterators holding ONE buffered payload row. */
case class AsOfJoinExec(
    output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan,
    keyName: String,
    tsName: String,
    payload: Seq[String],
    tieBreak: Seq[String]) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.takeRight(payload.length))

  private def attrOf(side: SparkPlan, n: String): Attribute =
    side.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n missing from " +
        side.output.map(_.name).mkString(", ")))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(attrOf(left, keyName))),
      ClusteredDistribution(Seq(attrOf(right, keyName))))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attrOf(left, keyName), Ascending),
      SortOrder(attrOf(left, tsName), Ascending)),
    Seq(SortOrder(attrOf(right, keyName), Ascending),
      SortOrder(attrOf(right, tsName), Ascending)) ++
      tieBreak.map(t => SortOrder(attrOf(right, t), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(
      attrOf(left, keyName).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
      left.output)
    val lTs = BindReferences.bindReference(
      attrOf(left, tsName).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
      left.output)
    val rKey = BindReferences.bindReference(
      attrOf(right, keyName).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
      right.output)
    val rTs = BindReferences.bindReference(
      attrOf(right, tsName).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
      right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(attrOf(left, keyName).dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(attrOf(left, tsName).dataType)
    val payloadExprs = payload.map(p =>
      attrOf(right, p).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression])
    val rightOutput = right.output
    val allOutput = output
    val leftOutput = left.output
    val nPayload = payload.length

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rightOutput)
      val resultProj = UnsafeProjection.create(allOutput,
        leftOutput ++ allOutput.takeRight(nPayload))
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var haveR = false
        private var lastKey: Any = _
        private var lastPayload: InternalRow = _

        private def fetchR(): Unit =
          if (ri.hasNext) { rRow = ri.next(); haveR = true }
          else { rRow = null; haveR = false }

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKey.eval(l)
          val lt = lTs.eval(l)
          if (lk == null || lt == null) {
            resultProj(joined(l, nullPayload))
          } else {
            var scanning = true
            while (scanning) {
              if (!haveR) fetchR()
              if (!haveR) scanning = false
              else {
                val rk = rKey.eval(rRow)
                val rt = rTs.eval(rRow)
                if (rk == null || rt == null) { haveR = false } // skip
                else {
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) { haveR = false } // behind: discard
                  else if (c == 0 && tsOrd.compare(rt, lt) <= 0) {
                    // copyValue: sort iterators REUSE row buffers, so a
                    // raw UTF8String/array key would go stale once the
                    // iterator advances (fine for primitives, corrupt
                    // for strings) — same discipline as the payload copy
                    lastKey = InternalRow.copyValue(rk)
                    lastPayload = payloadProj(rRow).copy()
                    haveR = false // consumed
                  } else scanning = false // ahead: keep buffered
                }
              }
            }
            val matched = lastKey != null && keyOrd.compare(lastKey, lk) == 0
            resultProj(joined(l, if (matched) lastPayload else nullPayload))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API for the native as-of join. */
object AsOfNative {

  /** Install strategy + pushdown rule into a session (idempotent). Uses
    * the public `experimental` hooks so any session can opt in without
    * extension config. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfFilterPushdown
  }

  /** Same contract as [[graft.ops.AsOf.asofJoin]]: left rows plus
    * `asof_<payload>` columns from the latest right row at or before the
    * left row's `ts` within the key (null when none). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    register(left.sparkSession)
    GraftShims.ofRows(left.sparkSession,
      AsOfJoinNode.create(left.queryExecution.analyzed,
        right.queryExecution.analyzed, key, ts, payload, tieBreak))
  }
}
