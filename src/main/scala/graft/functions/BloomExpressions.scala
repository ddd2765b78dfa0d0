package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The scale pattern this enables: when a semi-join's small side is too
  * big to broadcast EXACTLY (a benchmark suite's distinct n-grams can
  * run to tens of GB) but its Bloom filter fits in a few MB, ship the
  * filter to every task as plan metadata and pre-filter the 100 TB side
  * with a NARROW map — no shuffle, no broadcast exchange — so only the
  * ~fpp fraction of surviving rows reaches the exact verify join. The
  * final result stays exact because the Bloom filter has no false
  * negatives; false positives are dropped by the verify join. This is
  * the same row-level-filtering idea Spark applies internally to shuffle
  * joins, exposed as a library primitive.
  *
  * The filter bytes ride in the expression itself (serialized once with
  * the task binary, deserialized lazily per executor); probes hash the
  * value's UTF-8 bytes directly — no per-row String materialization.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // Reference THIS expression instance; the generated code probes its
    // lazily-deserialized filter so codegen never embeds the bit array.
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.probe($v);")
  }

  /** Called from generated code. */
  def probe(v: UTF8String): Boolean = bloom.mightContainBinary(v.getBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilters {

  /** Build a Bloom filter over a string column with a distributed
    * partial-aggregate (Spark's `stat.bloomFilter` runs a treeAggregate:
    * per-partition filters OR-merged up a tree, so the driver sees only
    * log-many bit arrays, never rows) and return it serialized. */
  def buildString(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `true` iff `v` MIGHT be in the serialized filter (no false
    * negatives). */
  def bloomMightContain(v: Column, bloomBytes: Array[Byte]): Column =
    GraftShims.column(BloomMightContain(GraftShims.expression(v), bloomBytes))
}
