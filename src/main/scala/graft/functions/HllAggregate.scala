package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HyperLogLog register aggregate — the engine-internal fast path
  * behind [[graft.ops.Sketches.hllDistinct]].
  *
  * The composed form shuffles ≤ 256 `(group, register, rank)` rows per
  * group per partition; this one-buffer aggregate shuffles a single
  * 256-BYTE buffer per group per partition (hashing each value once, no
  * explode of register rows), with partial aggregation / merge running
  * like any built-in sketch aggregate under `ObjectHashAggregateExec`.
  *
  * Register semantics are BIT-IDENTICAL to the portable md5 form:
  * register = first md5 byte, rank = 1-based leftmost-1-bit position of
  * the next 32 bits (33 when zero) — so the finishing arithmetic in
  * [[graft.ops.Sketches]] produces byte-for-byte the same estimates and
  * the DuckDB oracle still applies.
  */
case class HllRegistersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  // Analysis-time input contract: reject non-string children with a
  // clear error instead of ClassCastException-ing at execution time
  // (the update loop blind-casts child.eval to UTF8String).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got " +
        child.dataType.catalogString)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val md = HllRegistersAgg.digests.get()
      md.reset()
      val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
      val reg = d(0) & 0xff
      val next32 = ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
        ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      val rank =
        if (next32 == 0L) 33
        else java.lang.Long.numberOfLeadingZeros(next32) - 31
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 256) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](256)
    var i = 0
    while (i < 256) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllRegistersAgg =
    copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers_agg"
}

object HllRegistersAgg {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** 256-register HLL max-rank array (`array<int>`, 0 = empty register)
    * over a string value column. */
  def hllRegisters(value: Column): Column =
    GraftShims.column(
      HllRegistersAgg(GraftShims.expression(value)).toAggregateExpression())
}
