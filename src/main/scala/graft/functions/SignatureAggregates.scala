package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native signature aggregates for the dedup hot path.
  *
  * The declarative forms build the whole signature as N parallel agg
  * columns — `min(xxhash64(w, 0)) .. min(xxhash64(w, 63))` for MinHash,
  * 64 `sum(when(bit_i(h), 1, -1))` columns for SimHash. Correct, but each
  * grouped pass generates N aggregate expressions → a very large generated
  * method (the dominant cost of qd05/qd06 at bench scale is codegen
  * compilation, not data), and each input token is re-hashed N times.
  *
  * These `TypedImperativeAggregate`s accumulate the whole signature in ONE
  * primitive-array buffer: the token is hashed once per row, the N lanes
  * are updated in a tight JVM loop, and partial aggregation / merge work
  * exactly like any built-in sketch aggregate (`ObjectHashAggregateExec`),
  * so map-side combine still runs before the exchange. Lane semantics are
  * bit-identical to the declarative forms they replace:
  *
  *   - MinHash lane s == `min(xxhash64(w, lit(s)))`: Spark's `xxhash64`
  *     folds children left-to-right starting from seed 42, so
  *     `xxhash64(w, s) == XXH64.hashInt(s, XXH64.hashUTF8String(w, 42))`
  *     — reproduced verbatim here (one string hash per token, one
  *     `hashInt` per lane).
  *   - SimHash bit i == `sum(±1 by bit i of xxhash64(w)) > 0`.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XXH64.hashUTF8String(v.asInstanceOf[UTF8String], 42L)
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s, base)
        if (h < buf(s)) buf(s) = h
        s += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var i = 0
    while (i < numHashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): MinHashAgg =
    copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"
}

/** 64-bit SimHash: the buffer holds one signed vote counter per bit
  * (`+1` when bit i of `xxhash64(token)` is set, `-1` when clear); the
  * final signature sets bit i when its vote sum is positive — identical
  * to the 64-`sum(when(...))` declarative form. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XXH64.hashUTF8String(v.asInstanceOf[UTF8String], 42L)
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sh = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sh |= (1L << i); i += 1 }
    sh
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    var i = 0
    while (i < 64) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(n: Int): SimHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"
}

object SignatureAggregates {
  /** One-buffer MinHash signature (`array<bigint>` of length `numHashes`)
    * over a string token column; lane s equals `min(xxhash64(w, lit(s)))`. */
  def minhash(token: Column, numHashes: Int): Column =
    GraftShims.column(
      MinHashAgg(GraftShims.expression(token), numHashes)
        .toAggregateExpression())

  /** One-buffer 64-bit SimHash signature over a string token column. */
  def simhash(token: Column): Column =
    GraftShims.column(
      SimHashAgg(GraftShims.expression(token)).toAggregateExpression())
}
