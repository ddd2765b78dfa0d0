package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable MinHash lane hash.
  *
  * Contract (shared with the DuckDB oracle SQL): lane `s` of a token `w`
  * is the 8-hex-char slice `[8·(s mod 4), 8·(s mod 4)+8)` of
  * `md5((s div 4) + ":" + w)`, read as an UNSIGNED 32-bit integer. For
  * fixed-width lowercase hex, lexicographic string order IS unsigned
  * numeric order, so `min` over these longs equals `min` over the hex
  * substrings — an external engine reproduces every lane bit-for-bit
  * with `CAST(substring(md5(...), 8s+1, 8) AS hex-parsed int)` or by
  * comparing the hex strings directly.
  *
  * Why native instead of `min(substring(md5(concat(...))))`: the
  * declarative form materializes a 32-char hex string per (token, chunk)
  * plus an 8-char substring per lane — at corpus scale that garbage
  * dominates the signature aggregation (the hot stage of the portable
  * dedup pipelines qd24/qd29/qd30). This expression digests the token's
  * bytes directly (no hex encode, no substring) and emits all
  * `4·numChunks` lanes as one primitive long array; the min-aggs then
  * run on longs, not strings. Values are identical, so the oracle SQL
  * is unchanged.
  */
case class Md5Lanes(child: Expression, numChunks: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_lanes"

  override protected def nullSafeEval(w: Any): Any =
    Md5Lanes.compute(w.asInstanceOf[UTF8String], numChunks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.Md5Lanes.compute($w, $numChunks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Lanes {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // "0:".."15:" prefix bytes precomputed; chunks beyond 16 (lanes > 64)
  // fall back to allocating the prefix — far past any sane lane count.
  private val prefixes: Array[Array[Byte]] =
    (0 until 16).map(m => s"$m:".getBytes("US-ASCII")).toArray

  /** All `4·chunks` lanes of `w` as unsigned-32 values in a long array.
    * Called from generated code (static forwarder), so it must stay a
    * top-level object method with a Java-friendly signature. */
  def compute(w: UTF8String, chunks: Int): GenericArrayData = {
    val wb = w.getBytes
    val out = new Array[Long](chunks * 4)
    val md = digests.get()
    var m = 0
    while (m < chunks) {
      md.reset()
      md.update(if (m < 16) prefixes(m) else s"$m:".getBytes("US-ASCII"))
      md.update(wb)
      val d = md.digest()
      var k = 0
      while (k < 4) {
        out(m * 4 + k) =
          ((d(4 * k) & 0xffL) << 24) | ((d(4 * k + 1) & 0xffL) << 16) |
            ((d(4 * k + 2) & 0xffL) << 8) | (d(4 * k + 3) & 0xffL)
        k += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Codegen'd `array<long>` of the portable md5 lanes of a string. */
  def lanes(w: Column, numChunks: Int): Column =
    GraftShims.column(Md5Lanes(GraftShims.expression(w), numChunks))
}
