package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd generalized-pigeonhole BAND KEYS of a 64-bit signature —
  * the banding engine behind [[graft.ops.Dedup.hammingNearDup]] and
  * the persisted fingerprint store, as ONE native expression instead
  * of an `array(...)` of per-combination column trees.
  *
  * Why native: at radius 10 the banding is 286 three-block
  * combinations; as a column-expression array that is 286 × (shifts,
  * masks, ors) of generated code per projection — measured past
  * janino's method limits (a 16k-line `doConsume`), so Spark silently
  * fell back to INTERPRETED projection on exactly the fingerprint hot
  * path the banding exists to keep cheap. Here the combination table
  * is data, not code: the generated stage runs one tight double loop
  * over driver-precomputed (start, width, mask, combo) arrays — a few
  * dozen generated lines at ANY radius, safely inside whole-stage
  * codegen.
  *
  * Semantics are bit-identical to the column form (spec-pinned by the
  * BandingFuzzSpec planted-neighbor fuzz at every compound-key
  * branch): the 64 bits split into `maxHamming + c` contiguous blocks
  * (widths differ by at most 1); two signatures within Hamming
  * distance `maxHamming` agree on at least `c` whole blocks, hence on
  * at least one of the C(numBlocks, c) c-combinations — element i of
  * the result packs combination i's block values into one long, and
  * keying candidates on (i, value) keeps recall exactly 1.0. `c` is
  * the smallest combination size whose compound key retains ≥ 12
  * discriminating bits (the [[graft.ops.Dedup.hammingNearDup]]
  * geometry note). A null signature yields a null array (a failed
  * decode's fingerprint bands nowhere and can never pair). */
case class BandKeys64(child: Expression, maxHamming: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys64"

  @transient private lazy val numCombos = combos.length
  @transient private[functions] lazy val starts: Array[Int] = {
    val n = numBlocks
    Array.tabulate(n)(i => i * 64 / n)
  }
  @transient private[functions] lazy val widths: Array[Int] = {
    val n = numBlocks
    Array.tabulate(n)(i => (i + 1) * 64 / n - i * 64 / n)
  }
  @transient private[functions] lazy val masks: Array[Long] =
    widths.map(w => if (w >= 64) -1L else (1L << w) - 1L)
  @transient private[functions] lazy val combos: Array[Array[Int]] =
    (0 until numBlocks).combinations(
      (1 to 8).find(k => k * 64 / (maxHamming + k) >= 12).getOrElse(8))
      .map(_.toArray).toArray
  private def numBlocks: Int =
    maxHamming +
      (1 to 8).find(k => k * 64 / (maxHamming + k) >= 12).getOrElse(8)

  private def keysOf(sig: Long): Array[Long] = {
    val out = new Array[Long](numCombos)
    var i = 0
    while (i < numCombos) {
      val combo = combos(i)
      var key = 0L
      var j = 0
      while (j < combo.length) {
        val b = combo(j)
        key = (key << widths(b)) | ((sig >>> starts(b)) & masks(b))
        j += 1
      }
      out(i) = key
      i += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(keysOf(a.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val combosRef = ctx.addReferenceObj("combos", combos, "int[][]")
    val startsRef = ctx.addReferenceObj("starts", starts, "int[]")
    val widthsRef = ctx.addReferenceObj("widths", widths, "int[]")
    val masksRef = ctx.addReferenceObj("masks", masks, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val key = ctx.freshName("key")
      val b = ctx.freshName("b")
      val cs = ctx.freshName("cs")
      val st = ctx.freshName("st")
      val wd = ctx.freshName("wd")
      val mk = ctx.freshName("mk")
      // the reference lookups hoist into locals: janino's parser
      // rejects a cast expression as a shift operand
      s"""
        final int[][] $cs = $combosRef;
        final int[] $st = $startsRef;
        final int[] $wd = $widthsRef;
        final long[] $mk = $masksRef;
        final long[] $out = new long[${combos.length}];
        for (int $i = 0; $i < ${combos.length}; $i++) {
          long $key = 0L;
          for (int $j = 0; $j < $cs[$i].length; $j++) {
            final int $b = $cs[$i][$j];
            $key = ($key << $wd[$b]) | (($a >>> $st[$b]) & $mk[$b]);
          }
          $out[$i] = $key;
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BandKeysExpression {
  /** Codegen'd pigeonhole band-key array of a `long` signature column
    * at radius `maxHamming`. */
  def bandKeys64(sig: Column, maxHamming: Int): Column =
    GraftShims.column(
      BandKeys64(GraftShims.expression(sig), maxHamming))
}
