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

/** Codegen'd 64-bit AVERAGE-HASH (aHash) over a decoded grayscale
  * array — the perceptual image fingerprint: bit p is set iff pixel p
  * is strictly brighter than the image mean. Computed in EXACT integer
  * arithmetic (`v(p) * n > Σv` — no division, so the threshold is
  * engine-portable and oracle-expressible), over `array<long>` gray
  * values in row-major order, at most 64 of them (the classic 8×8
  * aHash grid; more elements is a loud error, not a silent
  * truncation). Two tight primitive loops inside whole-stage codegen —
  * the per-row decode feeds straight into this without leaving the
  * generated stage. Null input or any null element yields null (a
  * failed decode surfaces as a null hash, never a fake fingerprint).
  */
case class AHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ahash64"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > 64) throw new IllegalArgumentException(
      s"ahash64 takes at most 64 gray values, got $n")
    var tot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      tot += x.getLong(i)
      i += 1
    }
    var h = 0L
    i = 0
    while (i < n) {
      if (x.getLong(i) * n > tot) h |= (1L << i)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val tot = ctx.freshName("tot")
      val h = ctx.freshName("h")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $a.numElements();
        if ($n > 64) {
          throw new IllegalArgumentException(
            "ahash64 takes at most 64 gray values, got " + $n);
        }
        long $tot = 0L;
        boolean $bad = false;
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i)) { $bad = true; }
          else { $tot += $a.getLong($i); }
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          long $h = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.getLong($i) * $n > $tot) { $h |= (1L << $i); }
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Codegen'd 64-bit circular DIFFERENCE-HASH (dHash) over a decoded
  * value array — the gradient fingerprint: bit i is set iff
  * `v((i+1) mod n) > v(i)` (strict). Where [[AHash64]] compares every
  * value against the GLOBAL mean — so perturbing a few values shifts
  * the threshold and can flip bits anywhere near it — dHash compares
  * only ADJACENT values: a locally-perturbed signal flips at most the
  * two bits touching each perturbed position, which is what makes it
  * the right fingerprint for near-dup pairing of signals whose total
  * energy moves (audio window-energy profiles, video frame-brightness
  * profiles; the image-gradient dHash of the pHash family is the same
  * construction). The circular wrap yields n bits from n values
  * instead of n−1, keeping the full 64-bit budget. Exact integer
  * comparisons — engine-portable and oracle-expressible. At most 64
  * elements (loud error beyond); null input or any null element
  * yields null (a failed decode surfaces as a null fingerprint,
  * never a fake one). */
case class DHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dhash64"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > 64) throw new IllegalArgumentException(
      s"dhash64 takes at most 64 values, got $n")
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var h = 0L
    i = 0
    while (i < n) {
      if (x.getLong((i + 1) % n) > x.getLong(i)) h |= (1L << i)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $a.numElements();
        if ($n > 64) {
          throw new IllegalArgumentException(
            "dhash64 takes at most 64 values, got " + $n);
        }
        boolean $bad = false;
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i)) { $bad = true; }
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          long $h = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.getLong(($i + 1) % $n) > $a.getLong($i)) {
              $h |= (1L << $i);
            }
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd dot product of two `array<double>` columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Codegen'd 64-bit perceptual average-hash of an `array<long>` of
    * grayscale values (≤ 64, row-major 8×8). */
  def ahash64(grays: Column): Column =
    GraftShims.column(AHash64(GraftShims.expression(grays)))

  /** Codegen'd 64-bit circular difference-hash of an `array<long>` of
    * values (≤ 64): bit i set iff the next value (wrapping) is
    * strictly larger. */
  def dhash64(values: Column): Column =
    GraftShims.column(DHash64(GraftShims.expression(values)))
}
