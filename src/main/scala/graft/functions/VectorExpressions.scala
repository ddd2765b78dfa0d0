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

/** Codegen'd PRODUCT-QUANTIZATION argmin over a frozen codebook — the
  * PQ encode's hot core. The declarative form (`transform` over a
  * literal array-of-arrays with an `aggregate(zip_with(...))` distance
  * per codeword) evaluates numSub × codebookSize interpreted lambdas
  * per ROW — measured at ~26 s per 1M rows on a 16×64 book, which is
  * the whole encode cost of a 100 TB ingest arriving at a PQ store.
  * This compiles the same math into one tight primitive loop inside
  * whole-stage codegen.
  *
  * Exactness contract (what keeps every PQ oracle untouched): per
  * subspace m the distance to codeword c is Σ_d (v[m·subDim+d] −
  * cb[m][c][d])², accumulated in ascending d — the identical IEEE op
  * sequence as the `aggregate(zip_with(...))` left fold (and equal to
  * the expanded ‖a‖²−2ab+‖b‖² form on the 1e-4/1e-6 integer grids all
  * PQ inputs live on); the argmin keeps the FIRST minimum in ascending
  * c (strict <), which is `array_min` on (dist, code) structs — ties
  * to the lower code. `asCodes = true` returns the argmin indexes
  * (`array<int>` — the stored codes column); `asCodes = false` returns
  * Σ_m min-dist as a double (the quantization error the drift-state
  * sidecar folds). Null input, a length ≠ numSub × subDim, or any
  * null element yields null — a malformed vector surfaces as a null
  * encode, never a silently-truncated one. */
case class PqArgmin(child: Expression, numSub: Int, cbSize: Int,
    subDim: Int, flatCb: Array[Double], asCodes: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    if (asCodes) org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
    else DoubleType
  override def prettyName: String =
    if (asCodes) "pq_encode" else "pq_min_dist"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != numSub * subDim) return null
    var i = 0
    while (i < numSub * subDim) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val codes = if (asCodes) new Array[Int](numSub) else null
    var errSum = 0.0
    var m = 0
    while (m < numSub) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < cbSize) {
        var s = 0.0
        var d = 0
        val base = (m * cbSize + c) * subDim
        while (d < subDim) {
          val diff = x.getDouble(m * subDim + d) - flatCb(base + d)
          s += diff * diff
          d += 1
        }
        if (s < best) { best = s; bestC = c }
        c += 1
      }
      if (asCodes) codes(m) = bestC
      errSum += best
      m += 1
    }
    if (asCodes)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
    else errSum
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("flatCb", flatCb, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val bad = ctx.freshName("bad")
      val codes = ctx.freshName("codes")
      val errSum = ctx.freshName("errSum")
      val out =
        if (asCodes)
          s"""${ev.value} =
             new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);"""
        else s"${ev.value} = $errSum;"
      val codesDecl =
        if (asCodes) s"final int[] $codes = new int[$numSub];" else ""
      val codesSet = if (asCodes) s"$codes[$m] = $bestC;" else ""
      s"""
        boolean $bad = ($a.numElements() != ${numSub * subDim});
        for (int $i = 0; $i < ${numSub * subDim} && !$bad; $i++) {
          if ($a.isNullAt($i)) { $bad = true; }
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          $codesDecl
          double $errSum = 0.0;
          for (int $m = 0; $m < $numSub; $m++) {
            double $best = Double.POSITIVE_INFINITY;
            int $bestC = 0;
            for (int $c = 0; $c < $cbSize; $c++) {
              double $s = 0.0;
              final int $base = ($m * $cbSize + $c) * $subDim;
              for (int $d = 0; $d < $subDim; $d++) {
                final double $diff =
                  $a.getDouble($m * $subDim + $d) - $cbRef[$base + $d];
                $s += $diff * $diff;
              }
              if ($s < $best) { $best = $s; $bestC = $c; }
            }
            $codesSet
            $errSum += $best;
          }
          $out
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Codegen'd L2-NORMALIZE of a float/double vector — the single most
  * shared primitive in the engine: every similarity operator, every
  * store build/append and every probe normalizes its vectors first.
  * The declarative form
  * (`transform(d, x => x / sqrt(vec_dot(d, d)))` with
  * `d = transform(vec, _.cast("double"))`) evaluates TWO interpreted
  * higher-order lambdas per row, and the norm subexpression rides
  * inside the second lambda — measured at ~0.35 s per 2,000-row pass
  * (64-dim) against ~0.06 s for the native dot on the same frame, a
  * ~6× interpreted tax on the hottest path in the engine (at 100 TB
  * this is the difference between normalizing an ingest at scan speed
  * and paying an interpreter per element).
  *
  * Exactness contract (what keeps every oracle hash untouched): the
  * element cast is the plain `(double)` widening the `cast("double")`
  * form runs; the norm is `sqrt` of the ascending-index sum of
  * squares — the identical IEEE op sequence as [[DotProduct]]'s fold;
  * each output element is `d_i / norm` — including the ANSI
  * divide-by-zero ERROR a zero vector raises (Spark 4 runs ANSI by
  * default, so the `transform` form throws there too; an
  * all-zero embedding surfaces loudly, never as a quiet NaN row; an
  * EMPTY vector stays an empty array — no element, no division, the
  * `transform` behavior). Null semantics mirror the
  * declarative composition exactly: a null vector yields null; a null
  * ELEMENT nulls the norm (the [[DotProduct]] contract), which in the
  * `transform` form nulls EVERY output element — so the native form
  * returns an all-null array of the input length, never a partial
  * normalize. */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"l2_normalize needs array<float> or array<double>, got " +
              other.catalogString)
    }

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    DoubleType, containsNull = true)
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isF = elemIsFloat
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) {
      if (x.isNullAt(i)) anyNull = true
      i += 1
    }
    val out = new Array[Any](n)
    if (!anyNull) {
      var s = 0.0
      i = 0
      while (i < n) {
        val d = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        s += d * d
        i += 1
      }
      val norm = math.sqrt(s)
      if (n > 0 && norm == 0.0)
        throw org.apache.spark.sql.GraftShims.divideByZeroError()
      i = 0
      while (i < n) {
        val d = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = d / norm
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nrm = ctx.freshName("nrm")
      val anyNull = ctx.freshName("anyNull")
      val out = ctx.freshName("out")
      def get(idx: String) =
        if (elemIsFloat) s"(double) $a.getFloat($idx)"
        else s"$a.getDouble($idx)"
      s"""
        final int $n = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $n && !$anyNull; $i++) {
          if ($a.isNullAt($i)) { $anyNull = true; }
        }
        final Object[] $out = new Object[$n];
        if (!$anyNull) {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $d = ${get(i)};
            $s += $d * $d;
          }
          final double $nrm = Math.sqrt($s);
          if ($n > 0 && $nrm == 0.0) {
            throw org.apache.spark.sql.GraftShims.divideByZeroError();
          }
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = ${get(i)} / $nrm;
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Codegen'd BEST-CENTROID argmax over a frozen centroid set — the
  * assignment core of every literal-centroid operator (IVF cell
  * assignment, spherical k-means iterations, the drift monitor's
  * error term). The historical form unrolled one [[DotProduct]] per
  * centroid under a `greatest()` over (score, cell) structs: correct
  * and codegen'd, but the generated code EMBEDS the centroid values,
  * so every Lloyd iteration and every retrain phase compiles a fresh
  * janino class (~0.2–0.5 s each — the lifecycle fixtures measured
  * ~200+ compiles per run), and the method size grows with
  * nList × dim. Here the centroids ride a REFERENCE object: the
  * generated code is identical for every centroid set of any shape,
  * so one compile serves all iterations, phases and queries.
  *
  * Semantics are `greatest()` over struct(score, cell) exactly: score
  * = dot(v, centroid) summed in ascending dim order (the
  * [[DotProduct]] fold), winner = highest score, ties to the HIGHEST
  * cell id, independent of centroid order. Null input, a length
  * mismatch with the centroid dim, or any null element yields null
  * (the [[DotProduct]] malformed-vector contract). Returns
  * struct<score:double, cell:int>. */
case class CellArgmax(child: Expression, cells: Array[Int],
    flat: Array[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("score", DoubleType,
        nullable = false),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "cell_argmax"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var bs = Double.NegativeInfinity
    var bc = Int.MinValue
    var c = 0
    while (c < cells.length) {
      var s = 0.0
      var d = 0
      while (d < dim) { s += x.getDouble(d) * flat(c * dim + d); d += 1 }
      if (s > bs || (s == bs && cells(c) > bc)) { bs = s; bc = cells(c) }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bs, bc))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("flatCents", flat, "double[]")
    val cellsRef = ctx.addReferenceObj("cellIds", cells, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val bs = ctx.freshName("bs")
      val bc = ctx.freshName("bc")
      val bad = ctx.freshName("bad")
      s"""
        boolean $bad = ($a.numElements() != $dim);
        for (int $i = 0; $i < $dim && !$bad; $i++) {
          if ($a.isNullAt($i)) { $bad = true; }
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          double $bs = Double.NEGATIVE_INFINITY;
          int $bc = Integer.MIN_VALUE;
          for (int $c = 0; $c < $cellsRef.length; $c++) {
            double $s = 0.0;
            for (int $d = 0; $d < $dim; $d++) {
              $s += $a.getDouble($d) * $flatRef[$c * $dim + $d];
            }
            if ($s > $bs || ($s == $bs && $cellsRef[$c] > $bc)) {
              $bs = $s; $bc = $cellsRef[$c];
            }
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              new Object[] { $bs, $bc });
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd dot product of two `array<double>` columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Codegen'd L2-normalize of an `array<float>`/`array<double>` vector
    * — see [[L2Normalize]] for the bit-exactness contract vs the
    * declarative `transform`/`sqrt(vec_dot)` composition. */
  def l2normalize(v: Column): Column =
    GraftShims.column(L2Normalize(GraftShims.expression(v)))

  /** Codegen'd best-centroid struct<score, cell> of an `array<double>`
    * vector against a centroid set carried as a reference object —
    * see [[CellArgmax]] for the greatest()-equivalence contract. */
  def cellArgmax(v: Column,
      cents: Array[(Int, Array[Double])]): Column = {
    val dim = cents(0)._2.length
    require(cents.forall(_._2.length == dim),
      "cell_argmax needs uniform centroid dimensions")
    val flat = new Array[Double](cents.length * dim)
    cents.zipWithIndex.foreach { case ((_, cv), c) =>
      System.arraycopy(cv, 0, flat, c * dim, dim)
    }
    GraftShims.column(CellArgmax(GraftShims.expression(v),
      cents.map(_._1).toArray, flat, dim))
  }

  private def flatten(codebook: Array[Array[Array[Double]]])
      : (Int, Int, Int, Array[Double]) = {
    val numSub = codebook.length
    val cbSize = codebook(0).length
    val subDim = codebook(0)(0).length
    val flat = new Array[Double](numSub * cbSize * subDim)
    var m = 0
    while (m < numSub) {
      var c = 0
      while (c < cbSize) {
        System.arraycopy(codebook(m)(c), 0, flat,
          (m * cbSize + c) * subDim, subDim)
        c += 1
      }
      m += 1
    }
    (numSub, cbSize, subDim, flat)
  }

  /** Codegen'd PQ encode: per-subspace argmin codes (`array<int>`)
    * of a quantized `array<double>` vector against a frozen codebook
    * — see [[PqArgmin]] for the exactness contract. */
  def pqEncode(v4: Column,
      codebook: Array[Array[Array[Double]]]): Column = {
    val (numSub, cbSize, subDim, flat) = flatten(codebook)
    GraftShims.column(PqArgmin(GraftShims.expression(v4),
      numSub, cbSize, subDim, flat, asCodes = true))
  }

  /** Codegen'd PQ quantization error: Σ over subspaces of the minimum
    * squared distance to any codeword — the residual [[pqEncode]]'s
    * argmin leaves behind, in one pass. */
  def pqMinDist(v4: Column,
      codebook: Array[Array[Array[Double]]]): Column = {
    val (numSub, cbSize, subDim, flat) = flatten(codebook)
    GraftShims.column(PqArgmin(GraftShims.expression(v4),
      numSub, cbSize, subDim, flat, asCodes = false))
  }

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
