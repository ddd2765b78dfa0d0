package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints as ONE native expression: token array in,
  * distinct min-per-window shingle hashes out.
  *
  * The declarative form (`transform` + `slice` + `array_min` +
  * `array_distinct`) allocates a sub-array per shingle per window inside
  * interpreted lambdas — O(shingles × w) allocations per document. Here
  * the whole pipeline is a primitive loop: each token hashes once
  * (XXH64 over its UTF8 bytes, seed 42 like Spark's `xxhash64`), shingle
  * hashes combine the k token hashes polynomially, and the sliding min +
  * dedup run over primitive longs. Per-row compute, no shuffle — a
  * 100 TB corpus winnows in one narrow map stage.
  *
  * The fingerprint function (token-hash polynomial combine) is
  * library-defined and deterministic across runs/partitions; it is not
  * string-identical to hashing the joined shingle text.
  */
case class ShingleWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "shingle size and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_winnow"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    // per-token hashes
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      i += 1
    }
    // shingle hashes: polynomial combine of k consecutive token hashes
    val m = if (n >= k) n - k + 1 else 1
    val sh = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { h = h * 31L + th(j); j += 1 }
      sh(i) = h
      i += 1
    }
    // sliding min over w shingles, deduplicated
    val out = new java.util.LinkedHashSet[Long]()
    val mw = if (m >= w) m - w + 1 else 1
    i = 0
    while (i < mw) {
      var mn = sh(i)
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) { if (sh(j) < mn) mn = sh(j); j += 1 }
      out.add(mn)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val sh = ctx.freshName("sh")
      val m = ctx.freshName("m")
      val mw = ctx.freshName("mw")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val h = ctx.freshName("h")
      val mn = ctx.freshName("mn")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      val it = ctx.freshName("it")
      s"""
        final int $n = $toks.numElements();
        long[] $th = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          org.apache.spark.unsafe.types.UTF8String $s =
            $toks.getUTF8String($i);
          $th[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
              $s.numBytes(), 42L);
        }
        final int $m = $n == 0 ? 0 : ($n >= $k ? $n - $k + 1 : 1);
        long[] $sh = new long[$m];
        for (int $i = 0; $i < $m; $i++) {
          long $h = 1125899906842597L;
          int $end = java.lang.Math.min($i + $k, $n);
          for (int $j = $i; $j < $end; $j++) { $h = $h * 31L + $th[$j]; }
          $sh[$i] = $h;
        }
        final int $mw = $m == 0 ? 0 : ($m >= $w ? $m - $w + 1 : 1);
        java.util.LinkedHashSet<Long> $out = new java.util.LinkedHashSet<Long>();
        for (int $i = 0; $i < $mw; $i++) {
          long $mn = $sh[$i];
          int $end = java.lang.Math.min($i + $w, $m);
          for (int $j = $i + 1; $j < $end; $j++) {
            if ($sh[$j] < $mn) $mn = $sh[$j];
          }
          $out.add($mn);
        }
        long[] $arr = new long[$out.size()];
        int $i = 0;
        for (java.util.Iterator<Long> $it = $out.iterator(); $it.hasNext(); $i++) {
          $arr[$i] = ((Long) $it.next()).longValue();
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleWinnow {
  /** Distinct winnowed fingerprints of a token-array column. */
  def winnow(tokens: Column, k: Int, w: Int): Column =
    GraftShims.column(ShingleWinnow(GraftShims.expression(tokens), k, w))
}

/** ENGINE-PORTABLE winnowing as ONE native expression — the md5 twin of
  * [[ShingleWinnow]] and the single-pass replacement for the lead-chain
  * window form [[graft.ops.TextAnalysis.winnowFingerprintsPortable]]
  * previously composed (k `lead()` calls + two window passes per
  * document, all shuffled on the doc id).
  *
  * Token array in, distinct `fp · 2^20 + pos` selections out, where
  * `fp` = the first unsigned-32 slice of md5("wf:" + the k-token shingle
  * joined by single spaces) — EXACTLY the hash the composed form (and
  * the DuckDB oracle) computes — and `pos` = the selected shingle's
  * token position. Window semantics follow the composed form: only
  * COMPLETE windows of `w` consecutive shingles select (a document with
  * fewer than k+w-1 tokens emits nothing), each selecting its minimum
  * combined key (hash ties go to the leftmost position, exactly the
  * `min(h·2^20 + pos)` argmin trick), selections deduplicated in
  * first-appearance order.
  *
  * Per-row compute, no shuffle, one md5 per shingle — a 100 TB corpus
  * winnows in one narrow map stage; byte-equality with the composed
  * form is spec-pinned and the qd09/qd61 oracles hash-check it. */
case class ShingleWinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "shingle size and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_winnow_md5"

  override protected def nullSafeEval(input: Any): Any =
    ShingleWinnowMd5.compute(input.asInstanceOf[ArrayData], k, w)

  // Codegen participates in whole-stage (no interpreted-lambda
  // allocations); the heavy loop lives in one static JVM method.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
        ${ev.value} = graft.functions.ShingleWinnowMd5
          .compute($toks, $k, $w);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleWinnowMd5 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Prefix = "wf:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** The whole winnow for one token array: md5 shingle hashes, complete
    * sliding-window minima over the combined `h·2^20 + pos` keys,
    * first-appearance dedup. */
  def compute(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1 // number of complete k-token shingles
    if (m < 1) return Empty
    val mw = m - w + 1 // number of COMPLETE w-shingle windows
    if (mw < 1) return Empty
    // The selection key packs (hash, position) as h·2^20 + i, so a
    // position ≥ 2^20 would silently corrupt both fields on decode —
    // fail loudly at the contract boundary instead.
    require(m <= 1048576,
      s"shingle_winnow_md5 position field is 20 bits: document has $m " +
        "shingles (max 1048576); split longer documents before winnowing")
    val md = digests.get()
    val keys = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(Prefix)
      var j = i
      while (j < i + k) {
        if (j > i) md.update(' '.toByte)
        val s = toks.getUTF8String(j)
        md.update(s.getBytes)
        j += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      keys(i) = h * 1048576L + i
      i += 1
    }
    val out = new java.util.LinkedHashSet[Long]()
    i = 0
    while (i < mw) {
      var mn = keys(i)
      var j = i + 1
      while (j < i + w) { if (keys(j) < mn) mn = keys(j); j += 1 }
      out.add(mn)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct `fp · 2^20 + pos` winnow selections of a token-array
    * column (decode with `mk div 2^20` / `mk % 2^20`). */
  def winnow(tokens: Column, k: Int, w: Int): Column =
    GraftShims.column(ShingleWinnowMd5(GraftShims.expression(tokens), k, w))
}
