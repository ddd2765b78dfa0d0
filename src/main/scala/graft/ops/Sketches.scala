package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable cardinality / frequency sketches for 100 TB profiling.
  *
  * Both sketches hash with plain `md5` (not `xxhash64`) so every query
  * built on them is oracle-exact: the register / bucket / rank values are
  * re-derivable in ANSI SQL (`'0x' || substr(md5(x), …)` casts) and the
  * estimate arithmetic is either pure-integer or a single final division,
  * so DuckDB reproduces the output bit-for-bit.
  *
  * Scale shapes:
  *  - HLL: the per-row map emits `(group, register, rank)`; partial
  *    aggregation collapses that to ≤ m rows per group per partition
  *    BEFORE the shuffle, so a 100 TB scan shuffles `groups × m` tiny
  *    rows, never the raw values. This is the only sane way to count
  *    distinct tokens/urls per domain at corpus scale — an exact
  *    `count(distinct)` shuffles every value.
  *  - CMS: the sketch is `depth × width` counters built with one
  *    map-side-combined aggregation; probes broadcast-join the counters.
  */
object Sketches {

  /** HLL register count m = 2^8. 256 registers give ~6.5% standard
    * error — the classic profiling operating point. */
  val HllM: Int = 256

  /** Register index: first byte of md5(value), 0..255. */
  def hllRegister(value: Column): Column =
    conv(substring(md5(value), 1, 2), 16, 10).cast("int")

  /** Rank = 1-based position of the leftmost 1-bit in the NEXT 32 hash
    * bits (33 when all zero). `bin()` strips leading zeros identically
    * in Spark and DuckDB, so `33 - length(bin(v))` is portable. */
  def hllRank(value: Column): Column = {
    val v = conv(substring(md5(value), 3, 8), 16, 10).cast("long")
    when(v === 0L, lit(33))
      .otherwise(lit(33) - length(bin(v))).cast("int")
  }

  /** Per-group HyperLogLog distinct estimate of `value`.
    *
    * Output: `grp, present_registers, zero_registers, est_distinct`.
    * The register sum is kept EXACT as `Σ 2^(40-rank)` (a bigint —
    * rank ≤ 33 so every term and the 256-term sum fit), so the only
    * floating-point steps are one division and (for the small-range
    * correction, Flajolet et al. 2007) one `ln` — both reproducible
    * across engines, rounded to 4 decimals. */
  def hllDistinct(df: DataFrame, group: Column, value: Column): DataFrame = {
    // Nulls are skipped (matching the native aggregate's null skip):
    // md5(NULL) would otherwise emit a null register row that inflates
    // present_registers and drops a 2^40 term from the sum. Groups
    // whose values are ALL null still get a row (empty sketch,
    // est 0) — the left join below restores them, keeping this path
    // row-for-row identical to [[hllDistinctFast]], whose one-buffer
    // aggregate emits a row for every group regardless.
    val allGroups = df.select(group.as("grp")).distinct()
    val regs = df
      .filter(value.isNotNull)
      .select(group.as("grp"), hllRegister(value).as("reg"),
        hllRank(value).as("rank"))
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("rank")).as("mrank"))
    val twoP40 = 1099511627776L // 2^40
    val byGroup = regs.groupBy(col("grp")).agg(
      count(lit(1)).cast("long").as("present_registers"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - mrank)")).as("sum_present"))
    // Empty registers contribute 2^-0 = 1 = 2^40/2^40 each.
    val withSum = allGroups.join(byGroup, Seq("grp"), "left")
      .withColumn("present_registers",
        coalesce(col("present_registers"), lit(0L)))
      .withColumn("sum_present", coalesce(col("sum_present"), lit(0L)))
      .withColumn("zero_registers",
        (lit(HllM.toLong) - col("present_registers")).as("zero_registers"))
      .withColumn("sum_int",
        col("sum_present") + col("zero_registers") * lit(twoP40))
    withSum.select(col("grp"), col("present_registers"),
      col("zero_registers"),
      hllEstimate(col("zero_registers"), col("sum_int")).as("est_distinct"))
  }

  /** Shared HLL finishing arithmetic — alpha_256 · m² · 2^40 / sum_int
    * with the Flajolet small-range `ln` correction, literal order
    * matched with the DuckDB oracle SQL. Both the composed and the
    * native-aggregate paths route through this exact expression tree so
    * their doubles are bit-identical. */
  private def hllEstimate(zeros: Column, sumInt: Column): Column = {
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(256.0) * lit(256.0) * lit(1099511627776.0) / sumInt
    val corrected = when(zeros > 0L && raw <= lit(2.5 * HllM),
      lit(256.0) * log(lit(256.0) / zeros)).otherwise(raw)
    round(corrected, 4)
  }

  /** [[hllDistinct]] via the native one-buffer register aggregate
    * ([[graft.functions.HllRegistersAgg]]): one 256-byte buffer per
    * group per partition crosses the exchange instead of ≤ 256 register
    * rows, and each value is hashed once in a tight JVM loop. Output is
    * BYTE-IDENTICAL to [[hllDistinct]] (same registers, same finishing
    * arithmetic) — spec-pinned. */
  def hllDistinctFast(df: DataFrame, group: Column, value: Column)
      : DataFrame = {
    val ag = df.groupBy(group.as("grp"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(value).as("regs"))
    ag.select(col("grp"),
        hllPresentRegisters(col("regs")).as("present_registers"),
        hllSumInt(col("regs")).as("sum_int"))
      .withColumn("zero_registers",
        lit(HllM.toLong) - col("present_registers"))
      .select(col("grp"), col("present_registers"), col("zero_registers"),
        hllEstimate(col("zero_registers"), col("sum_int"))
          .as("est_distinct"))
  }

  /** Count of non-empty registers in a 256-register max-rank array. */
  def hllPresentRegisters(regs: Column): Column =
    size(filter(regs, r => r > 0)).cast("long")

  /** Exact bigint Σ 2^(40-rank) over ALL 256 registers — empty registers
    * (rank 0) contribute 2^40, the same uniform sum the composed path
    * splits into present + zeros terms. 2^(40-r) for r ≤ 40 is exact in
    * a double, so `pow → cast` is integer-exact. */
  def hllSumInt(regs: Column): Column =
    aggregate(regs, lit(0L),
      (acc, r) => acc + pow(lit(2.0), lit(40) - r).cast("long"))

  /** Finished `est_distinct` straight from a register array — for
    * consumers holding raw sketches (e.g. the streaming windowed
    * distinct), byte-identical to [[hllDistinct]]'s estimates. */
  def hllEstimateFromRegisters(regs: Column): Column =
    hllEstimate(lit(HllM.toLong) - hllPresentRegisters(regs),
      hllSumInt(regs))

  /** Merge per-group register ARRAYS (one row per partial sketch, e.g.
    * one per day / batch / shard) into one finished estimate per group —
    * HLL's point at corpus scale: registers max-merge associatively, so
    * yesterday's sketch + today's sketch equals the sketch of the union
    * WITHOUT rescanning yesterday. Byte-identical to running
    * [[hllDistinctFast]] over the union (spec + oracle-pinned: qd68
    * merges per-parity partials and hash-checks against qd65's direct
    * derivation). */
  def hllMergeRegisters(sketches: DataFrame, group: Column,
      regs: Column): DataFrame = {
    val merged = sketches
      .select(group.as("grp"), posexplode(regs).as(Seq("reg", "rank")))
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("rank")).as("mrank"))
      .groupBy(col("grp"))
      .agg(sum(when(col("mrank") > 0, 1L).otherwise(0L))
          .as("present_registers"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - mrank)"))
          .as("sum_int"))
    merged
      .withColumn("zero_registers",
        lit(HllM.toLong) - col("present_registers"))
      .select(col("grp"), col("present_registers"), col("zero_registers"),
        hllEstimate(col("zero_registers"), col("sum_int"))
          .as("est_distinct"))
  }

  /** Count-min sketch of `value` occurrences: `depth` = 4 hash rows
    * (the 4 u32 lanes of `md5("0:" || value)` via the native codegen'd
    * [[graft.functions.Md5Lanes]] expression), `width` buckets per row.
    * Output: `(row, bucket, cnt)` — at most `4 × width` rows, with
    * map-side partial counting so the shuffle is bounded by
    * `4 × width × partitions` regardless of corpus size. */
  def cmsSketch(df: DataFrame, value: Column, width: Int): DataFrame =
    df.select(posexplode(graft.functions.Md5Lanes.lanes(value, 1))
        .as(Seq("row", "lane")))
      .select(col("row"), (col("lane") % lit(width.toLong)).as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Set algebra on two per-group register sketches `(grp, regs)`:
    * union via element-wise register max (exactly the union's sketch),
    * intersection via inclusion–exclusion on the ROUNDED estimates —
    * the standard HLL answer to "how much vocabulary do two corpora
    * share" without ever co-shuffling their values. Output:
    * `grp, est_a, est_b, est_union, est_inter`, all 4-decimal, all
    * derivable (and oracle-checked) from the two register arrays. */
  def hllOverlap(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("grp"), col("regs").as("ra"))
      .join(b.select(col("grp"), col("regs").as("rb")), Seq("grp"))
    val estA = hllEstimateFromRegisters(col("ra"))
    val estB = hllEstimateFromRegisters(col("rb"))
    val estU = hllEstimateFromRegisters(
      zip_with(col("ra"), col("rb"), (x, y) => greatest(x, y)))
    j.select(col("grp"), estA.as("est_a"), estB.as("est_b"),
        estU.as("est_union"))
      .withColumn("est_inter",
        round(col("est_a") + col("est_b") - col("est_union"), 4))
  }

  /** Merge count-min sketches by ADDING matching counters — CMS's
    * mergeability half (HLL registers max-merge, CMS counters sum), so
    * per-batch sketches roll up into the union's sketch exactly.
    * Input: a union of `(row, bucket, cnt)` sketch frames; output: one
    * merged sketch, byte-identical to building over the union (pinned
    * by qd69 sharing qd66's oracle verbatim). */
  def cmsMergeSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Log2 bucket of a non-negative bigint measure: 0 for ≤ 0, else the
    * bit length `length(bin(v))` = ⌊log₂ v⌋ + 1 — the same
    * engine-portable `bin()` trick the HLL rank uses, so stored buckets
    * re-derive in ANSI SQL. Bucket b > 0 covers [2^(b−1), 2^b − 1]; a
    * bigint measure can land in at most 64 buckets ever. */
  def histBucket(measure: Column): Column =
    when(measure <= 0L, lit(0))
      .otherwise(length(bin(measure.cast("long")))).cast("int")

  /** Per-group log-bucket histogram sketch of `measure` — the
    * DISTRIBUTION member of the profiling triad (HLL = distinct,
    * CMS = frequency, histogram = quantiles). Output
    * `(grp, bucket, cnt)`: ≤ 64 counter rows per group regardless of
    * corpus size, map-side partial counting, shuffle bounded by
    * `groups × 64`. Mergeable by counter ADDITION (like CMS), so
    * per-batch sketches roll up into the union's sketch exactly. */
  def histSketch(df: DataFrame, group: Column, measure: Column): DataFrame =
    df.select(group.as("grp"), histBucket(measure).as("bucket"))
      // null measures are dropped (histBucket(null) is null), matching
      // the streaming windowed twin, whose per-bucket conditional sums
      // skip them — a null-bucket row would otherwise inflate n in
      // [[histQuantiles]] while never being selectable as a quantile
      .filter(col("bucket").isNotNull)
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge per-batch histogram sketches by adding matching counters —
    * counter-wise equal to sketching the union directly. */
  def histMergeSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("grp"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a histogram sketch: for each requested
    * quantile q, the UPPER bound `2^bucket − 1` of the first bucket
    * whose cumulative count reaches q·n. The rank test is pure bigint
    * (`cum · 10⁴ ≥ n · q·10⁴` — q quantized to 4 decimals, no float
    * anywhere), so estimates are deterministic, oracle-exact, and
    * merge-invariant. Guarantee: est ≥ the true q-quantile v and
    * est < 2·v (v shares est's bucket, whose width is one doubling).
    * Output: `grp, n_rows, p<q·100> …` — one finished row per group,
    * computed from ≤ 64 counter rows per group (the window runs over
    * the SKETCH, never the corpus). */
  /** Column label for quantile q (4-decimal quantization `qq`): whole
    * percents read naturally (0.5 → p50, 0.99 → p99); fractional
    * percents carry their basis points (0.999 → p99_90, 0.005 → p0_50)
    * so DISTINCT quantiles can never collide into one name. */
  private[graft] def quantileLabel(q: Double): String = {
    val qq = math.round(q * 10000).toInt
    if (qq % 100 == 0) s"p${qq / 100}" else f"p${qq / 100}%d_${qq % 100}%02d"
  }

  def histQuantiles(sketch: DataFrame, quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    require(quantiles.map(quantileLabel).distinct.size == quantiles.size,
      s"quantiles collide after 4-decimal quantization: $quantiles")
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
      .withColumn("ub",
        expr("shiftleft(CAST(1 AS BIGINT), bucket)") - lit(1L))
    val qAggs = quantiles.map { q =>
      val qq = math.round(q * 10000).toInt
      min(when(col("cum") * lit(10000L) >= col("n") * lit(qq.toLong),
        col("ub"))).as(quantileLabel(q))
    }
    cum.groupBy(col("grp"))
      .agg(max(col("n")).as("n_rows"), qAggs: _*)
  }

  /** One quantile estimate from a 64-slot bucket-count ARRAY (slot i =
    * [[histBucket]] value i) — the arrayized twin of [[histQuantiles]]
    * for contexts where a second aggregation or window pass is
    * unavailable (the finishing projection of a STREAMING windowed
    * bucket-count aggregate). Same pure-bigint rank test; the bucket
    * ceiling 2^b − 1 computes as `pow(2,b) − 1` cast to long (exact to
    * b = 53, far beyond any realistic measure — the [[hllSumInt]]
    * precedent). The scan is a 64-element fold: per-row cost is
    * constant regardless of data volume. */
  def histQuantileFromCounts(counts: Column, q: Double): Column = {
    require(q > 0 && q <= 1, s"quantile must lie in (0, 1]: $q")
    val qq = math.round(q * 10000)
    val n = aggregate(counts, lit(0L), (a, c) => a + c)
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, b) => struct(c.cast("long").as("c"), b.as("b"))),
      struct(lit(0L).as("cum"), lit(-1L).as("ans")),
      (acc, x) => {
        val cum2 = acc.getField("cum") + x.getField("c")
        val ub = pow(lit(2.0), x.getField("b")).cast("long") - lit(1L)
        val hit = acc.getField("ans") === lit(-1L) &&
          x.getField("c") > lit(0L) &&
          cum2 * lit(10000L) >= n * lit(qq)
        struct(cum2.as("cum"),
          when(hit, ub).otherwise(acc.getField("ans")).as("ans"))
      },
      acc => acc.getField("ans"))
  }

  /** Point-estimate the count of each probe term: min over the 4 rows
    * of the matching bucket counters (0 when a bucket is empty). The
    * sketch side is tiny (≤ 4 × width rows) and broadcast; probes are
    * never shuffled. Estimates are exact-or-over, never under. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      term: Column, width: Int): DataFrame = {
    val pl = probes
      .select(term.as("term"),
        posexplode(graft.functions.Md5Lanes.lanes(term, 1))
          .as(Seq("row", "lane")))
      .select(col("term"), col("row"),
        (col("lane") % lit(width.toLong)).as("bucket"))
    pl.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
