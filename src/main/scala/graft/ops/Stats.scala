package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-statistic aggregations that avoid a global sort.
  *
  * The classic way to get an exact median is ORDER BY + pick the middle —
  * a single-partition sort at scale. Here each group's rows get a
  * row_number within ONE (group)-keyed shuffle and the (n+1)/2-th row is
  * filtered out, so the heavy data never leaves its group partition and
  * no stage sees more than one group's rows sorted together. Works for
  * any quantile; exact, not sketched (use approx_percentile when a
  * t-digest error is acceptable — this is the exact path).
  */
object Stats {

  /** Exact LOWER median of `value` per `group`: the ((n+1) div 2)-th
    * smallest value, ties broken deterministically by `tie` so the
    * selected row (and therefore the result) is stable across engines
    * and partitionings. Returns (grp, n, median_v). */
  def groupMedian(df: DataFrame, group: Column, value: Column,
      tie: Column): DataFrame = {
    val base = df.select(group.as("grp"), value.as("v"), tie.as("t"))
    val ordered = Window.partitionBy(col("grp")).orderBy(col("v"), col("t"))
    val whole = Window.partitionBy(col("grp"))
    base
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(whole))
      .filter(col("rn") === floor((col("n") + 1) / 2))
      .select(col("grp"), col("n"), col("v").as("median_v"))
  }

  /** Exact DISCRETE quantiles per group — the multi-quantile
    * generalization of [[groupMedian]]: still ONE (group)-keyed shuffle
    * (row_number + count windows share it), then each requested quantile
    * selects the rank-`max(1, ceil(p·n))` row by conditional
    * aggregation. That rank rule is DuckDB's `quantile_disc` (probed:
    * n=4 gives ranks 1/2/3/4 for p=.25/.5/.75/.9), and both engines
    * evaluate `ceil(p*n)` on IEEE doubles, so the oracle can reproduce
    * the selection bit-for-bit. Ties break by `tie` so the selected row
    * never depends on partitioning. Exact, not sketched — at 100 TB per
    * group this is the accuracy-critical path (SLA percentiles, token
    * budget cutoffs); use approx_percentile when t-digest error is
    * acceptable. */
  def groupQuantiles(df: DataFrame, group: Column, value: Column,
      tie: Column, ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"quantiles must be in [0,1]: $ps")
    val ordered = Window.partitionBy(col("grp")).orderBy(col("v"), col("t"))
    val whole = Window.partitionBy(col("grp"))
    val ranked = df.select(group.as("grp"), value.as("v"), tie.as("t"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(whole))
    val aggs = max(col("n")).as("n") +: ps.map { case (name, p) =>
      max(when(col("rn") ===
        greatest(lit(1L), ceil(lit(p) * col("n")).cast("long")),
        col("v"))).as(name)
    }
    ranked.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-row quantile-bucket assignment (`ntile`): every row of a group
    * gets its 1-based bucket among `n` near-equal buckets by `value`
    * order — the score-calibration shape ("which decile is this
    * document's quality in?"). Standard SQL NTILE semantics (first
    * buckets absorb the remainder), tie broken by `tie` so bucket
    * boundaries are engine-stable. Same single (group)-shuffle
    * discipline as [[groupMedian]]. */
  def quantileBuckets(df: DataFrame, group: Column, id: Column,
      value: Column, tie: Column, n: Int): DataFrame = {
    require(n > 0, s"bucket count must be positive: $n")
    df.select(group.as("grp"), id.as("doc_id"), value.as("v"),
        tie.as("_t"))
      .withColumn("bucket", ntile(n).over(
          Window.partitionBy(col("grp")).orderBy(col("v"), col("_t")))
        // long, matching SQL engines whose NTILE returns BIGINT
        .cast("long"))
      .drop("_t")
  }

  /** Per-group equi-width histogram over a monetary measure, on exact
    * integer cents: bin b covers [b·width, (b+1)·width) cents. One
    * map-side-combined hash aggregation — each partition emits at most
    * (groups × occupied bins) rows regardless of input size, the
    * profile-dashboard scan shape. Bins are derived with floor division
    * in DOUBLE (exact for |cents| < 2^53) because integer `div`
    * truncates toward zero in Spark but floors in other engines —
    * doubles sidestep the negative-value disagreement. Empty bins are
    * absent (join a spine like denseHourlyCounts when zero-filled
    * output is wanted). */
  def centsHistogram(df: DataFrame, group: Column, value: Column,
      widthCents: Long): DataFrame =
    df.select(group.as("grp"),
        floor(value * lit(100.0)).cast("long").as("cents"))
      .withColumn("bin",
        floor(col("cents").cast("double") / lit(widthCents.toDouble))
          .cast("long"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .withColumn("bin_lo_cents", col("bin") * widthCents)
}
