package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins without a cartesian plan.
  *
  * Spark compiles a bare range predicate (`p.ts BETWEEN i.start AND
  * i.end` with no equi-key) to `BroadcastNestedLoopJoin` — O(|points| ×
  * |intervals|) and a driver OOM once the broadcast side grows. The
  * standard scale fix is BINNING: quantize time into fixed-width
  * buckets, explode each interval into the buckets it covers, and
  * equi-join on the bucket id — Catalyst then plans an ordinary shuffled
  * hash join keyed by bucket, and the exact containment predicate
  * filters bucket-collision false positives. Cost per interval is
  * `len/width + 1` exploded rows; pick `bucketWidth` near the typical
  * interval length so that factor stays ~2. Each point lands in exactly
  * ONE bucket, so no pair is emitted twice and no post-join dedup is
  * needed. Hot buckets (intervals piling onto one epoch) are ordinary
  * join skew — AQE's skew-join split or [[Skew.saltedJoin]] applies
  * unchanged.
  */
object RangeJoin {

  /** All (interval, point) pairs with `start <= pt <= end` (inclusive
    * both ends). `pt`/`start`/`end` must be non-negative LONGs in one
    * shared unit (epoch nanos/micros — `div` truncation equals floor
    * only at >= 0). Output columns: `interval_id, point_id, pt, start,
    * end`. */
  def pointInInterval(points: DataFrame, pointId: Column, pt: Column,
      intervals: DataFrame, intervalId: Column, start: Column, end: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points
      .select(pointId.as("point_id"), pt.as("pt"))
      .withColumn("bucket", expr(s"pt div $bucketWidth"))
    val iv = intervals
      .select(intervalId.as("interval_id"), start.as("start"), end.as("end"))
      .filter(col("end") >= col("start"))
      .withColumn("bucket", explode(sequence(
        expr(s"start div $bucketWidth"), expr(s"end div $bucketWidth"))))
    p.join(iv, "bucket")
      .filter(col("pt") >= col("start") && col("pt") <= col("end"))
      .select(col("interval_id"), col("point_id"), col("pt"),
        col("start"), col("end"))
  }

  /** All (a, b) interval pairs that OVERLAP (`a_start <= b_end AND
    * b_start <= a_end`, inclusive) — the interval×interval sibling of
    * [[pointInInterval]], same binning idea with one extra trick: an
    * overlapping pair shares every bucket in the overlap range, so to
    * emit it exactly ONCE (no distinct) each pair is claimed only by the
    * FIRST shared bucket, `max(a_start, b_start) div width` — a pure
    * filter, no post-join dedup shuffle. Bounds must be non-negative
    * longs in one shared unit. */
  def intervalOverlap(a: DataFrame, aId: Column, aStart: Column,
      aEnd: Column, b: DataFrame, bId: Column, bStart: Column,
      bEnd: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def explodeBuckets(df: DataFrame, id: Column, s: Column, e: Column,
        p: String): DataFrame =
      df.select(id.as(s"${p}_id"), s.as(s"${p}_start"), e.as(s"${p}_end"))
        .filter(col(s"${p}_end") >= col(s"${p}_start"))
        .withColumn("bucket", explode(sequence(
          expr(s"${p}_start div $bucketWidth"),
          expr(s"${p}_end div $bucketWidth"))))
    val av = explodeBuckets(a, aId, aStart, aEnd, "a")
    val bv = explodeBuckets(b, bId, bStart, bEnd, "b")
    av.join(bv, "bucket")
      .filter(col("a_start") <= col("b_end") &&
        col("b_start") <= col("a_end"))
      .filter(col("bucket") ===
        expr(s"greatest(a_start, b_start) div $bucketWidth"))
      .select(col("a_id"), col("b_id"), col("a_start"), col("a_end"),
        col("b_start"), col("b_end"))
  }
}
