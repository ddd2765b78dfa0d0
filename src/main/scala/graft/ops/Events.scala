package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the append-only `events` table — the shapes that
  * also run under Structured Streaming (see graft.streaming).
  *
  * Input contract: `ts` is nanos-since-epoch (LongType, see
  * [[graft.Tables.loadEvents]]). All second-granularity math uses integer
  * division — no doubles touch the timestamps, so ordering and bucketing
  * are bit-identical to the oracle's nanosecond view. */
object Events {

  private val secs = expr("ts div 1000000000")

  /** Tumbling 1-hour rollup per event type: the batch twin of the
    * streaming windowed aggregation. Partial aggregation before the
    * exchange; (hour, type) is the natural partition key at scale. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy((expr("ts div 1000000000 div 3600") * 3600).as("hour_secs"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))

  /** Gap-based sessionization: a new session starts after `gapSeconds` of
    * user inactivity. Two windows over one (user_id, ts) shuffle: lag to
    * flag session starts, running sum to number them. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("secs", secs)
      .withColumn("prev_secs", lag(col("secs"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_secs").isNull ||
          col("secs") - col("prev_secs") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("session_id"))
  }

  /** Per-user rolling analytics: previous-event cents, inter-event gap
    * in microseconds, and a 3-event rolling cents sum — the lag /
    * moving-window shapes, all integer math (cents + integer micros) so
    * results are engine-exact. One shuffle on user_id feeds every
    * window. */
  def rollingStats(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("ts div 1000").as("ts_us"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(byUser))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
      .withColumn("roll3_cents",
        sum(col("cents")).over(byUser.rowsBetween(-2, 0)))
      .drop("ts")
  }

  /** Per-user spend outliers by EXACT z-score test: flag event x when
    * (x − mean)² > k² · variance over that user's events, evaluated as
    *   (n·x − s)² > k² · (n·q − s²)
    * with s = Σcents, q = Σcents² (both exact BIGINT window sums, so the
    * usual stddev float-accumulation-order nondeterminism never enters;
    * the only floating math is the final IEEE multiplies of
    * exactly-represented integers — identical on every engine).
    * Integer headroom: needs n·Σcents² < 2^63, i.e. per-group
    * n·max_cents ≲ 3·10^9 — comfortable for per-user spend; for
    * coarser groups pre-aggregate or rescale the unit. One shuffle on
    * user_id; users with one event never flag (variance term is 0). */
  def spendOutliers(events: DataFrame, k: Double): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val e = events.select(col("event_id"), col("user_id"),
      floor(col("value") * lit(100.0)).cast("long").as("cents"))
    e.withColumn("n", count(lit(1)).over(byUser))
      .withColumn("s", sum(col("cents")).over(byUser))
      .withColumn("q", sum(col("cents") * col("cents")).over(byUser))
      .filter {
        // square by self-multiply, not pow(): pow's libm path is not
        // guaranteed to be a correctly-rounded square on every engine
        val dev = (col("n") * col("cents") - col("s")).cast("double")
        val variance =
          (col("n") * col("q") - col("s") * col("s")).cast("double")
        dev * dev > lit(k * k) * variance && col("n") > 1
      }
      .select(col("event_id"), col("user_id"), col("cents"),
        col("n"), col("s"))
  }

  /** Hourly traffic SPIKES per event type: an hour flags when its count
    * sits more than k standard deviations ABOVE the type's mean hourly
    * count — the ops-dashboard anomaly pass. Same exact-integer
    * variance test as [[spendOutliers]] ((h·n − s)² > k²(h·q − s²) on
    * BIGINT window sums — no float accumulation, engine-identical),
    * restricted to the spike side (h·n > s). Works on the sparse
    * rollup (mean over PRESENT hours); compose with
    * [[denseHourlyCounts]] first if silent hours should drag the mean.
    * The corpus-sized work is the rollup; the window runs over
    * (types × hours) rows. */
  def hourlyAnomalies(events: DataFrame, k: Double): DataFrame = {
    val hourly = events.groupBy(
      (expr("ts div 1000000000 div 3600") * 3600).as("hour_secs"),
      col("event_type")).agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    hourly
      .withColumn("h", count(lit(1)).over(byType))
      .withColumn("s", sum(col("n")).over(byType))
      .withColumn("q", sum(col("n") * col("n")).over(byType))
      .filter {
        val dev = (col("h") * col("n") - col("s")).cast("double")
        val variance =
          (col("h") * col("q") - col("s") * col("s")).cast("double")
        dev * dev > lit(k * k) * variance && col("h") > 1 &&
          col("h") * col("n") > col("s")
      }
      .select(col("event_type"), col("hour_secs"), col("n"), col("h"),
        col("s"))
  }

  /** DENSE hourly counts: the tumbling rollup with empty buckets
    * zero-filled — resampling/gap-filling for time-series consumers
    * that need every (hour, type) cell. The only corpus-sized work is
    * the rollup itself (already reduced to one row per bucket); the
    * hour spine is generated from the min/max bounds (range/3600 rows)
    * and cross-joined with the distinct types — both broadcast-sized by
    * construction at any corpus scale. */
  def denseHourlyCounts(events: DataFrame): DataFrame = {
    val r = events
      .groupBy((expr("ts div 1000000000 div 3600") * 3600).as("hour_secs"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hours = r.agg(min(col("hour_secs")).as("h0"),
        max(col("hour_secs")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), lit(3600L)))
        .as("hour_secs"))
    val types = events.select(col("event_type")).distinct()
    hours.crossJoin(broadcast(types))
      .join(r, Seq("hour_secs", "event_type"), "left")
      .select(col("hour_secs"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** Ordered conversion funnel signup → click → purchase: per user, the
    * first signup, the first click AT OR AFTER it, and the first
    * purchase at or after that click; `stage` is how far the user got.
    * Three aggregations + joins, all keyed on user_id — one partitioning
    * serves every step (Spark reuses the hash exchange), nothing global.
    * Timestamps compare in integer microseconds. */
  def funnel(events: DataFrame): DataFrame = {
    val us = expr("ts div 1000")
    val s = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(us).as("s_us"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), us.as("_us"))
      .join(s, "user_id")
      .filter(col("_us") >= col("s_us"))
      .groupBy(col("user_id")).agg(min(col("_us")).as("c_us"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), us.as("_us"))
      .join(c, "user_id")
      .filter(col("_us") >= col("c_us"))
      .groupBy(col("user_id")).agg(min(col("_us")).as("p_us"))
    s.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("s_us"), col("c_us"), col("p_us"),
        when(col("p_us").isNotNull, lit(3))
          .when(col("c_us").isNotNull, lit(2))
          .otherwise(lit(1)).as("stage"))
  }

  /** Weekly retention cohorts: each user's cohort is their first active
    * week; the matrix counts distinct users per (cohort, offset). Two
    * aggregations on user_id + one on the (tiny) cohort matrix. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val week = expr("(ts div 1000) div 604800000000").as("week_")
    val d = events.select(col("user_id"), week)
    val f = d.groupBy(col("user_id")).agg(min(col("week_")).as("cohort_week"))
    d.join(f, "user_id")
      .groupBy(col("cohort_week"),
        (col("week_") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Per-session summary built on sessionize — session span + volume. */
  def sessionStats(events: DataFrame, gapSeconds: Long): DataFrame = {
    val sess = sessionize(events, gapSeconds)
    events.withColumn("secs", secs)
      .join(sess, Seq("event_id", "user_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("secs")).as("start_secs"),
        max(col("secs")).as("end_secs"),
        round(sum(col("value")), 2).as("session_value"))
  }

  /** Top-k most common session paths — the ordered event-type sequence
    * each session walked (`signup>click>purchase`), the clickstream
    * view behind funnel design. Per-session path assembly rides the
    * same (user_id) shuffle as sessionization (collect + in-row sort by
    * (ts, event_id), so the path is deterministic under any partition
    * order); the path frequency table is one map-side-combined hash
    * aggregation, and the final top-k is a distributed
    * orderBy().limit() — rank is derived on the k-row result only. */
  def topPaths(events: DataFrame, gapSeconds: Long, k: Int): DataFrame = {
    val sess = sessionize(events, gapSeconds)
    val paths = events
      .join(sess, Seq("event_id", "user_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
        array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))),
        x => x("event_type")), ">").as("path"))
    val top = paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("path")))
        .cast("long"))
  }
}
