package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * A plain `groupBy(key)` sends every row of a hot key to ONE reducer;
  * at 100 TB a single celebrity key stalls the stage. Salting splits
  * each key into `buckets` sub-keys for a first partial aggregation,
  * then combines the per-bucket partials — two small shuffles instead of
  * one skewed one. The salt derives from a row hash, so results are
  * independent of partitioning; only decomposable aggregates (count,
  * sum, min, max) ride this path. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`) covers the join side; this covers
  * aggregation.
  */
object Skew {

  /** Per-key count + exact integer sum via two-phase salted
    * aggregation. `valueCents` should be an integral column (exact,
    * order-independent — see the q12 discipline). */
  def saltedCountSum(df: DataFrame, key: Column, valueCents: Column,
      buckets: Int): DataFrame =
    df.select(key.as("k"), valueCents.as("v"))
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v"),
        monotonically_increasing_id()), lit(buckets.toLong)))
      .groupBy(col("k"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col("v")).as("_s"))
      .groupBy(col("k"))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total_cents"))
}
