package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * A plain `groupBy(key)` sends every row of a hot key to ONE reducer;
  * at 100 TB a single celebrity key stalls the stage. Salting splits
  * each key into `buckets` sub-keys for a first partial aggregation,
  * then combines the per-bucket partials — two small shuffles instead of
  * one skewed one. The salt derives ONLY from stable row content (a
  * caller-supplied unique row id), never from a nondeterministic
  * expression: a salt built from `monotonically_increasing_id()` or
  * `rand()` is partition-position-dependent, and using it as a shuffle
  * key can drop or duplicate rows when a stage retries after a fetch
  * failure (the SPARK-38388 class of bugs) — exactly the long-job 100 TB
  * scenario this operator targets. Only decomposable aggregates (count,
  * sum, min, max) ride this path. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`) covers the join side; this covers
  * aggregation.
  */
object Skew {

  /** Per-key count + exact integer sum via two-phase salted
    * aggregation. `valueCents` should be an integral column (exact,
    * order-independent — see the q12 discipline); `rowId` must be a
    * stable, content-derived row identifier (a primary key, a document
    * fingerprint) so the salt — `pmod(xxhash64(rowId), buckets)` — is
    * identical on any retry or repartitioning of the same data. */
  def saltedCountSum(df: DataFrame, key: Column, valueCents: Column,
      rowId: Column, buckets: Int): DataFrame =
    df.select(key.as("k"), valueCents.as("v"),
        pmod(xxhash64(rowId), lit(buckets.toLong)).as("_salt"))
      .groupBy(col("k"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col("v")).as("_s"))
      .groupBy(col("k"))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total_cents"))
}
