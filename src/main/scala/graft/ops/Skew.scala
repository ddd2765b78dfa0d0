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

  /** Skew-safe EQUI-JOIN: every big-side row gets a content-derived salt
    * (same determinism discipline as [[saltedCountSum]]) and the small
    * side is REPLICATED across all `buckets` salt values, so a hot join
    * key's rows spread over `buckets` reducers instead of stalling one.
    * The join result is exactly the plain `big ⋈ small` — salting is
    * invisible in the output (helper columns dropped), which is what
    * makes it oracle-checkable against the unsalted join.
    *
    * Use when the small side is too big to broadcast but the big side's
    * key distribution is skewed and AQE's skew-join split can't help
    * (e.g. the skew is in a single unsplittable partition of a
    * pre-shuffled input). Cost: small side × buckets. Column names must
    * be disjoint between the two frames (Spark would otherwise emit
    * ambiguous duplicates). */
  def saltedEquiJoin(big: DataFrame, bigKey: Column, rowId: Column,
      small: DataFrame, smallKey: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val b = big.withColumn("_salt", pmod(xxhash64(rowId), lit(buckets.toLong)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    b.join(s, bigKey === smallKey && b("_salt") === s("_salt"))
      .drop("_salt")
  }
}
