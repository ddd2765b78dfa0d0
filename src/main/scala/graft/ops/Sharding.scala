package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard layout: the last step of a curation pipeline — turn a
  * corpus into `numShards` balanced, deterministically-assigned,
  * internally-ordered parquet shards that a data loader streams.
  *
  * Design for 100 TB:
  *  - shard id = `pmod(xxhash64(key), numShards)` — content-derived, so
  *    the layout is reproducible on any cluster/partitioning (same
  *    discipline as [[Sampling]]; never `monotonically_increasing_id`).
  *  - one `repartition(numShards, shard)` shuffle, then
  *    `sortWithinPartitions` — NO global sort; each shard orders
  *    independently.
  *  - written `partitionBy("shard")` so a loader (or a later Spark job)
  *    reads any subset of shards via partition pruning.
  *  - a tiny manifest (shard → rows, bytes-ish) is computed from the
  *    same frame, not by re-listing files.
  */
object Sharding {

  /** Stable shard id in [0, numShards) — fast in-engine path. */
  def shardId(key: Column, numShards: Int): Column = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    pmod(xxhash64(key), lit(numShards.toLong))
  }

  /** ENGINE-PORTABLE shard id: first 8 hex chars of md5 as an integer,
    * mod `numShards` — reproducible in external SQL
    * (`CAST('0x'||substr(md5(k),1,8) AS BIGINT) % n`), same md5
    * discipline as [[Sampling.hashHex]]. Use when the shard layout must
    * be re-derivable outside Spark; [[shardId]] (xxhash64) is cheaper
    * when it only has to be stable within Spark. */
  def portableShardId(key: Column, numShards: Int): Column = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % numShards
  }

  /** Assign shards and lay the frame out shard-per-partition, rows
    * ordered by `order` inside each shard. Returns the frame WITH the
    * `shard` column, partitioned so each task holds exactly one shard. */
  /** CONSISTENT-HASH shard assignment: the ring has `vnodes` virtual
    * points per shard at md5-derived positions, and a key lands on the
    * first ring point at-or-after its own md5 position (wrapping to the
    * ring's first point). Why it exists next to [[portableShardId]]'s
    * mod hash: resharding. Dropping (or adding) shards moves ONLY the
    * keys on the removed shards' ring arcs — ~1/n of the data — where
    * a mod hash moves nearly everything; on a 100 TB corpus that is
    * the difference between rewriting ~6 TB and rewriting the world.
    * The ring (nShards·vnodes longs) compiles in as LITERAL arrays —
    * the lookup is a narrow codegen'd map, no join, no shuffle — and
    * every position is a plain md5, so an external engine re-derives
    * the full ring and every assignment exactly. */
  def consistentShard(id: Column, nShards: Int, vnodes: Int = 8,
      seed: String = "ring"): Column = {
    require(nShards >= 1 && vnodes >= 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val ring = (for { s <- 0 until nShards; v <- 0 until vnodes } yield {
      val hex = md.digest(s"$seed:$s:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      md.reset()
      (java.lang.Long.parseLong(hex, 16), s.toLong)
    }).sortBy(p => (p._1, p._2))
    val positions = ring.map(_._1).toArray
    val shards = ring.map(_._2).toArray
    val h = conv(substring(md5(concat_ws(":", lit("ch"),
      id.cast("string"))), 1, 8), 16, 10).cast("long")
    val idx = size(filter(lit(positions), p => p < h))
    when(idx === lit(positions.length), lit(shards.head))
      .otherwise(element_at(lit(shards), idx + 1))
  }

  def layout(df: DataFrame, key: Column, order: Column,
      numShards: Int): DataFrame =
    df.withColumn("shard", shardId(key, numShards))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), order)

  /** Write the sharded corpus under `path` (dir per shard via hive-style
    * `shard=N` partitions) and return the manifest (shard, n_rows). */
  def write(df: DataFrame, key: Column, order: Column, numShards: Int,
      path: String): DataFrame = {
    val laid = layout(df, key, order, numShards)
    laid.write.mode("overwrite").partitionBy("shard").parquet(path)
    // hive partition-column inference decides the read-back type of
    // `shard`; pin it to long so the manifest schema never depends on
    // the inference setting (same trap Catalog sidesteps)
    laid.sparkSession.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Shard-balance report straight from the assignment (no write):
    * per-shard row count and total cost, for checking the hash spread
    * before paying for the layout shuffle. Uses the portable shard id
    * so the report is oracle-checkable end to end. */
  def balance(df: DataFrame, key: Column, cost: Column,
      numShards: Int): DataFrame =
    df.select(portableShardId(key, numShards).as("shard"),
        cost.cast("long").as("c"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c")).as("total_cost"))

  /** Z-value (Morton code): bit-interleave of two non-negative integer
    * dimensions, `bits` low bits each → a `2·bits`-bit code whose
    * ordering maps compact code ranges to small RECTANGLES in (a, b)
    * space. Pure integer shifts/masks — codegen'd, engine-portable,
    * oracle-checkable. Callers bucket raw columns into the `bits`-bit
    * domain first (`% (1 << bits)`, or a range bin). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    // Operands are widened to BIGINT first: on an INT operand Spark's
    // shiftleft wraps the shift amount mod 32, so any bits > 15 would
    // silently corrupt the interleave for integer-typed columns.
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Z-ordered layout write: range-partition on the z-value (sampled
    * range boundaries — one shuffle, NO global sort) and sort each file
    * internally, so every output file covers a compact z-range = a
    * small rectangle in (a, b) space. Parquet min/max column stats then
    * prune scans filtered on EITHER dimension — the multi-dimensional
    * layout a 100 TB table wants when queries slice by more than one
    * key (a single-column sort clusters only its own column; z-order
    * gives both columns ~√files locality). Returns the read-back frame.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int, path: String): DataFrame = {
    val laid = df.withColumn("zval", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
    laid.write.mode("overwrite").parquet(path)
    laid.sparkSession.read.parquet(path)
  }
}
