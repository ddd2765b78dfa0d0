package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `sample(fraction)` is seeded per partition, so its output changes with
  * partitioning, task retries, and cluster size — unacceptable for a
  * reproducible 100 TB curation run. These operators key the keep/drop
  * decision on a CONTENT hash (md5 of a stable key), so the same row gets
  * the same verdict on any cluster, any partitioning, any engine: a pure
  * narrow filter, no shuffle, and the sampled corpus is re-derivable
  * forever from the key alone.
  */
object Sampling {

  /** Uniform [0, 1) hash of a key: the first 8 hex chars of md5, which
    * both the JVM and every SQL engine render as the same lowercase hex
    * string — comparisons are plain byte-wise string compares, immune to
    * float formatting. */
  def hashHex(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Hex threshold for a keep-rate in [0, 1]: floor(rate * 16^8) as
    * 8-digit zero-padded lowercase hex. A row survives when
    * hashHex(key) < threshold — i.e. with probability ~rate, exactly
    * reproducibly. */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    val n = math.min((rate * 4294967296.0).toLong, 4294967295L)
    f"$n%08x"
  }

  /** Keep-predicate for a deterministic uniform sample at `rate`. */
  def keep(key: Column, rate: Double): Column =
    hashHex(key) < lit(rateThreshold(rate))

  /** Rebalance a skewed group mix toward UNIFORM: group g keeps at rate
    * min(1, (N/|groups|)/n_g), so over-represented groups downsample to
    * the uniform share and under-represented ones keep everything — the
    * domain/language mix-balancing pass of a training-data pipeline.
    * Rates are DATA-DEPENDENT, so the hex threshold is computed in-plan
    * (`format_string("%08x", ...)` — no collect, no driver round-trip):
    * group stats are one tiny aggregation, broadcast back, and the
    * keep/drop test stays the same engine-portable md5 compare as
    * [[keep]]. Returns the input rows that survive plus their group's
    * `rate` (floored to 4 decimals). */
  def mixBalancedSample(df: DataFrame, group: Column,
      key: Column): DataFrame = {
    val n = df.groupBy(group.as("_g")).agg(count(lit(1)).as("_n"))
    val tot = n.agg(sum(col("_n")).as("_tot"), count(lit(1)).as("_k"))
    val rates = n.crossJoin(broadcast(tot))
      .select(col("_g"), least(lit(1.0),
        (col("_tot").cast("double") / col("_k").cast("double")) /
          col("_n").cast("double")).as("_rate0"))
    val thr = format_string("%08x",
      least(floor(col("_rate0") * lit(4294967296.0)), lit(4294967295.0))
        .cast("long"))
    df.join(broadcast(rates), group === col("_g"))
      .filter(hashHex(key) < thr)
      .withColumn("rate", Num.floor4(col("_rate0")))
      .drop("_g", "_rate0")
  }

  /** Temperature-style mix sampling at α = 1/2: group g keeps at rate
    * sqrt(min_n / n_g), so sampled sizes scale as sqrt(n) — the classic
    * temperature flattening (probability ∝ n^α) that boosts
    * low-resource languages/domains without collapsing the mix all the
    * way to uniform the way [[mixBalancedSample]] does. The smallest
    * group keeps everything; a 100× larger group keeps 10×, not 100×.
    *
    * α is FIXED at 1/2 because `sqrt` is the one fractional power IEEE
    * 754 requires to be correctly rounded — the data-dependent hex
    * threshold comes out bit-identical on every engine. A generic
    * `pow(n, α−1)` would hang the kept-set on last-ulp libm behavior
    * and is deliberately not offered. Same in-plan mechanics as
    * [[mixBalancedSample]]: tiny group aggregation, broadcast back,
    * md5-threshold keep — no collect, no shuffle of the fact table. */
  def sqrtTemperatureSample(df: DataFrame, group: Column,
      key: Column): DataFrame = {
    val n = df.groupBy(group.as("_g")).agg(count(lit(1)).as("_n"))
    val mn = n.agg(min(col("_n")).as("_mn"))
    val rates = n.crossJoin(broadcast(mn))
      .select(col("_g"),
        sqrt(col("_mn").cast("double") / col("_n").cast("double"))
          .as("_rate0"))
    val thr = format_string("%08x",
      least(floor(col("_rate0") * lit(4294967296.0)), lit(4294967295.0))
        .cast("long"))
    df.join(broadcast(rates), group === col("_g"))
      .filter(hashHex(key) < thr)
      .withColumn("rate", Num.floor4(col("_rate0")))
      .drop("_g", "_rate0")
  }

  /** Deterministic train/validation/test SPLIT assignment: the md5 hash
    * of the key lands in [0,1) and the cumulative weight ranges carve it
    * into one labeled region per split — every row gets exactly one
    * label, reproducibly on any cluster/partitioning/engine (the same
    * property as [[keep]], and the reason `randomSplit` is unusable for
    * a 100 TB corpus: its assignment changes with partitioning). Weights
    * are normalized, so (8,1,1) and (0.8,0.1,0.1) agree. Pure codegen'd
    * string compares — a narrow map, no shuffle, no state. */
  def splitAssign(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights: $splits")
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val h = hashHex(key)
    // last region is the otherwise-branch: no rounding gap at the top
    splits.zip(cum).init.foldLeft(when(lit(false), lit(""))) {
      case (acc, ((label, _), c)) =>
        acc.when(h < lit(rateThreshold(c)), label)
    }.otherwise(lit(splits.last._1))
  }

  /** Leakage-free split assignment: every member of a near-duplicate
    * cluster gets the SAME split label, keyed on the cluster
    * representative (documents absent from `clusters` are singletons and
    * key on their own id). Splitting on the raw doc id leaks — a test
    * document's near-duplicate lands in train and the eval is
    * contaminated — so the split unit must be the whole cluster.
    * `clusters` is the [[Dedup.dupClusters]] shape (member id → cluster
    * rep). One equi-join on the id (the cluster map only holds docs that
    * HAVE a near-dup, so AQE broadcasts it when it's small); the verdict
    * itself stays the same engine-portable md5 compare as
    * [[splitAssign]]. */
  def leakFreeSplitAssign(df: DataFrame, id: Column,
      clusters: DataFrame, member: Column, rep: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    val c = clusters.select(member.as("_m"), rep.as("_rep"))
    df.join(c, id === col("_m"), "left")
      .withColumn("split", splitAssign(coalesce(col("_rep"), id), splits))
      .drop("_m", "_rep")
  }

  /** Deterministic global epoch shuffle: assign every row its position in
    * a pseudo-random permutation — the "shuffle the corpus each epoch"
    * pass of a training run — WITHOUT a single global sort partition.
    * The permutation is the lexicographic order of `md5(seed:id)` (ties
    * by id), so it is reproducible on any cluster/partitioning/engine and
    * a new `seed` is a fresh permutation. Two-phase plan: rows shuffle
    * once into 16^`shardHexChars` shards keyed on the hash PREFIX (hex
    * order == numeric order, so shards are contiguous runs of the global
    * order), per-shard counts (bounded: ≤65536 longs) come back to the
    * driver for a prefix-sum, and each shard sorts locally —
    * `global pos = shard offset + rank within shard`. At 100 TB with the
    * default 4096 shards a shard is ~25 GB: a spillable per-partition
    * sort, vs the single-reducer final range of a naive
    * `row_number() OVER (ORDER BY hash)`. */
  def epochShuffle(df: DataFrame, id: Column, seed: String,
      shardHexChars: Int = 3): DataFrame = {
    require(shardHexChars >= 1 && shardHexChars <= 4,
      s"shardHexChars out of [1,4]: $shardHexChars")
    val keyed = df
      .withColumn("_k", md5(concat_ws(":", lit(seed), id.cast("string"))))
      .withColumn("_shard", substring(col("_k"), 1, shardHexChars))
    val counts = keyed.groupBy("_shard").agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (s, n) => val o = (s, acc); acc += n; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offs = offsets.toSeq.toDF("_shard", "_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(col("_k"), id)
    keyed.join(broadcast(offs), "_shard")
      .withColumn("pos", col("_off") + row_number().over(w) - 1)
      .drop("_k", "_shard", "_off")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis exponential race): row i gets priority −ln(u_i)/w_i with
    * u_i an md5-uniform in (0,1], and the k smallest priorities are the
    * sample — each row wins with probability proportional to its weight,
    * with no replacement and no reshuffle-dependence. The priority is
    * floored at 1e-12 resolution to a long so the comparison is integer
    * (the float only feeds the floor; a last-ulp ln() difference between
    * engines could flip a boundary only when two rows land within one
    * unit AND straddle rank k — vanishing, and membership-only since the
    * priority is dropped from the output). `orderBy(...).limit(k)`
    * compiles to TakeOrderedAndProject: per-partition top-k, k-row
    * driver merge — no global sort at 100 TB. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
      seed: String = "ws"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (conv(substring(md5(concat_ws(":", lit(seed),
      id.cast("string"))), 1, 8), 16, 10).cast("double") + 1.0) /
      lit(4294967296.0)
    val pri = floor(lit(1e12) * -log(u) / weight.cast("double"))
      .cast("long")
    df.withColumn("_pri", pri)
      .orderBy(col("_pri"), id)
      .limit(k)
      .drop("_pri")
  }

  /** Per-group quality-percentile gate: keep the top `fraction` of each
    * group by `score` (ties broken by `id` so the cut is deterministic)
    * — "keep the best 60% of every domain", the per-source FineWeb-style
    * quality prune that a single global threshold gets wrong when
    * domains have different score distributions. Keeps
    * `ceil(fraction · n_g)` rows of each group, so no group is emptied.
    * One shuffle on the group key; the per-group sort is a spillable
    * window, acceptable when groups are domains/sources. For a
    * GLOBAL gate (one giant group) use a quantile threshold from
    * [[Stats.groupQuantiles]] + a narrow filter instead. */
  def percentileGate(df: DataFrame, group: Column, score: Column,
      id: Column, fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction out of (0,1]: $fraction")
    val w = org.apache.spark.sql.expressions.Window
    df.withColumn("_rn", row_number().over(
        w.partitionBy(group).orderBy(score.desc, id)))
      .withColumn("_n", count(lit(1)).over(w.partitionBy(group)))
      .filter(col("_rn").cast("double") <=
        ceil(lit(fraction) * col("_n").cast("double")))
      .drop("_rn", "_n")
  }

  /** Deterministic epoch UPSAMPLING: replicate each row its group's
    * repeat factor — "2.3 epochs of wiki, 0.5 of crawl", the standard
    * way a training mix over-represents curated sources. A factor f
    * yields floor(f) copies plus one more with probability f−floor(f),
    * decided by the same engine-portable md5 compare as [[keep]] (the
    * fractional threshold is computed IN-PLAN with `format_string`
    * since it's data-dependent per group) — so the materialized mix is
    * reproducible on any cluster/partitioning/engine. Each copy carries
    * a 0-based `copy` index (callers shuffle copies apart with
    * [[epochShuffle]] keyed on (id, copy)). Pure narrow map + explode:
    * no shuffle, no state, output size = Σ n_copies. */
  def epochUpsample(df: DataFrame, id: Column, group: Column,
      factors: Seq[(String, Double)], defaultFactor: Double,
      seed: String = "eu"): DataFrame = {
    require((factors.map(_._2) :+ defaultFactor).forall(_ >= 0.0),
      s"repeat factors must be non-negative: $factors, $defaultFactor")
    val r = factors.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (g, f)) => acc.when(group === g, lit(f))
    }.otherwise(lit(defaultFactor))
    val thr = format_string("%08x",
      least(floor((r - floor(r)) * lit(4294967296.0)), lit(4294967295.0))
        .cast("long"))
    val extra = when(hashHex(concat_ws(":", lit(seed),
      id.cast("string"))) < thr, lit(1L)).otherwise(lit(0L))
    df.withColumn("n_copies", floor(r).cast("long") + extra)
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Per-GROUP deterministic weighted sample: the top `k` of each group
    * by the same Efraimidis–Spirakis priority as [[weightedSample]] —
    * "50 quality-weighted docs from every source". One shuffle on the
    * group key; the per-group window sorts only within groups. */
  def groupWeightedSample(df: DataFrame, id: Column, group: Column,
      weight: Column, k: Int, seed: String = "gws"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (conv(substring(md5(concat_ws(":", lit(seed),
      id.cast("string"))), 1, 8), 16, 10).cast("double") + 1.0) /
      lit(4294967296.0)
    val pri = floor(lit(1e12) * -log(u) / weight.cast("double"))
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(col("_pri"), id)
    df.withColumn("_pri", pri)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_pri", "_rn")
  }

  /** Token-budget mix planner + sampler: given target mix shares and a
    * global token `budget`, each group samples at
    * `rate_g = min(1, budget·share_g / tokens_g)` — the deterministic
    * materialization of "hit this mix under this budget" (groups whose
    * corpus can't fill their share keep everything; the underrun is the
    * caller's signal to re-weight). Group token totals are ONE tiny
    * aggregation; rates are data-dependent, so thresholds compile
    * in-plan via `format_string` (no collect) and the keep test is the
    * same engine-portable md5 compare as [[keep]]. Returns survivors
    * with their group `rate` floored to 4 decimals. */
  def budgetMixSample(df: DataFrame, id: Column, group: Column,
      tokens: Column, targetShares: Seq[(String, Double)], budget: Long,
      seed: String = "bm"): DataFrame = {
    require(budget > 0 && targetShares.forall(_._2 >= 0),
      s"budget and shares must be non-negative: $budget, $targetShares")
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df.groupBy(group.as("_g"))
      .agg(sum(tokens.cast("double")).as("_n"))
    val shares = targetShares.toDF("_g2", "_share")
    val rates = totals.join(shares, col("_g") === col("_g2"))
      .select(col("_g"), least(lit(1.0),
        lit(budget.toDouble) * col("_share") / col("_n")).as("_rate0"))
    val thr = format_string("%08x",
      least(floor(col("_rate0") * lit(4294967296.0)), lit(4294967295.0))
        .cast("long"))
    df.join(broadcast(rates), group === col("_g"))
      .filter(hashHex(concat_ws(":", lit(seed), id.cast("string"))) < thr)
      .withColumn("rate", floor(col("_rate0") * lit(10000.0)) / lit(10000.0))
      .drop("_g", "_rate0")
  }

  /** Keep-predicate for a STRATIFIED deterministic sample: each stratum
    * samples at its own rate (e.g. downsample low-quality documents,
    * keep all high-quality ones — the standard quality-pruning move).
    * `strata` maps a stratum label to its keep-rate; rows in unlisted
    * strata keep `defaultRate`. The per-row test is still one codegen'd
    * string compare — no shuffle, no state. */
  def stratifiedKeep(key: Column, stratum: Column,
      strata: Seq[(String, Double)], defaultRate: Double): Column = {
    val h = hashHex(key)
    strata.foldLeft(when(lit(false), lit(false))) {
      case (acc, (s, rate)) =>
        acc.when(stratum === s, h < lit(rateThreshold(rate)))
    }.otherwise(h < lit(rateThreshold(defaultRate)))
  }
}
