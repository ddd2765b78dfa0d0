package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator for LARGER scale factors than
  * the driver ships (TESTDATA.md stops at sf0.1) — so ARCHITECTURE.md
  * can pin a MEASURED (not extrapolated) 10× point for every query
  * family. Reproduces the driver tables' schemas, key ranges, and
  * marginal distributions (profiled from sf0.01/sf0.1): same column
  * names/types, same 5/25 fixed dims, same 31-word document vocabulary,
  * same fixed 30-day event window with user count scaling, exact-dup
  * and near-dup document structure, label-clustered embeddings.
  * Randomness is seeded hash arithmetic (`xxhash64` of the row id and a
  * salt) — no RNG state, so any row regenerates identically anywhere.
  *
  * Usage: `sbt "runMain graft.GenData /tmp/graft_sf1 10"` — the factor
  * is relative to sf0.1 (10 → ~6M lineitem rows).
  *
  * TWO deliberate deviations, both for measurement value: document
  * `source` cardinality AND vocabulary size scale with the corpus
  * (20 sources / 31 words at factor 1 → 200 / 310 at factor 10) so the
  * per-block document density and the per-pair word-set similarity stay
  * at their sf0.1 operating points. With both fixed, a 10× corpus
  * degenerates in two opposite ways at once: every token saturates the
  * df-256 candidate cap (pair stage measures an empty join) and every
  * document's word set converges on the full vocabulary (the TRUE
  * near-dup answer becomes quadratic in the corpus — measured before
  * this fix: qd30 alone was 1 625 s / 5.2 GB shuffle at sf1, 82% of the
  * sweep, all of it honest output). Neither says anything about plan
  * scaling; density-preserving growth does.
  *
  * A measurement tool, not part of the declared operator surface.
  */
object GenData {

  /** Deterministic uniform in [0, 1) from (seed column, salt). */
  private def u(seed: Column, salt: String): Column =
    pmod(xxhash64(seed, lit(salt)), lit(1000000000L)).cast("double") /
      lit(1.0e9)

  /** Deterministic long in [0, n) from (seed column, salt). */
  private def h(seed: Column, salt: String, n: Long): Column =
    pmod(xxhash64(seed, lit(salt)), lit(n))

  private def pick(seed: Column, salt: String, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*),
      (h(seed, salt, vals.size.toLong) + 1).cast("int"))

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val factor = if (args.length > 1) args(1).toDouble else 10.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def n(base: Long): Long = (base * factor).toLong

    def ids(rows: Long, parts: Int): org.apache.spark.sql.DataFrame =
      spark.range(0, rows, 1, parts).toDF("id")

    // region / nation: the fixed dims (sf-invariant in the testdata)
    spark.createDataFrame(Seq(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA",
        3 -> "EUROPE", 4 -> "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/region.parquet")
    spark.createDataFrame((0 until 25).map(i => (i, s"NATION_$i", i % 5)))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/nation.parquet")

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    ids(n(15000), 4).select(
        col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        h(col("id"), "cnat", 25).cast("int").as("c_nationkey"),
        round(lit(-1000.0) + u(col("id"), "cbal") * 11000.0, 2)
          .as("c_acctbal"),
        pick(col("id"), "cseg", segs).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    ids(n(1000), 2).select(
        col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        h(col("id"), "snat", 25).cast("int").as("s_nationkey"),
        round(u(col("id"), "sbal") * 10000.0, 2).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    val adjs = Seq("small", "large", "red", "blue", "green", "shiny")
    val nouns = Seq("ring", "widget", "bolt", "gear", "cog", "pin")
    val types = Seq("ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO")
    ids(n(20000), 4).select(
        col("id").as("p_partkey"),
        concat(pick(col("id"), "padj", adjs), lit(" "),
          pick(col("id"), "pnoun", nouns)).as("p_name"),
        format_string("Brand#%d", h(col("id"), "pbr", 25) + 1).as("p_brand"),
        pick(col("id"), "ptyp", types).as("p_type"),
        (h(col("id"), "psz", 50) + 1).cast("int").as("p_size"),
        round(lit(900.0) + col("id") * 0.1, 2).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    val nCust = n(15000)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val day = 86400L * 1000000L // microseconds
    val ordBase = 788918400L * 1000000L // 1995-01-01 UTC
    ids(n(150000), 8).select(
        col("id").as("o_orderkey"),
        h(col("id"), "ocust", nCust).as("o_custkey"),
        pick(col("id"), "ost", Seq("O", "F", "P")).as("o_orderstatus"),
        round(lit(1000.0) + u(col("id"), "otot") * 499000.0, 2)
          .as("o_totalprice"),
        timestamp_micros(lit(ordBase) +
          h(col("id"), "odate", 2400) * day).as("o_orderdate"),
        pick(col("id"), "oprio", prios).as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    val nOrd = n(150000); val nPart = n(20000); val nSupp = n(1000)
    ids(n(600000), 32).select(
        h(col("id"), "lord", nOrd).as("l_orderkey"),
        h(col("id"), "lpart", nPart).as("l_partkey"),
        h(col("id"), "lsupp", nSupp).as("l_suppkey"),
        (h(col("id"), "lln", 7) + 1).cast("int").as("l_linenumber"),
        (h(col("id"), "lqty", 50) + 1).cast("double").as("l_quantity"),
        round(lit(900.0) + u(col("id"), "lext") * 104100.0, 2)
          .as("l_extendedprice"),
        (h(col("id"), "ldisc", 11).cast("double") / 100.0).as("l_discount"),
        (h(col("id"), "ltax", 9).cast("double") / 100.0).as("l_tax"),
        pick(col("id"), "lrf", Seq("A", "N", "R")).as("l_returnflag"),
        pick(col("id"), "lls", Seq("O", "F")).as("l_linestatus"),
        timestamp_micros(lit(ordBase) + day +
          h(col("id"), "lship", 2500) * day).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // events: FIXED 30-day window (sf-invariant in the testdata),
    // user count scales 1500 -> 15000
    val evBase = 1704067200L * 1000000L // 2024-01-01 UTC
    val evTypes = Seq("click", "view", "purchase", "signup", "error")
    val nUsers = n(1500)
    ids(n(100000), 8).select(
        col("id").as("event_id"),
        timestamp_micros(lit(evBase) +
          h(col("id"), "ets", 30L * 86400L * 1000000L)).as("ts"),
        h(col("id"), "euser", nUsers).as("user_id"),
        pick(col("id"), "etyp", evTypes).as("event_type"),
        round(lit(0.01) + u(col("id"), "eval") * u(col("id"), "eval2")
          * 500.0, 2).as("value"),
        format_string("{\"k\": %d}", h(col("id"), "ek", 100)).as("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // documents: the testdata's 31-word vocabulary extended with
    // synthetic tokens so vocabulary scales with the corpus (see the
    // header note), 10-109 tokens, ~12% exact dups sharing a 7-block
    // leader's seed, a slice of near-dups (same seed, one token
    // shorter), source cardinality scaled with the corpus
    val baseWords = Seq("the", "a", "key", "agg", "row", "scan", "slow",
      "fast", "table", "value", "part", "hash", "merge", "batch", "line",
      "sort", "win", "spark", "join", "shuffle", "filter", "group",
      "order", "limit", "index", "plan", "stage", "task", "byte",
      "cache", "disk")
    val vocabSize = math.max(baseWords.size,
      (baseWords.size * factor).toInt)
    val words = baseWords ++
      (baseWords.size until vocabSize).map(i => s"tok$i")
    val langs = Seq("en", "en", "en", "en", "de", "de", "fr", "fr",
      "es", "zh")
    val nSources = math.max(20L, (20 * factor).toLong)
    val vocab = array(words.map(lit): _*)
    val docSeed = when(u(col("id"), "ddup") < 0.12,
      expr("(id div 7) * 7")).otherwise(col("id"))
    val nTok = (h(docSeed, "dlen", 100) + 10).cast("int")
    val nTok2 = when(u(col("id"), "dtrim") < 0.05, nTok - 1).otherwise(nTok)
    ids(n(5000), 8)
      .withColumn("_seed", docSeed)
      .withColumn("_n", nTok2)
      .select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), col("_n") - 1), i =>
          element_at(vocab,
            (pmod(xxhash64(col("_seed"), lit("dw"), i),
              lit(words.size.toLong)) + 1).cast("int"))), " ").as("text"),
        pick(col("id"), "dlang", langs).as("lang"),
        format_string("src%d", h(col("id"), "dsrc", nSources)).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: 64-dim float vectors clustered around 10 label
    // centers (center ± noise), count follows the testdata's trajectory
    val dim = 64
    ids(n(2000), 4)
      .withColumn("label", h(col("id"), "elab", 10).cast("int"))
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((pmod(xxhash64(col("label"), lit("ec"), i), lit(1000L))
              .cast("double") / 1000.0 - 0.5) * 0.4 +
            (pmod(xxhash64(col("id"), lit("en"), i), lit(1000L))
              .cast("double") / 1000.0 - 0.5) * 0.2).cast("float"))
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"generated factor=$factor at $out")
    spark.stop()
  }
}
