package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational query surface, exercising the operator classes of
  * SURVEY.md §2 (scans, filters, equi-joins of every flavor, aggregations,
  * window-shaped ID logic, set ops) against the driver's TPC-H-ish tables.
  *
  * Design rules applied throughout (100 TB mindset):
  *   - dimension tables (region/nation/customer/supplier/part) are
  *     explicitly `broadcast()` — no shuffle for the dim side of a join;
  *   - aggregates are declared with `groupBy.agg` so Catalyst plans
  *     partial (map-side) aggregation before the exchange;
  *   - every query ends in a total ORDER BY over a unique key combo so the
  *     result is deterministic for the DuckDB oracle hash-compare;
  *   - double-typed aggregates are `round()`ed to absorb summation-order
  *     float noise between engines.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Pricing summary (TPC-H Q1 shape): the canonical partial-agg pipeline.
    * SURVEY §2.5 aggregations (sum/avg/count per group). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Predicate-pushdown scan (TPC-H Q6 shape): filter + 2-column projection
    * must reach the parquet reader (SURVEY §2.2). */
  def revenueFilter(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))
  }

  /** Fact-to-dims join + agg: revenue per region/nation. Dims broadcast.
    * SURVEY §2.4 FK equi-join chains (SpecimenView shape). */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Flagship wide join: 7 tables, DISTINCT — the `SpecimenTable` /
    * `MetaAnalysisView` shape (SURVEY §2.4, sql/views.sql:77-84 in the
    * reference). Facts shuffle on their join keys; every dim broadcasts. */
  def flagshipMultiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    val p = broadcast(t(s, dir, "part"))
    val sup = broadcast(t(s, dir, "supplier"))
    val n2 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_nationkey"),
        col("n_name").as("supp_nation")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n2, col("s_nationkey") === col("sn_nationkey"))
      .select(col("r_name"), col("n_name"), col("supp_nation"),
        col("c_mktsegment"), col("o_orderpriority"), col("p_brand"),
        col("l_returnflag"))
      .distinct()
      .orderBy(col("r_name"), col("n_name"), col("supp_nation"),
        col("c_mktsegment"), col("o_orderpriority"), col("p_brand"),
        col("l_returnflag"))
  }

  /** Left-outer join + per-parent child counts (SURVEY §2.5 per-parent
    * counts; keeps parents with zero children). */
  def custOrderStats(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("order_count"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2)
          .as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** Full-outer join on a coalesced key: the `join_metadata` shape
    * (SURVEY §2.4, util.py:166-182 — subject ⟗ specimen with coalesced
    * subject id). Per-nation customer vs supplier profiles; either side
    * may be absent. */
  def fullOuterNationProfile(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = t(s, dir, "supplier")
      .filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, col("ck") === col("sk"), "full_outer")
      .select(
        coalesce(col("ck"), col("sk")).cast("int").as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  /** Derived-weight view replacing the reference's SQL triggers
    * (SURVEY §2.9, sql/triggers.sql:5-36): effective remaining weight =
    * initial − Σ(child weights), computed as an aggregation instead of
    * mutation-on-insert. Order total vs its lineitems' gross charge. */
  def derivedWeights(s: SparkSession, dir: String): DataFrame = {
    // Integer-cents arithmetic: each charge floors to a BIGINT before the
    // sum, so the aggregate is order-independent (exact) across engines —
    // a double sum re-rounded to 2dp tie-flips on partition order.
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0)).cast("long")).as("consumed_cents"))
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(100.0)).cast("long")
          .as("initial_cents"),
        coalesce(col("consumed_cents"), lit(0L)).as("consumed_cents"),
        (floor(col("o_totalprice") * lit(100.0)).cast("long") -
          coalesce(col("consumed_cents"), lit(0L))).as("remaining_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** Left-semi join: existence check (SURVEY §2.4 check_repeated_subjects
    * shape — `WHERE EXISTS`). */
  def semiJoinUrgent(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join: NOT EXISTS (customers with no high-value order). */
  def antiJoinNoOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Window row_number: human-readable child-ID generation, the
    * `{SpecimenID}-Aliquot{n}` pattern of SURVEY §2.6
    * (reference database.py:623-699). Partition by parent key, order by a
    * deterministic (date, id) tiebreak. */
  def childIdGeneration(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("seq", row_number().over(w))
      .select(col("o_orderkey"), col("o_custkey"),
        concat(lit("C"), col("o_custkey").cast("string"), lit("-O"),
          col("seq").cast("string")).as("sample_id"))
      .orderBy(col("o_orderkey"))
  }

  /** Dense-rank surrogate-key assignment over distinct natural keys
    * (SURVEY §2.6, metadata_uploader.py:282-311 shape). Dim-sized input:
    * the single-partition window is deliberate and documented. */
  def surrogateKeys(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("p_brand"), col("p_type"))
    t(s, dir, "part")
      .select(col("p_brand"), col("p_type")).distinct()
      .withColumn("surrogate_key", dense_rank().over(w).cast("long"))
      .orderBy(col("surrogate_key"))
  }

  /** Value-frequency profile of a categorical column (SURVEY §2.5
    * value_counts; validate.py:153-166). */
  def valueCounts(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))
  }

  /** ±2σ numeric outlier detection (SURVEY §2.5; validate.py:137-151).
    * Stats computed once, broadcast back over the column. */
  def numericOutliers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val stats = c.agg(
      avg(col("c_acctbal")).as("mu"),
      stddev_pop(col("c_acctbal")).as("sigma"))
    c.crossJoin(broadcast(stats))
      .filter(abs(col("c_acctbal") - col("mu")) > lit(1.6) * col("sigma"))
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Duplicate detection within a partition key (SURVEY §2.5;
    * validate.py:222-252 — duplicates per sequencing run). */
  def duplicateDetection(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("first_key"))
      .filter(col("n") > 1)
      .orderBy(col("o_custkey"), col("o_orderdate"))
  }

  /** Symmetric difference with side-tag (SURVEY §2.8 subject
    * reconciliation, validate.py:629-652). Anti-joins in both directions. */
  def symmetricDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("id")).distinct()
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_custkey").as("id")).distinct()
    val onlyU = urgent.join(low, Seq("id"), "left_anti")
      .withColumn("side", lit("urgent_only"))
    val onlyL = low.join(urgent, Seq("id"), "left_anti")
      .withColumn("side", lit("low_only"))
    onlyU.unionByName(onlyL).orderBy(col("side"), col("id"))
  }

  /** Schema-aligned union (SURVEY §2.8 subject concat —
    * `unionByName(allowMissingColumns)`). */
  def unionByNameConcat(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      col("c_name").as("name"), round(col("c_acctbal"), 2).as("acctbal"),
      col("c_nationkey").cast("int").as("nationkey"),
      lit("customer").as("kind"))
    val sup = t(s, dir, "supplier").select(
      col("s_name").as("name"), round(col("s_acctbal"), 2).as("acctbal"),
      col("s_nationkey").cast("int").as("nationkey"),
      lit("supplier").as("kind"))
    c.unionByName(sup).orderBy(col("kind"), col("name"))
  }
}
