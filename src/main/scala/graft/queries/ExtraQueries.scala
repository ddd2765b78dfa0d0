package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mmeds.{AnalysisOps, Icd}

/** Second wave of SURVEY §2 operator coverage: null-safe matching, the
  * ICD scalar-function family, levenshtein, date-range checks, the RLS
  * filter shape, distinct aggregation, per-group top-k, the
  * valid-column profile, and rollup totals. */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** NULL-safe equi-join (`<=>`): the reference matches NA cells with
    * ISNULL(col) rather than `= NULL` (sql_builder.py:184-186). */
  def nullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val proj = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        nullif(col("o_orderstatus"), lit("O")).as("st"))
      .distinct()
    val l = proj.select(col("prio").as("l_prio"), col("st"))
    val r = proj.select(col("prio").as("r_prio"), col("st").as("r_st"))
    l.join(r, col("st") <=> col("r_st"))
      .select(col("l_prio"), col("r_prio"), col("st"))
      .orderBy(col("l_prio"), col("r_prio"), col("st"))
  }

  /** ICD-code scalar parse (util.py:575-610 semantics) over synthesized
    * codes — exercises graft.mmeds.Icd end to end. */
  def icdParse(s: SparkSession, dir: String): DataFrame = {
    val code = concat(
      substring(upper(col("p_brand")), 1, 1),
      lpad((col("p_size") % 100).cast("string"), 2, "0"),
      lit("."),
      lpad((col("p_partkey") % 1000).cast("string"), 3, "0"),
      upper(substring(col("p_type"), 1, 1)))
    t(s, dir, "part")
      .select(col("p_partkey"), code.as("code"),
        Icd.firstCharacter(code).as("first_char"),
        Icd.category(code).as("category"),
        Icd.details(code).as("details"),
        Icd.extension(code).as("extension"))
      .orderBy(col("p_partkey"))
  }

  /** Levenshtein distance (util.py:1233-1234 barcode error counting). */
  def levenshteinNames(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").crossJoin(broadcast(t(s, dir, "region")))
      .select(col("n_name"), col("r_name"),
        levenshtein(col("n_name"), col("r_name")).cast("long").as("dist"),
        levenshtein(col("n_name"), lit("GERMANY")).cast("long")
          .as("dist_de"))
      .orderBy(col("n_name"), col("r_name"))

  /** Date-ordering check (validate.py:365-377 start/end shape): items
    * shipped within 30 days of their order date, per priority. */
  def dateRangeCheck(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days",
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        count(when(col("lag_days") <= 30, 1)).as("shipped_fast"),
        count(when(col("lag_days") < 0, 1)).as("invalid_range"))
      .orderBy(col("o_orderpriority"))
  }

  /** The RLS predicate shape (sql/functions.sql:33-50 owner_check):
    * user 7's view = own rows + public (user 1) rows. */
  def rlsFilter(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .filter(col("user_id").isin(7L, 1L))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("user_id"), col("event_type"))

  /** Distinct aggregation (meta-analysis regroup shape,
    * database.py:272-304). */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** Per-group top-k with deterministic tiebreak. */
  def topKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rank"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** Valid-column profile (util.py:414-465): cardinality/null stats and
    * the continuous/discrete/valid classification per column. */
  def columnProfile(s: SparkSession, dir: String): DataFrame =
    AnalysisOps.columnProfile(t(s, dir, "orders"),
      Seq("o_orderpriority", "o_orderstatus", "o_custkey", "o_totalprice"))
      .orderBy(col("column"))

  /** Long -> wide pivot (the OTU-table / LEfSe export shape,
    * util.py:1698-1762, AnalysisOps.otuLongToWide): per-customer spend
    * matrix across order priorities. Explicit pivot values keep the
    * schema static — mandatory at scale (no dry-run distinct scan). */
  def pivotWide(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .pivot("o_orderpriority", prios)
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy(col("o_custkey"))
  }

  /** Rollup totals over the region/nation hierarchy. */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"), col("revenue"))
      .orderBy(col("region"), col("nation"))
  }

  /** Skew-safe lineitem ⋈ part: salted equi-join whose output is exactly
    * the plain join (the oracle runs the unsalted SQL). */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    graft.ops.Skew.saltedEquiJoin(
        li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        col("l_partkey"),
        concat_ws("-", col("l_orderkey"), col("l_linenumber")),
        p, col("p_partkey"), buckets = 8)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("p_partkey"), col("p_brand"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
}
