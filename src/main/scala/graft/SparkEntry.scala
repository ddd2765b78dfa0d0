package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from the SURVEY §2 inventory
  * (or a beyond-reference LLM-pipeline operator) expressed over the
  * driver's parquet tables; [[oracleSql]] carries the DuckDB-equivalent
  * ANSI SQL with IDENTICAL output column names and row ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagshipMultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (CoreQueries.pricingSummary _),
    "q02_revenue_filter" -> (CoreQueries.revenueFilter _),
    "q03_revenue_by_nation" -> (CoreQueries.revenueByNation _),
    "q04_flagship_multijoin" -> (CoreQueries.flagshipMultiJoin _),
    "q05_cust_order_stats" -> (CoreQueries.custOrderStats _),
    "q07_semi_join" -> (CoreQueries.semiJoinUrgent _),
    "q08_anti_join" -> (CoreQueries.antiJoinNoOrders _),
    "q10_child_ids" -> (CoreQueries.childIdGeneration _),
    "q11_surrogate_keys" -> (CoreQueries.surrogateKeys _),
    "q13_value_counts" -> (CoreQueries.valueCounts _),
    "q14_numeric_outliers" -> (CoreQueries.numericOutliers _),
    "q15_duplicate_detection" -> (CoreQueries.duplicateDetection _),
    "q16_symmetric_diff" -> (CoreQueries.symmetricDiff _),
    "q17_union_by_name" -> (CoreQueries.unionByNameConcat _),
  )

  /** DuckDB-equivalent SQL per query key. Output column names and ORDER BY
    * match the Spark side exactly (driver hash-compares by sorted column
    * name). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q04_flagship_multijoin" ->
      """SELECT DISTINCT r_name, nation.n_name AS n_name, n2.n_name AS supp_nation,
         c_mktsegment, o_orderpriority, p_brand, l_returnflag
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         ORDER BY 1, 2, 3, 4, 5, 6, 7""",
    "q05_cust_order_stats" ->
      """SELECT c_custkey, count(o_orderkey) AS order_count,
         round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY 1""",
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY 1""",
    "q10_child_ids" ->
      """SELECT o_orderkey, o_custkey,
         'C' || CAST(o_custkey AS VARCHAR) || '-O' || CAST(seq AS VARCHAR)
           AS sample_id
         FROM (SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS seq FROM orders)
         ORDER BY 1""",
    "q11_surrogate_keys" ->
      """SELECT p_brand, p_type,
         DENSE_RANK() OVER (ORDER BY p_brand, p_type) AS surrogate_key
         FROM (SELECT DISTINCT p_brand, p_type FROM part)
         ORDER BY 3""",
    "q13_value_counts" ->
      """SELECT o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q14_numeric_outliers" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
         FROM customer,
           (SELECT avg(c_acctbal) AS mu, stddev_pop(c_acctbal) AS sigma
            FROM customer)
         WHERE abs(c_acctbal - mu) > 1.6 * sigma
         ORDER BY 1""",
    "q15_duplicate_detection" ->
      """SELECT o_custkey, o_orderdate, count(*) AS n,
         min(o_orderkey) AS first_key
         FROM orders GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2""",
    "q16_symmetric_diff" ->
      """WITH urgent AS (SELECT DISTINCT o_custkey AS id FROM orders
             WHERE o_orderpriority = '1-URGENT'),
         low AS (SELECT DISTINCT o_custkey AS id FROM orders
             WHERE o_orderpriority = '5-LOW')
         SELECT id, 'urgent_only' AS side FROM urgent
         WHERE id NOT IN (SELECT id FROM low)
         UNION ALL
         SELECT id, 'low_only' AS side FROM low
         WHERE id NOT IN (SELECT id FROM urgent)
         ORDER BY side, id""",
    "q17_union_by_name" ->
      """SELECT c_name AS name, round(c_acctbal, 2) AS acctbal,
         CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS kind
         FROM customer
         UNION ALL
         SELECT s_name AS name, round(s_acctbal, 2) AS acctbal,
         CAST(s_nationkey AS INTEGER) AS nationkey, 'supplier' AS kind
         FROM supplier
         ORDER BY kind, name""",
  )
}
