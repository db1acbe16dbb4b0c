package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 relational widening: the classic subquery shapes (EXISTS with
  * aggregation, correlated scalar subquery, HAVING, NOT IN, CTE + scalar
  * max), FULL OUTER join, and the regexp / math-bit scalar surfaces —
  * each expressed as the decorrelated join formulation Catalyst would plan
  * anyway, with a DuckDB oracle in the original subquery dialect (so the
  * oracle double-checks the decorrelation is semantics-preserving).
  *
  * Determinism contract matches [[RelationalQueries]]: decimal aggregation
  * for money, exact-integral doubles for quantities, total ORDER BY, aliases
  * mirrored on both sides.
  */
object SubqueryQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def d(c: Column): Column = c.cast("double")

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q6 shape: tight scan-local filter + single-row aggregate. The
    * point at 100 TB: every predicate (date range, discount band, quantity
    * cap) pushes to the parquet scan — zero shuffle, one partial-agg tree.
    */
  val q6ForecastRevenue: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(d(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4 shape: EXISTS-with-aggregation — orders (in a half-year) that
    * have at least one returned lineitem, counted by priority. The EXISTS
    * decorrelates to a LEFT SEMI join on the order key: no row explosion
    * when an order has many matching lineitems, one shuffle on l_orderkey.
    */
  val q4PriorityExists: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q17 shape: correlated scalar subquery (per-part average quantity)
    * → decorrelated to an aggregate + equi-join on the correlation key.
    * Quantities are integral-valued doubles, so avg = exact-sum / count is
    * order-independent and bit-identical across engines. At scale the
    * per-part aggregate is small (∝ |part|) — AQE broadcast-joins it back.
    */
  val q17SmallQuantity: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val avgQ = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(avgQ, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(d(sum(dec(col("l_extendedprice")))).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18 shape: HAVING over a fact aggregate, joined back to the
    * dimension rows — large orders (Σ quantity > 300) with their customer.
    * The HAVING filter runs on the aggregate BEFORE the joins, so only
    * qualifying order keys (a tiny set) reach the join — broadcast-able.
    */
  val q18BigOrders: Q = (spark, dir) => {
    val big = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** TPC-H Q14 shape: conditional aggregation (CASE inside SUM) — promo
    * revenue share by ship year. One fact pass; part joins on the equi-key
    * (grows with SF — no broadcast hint, AQE decides).
    */
  val q14PromoRevenue: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    // LONG integer cents (the q9 pattern): per-row products <= 1e9, group
    // sums <= ~6e14 — exact 64-bit arithmetic on the codegen fast path,
    // one double conversion of the exact integer at the end
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    val discCents = cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .withColumn("ship_year", year(col("l_shipdate")))
      .groupBy(col("ship_year"))
      .agg(
        (d(coalesce(sum(when(col("p_type") === "PROMO", discCents)), lit(0L)))
          / 10000.0).as("promo_revenue"),
        (d(sum(discCents)) / 10000.0).as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
      .orderBy(col("ship_year"))
  }

  /** TPC-H Q15 shape via the SQL entry path: CTE + scalar-subquery max —
    * the top supplier(s) by quarterly revenue. Exercises the parser /
    * analyzer route (CTE reuse, uncorrelated scalar subquery) rather than
    * the DataFrame builder.
    */
  val q15TopSupplier: Q = (spark, dir) => {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    Tables(spark, dir, "supplier").createOrReplaceTempView("q15_supplier")
    spark.sql(
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_rev
        |  FROM q15_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM q15_supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** FULL OUTER join of two sparse per-nation aggregates (deep-debit
    * customers vs high-balance suppliers): nations present on only one side
    * surface the null-padding semantics. Both inputs are post-aggregate
    * (≤ |nation| rows) — broadcast-able; the fact scans do the real work.
    */
  val qFullOuterJoin: Q = (spark, dir) => {
    val custSide = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") < -500)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_debit_cust"))
    val supSide = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_rich_supp"))
    custSide.join(supSide, col("c_nationkey") === col("s_nationkey"),
        "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_debit_cust"), col("n_rich_supp"))
      .orderBy(col("nationkey"))
  }

  /** NOT IN over a subquery of non-null keys (safe to decorrelate to
    * LEFT ANTI): customers outside region 0's nations, counted by segment.
    * The nation exclusion list is bounded — broadcast anti join.
    */
  val qNotInSubquery: Q = (spark, dir) => {
    val excluded = Tables(spark, dir, "nation")
      .filter(col("n_regionkey") === 0)
      .select(col("n_nationkey"))
    Tables(spark, dir, "customer")
      .join(broadcast(excluded), col("c_nationkey") === col("n_nationkey"),
        "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Regexp scalar surface (extract / match-test / replace-count / split via
    * regexp) — constructs restricted to syntax that parses identically in
    * Java regex and RE2 (see NOTES.md determinism contract).
    */
  val qRegexpFuncs: Q = (spark, dir) =>
    Tables(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
        col("p_name").rlike("[0-9]").as("has_digit"),
        length(regexp_replace(lower(col("p_name")), "[^aeiou]", ""))
          .as("n_vowels"),
        regexp_replace(col("p_type"), "(STANDARD|PROMO)", "X").as("type_norm"))
      .orderBy(col("p_partkey"))

  private val regexpFuncsOracle: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
      |  regexp_matches(p_name, '[0-9]') AS has_digit,
      |  CAST(length(regexp_replace(lower(p_name), '[^aeiou]', '', 'g')) AS INT)
      |    AS n_vowels,
      |  regexp_replace(p_type, '(STANDARD|PROMO)', 'X', 'g') AS type_norm
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Math + bitwise scalar surface, restricted to operations with a single
    * correct IEEE-754 answer on both engines (sqrt is exactly rounded;
    * abs/sign/ceil/floor/mod/bit ops are integer-exact) — no libm-dependent
    * transcendentals (exp/ln/pow), whose last-bit rounding may differ.
    */
  val qMathBitFuncs: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        abs(col("o_totalprice") - 150000.0).as("abs_dev"),
        signum(col("o_totalprice") - 150000.0).cast("int").as("sign_dev"),
        ceil(col("o_totalprice")).as("price_ceil"),
        floor(col("o_totalprice")).as("price_floor"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        (col("o_orderkey") % 7).as("key_mod7"),
        col("o_orderkey").bitwiseXOR(255L).as("key_xor"),
        col("o_orderkey").bitwiseAND(1023L).as("key_and"),
        shiftleft(col("o_custkey"), 2).as("cust_shl2"),
        greatest(col("o_totalprice"), lit(100000.0)).as("price_floor100k"))
      .orderBy(col("o_orderkey"))

  private val mathBitFuncsOracle: String =
    """SELECT o_orderkey,
      |  abs(o_totalprice - 150000.0) AS abs_dev,
      |  CAST(sign(o_totalprice - 150000.0) AS INT) AS sign_dev,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  sqrt(o_totalprice) AS price_sqrt,
      |  o_orderkey % 7 AS key_mod7,
      |  xor(o_orderkey, 255) AS key_xor,
      |  o_orderkey & 1023 AS key_and,
      |  o_custkey << 2 AS cust_shl2,
      |  greatest(o_totalprice, 100000.0) AS price_floor100k
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Salted skew join surfaced as an oracle-checked query: lineitem ⋈
    * supplier through `SkewJoin.saltedJoin` (probe salted ×8, build
    * replicated ×8 → the hot key's rows spread over 8 shuffle partitions),
    * aggregated per nation. The oracle is the PLAIN join — hash equality
    * proves salting is result-invisible.
    */
  val qSkewJoin: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.operators.SkewJoin.saltedJoin(li, sup, Seq("suppkey"), factor = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        d(sum(dec(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("s_nationkey"))
  }

  val all: Map[String, Q] = Map(
    "q_skew_join" -> qSkewJoin,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q4_priority_exists" -> q4PriorityExists,
    "q17_small_quantity" -> q17SmallQuantity,
    "q18_big_orders" -> q18BigOrders,
    "q14_promo_revenue" -> q14PromoRevenue,
    "q15_top_supplier" -> q15TopSupplier,
    "q_full_outer_join" -> qFullOuterJoin,
    "q_not_in_subquery" -> qNotInSubquery,
    "q_regexp_funcs" -> qRegexpFuncs,
    "q_math_bit_funcs" -> qMathBitFuncs
  )

  val oracles: Map[String, String] = Map(
    "q_skew_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q17_small_quantity" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  count(*) AS n_items
        |FROM lineitem l
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
        |                    WHERE l_partkey = l.l_partkey)""".stripMargin,
    "q18_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) b
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
        |  CAST(coalesce(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1 - l_discount) * 100) AS BIGINT) END), 0) AS DOUBLE) / 10000.0
        |    AS promo_revenue,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0
        |    AS total_revenue,
        |  100.0 * (CAST(coalesce(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1 - l_discount) * 100) AS BIGINT) END), 0) AS DOUBLE) / 10000.0) /
        |    (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0)
        |    AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY year(l_shipdate)
        |ORDER BY ship_year""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_full_outer_join" ->
      """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  n_debit_cust, n_rich_supp
        |FROM (SELECT c_nationkey, count(*) AS n_debit_cust
        |      FROM customer WHERE c_acctbal < -500 GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey, count(*) AS n_rich_supp
        |      FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) s
        |ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_not_in_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_nationkey NOT IN
        |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_regexp_funcs" -> regexpFuncsOracle,
    "q_math_bit_funcs" -> mathBitFuncsOracle
  )
}
