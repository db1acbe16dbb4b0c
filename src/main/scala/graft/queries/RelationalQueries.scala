package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational query surface: scan / filter / project / aggregate / join
  * (broadcast + shuffle) / window / sort / top-k / set ops / cube / pivot /
  * semi-anti. The reference itself delegates all querying to Spark
  * (SURVEY.md §2.5: its only latent query is the OLAP MDX crosstab,
  * reproduced here as `q_cube_category_year`); this suite is the engine's
  * query capability layer over the driver test tables, each entry paired with
  * a DuckDB oracle in [[RelationalQueries.oracles]].
  *
  * Determinism contract with the oracle (driver hashes values):
  *   - every money/measure aggregate is computed in DECIMAL(18,2) (exact,
  *     order-independent) and cast to DOUBLE at the end — double-sum ordering
  *     nondeterminism can never flip a bit;
  *   - every query ends in a total ORDER BY (unique tie-break key);
  *   - column names are aliased identically on both sides.
  *
  * Scale notes are on each query: the small sides (region/nation/supplier/
  * part at any SF — they grow sublinearly or are bounded) are broadcast
  * explicitly; large-large joins shuffle on their equi-keys; aggregations are
  * partial (map-side combine) by construction of the DataFrame API.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** money in LONG integer cents (per-row products are primitive 64-bit) */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** sum of cents products in DECIMAL(38,0): exact at ANY row count (no
    * 2^63 overflow at extreme SF) while Spark's Decimal add stays on its
    * compact-long fast path until a partial sum actually outgrows a long —
    * the per-row cost drops from decimal multiply to long multiply. */
  private def sumCents(prod: Column): Column = sum(prod.cast("decimal(38,0)"))
  private def d(c: Column): Column = c.cast("double")

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: single scan of lineitem, partial agg
    * before the 6-group shuffle. Filter pushed to parquet.
    */
  val q1PricingSummary: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (d(sumCents(cents(col("l_quantity")))) / 100.0).as("sum_qty"),
        (d(sumCents(cents(col("l_extendedprice")))) / 100.0).as("sum_base_price"),
        (d(sumCents(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))))
          / 10000.0).as("sum_disc_price"),
        (d(sumCents(cents(col("l_quantity")))) / 100.0 / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style: shuffle join orders⋈lineitem on orderkey with customer
    * broadcast; top-10 by revenue. At 100 TB: customer filter first (segment
    * selectivity ~1/5), broadcast only if the filtered dim fits — here
    * customer is the smallest fact-adjacent dim, so hint it.
    */
  val q3TopRevenue: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg((d(sumCents(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))))
        / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 5-way join; region/nation/supplier broadcast (bounded
    * cardinality at any SF), customer⋈orders⋈lineitem shuffle on their keys.
    */
  val q5LocalSupplierVolume: Q = (spark, dir) => {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val sup = Tables(spark, dir, "supplier")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((d(sumCents(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))))
        / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Selective filter + narrow projection — exists to prove pushdown/pruning:
    * the parquet scan must show PushedFilters + a 4-column ReadSchema.
    */
  val qFilterProject: Q = (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Top-3 orders per customer by totalprice — ranking window. One shuffle on
    * o_custkey; no driver-side work.
    */
  val qWindowTopPerCustomer: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Per-customer running order total — frame window with exact decimal
    * accumulation (order-sensitive but tie-broken to a total order).
    */
  val qWindowRunningSum: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .withColumn("running_total", d(sum(dec(col("o_totalprice"))).over(w)))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distinct aggregation: market segments with exact distinct nation counts.
    * countDistinct expands to a two-stage agg (no driver collect).
    */
  val qDistinctAgg: Q = (spark, dir) =>
    Tables(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"),
        d(sum(dec(col("c_acctbal")))).as("sum_acctbal"))
      .orderBy(col("c_mktsegment"))

  /** Set op EXCEPT: customers with 'F' orders but no 'O' orders. */
  val qExcept: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(ord.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** Set op INTERSECT: customers with both 'F' and 'O' orders. */
  val qIntersect: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(ord.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** CUBE over (order year, priority) — the materialization of the
    * reference's latent OLAP MDX crosstab (sources.yaml:55: category ×
    * calendar_year cube), expressed on the driver's fact table.
    */
  val qCubeCategoryYear: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .cube(col("order_year"), col("o_orderpriority"))
      .agg(d(sum(dec(col("o_totalprice")))).as("sales"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("order_year").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Pivot order status into columns per year (conditional aggregation —
    * one pass, no join).
    */
  val qPivotStatus: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .groupBy(col("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(d(sum(dec(col("o_totalprice")))))
      .orderBy(col("order_year"))

  /** Anti join: customers with no orders (NOT EXISTS). */
  val qAntiJoin: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Semi join: parts that appear in any lineitem (EXISTS). Semi stops at
    * first match — no fact-side row explosion.
    */
  val qSemiJoin: Q = (spark, dir) => {
    val part = Tables(spark, dir, "part")
    val li = Tables(spark, dir, "lineitem")
    part.join(li, part("p_partkey") === li("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** Histogram-of-histogram: orders-per-customer distribution. Two
    * aggregations; the second one is tiny (bounded by max order count).
    */
  val qOrdersPerCustomerHist: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))
  }

  /** Hourly event rollup — the batch shape of the streaming windowed agg
    * (see graft.streaming): date_trunc + groupBy, partial-agg friendly.
    */
  val qEventsHourly: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), d(sum(dec(col("value")))).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** JSON scalar extraction from the events.props payload (get_json_object →
    * codegen'd path, no UDF).
    */
  val qEventsJson: Q = (spark, dir) =>
    Tables(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Join-reorder/pruning showcase: revenue by region name (all dims
    * broadcast, single fact pass).
    */
  val qRegionRollup: Q = (spark, dir) => {
    val region = Tables(spark, dir, "region")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(d(sum(dec(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** ROLLUP variant of the cube (year ⊃ priority hierarchy). */
  val qRollup: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .rollup(col("order_year"), col("o_orderpriority"))
      .agg(d(sum(dec(col("o_totalprice")))).as("sales"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("order_year").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** UNION ALL of two tagged aggregates (bag semantics, no dedup shuffle). */
  val qUnionAll: Q = (spark, dir) => {
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    ord.groupBy(col("o_orderstatus").as("k"))
      .agg(count(lit(1)).as("n")).withColumn("src", lit("orders"))
      .unionAll(
        li.groupBy(col("l_returnflag").as("k"))
          .agg(count(lit(1)).as("n")).withColumn("src", lit("lineitem")))
      .orderBy(col("src"), col("k"))
  }

  /** Error bounds for the sketch-vs-exact oracle check. HLL default rsd is
    * 5% (≈2σ at 10%); KMV with k=256 has σ ≈ 1/√256 = 6.25% (≈2.4σ at 15%).
    * Both sketches are deterministic (fixed hash functions), so a local pass
    * at a given SF is exactly reproducible in the driver gate.
    */
  val HllTolerance = 0.10
  val KmvTolerance = 0.15

  /** HLL sketch distinct (approx_count_distinct) + KMV sketch next to the
    * exact count — the mergeable-sketch path for 100 TB distincts. DuckDB's
    * HLL differs bit-wise, so the oracle checks the CONTRACT instead: the
    * output carries booleans "sketch within tolerance of exact", which the
    * oracle reproduces as literal TRUE alongside the exact counts — a
    * hash-exact comparison iff both sketches honor their error bounds.
    */
  val qApproxDistinct: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    // sketches in one expand-free agg (no DISTINCT aggregate in the frame);
    // the exact count runs as dedup-then-count and joins back on the 3
    // group keys — mixing countDistinct into the sketch agg forced an
    // Expand ×3 of the whole fact input
    val sketches = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("hll_parts"),
        graft.functions.KmvDistinct.kmvDistinct(col("l_partkey"), 256)
          .as("kmv_parts"))
    val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_parts"))
    sketches.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("hll_parts") - col("exact_parts")) <=
          col("exact_parts") * HllTolerance).as("hll_ok"),
        (abs(col("kmv_parts") - col("exact_parts")) <=
          col("exact_parts") * KmvTolerance).as("kmv_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Scalar string-function surface in one projection (concat, substring,
    * case, pad, trim, replace, split, length, reverse, position).
    */
  val qStringFuncs: Q = (spark, dir) =>
    Tables(spark, dir, "part")
      .select(col("p_partkey"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pref"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_brand"), 12, "_").as("brand_pad"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_type"), "BRUSHED").as("brushed_pos"),
        size(split(col("p_type"), " ")).as("type_words"))
      .orderBy(col("p_partkey"))

  /** Scalar date/time-function surface (year/quarter/month/day, dow, trunc,
    * diff, add, last_day, epoch).
    */
  val qDateFuncs: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        last_day(col("o_orderdate")).as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  /** Analytic window-function surface beyond rank/sum: lag/lead with
    * defaults, first/last over a running frame, ntile, percent_rank,
    * cume_dist — one shuffle on the partition key.
    */
  val qWindowFuncs: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1, -1.0).over(w).as("next_price"),
        first(col("o_orderkey")).over(wRun).as("first_key"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val windowFuncsOracle: String =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1, -1.0) OVER w AS next_price,
      |  first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Array-function surface over the embedding vectors, reduced to scalar
    * outputs (the driver compare cannot hash array cells): size, element
    * access, head-slice sum, extrema, containment. The head sum is an
    * explicit left-to-right element chain — an `aggregate` HOF lambda would
    * be interpreted, the one thing this repo keeps off hot paths.
    */
  val qArrayFuncs: Q = (spark, dir) => {
    val v = col("embedding").cast("array<double>")
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        size(v).as("dim"),
        v.getItem(0).as("first_elem"),
        element_at(v, -1).as("last_elem"),
        array_max(v).as("max_elem"),
        array_min(v).as("min_elem"),
        (((lit(0.0) + element_at(v, 1)) + element_at(v, 2)) +
          element_at(v, 3) + element_at(v, 4)).as("head4_sum"),
        array_position(v, array_max(v)).as("argmax1"))
      .orderBy(col("vec_id"))
  }

  private val arrayFuncsOracle: String =
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_elem,
      |  CAST(embedding[-1] AS DOUBLE) AS last_elem,
      |  CAST(list_max(embedding) AS DOUBLE) AS max_elem,
      |  CAST(list_min(embedding) AS DOUBLE) AS min_elem,
      |  list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))) AS head4_sum,
      |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax1
      |FROM embeddings ORDER BY vec_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q_window_funcs" -> qWindowFuncs,
    "q_array_funcs" -> qArrayFuncs,
    "q_string_funcs" -> qStringFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_rollup" -> qRollup,
    "q_union_all" -> qUnionAll,
    "q_approx_distinct" -> qApproxDistinct,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_top_revenue" -> q3TopRevenue,
    "q5_local_supplier_volume" -> q5LocalSupplierVolume,
    "q_filter_project" -> qFilterProject,
    "q_window_top_per_customer" -> qWindowTopPerCustomer,
    "q_window_running_sum" -> qWindowRunningSum,
    "q_distinct_agg" -> qDistinctAgg,
    "q_except" -> qExcept,
    "q_intersect" -> qIntersect,
    "q_cube_category_year" -> qCubeCategoryYear,
    "q_pivot_status" -> qPivotStatus,
    "q_anti_join" -> qAntiJoin,
    "q_semi_join" -> qSemiJoin,
    "q_orders_per_customer_hist" -> qOrdersPerCustomerHist,
    "q_events_hourly" -> qEventsHourly,
    "q_events_json" -> qEventsJson,
    "q_region_rollup" -> qRegionRollup
  )

  /** DuckDB-dialect oracles, value-identical by construction (decimal
    * aggregation + total ordering + matching aliases).
    */
  val oracles: Map[String, String] = Map(
    "q_window_funcs" -> windowFuncsOracle,
    "q_array_funcs" -> arrayFuncsOracle,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 5) AS name_pref,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  lpad(p_brand, 12, '_') AS brand_pad,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  reverse(p_brand) AS brand_rev,
        |  CAST(strpos(p_type, 'BRUSHED') AS INT) AS brushed_pos,
        |  CAST(len(string_split(p_type, ' ')) AS INT) AS type_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS d,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
        |    AS days_to_2002,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
        |ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_union_all" ->
      """SELECT * FROM (
        |  SELECT o_orderstatus AS k, count(*) AS n, 'orders' AS src
        |  FROM orders GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT l_returnflag AS k, count(*) AS n, 'lineitem' AS src
        |  FROM lineitem GROUP BY l_returnflag) t
        |ORDER BY src, k""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q_cube_category_year" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (year(o_orderdate), o_orderpriority)
        |ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS F,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS O,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS P
        |FROM orders GROUP BY year(o_orderdate) ORDER BY order_year""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q_orders_per_customer_hist" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, event_type
        |ORDER BY hour, event_type""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS max_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  true AS hll_ok,
        |  true AS kmv_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_region_rollup" ->
      """SELECT r_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
