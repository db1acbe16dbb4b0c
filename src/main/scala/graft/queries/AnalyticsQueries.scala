package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 relational + scalar-surface widening: TPC-H Q7/Q10/Q19 shapes
  * (nation-pair OR, returned-item top-k, disjunctive pushdown), double-EXISTS
  * intersection, Q22-style scalar-average anti pattern, RANGE-frame windows,
  * and the map / posexplode function surfaces.
  *
  * Determinism contract matches [[RelationalQueries]]: decimal aggregation
  * for money (order-independent), decimal COMPARISON for the scalar-average
  * threshold (an exact decimal product beats a double average whose rounding
  * depends on accumulation order), total ORDER BY, aliases mirrored on both
  * sides.
  */
object AnalyticsQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def d(c: Column): Column = c.cast("double")
  /** long-cents money path — see RelationalQueries.sumCents scaladoc */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def sumCents(prod: Column): Column = sum(prod.cast("decimal(38,0)"))

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q7 shape: bilateral trade volume between two nations by ship
    * year. Both nation dims are pre-filtered to the two relevant names
    * BEFORE joining (the join then keeps only candidate rows; the OR pair
    * predicate prunes the two same-nation combinations). nation is bounded —
    * both sides broadcast; the fact-side joins shuffle on their equi-keys.
    */
  val q7NationVolume: Q = (spark, dir) => {
    val names = Seq("NATION_18", "NATION_19")
    val n1 = Tables(spark, dir, "nation")
      .filter(col("n_name").isInCollection(names))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables(spark, dir, "nation")
      .filter(col("n_name").isInCollection(names))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("ship_year", year(col("l_shipdate")))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg((d(sumCents(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))))
        / 10000.0).as("volume"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** TPC-H Q10 shape: top-20 customers by revenue from returned items.
    * The returnflag filter pushes to the lineitem scan; customer joins on
    * the equi-key after the fact-side aggregate would be ideal, but the
    * group keys include customer attributes — so filter first, join, one
    * grouped aggregate, global top-k (AQE takes the final sort+limit).
    */
  val q10ReturnedItems: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg((d(sumCents(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))))
        / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q19 shape: disjunctive OR-of-ANDs across the join. The derived
    * conjuncts implied by the OR (quantity ∈ [1,40], size ∈ [1,30], brand ∈
    * {1,2}) are stated explicitly on each input so they PUSH to the scans —
    * the raw OR references both tables and can only run post-join. The
    * oracle keeps the pure OR form: hash equality proves the derived
    * predicates are implied (a row the pushdown drops never satisfied the
    * OR).
    */
  val q19Disjunctive: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
    val part = Tables(spark, dir, "part")
      .filter(col("p_brand").isInCollection(Seq("Brand#1", "Brand#2")) &&
        col("p_size").between(1, 30))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 30) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 40))
      .agg(d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Double-EXISTS intersection: customers active in BOTH 1996 and 1997,
    * by segment. Each EXISTS decorrelates to a LEFT SEMI join against a
    * year-filtered orders projection — two semi joins, no row explosion.
    */
  val qExistsBothYears: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    def active(y: Int) = Tables(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as(s"ck$y"))
    cust.join(active(1996), col("c_custkey") === col("ck1996"), "left_semi")
      .join(active(1997), col("c_custkey") === col("ck1997"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q22 shape: wealthy-but-dormant customers — balance above the
    * positive-balance average (uncorrelated scalar subquery) with at most
    * 3 orders (correlated COUNT), grouped by the last digit of the name
    * (standing in for the reference query's phone prefix).
    *
    * The average threshold is compared in EXACT decimal arithmetic:
    * `bal · n_pos > sum_pos` avoids materializing sum/n as a double, whose
    * last bit depends on accumulation order and could flip boundary rows.
    * The scalar aggregate is one row — broadcast by construction.
    */
  val q22DormantCustomers: Q = (spark, dir) => {
    val cust = Tables(spark, dir, "customer")
    val posAvg = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    val nOrders = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    cust.crossJoin(broadcast(posAvg))
      .filter(dec(col("c_acctbal")) * col("n_pos") > col("sum_pos"))
      .join(nOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .filter(coalesce(col("n_ord"), lit(0L)) <= 3)
      .groupBy(substring(col("c_name"), -1, 1).as("tail_digit"))
      .agg(count(lit(1)).as("n_customers"),
        d(sum(dec(col("c_acctbal")))).as("total_bal"))
      .orderBy(col("tail_digit"))
  }

  /** RANGE-frame window: each order with the count + sum of the same
    * customer's orders in the trailing 90 days (inclusive). The frame is
    * value-based on epoch seconds — peers at the same timestamp are all in
    * frame on both engines. One shuffle on the partition key.
    */
  val qRangeWindow: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-7776000L, 0)
    Tables(spark, dir, "orders")
      .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_90d"),
        d(sum(dec(col("o_totalprice"))).over(w)).as("sum_90d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Map-function surface: build a per-row map from columns, then extract —
    * element_at by key, cardinality, insertion-ordered first key, map_concat
    * growth — reduced to scalar outputs (driver compare cannot hash map
    * cells). Both engines preserve map insertion order.
    */
  val qMapFuncs: Q = (spark, dir) => {
    val m = map_from_arrays(
      array(lit("qty"), lit("price"), lit("disc")),
      array(col("l_quantity"), col("l_extendedprice"), col("l_discount")))
    val m2 = map_concat(m, map_from_arrays(array(lit("tax")), array(col("l_tax"))))
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        element_at(m, "qty").as("qty_val"),
        element_at(m, "price").as("price_val"),
        size(m).as("n_keys"),
        element_at(map_keys(m), 1).as("first_key"),
        element_at(map_values(m), -1).as("last_val"),
        size(m2).as("n_keys2"),
        element_at(m2, "tax").as("tax_val"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** TPC-H Q2 shape: min-per-group join-back — for every part, the
    * cheapest-balance supplier that shipped it (lineitem is the part↔supplier
    * bridge in this schema). The min is resolved as a row_number window over
    * (acctbal, suppkey) so a balance tie picks the lowest key on both
    * engines. One shuffle on the bridge key; supplier broadcasts.
    */
  val q2MinSupplier: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val bridge = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val sup = Tables(spark, dir, "supplier")
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    bridge.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q12 shape: two-class conditional counts per line status —
    * critical-priority vs other orders among late-shipped items.
    */
  val q12PriorityClass: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = Tables(spark, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isInCollection(
          Seq("1-URGENT", "2-HIGH")), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isInCollection(
          Seq("1-URGENT", "2-HIGH")), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** UDTF surface: posexplode of the token array — one output row per
    * (doc, position, token), 0-based position like the generator.
    */
  val qExplodeTokens: Q = (spark, dir) =>
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(graft.operators.TextAnalysis.tokens(col("text"))))
      .withColumnRenamed("col", "tok")
      .select(col("doc_id"), col("pos"), col("tok"))
      .orderBy(col("doc_id"), col("pos"))

  /** TPC-H Q8 shape: a nation's market share of a part type's trade within
    * one region, by order year — the classic two-sum division. All dims
    * (region→nation chain on the customer side, the supplier nation, the
    * filtered part list) broadcast; the fact side shuffles only on its
    * equi-keys. Both sums are exact decimal; the single division runs in
    * double on two exact inputs — deterministic on both engines.
    */
  val q8MarketShare: Q = (spark, dir) => {
    val asiaNations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val promoParts = Tables(spark, dir, "part")
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val vol = cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy(col("o_year"))
      .agg(
        (d(sumCents(when(col("supp_nation") === "NATION_18", vol)
          .otherwise(lit(0L)))) / d(sumCents(vol))).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape: profit by supplier nation and year. The data has no
    * partsupp table, so supply cost is proxied as 0.8 × p_retailprice per
    * unit (documented adaptation — the join/aggregate shape is Q9's).
    *
    * Money runs in LONG integer cents (`round(v·100)` — the q_outliers
    * pattern, proven engine-identical): per-row products ≤ 5e10 and group
    * sums ≤ 3e16 stay exact in 64-bit, so the whole aggregate is primitive
    * codegen'd long arithmetic instead of the precision-38 decimal slow
    * path, with ONE double conversion of the exact integer at the end
    * (identical IEEE rounding on both engines).
    */
  val q9ProfitProxy: Q = (spark, dir) => {
    def cents(c: Column): Column = round(c * 100).cast("long")
    val suppNation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("o_year", year(col("l_shipdate")))
      .groupBy(col("nation"), col("o_year"))
      .agg(
        (d(sum((cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount")))
            .cast("decimal(38,0)"))) / 10000.0
          - d(sum((cents(col("p_retailprice")) * cents(col("l_quantity")))
            .cast("decimal(38,0)"))) / 10000.0 * 0.8)
          .as("profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** TPC-H Q11 shape: parts carrying an outsized share of one nation's
    * traded value — GROUP BY + HAVING against a scalar fraction of the
    * global aggregate (the same frame re-aggregated, broadcast back as a
    * single row; no second scan pattern needed since Spark reuses the
    * shuffle via the exchange). No partsupp table: "value" is traded
    * lineitem value by NATION_3 suppliers (documented adaptation).
    */
  val q11PartValueShare: Q = (spark, dir) => {
    val n3supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val base = Tables(spark, dir, "lineitem")
      .join(broadcast(n3supp), col("l_suppkey") === col("s_suppkey"))
    val perPart = base.groupBy(col("l_partkey").as("p_partkey"))
      .agg(d(sum(dec(col("l_extendedprice")))).as("part_value"))
    val total = base.agg(d(sum(dec(col("l_extendedprice")))).as("_total"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > col("_total") * 0.001)
      .select(col("p_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q16 shape: supplier variety per (brand, type, size) bucket with
    * anti-predicates and a NOT-IN supplier exclusion (negative balance in
    * place of the reference's complaints filter; no partsupp — the
    * part↔supplier relation comes from lineitem). count(DISTINCT suppkey)
    * after an anti-join; the excluded-supplier list is tiny → broadcast
    * anti-join, never a shuffle.
    */
  val q16SupplierVariety: Q = (spark, dir) => {
    val badSupp = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val parts = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        !col("p_type").startsWith("PROMO") &&
        col("p_size").isInCollection(Seq(1, 4, 9, 14, 19, 24, 29, 34)))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape: suppliers whose recent shipments of a part class
    * dominate their history — a correlated-aggregate derived table
    * semi-joined back to the supplier dim. The 1997-vs-all-time comparison
    * `6·q97 > q_all` (an above-average 1997 share: > 1/6 of seven years)
    * stays in EXACT decimal (no fractional double multiply), so the
    * boundary row classifies identically on both engines.
    */
  val q20TopShippers: Q = (spark, dir) => {
    val econParts = Tables(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val perSupp = Tables(spark, dir, "lineitem")
      .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1997, dec(col("l_quantity")))
          .otherwise(lit(0))).as("q97"),
        sum(dec(col("l_quantity"))).as("q_all"))
      .filter(col("q97") * 6 > col("q_all"))
      .select(col("l_suppkey"))
    Tables(spark, dir, "supplier")
      .join(perSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Key-distribution skew profile of events.user_id — the pre-flight
    * diagnostic for choosing salting/AQE-skew handling before a big join
    * (see operators/Joins.saltedJoin). All counts exact; the top-10 sum is
    * tie-insensitive; one IEEE division for the skew ratio.
    */
  val qSkewProfile: Q = (spark, dir) =>
    graft.operators.Profiling.keySkewProfile(
      Tables(spark, dir, "events"), "user_id", topN = 10)

  private val skewProfileOracle: String =
    """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      |o AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |        CAST(sum(c) AS BIGINT) AS n_rows,
      |        CAST(max(c) AS BIGINT) AS max_count FROM c),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS topn_count FROM
      |      (SELECT c FROM c ORDER BY c DESC, user_id LIMIT 10))
      |SELECT n_keys, n_rows, max_count, topn_count,
      |  CAST(max_count * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE) AS skew_ratio
      |FROM o CROSS JOIN t""".stripMargin

  /** Hourly gap-fill of the event stream per event_type: resample onto the
    * [first, last] hourly grid, carry the latest observation per hour
    * (ties on ts broken by event_id), forward-fill empty hours. The value
    * is only COPIED (no arithmetic), so the double hashes exactly.
    */
  val qGapfill: Q = (spark, dir) =>
    graft.operators.TimeSeries.gapFill(
      Tables(spark, dir, "events"),
      keyCol = "event_type", tsCol = "ts", valueCol = "value",
      tieCol = "event_id", bucket = "hour")
      .orderBy(col("event_type"), col("bucket"))

  private val gapfillOracle: String =
    """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
      |        ts, event_id, value FROM events),
      |obs AS (SELECT event_type, bucket, value AS obs FROM
      |        (SELECT *, row_number() OVER (PARTITION BY event_type, bucket
      |           ORDER BY ts DESC, event_id DESC) AS rn FROM b)
      |        WHERE rn = 1),
      |span AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
      |         FROM obs GROUP BY 1),
      |grid AS (SELECT event_type,
      |           unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      |         FROM span),
      |j AS (SELECT g.event_type, g.bucket, o.obs
      |      FROM grid g LEFT JOIN obs o
      |        ON g.event_type = o.event_type AND g.bucket = o.bucket)
      |SELECT event_type, bucket,
      |  last_value(obs IGNORE NULLS) OVER (PARTITION BY event_type
      |    ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |  obs IS NULL AS is_gap
      |FROM j ORDER BY event_type, bucket""".stripMargin

  /** Hourly ingest-rate anomaly flags per event_type: squared 3σ test over
    * the trailing-24h window — rational arithmetic over exact integer
    * window sums (no sqrt), NULL under 8 observed hours. The oracle
    * mirrors the identical IEEE expression tree.
    */
  val qRateAnomaly: Q = (spark, dir) =>
    graft.operators.TimeSeries.rateAnomalies(
      Tables(spark, dir, "events"), "event_type", "ts",
      bucket = "hour", lookback = 24, minHistory = 8, sigma = 3.0)
      .orderBy(col("event_type"), col("bucket"))

  private val rateAnomalyOracle: String =
    """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
      |        count(*) AS n FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, bucket, n,
      |        sum(n) OVER f AS s1, sum(n * n) OVER f AS s2,
      |        count(n) OVER f AS c
      |      FROM h WINDOW f AS (PARTITION BY event_type ORDER BY bucket
      |        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, bucket, CAST(n AS BIGINT) AS n_events,
      |  CASE WHEN c >= 8 THEN
      |    (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
      |      * (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
      |    > 3.0 * 3.0 * ((CAST(s2 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
      |      / CAST(c - 1 AS DOUBLE))
      |  END AS is_anomaly
      |FROM w ORDER BY event_type, bucket""".stripMargin

  /** Exact Pearson-correlation components between quantity and extended
    * price per return flag, in long-cents integer space: n, Σx, Σy, Σxy,
    * Σx², Σy² plus the derived covariance / variance numerators
    * (n·Σxy − Σx·Σy etc.). The ratio r itself needs a square root — a
    * transcendental whose last bit is accumulation-order-dependent — so the
    * query reports the EXACT integer components instead; any consumer can
    * divide. Per-row products stay in 64-bit (≤5e10); sums run in
    * DECIMAL(38,0), which holds the numerators to ~6e12-row tables
    * (n·Σxy ≈ 1.8e36 < 1e38) — the 100 TB head-room is by construction.
    * One partial+final aggregate pass, no shuffle beyond the groupBy.
    *
    * Output encoding — the ±2^53 contract (NOTES.md): the raw Σy² and the
    * three numerators exceed 2^53 even at sf0.01 (syy ≈ 7.5e17, var_num_y ≈
    * 3.7e21), the range where a float64-based numeric canonicalization stops
    * being exact — CORRECTNESS_r05 proved the driver hash diverges there
    * while the values themselves are bit-identical. So every potentially-big
    * component is emitted as an exact base-1e9 hi/lo BIGINT pair
    * (value = hi·1e9 + lo) plus an explicit sign column for the one
    * component (cov_num) that is not nonnegative by construction; hi/lo are
    * taken of the ABSOLUTE value so DIV/% truncation-vs-floor semantics can
    * never disagree across engines. Both halves stay far below 2^53 at any
    * realistic SF ratio, and the encoding is lossless.
    */
  val qCorrelation: Q = (spark, dir) => {
    val d38 = "decimal(38,0)"
    // base-1e9 hi/lo split keeps both halves ≪ 2^53; DIV (integral divide,
    // truncating) on the abs value matches DuckDB `//` exactly — a plain
    // decimal `/` + cast would ROUND half-up and corrupt hi by one.
    def hiLo(c: String): Seq[String] = Seq(
      s"CAST(abs($c) DIV 1000000000 AS BIGINT) AS ${c}_hi",
      s"CAST(abs($c) % 1000000000 AS BIGINT) AS ${c}_lo")
    val s = Tables(spark, dir, "lineitem").select(col("l_returnflag"),
      cents(col("l_quantity")).as("qx"), cents(col("l_extendedprice")).as("px"))
    s.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("qx").cast(d38)).as("sx"),
        sum(col("px").cast(d38)).as("sy"),
        sum((col("qx") * col("px")).cast(d38)).as("sxy"),
        sum((col("qx") * col("qx")).cast(d38)).as("sxx"),
        sum((col("px") * col("px")).cast(d38)).as("syy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast(d38).as("cov"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(d38).as("varx"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast(d38).as("vary"))
      .selectExpr(Seq("l_returnflag", "n",
        "CAST(sx AS BIGINT) AS sx", "CAST(sy AS BIGINT) AS sy") ++
        hiLo("sxy") ++ hiLo("sxx") ++ hiLo("syy") ++
        Seq("CAST(CASE WHEN cov < 0 THEN -1 WHEN cov > 0 THEN 1 ELSE 0 END" +
          " AS BIGINT) AS cov_sign") ++
        hiLo("cov") ++ hiLo("varx") ++ hiLo("vary"): _*)
      .orderBy(col("l_returnflag"))
  }

  private val correlationOracle: String =
    """WITH s AS (SELECT l_returnflag,
      |  CAST(round(l_quantity * 100) AS BIGINT) AS qx,
      |  CAST(round(l_extendedprice * 100) AS BIGINT) AS px FROM lineitem),
      |a AS (SELECT l_returnflag, count(*) AS n,
      |        CAST(SUM(qx) AS HUGEINT) AS sx, CAST(SUM(px) AS HUGEINT) AS sy,
      |        CAST(SUM(qx * px) AS HUGEINT) AS sxy,
      |        CAST(SUM(qx * qx) AS HUGEINT) AS sxx,
      |        CAST(SUM(px * px) AS HUGEINT) AS syy
      |      FROM s GROUP BY 1),
      |d AS (SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
      |        n * sxy - sx * sy AS cov, n * sxx - sx * sx AS varx,
      |        n * syy - sy * sy AS vary FROM a)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
      |  CAST(abs(sxy) // 1000000000 AS BIGINT) AS sxy_hi,
      |  CAST(abs(sxy) % 1000000000 AS BIGINT) AS sxy_lo,
      |  CAST(abs(sxx) // 1000000000 AS BIGINT) AS sxx_hi,
      |  CAST(abs(sxx) % 1000000000 AS BIGINT) AS sxx_lo,
      |  CAST(abs(syy) // 1000000000 AS BIGINT) AS syy_hi,
      |  CAST(abs(syy) % 1000000000 AS BIGINT) AS syy_lo,
      |  CAST(CASE WHEN cov < 0 THEN -1 WHEN cov > 0 THEN 1 ELSE 0 END
      |    AS BIGINT) AS cov_sign,
      |  CAST(abs(cov) // 1000000000 AS BIGINT) AS cov_hi,
      |  CAST(abs(cov) % 1000000000 AS BIGINT) AS cov_lo,
      |  CAST(abs(varx) // 1000000000 AS BIGINT) AS varx_hi,
      |  CAST(abs(varx) % 1000000000 AS BIGINT) AS varx_lo,
      |  CAST(abs(vary) // 1000000000 AS BIGINT) AS vary_hi,
      |  CAST(abs(vary) % 1000000000 AS BIGINT) AS vary_lo
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** Time-series lag/rolling feature generation — the feature-engineering
    * verb of an ML pipeline. Per (user, day): event count and exact-decimal
    * value sum, previous-day value (lag 1), and trailing-3-row sum/min/max.
    * Scale shape: map-side combine shrinks the raw event stream before the
    * (user, day) shuffle; the follow-up user_id exchange for the windows
    * moves only DAILY rows (tiny), and lag + all trailing frames share one
    * Window pass. Decimals keep the sums order-independent, cast to double
    * only at the edge.
    */
  val qLagFeatures: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(dec(col("value"))).as("dv"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val w3 = w.rowsBetween(-2, 0)
    daily.select(col("user_id"), col("day"), col("n_events"),
      d(col("dv")).as("day_value"),
      d(lag(col("dv"), 1).over(w)).as("prev_value"),
      sum(col("n_events")).over(w3).as("n_events_3d"),
      d(min(col("dv")).over(w3)).as("min_value_3d"),
      d(max(col("dv")).over(w3)).as("max_value_3d"))
      .orderBy(col("user_id"), col("day"))
  }

  private val lagFeaturesOracle: String =
    """WITH dd AS (SELECT user_id,
      |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    count(*) AS n_events,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS dv
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(dv AS DOUBLE) AS day_value,
      |  CAST(lag(dv, 1) OVER w AS DOUBLE) AS prev_value,
      |  CAST(SUM(n_events) OVER w3 AS BIGINT) AS n_events_3d,
      |  CAST(MIN(dv) OVER w3 AS DOUBLE) AS min_value_3d,
      |  CAST(MAX(dv) OVER w3 AS DOUBLE) AS max_value_3d
      |FROM dd
      |WINDOW w AS (PARTITION BY user_id ORDER BY day),
      |  w3 AS (PARTITION BY user_id ORDER BY day
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day""".stripMargin

  /** One-pass table profile of five customer columns — null counts, exact
    * distincts, string-rendered min/max. c_acctbal is pre-normalized to
    * DECIMAL(18,2) so its string rendering is engine-portable (raw
    * double-to-string is not — NOTES.md determinism contract). The exact
    * variant Expands 5-fold before the partial agg; see
    * [[graft.operators.Profiling.columnProfileApprox]] for the no-Expand
    * HLL sibling (spec-tested; sketches have no hash oracle).
    */
  val qColumnProfile: Q = (spark, dir) => {
    val cols = Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal",
      "c_nationkey")
    graft.operators.Profiling.columnProfile(
      Tables(spark, dir, "customer")
        .withColumn("c_acctbal", dec(col("c_acctbal"))),
      cols)
  }

  private val columnProfileOracle: String = {
    val cols = Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal",
      "c_nationkey")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM (SELECT * REPLACE (CAST(c_acctbal AS DECIMAL(18,2))
         |      AS c_acctbal) FROM customer)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val all: Map[String, Q] = Map(
    "q_column_profile" -> qColumnProfile,
    "q_correlation" -> qCorrelation,
    "q_lag_features" -> qLagFeatures,
    "q_rate_anomaly" -> qRateAnomaly,
    "q_skew_profile" -> qSkewProfile,
    "q_gapfill" -> qGapfill,
    "q8_market_share" -> q8MarketShare,
    "q9_profit_proxy" -> q9ProfitProxy,
    "q11_part_value_share" -> q11PartValueShare,
    "q16_supplier_variety" -> q16SupplierVariety,
    "q20_top_shippers" -> q20TopShippers,
    "q2_min_supplier" -> q2MinSupplier,
    "q12_priority_class" -> q12PriorityClass,
    "q7_nation_volume" -> q7NationVolume,
    "q10_returned_items" -> q10ReturnedItems,
    "q19_disjunctive" -> q19Disjunctive,
    "q_exists_both_years" -> qExistsBothYears,
    "q22_dormant_customers" -> q22DormantCustomers,
    "q_range_window" -> qRangeWindow,
    "q_map_funcs" -> qMapFuncs,
    "q_explode_tokens" -> qExplodeTokens
  )

  val oracles: Map[String, String] = Map(
    "q_column_profile" -> columnProfileOracle,
    "q_correlation" -> correlationOracle,
    "q_lag_features" -> lagFeaturesOracle,
    "q_rate_anomaly" -> rateAnomalyOracle,
    "q_skew_profile" -> skewProfileOracle,
    "q_gapfill" -> gapfillOracle,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_18'
        |    THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
        |         CAST(round((1 - l_discount) * 100) AS BIGINT) ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |         CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_profit_proxy" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0
        |  - CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT) *
        |             CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 10000.0 * 0.8
        |  AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_part_value_share" ->
      """WITH base AS (
        |  SELECT l_partkey, l_extendedprice FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3')
        |SELECT l_partkey AS p_partkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        |FROM base GROUP BY 1
        |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
        |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM base) * 0.001
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_top_shippers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  GROUP BY l_suppkey
        |  HAVING sum(CASE WHEN year(l_shipdate) = 1997
        |             THEN CAST(l_quantity AS DECIMAL(18,2))
        |             ELSE CAST(0 AS DECIMAL(18,2)) END) * 6 >
        |         sum(CAST(l_quantity AS DECIMAL(18,2))))
        |ORDER BY s_suppkey""".stripMargin,
    "q2_min_supplier" ->
      """SELECT l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal
        |FROM (SELECT b.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
        |        row_number() OVER (PARTITION BY b.l_partkey
        |          ORDER BY s.s_acctbal, s.s_suppkey) AS rn
        |      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        |      JOIN supplier s ON b.l_suppkey = s.s_suppkey) t
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS ship_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS volume,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity >= 10 AND l_quantity <= 40)""".stripMargin,
    "q_exists_both_years" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND year(o_orderdate) = 1996)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND year(o_orderdate) = 1997)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q22_dormant_customers" ->
      """SELECT substring(c_name, -1, 1) AS tail_digit,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM customer WHERE c_acctbal > 0) >
        |      (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
        |       WHERE c_acctbal > 0)
        |  AND (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) <= 3
        |GROUP BY 1 ORDER BY tail_digit""".stripMargin,
    "q_range_window" ->
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER w AS n_90d,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sum_90d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_map_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  m['qty'][1] AS qty_val,
        |  m['price'][1] AS price_val,
        |  CAST(len(map_keys(m)) AS INT) AS n_keys,
        |  map_keys(m)[1] AS first_key,
        |  map_values(m)[-1] AS last_val,
        |  CAST(len(map_keys(m2)) AS INT) AS n_keys2,
        |  m2['tax'][1] AS tax_val
        |FROM (SELECT l_orderkey, l_linenumber,
        |        map(['qty', 'price', 'disc'],
        |            [l_quantity, l_extendedprice, l_discount]) AS m,
        |        map_concat(map(['qty', 'price', 'disc'],
        |                       [l_quantity, l_extendedprice, l_discount]),
        |                   map(['tax'], [l_tax])) AS m2
        |      FROM lineitem WHERE l_orderkey < 100) t
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_explode_tokens" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') ws
        |           FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS tok
        |FROM t, UNNEST(range(1, len(ws)+1)) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin
  )
}
