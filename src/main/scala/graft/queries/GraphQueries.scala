package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Link-graph analytics over the star schema: integer PageRank on the
  * customer→supplier purchase graph, triangle census of the part co-order
  * graph, and first-order Markov transitions over the event stream.
  *
  * Everything here is exact integer arithmetic (scaled ranks, counts, basis
  * points via integer division) so the DuckDB oracles — including a fully
  * unrolled PageRank recurrence — hash-match bit-for-bit. See
  * [[graft.operators.Graph]] for the scale rationale.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  val PrIterations = 3
  // Supplier ids shift into a disjoint range of the shared node-id space.
  // 2^40 clears any realistic key range (sf100 TPC-H custkeys are ~1.5e7;
  // 1e6 would already collide at sf>=7) while pr sums stay far inside Long.
  private val SuppOffset = 1L << 40

  /** PageRank over the bipartite customer→supplier purchase graph (edge =
    * "customer bought from supplier", deduplicated). Supplier nodes are
    * offset by 1e6 to share one id space. Reports the top-25 suppliers by
    * rank — the "authority" side of the graph — with a total (pr, id)
    * ordering so ties cannot flap the limit.
    */
  val qPageRank: Q = (spark, dir) => {
    val edges = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(SuppOffset)).as("dst"))
      .distinct()
    Graph.pageRankInt(edges, PrIterations)
      .filter(col("node") > lit(SuppOffset))
      .select((col("node") - lit(SuppOffset)).cast("long").as("supplier"),
        col("pr"))
      .orderBy(col("pr").desc, col("supplier"))
      .limit(25)
  }

  /** One unrolled PageRank iteration (DuckDB): the same scaled-integer
    * recurrence as [[Graph.pageRankInt]] — `//` there is `div` here, both
    * truncating on positive operands; DuckDB's HUGEINT sums cast back down.
    */
  private def prIterSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.node,
       |  CAST(150000 + ((COALESCE(s.c, 0) * 17) // 20) AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, CAST(SUM(r.pr // d.outdeg) AS BIGINT) AS c
       |    FROM e JOIN $prev r ON r.node = e.src JOIN deg d ON d.src = e.src
       |    GROUP BY 1) s ON n.node = s.node)""".stripMargin

  private val pageRankOracle: String = {
    val iters = (1 to PrIterations)
      .map(i => prIterSql(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
       |             l_suppkey + $SuppOffset AS dst
       |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |$iters
       |SELECT CAST(node - $SuppOffset AS BIGINT) AS supplier, pr
       |FROM r$PrIterations WHERE node > $SuppOffset
       |ORDER BY pr DESC, supplier LIMIT 25""".stripMargin
  }

  /** Convergence certificate for [[qPageRank]]: same graph, same declared
    * iteration count, but the output pins that the recurrence CONTRACTED —
    * max |Δrank| of the last round strictly below the first round's, in
    * exact integer rank units. A fixed unrolled iteration count is only a
    * valid stopping rule when this holds; making it an oracle row turns
    * "trust the iteration constant" into a hash-checked contract.
    */
  val qPageRankConverged: Q = (spark, dir) => {
    val edges = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(SuppOffset)).as("dst"))
      .distinct()
    Graph.pageRankConvergence(edges, PrIterations)
  }

  private val pageRankConvergedOracle: String = {
    val iters = (1 to PrIterations)
      .map(i => prIterSql(s"r${i - 1}", s"r$i")).mkString(",\n")
    val last = s"r$PrIterations"
    val prev = s"r${PrIterations - 1}"
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
       |             l_suppkey + $SuppOffset AS dst
       |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |$iters,
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
       |df AS (SELECT CAST(max(abs(pr - 1000000)) AS BIGINT)
       |         AS max_delta_first FROM r1),
       |dl AS (SELECT CAST(max(abs(a.pr - b.pr)) AS BIGINT)
       |         AS max_delta_last
       |       FROM $last a JOIN $prev b ON a.node = b.node)
       |SELECT CAST($PrIterations AS BIGINT) AS iters, n_nodes,
       |  max_delta_first, max_delta_last,
       |  max_delta_last < max_delta_first AS contracted
       |FROM nn, df, dl""".stripMargin
  }

  /** Triangle census of the part co-order graph: parts are linked when they
    * appear in the same order at least twice (the ≥2 weight threshold keeps
    * the backbone sparse at every SF — one-off co-occurrences are noise).
    */
  val qTriangleCount: Q = (spark, dir) => {
    val edges = Graph.coOccurrenceEdges(
      Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minWeight = 2)
    Graph.triangleCount(edges)
  }

  private val triangleCountOracle: String =
    """WITH cs AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS u
      |            FROM lineitem),
      |e AS (SELECT a.u AS u, b.u AS v FROM cs a JOIN cs b
      |      ON a.g = b.g AND a.u < b.u
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes
      |       FROM (SELECT u AS n FROM e UNION SELECT v FROM e)),
      |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |       FROM e e1 JOIN e e2 ON e1.v = e2.u
      |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, nt""".stripMargin

  /** First-order Markov transition matrix over the event stream: for each
    * user's (ts, event_id)-ordered history, count consecutive event-type
    * pairs and report each row's share of its source state in basis points
    * (integer division — exact). One window shuffle on user_id, one grouped
    * count, one broadcast-sized window over the ~|types|² matrix.
    */
  val qMarkovTransitions: Q = (spark, dir) => {
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .withColumn("next_type", lead(col("event_type"), 1).over(seq))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bps", expr(
        "(n * 10000) div sum(n) over (partition by event_type)"))
      .select(col("event_type"), col("next_type"), col("n"), col("bps"))
      .orderBy(col("event_type"), col("next_type"))
  }

  private val markovTransitionsOracle: String =
    """WITH t AS (SELECT event_type,
      |             lead(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS next_type
      |           FROM events),
      |c AS (SELECT event_type, next_type, count(*) AS n FROM t
      |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
      |  CAST((n * 10000) // SUM(n) OVER (PARTITION BY event_type)
      |       AS BIGINT) AS bps
      |FROM c ORDER BY event_type, next_type""".stripMargin

  val all: Map[String, Q] = Map(
    "q_pagerank" -> qPageRank,
    "q_pagerank_converged" -> qPageRankConverged,
    "q_triangle_count" -> qTriangleCount,
    "q_markov_transitions" -> qMarkovTransitions
  )

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> pageRankOracle,
    "q_pagerank_converged" -> pageRankConvergedOracle,
    "q_triangle_count" -> triangleCountOracle,
    "q_markov_transitions" -> markovTransitionsOracle
  )
}
