package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the link-graph verbs a
  * web-corpus pipeline runs (page quality via PageRank, community density via
  * triangles, co-occurrence graph construction).
  *
  * Design for scale:
  *   - Edges stay a DataFrame keyed by `src`/`dst`; every round of every
  *     algorithm is an equi-join + partial aggregation on those keys, so
  *     Catalyst shuffles on the join key once per round and map-side combines
  *     contributions. No adjacency lists are ever collected to the driver.
  *   - PageRank runs in SCALED INTEGER arithmetic (rank units of 1e-6):
  *     floating-point summation order varies across partitionings, so a
  *     double-based rank is not reproducible cluster-to-cluster — integer
  *     ranks make every iteration exactly associative and the result
  *     bit-stable at any parallelism (and lets the DuckDB oracle unroll the
  *     same iterations and hash-match).
  *   - Triangle counting joins the canonical (u<v) edge list to itself twice;
  *     the classic degree-ordering trick (direct each edge low-degree →
  *     high-degree) bounds the path fan-out at Σ deg(v)·min(deg) — apply
  *     [[coOccurrenceEdges]]' weight threshold first so the graph entering
  *     the join is the sparse backbone, not the raw co-occurrence blow-up.
  */
object Graph {

  /** Scaled-integer PageRank: damping 0.85 = 17/20 in exact integer math.
    *
    * rank_0(v) = `scale`;
    * rank_{t+1}(v) = 0.15·scale + (17·Σ_{u→v} rank_t(u) div outdeg(u)) div 20.
    *
    * Dangling mass (sink nodes) is dropped, not redistributed — standard for
    * link-quality scoring and keeps each iteration one join + one aggregate.
    * Each iteration shuffles edges on `src` (rank join) then `dst`
    * (contribution sum); the edge DataFrame is reused unchanged so its scan
    * and the degree aggregate are computed once by Spark's shuffle reuse.
    *
    * Returns (node, pr) with pr still in `scale` units.
    */
  def pageRankInt(edges: DataFrame, iterations: Int,
      scale: Long = 1000000L): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val base = lit(scale * 15 / 100)
    var ranks = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iterations) {
      val contrib = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + expr("(coalesce(c, 0L) * 17) div 20")).as("pr"))
    }
    ranks
  }

  /** Co-occurrence edges: items sharing a group key, canonicalized u < v,
    * kept only when the pair co-occurs at least `minWeight` times.
    *
    * The self-join explodes as Σ_g n_g² — the threshold is applied AFTER the
    * grouped count precisely so the downstream graph is the stable backbone
    * (pairs that recur) while the quadratic blow-up stays inside one shuffle
    * stage with map-side partial counts. At web scale, cap n_g first (drop
    * mega-groups) — same shape as the df-capped postings in [[Dedup]].
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      minWeight: Long): DataFrame = {
    val l = df.select(col(groupCol).as("g"), col(itemCol).as("u")).distinct()
    val r = l.select(col("g"), col("u").as("v"))
    l.join(r, "g").filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= minWeight)
      .select(col("u"), col("v"))
  }

  /** Exact triangle count over a canonical (u < v) undirected edge list:
    * join paths u→v→w with u < v < w to the closing edge (u, w). Both joins
    * are equi-joins on edge endpoints — never a cartesian — and the u < v < w
    * orientation counts each triangle exactly once.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("u").as("a"), col("v").as("b"))
    val e2 = edges.select(col("u").as("b"), col("v").as("c"))
    val e3 = edges.select(col("u").as("a"), col("v").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = edges.select(col("u").as("n"))
      .union(edges.select(col("v").as("n"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(tri)
  }
}
