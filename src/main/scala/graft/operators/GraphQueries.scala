package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over edge tables — the Pregel-on-DataFrame
  * shape beyond [[DedupQueries]]' connected components. Motivating
  * pipeline use: domain-authority weighting of a web corpus (rank the
  * host graph, weight documents by their host's score) — a standard
  * curation signal next to the quality classifiers in
  * [[CurationQueries]].
  *
  * All arithmetic is INTEGER (ranks in millionths, floor division for
  * both the out-degree split and the damping factor), so the result is
  * bit-identical regardless of aggregation order — summing doubles
  * across partitions would make every run engine- and plan-dependent.
  */
object GraphQueries {
  import Q._

  /** Fixed iteration count for the gate — unrolled as explicit CTEs in
    * the DuckDB oracle, so keep the two in sync. */
  val PageRankIters = 3

  /** Integer-exact PageRank over an `(src, dst)` edge table.
    *
    * Every node must appear as a source (feed an undirected /
    * symmetrized edge list, as the gate does) — that rules out dangling
    * nodes, whose lost mass would otherwise need a global redistribution
    * term per iteration. Update rule, all in Long millionths:
    *
    *   r₀(n)    = 1_000_000
    *   rₖ₊₁(n) = 150_000 + (85 · Σ_{(m,n)∈E} (rₖ(m) div deg(m))) div 100
    *
    * i.e. damping 0.85 with floor division at both steps. Each
    * iteration is ONE shuffle join (ranks onto edges by src) + ONE
    * aggregate (sum by dst) — at a 100 TB edge list this is the
    * standard iterative-join PageRank: the degree table is computed
    * once and reused, only (node, rank) pairs (16 B) travel per round,
    * and AQE handles hub-node skew on the dst aggregate. Edges and
    * degrees are materialized ONCE (`localCheckpoint`, the
    * [[DedupQueries.connectedComponents]] pattern) — without it every
    * iteration's plan re-derives the edge subtree, tripling the scan
    * work at 3 rounds and growing without bound beyond; ranks are
    * likewise checkpointed every few rounds so deep runs don't carry
    * the whole join lineage.
    */
  def pageRank(edges: DataFrame, iters: Int,
               checkpointEvery: Int = 4): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (k <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(s * 85) div 100")).as("r"))
      if (k % checkpointEvery == 0 && k < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  private def prIterSql(prev: String, cur: String): String =
    s"""$cur AS (
         SELECT e.dst AS node,
                CAST(150000 + (SUM($prev.r // deg.d) * 85) // 100 AS BIGINT) AS r
         FROM e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
         GROUP BY e.dst)"""

  val specs: Seq[Spec] = Seq(
    // Customer↔supplier trade graph from the star schema (undirected,
    // suppliers offset into their own id space), ranked for
    // PageRankIters rounds; top-100 by rank. The oracle unrolls the
    // identical integer recurrence as chained CTEs — bit-equal because
    // no float ever enters the computation.
    Spec("q_graph_pagerank",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val e0 = o.join(li, o("o_orderkey") === li("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
          .distinct()
        // no distinct after symmetrizing: customer ids and offset
        // supplier ids live in disjoint key spaces (also under the
        // ScaleUp replica's per-copy shifts), so a forward row can
        // never equal a swapped row — the union is already
        // duplicate-free and the extra 2|E|-row shuffle would be
        // pure waste
        val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        pageRank(e, PageRankIters)
          .orderBy(col("r").desc, col("node"))
          .limit(100)
          .select(col("node"), col("r").as("rank"))
      },
      Some(s"""WITH e0 AS (
                 SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
                 FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
               e AS (SELECT src, dst FROM e0
                     UNION ALL SELECT dst, src FROM e0),
               deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
               r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
               ${prIterSql("r0", "r1")},
               ${prIterSql("r1", "r2")},
               ${prIterSql("r2", "r3")}
               SELECT node, r AS rank FROM r3
               ORDER BY rank DESC, node LIMIT 100"""))
  )
}
