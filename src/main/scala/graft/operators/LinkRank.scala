package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph authority scoring (PageRank-shaped, q94) — the
  * domain-ranking pass a web-corpus training pipeline runs to weight
  * sources by link authority.
  *
  * All arithmetic is INTEGER (scaled ranks, floor division, damping as
  * ×85/100 in longs), so every iteration is order-free exact: the result
  * is bit-identical under any partitioning/merge order, and the DuckDB
  * oracle can unroll the same formula (`//` = `DIV`). Doubles would make
  * the fixpoint partitioning-dependent at 1000 executors.
  *
  * Per-iteration plan shape: the rank relation is NODE-scale (domains,
  * not pages/events), so it BROADCASTS onto the edge relation — the
  * edges, the only corpus-sized side, never shuffle for the join; the
  * single exchange per iteration is the map-side-combined sum over dst.
  * At a scale where the node side outgrows broadcast (billions of nodes),
  * the same loop runs with edges and ranks bucketed on src (q93's
  * co-location pattern) and the exchange count per iteration is
  * unchanged. Each iteration's ranks relation is lineage-truncated
  * (Caches.retainCheckpointed): without it ranks_3 nests three broadcast
  * joins and every run re-plans the full nested tree per broadcast job —
  * the same planning-floor wobble the round-12 verdict measured on q94
  * (0.98 → 1.92 s between same-tree runs on a loaded driver). The
  * checkpoint is node-scale (domains, not events), so the eager
  * materialization is cheap and the values are unchanged — the integer
  * fixpoint is what the plan computed either way.
  */
object LinkRank {
  val InitRank   = 1000000L // scaled initial rank
  val DampNum    = 85L      // damping 0.85 as ×85/100
  val DampDen    = 100L
  val BaseRank   = 150000L  // (1 - d) × InitRank

  /** `edges` must be a DISTINCT (src, dst) long-pair relation. Returns
    * (node, rank) after `iters` damped integer power iterations.
    * `checkpoint = false` keeps the full logical tree (no per-iteration
    * lineage truncation) — the spec hook that lets PlanQualitySpec pin the
    * per-iteration broadcast shape, which the checkpointed form hides
    * behind its materialized scan; production callers keep the default.
    */
  def rank(edges0: DataFrame, iters: Int,
      checkpoint: Boolean = true): DataFrame = {
    // persist the edge relation: ranks_i's lineage nests ranks_{i-1}, so
    // without it every iteration re-derives the edges from source —
    // events would be re-scanned ~2^iters times (d03's persist rationale).
    // Retained via Caches: the cache must outlive this lazy return, and
    // Caches.releaseAll() is the session's eviction hook.
    val edges = graft.util.Caches.retain(edges0)
    val nodes = graft.util.Caches.retain(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(broadcast(deg), "src")
    var ranks = nodes.withColumn("rank", lit(InitRank))
    (1 to iters).foreach { _ =>
      val contrib = withDeg
        .join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), expr("rank DIV deg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      val next = nodes.join(broadcast(contrib),
          col("node") === col("dst"), "left_outer")
        .select(col("node"), expr(
          s"coalesce(in_sum, 0L) * $DampNum DIV $DampDen + $BaseRank")
          .as("rank"))
      ranks =
        if (checkpoint) graft.util.Caches.retainCheckpointed(next) else next
    }
    ranks
  }

  /** DuckDB mirror: unrolled `iters` iterations over the same integer
    * formula; `edgesSql` must yield DISTINCT (src, dst).
    */
  def rankSql(edgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
                         CAST(coalesce(s.s, 0) * $DampNum // $DampDen
                              + $BaseRank AS BIGINT) AS rank
                  FROM nodes n
                  LEFT JOIN (SELECT e.dst, SUM(r.rank // d.deg) AS s
                             FROM edges e
                             JOIN deg d USING (src)
                             JOIN r${i - 1} r ON r.node = e.src
                             GROUP BY e.dst) s ON s.dst = n.node)"""
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
             deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
             nodes AS (SELECT DISTINCT node FROM
                         (SELECT src AS node FROM edges
                          UNION ALL SELECT dst FROM edges)),
             r0 AS (SELECT node, CAST($InitRank AS BIGINT) AS rank
                    FROM nodes),
             $steps
        SELECT node, rank FROM r$iters"""
  }
}
