package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Distributed PageRank (Page, Brin, Motwani & Winograd 1999) by fixed
  * power iteration over a directed edge list — the authority score a
  * web-scale corpus pipeline ranks crawl frontiers and weighs training
  * sources with (alongside the connected-components clustering of
  * [[Components]]; the reference has no graph operator).
  *
  * Semantics per iteration (damping d, N nodes):
  * `r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/out(u) + dangling/N)` where
  * `dangling = Σ_{out(u)=0} r(u)` — dangling mass is redistributed
  * uniformly, so Σ r stays 1 at every step (asserted in PageRankSpec).
  *
  * Determinism at scale: each edge contribution `r(u)/out(u)` (an
  * identical IEEE divide everywhere) is snapped to DECIMAL(38,18) before
  * the per-destination sum, and the dangling mass is summed the same way
  * — decimal addition is order-insensitive, so the result is
  * bit-identical under ANY partitioning or AQE re-plan (asserted under
  * repartition in PageRankSpec). Plain double sums would drift with the
  * merge order of shuffle partitions.
  *
  * Shape per iteration: one join of ranks onto edges (both sides keyed by
  * node — the rank side is the small one only at toy scale, so this is a
  * key shuffle, not a broadcast) + one groupBy(dst) with partial
  * aggregation, plus an O(1)-row dangling aggregate crossed back in.
  * Lineage is cut with an eager `localCheckpoint` every iteration (on a
  * real cluster: reliable `checkpoint`, same note as [[Components]]).
  */
object PageRank {

  /** PageRank over the directed graph `edges` (`srcCol` → `dstCol`).
    *
    * @return one row per node appearing anywhere in `edges`:
    *         (node, rank) after exactly `iters` iterations from the
    *         uniform start — fixed iteration count keeps the operator
    *         deterministic (no convergence-test data dependence).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      d: Double = 0.85, iters: Int = 10): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "PageRank over an empty graph")
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out"))
    // node spine with out-degree (0 = dangling), reused every iteration
    val spine = nodes.join(outDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("out"), lit(0L)).as("out"))
      .localCheckpoint()
    val base = (1.0 - d) / n
    var ranks = spine.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val withDeg = ranks.join(spine, "node")
      val dangling = withDeg.filter(col("out") === 0L)
        .agg(coalesce(sum(col("rank").cast(DecimalType(38, 18))), lit(0))
          .cast(DoubleType).as("dmass"))
      val contribs = withDeg.filter(col("out") > 0L)
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("out").cast(DoubleType))
            .cast(DecimalType(38, 18)).as("c"))
        .groupBy("node")
        .agg(sum("c").cast(DoubleType).as("inflow"))
      ranks = spine.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit(base) + lit(d) * (coalesce(col("inflow"), lit(0.0)) +
            col("dmass") / n)).as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }
}
