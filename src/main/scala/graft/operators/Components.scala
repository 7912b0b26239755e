package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed connected components over an undirected edge list, for
  * turning near-duplicate PAIRS (q41/q42/q43 output) into dedup CLUSTERS:
  * transitive closure picks one canonical document per group even when
  * A~B and B~C but A!~C.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the edge set
  * converges to stars centered at each component's minimum id in
  * O(log^2 n) rounds (2-3 rounds on typical near-dup graphs, whose
  * components are tiny). This is the 100 TB-safe choice over naive
  * min-label propagation, whose round count is the graph DIAMETER — a
  * 10^6-long chain of pairwise near-dups would need 10^6 shuffles there,
  * vs ~40 here.
  *
  * Each star pass is a groupBy-min plus an equi-join on the same key —
  * deliberately NOT a collect_set of the neighborhood: a component
  * minimum accumulates high degree as the algorithm contracts, and a
  * per-key array is exactly the hub-node OOM that kills naive
  * implementations at scale. Aggregate-then-join keeps partial (map-side)
  * aggregation, lets AQE split a skewed hub key, and reuses the agg's
  * hash partitioning for the join.
  *
  * The reference has no graph operator (it is a CDC pipeline); this is
  * part of the LLM-training-data surface built on top of its tables.
  */
object Components {

  /** Connected components of the undirected graph given by `edges`.
    *
    * @param edges two Long-castable columns `uCol`, `vCol`; self-loops and
    *              null endpoints are dropped.
    * @return one row per node that appears in `edges`: (node, component)
    *         with component = the smallest node id reachable from it.
    *         Isolated nodes never appear in an edge list — callers wanting
    *         singletons left-join their universe and coalesce to own id.
    *
    * Each iteration materializes the new edge set via `localCheckpoint`
    * (eager) — the loop is iterative, so lineage MUST be cut or the plan
    * doubles every round. On a real cluster prefer
    * `spark.sparkContext.setCheckpointDir` + reliable `checkpoint`; local
    * checkpoints die with an executor, which a 1000-node run cares about
    * and local[n] does not.
    */
  def connectedComponents(
      edges: DataFrame,
      uCol: String,
      vCol: String,
      maxIter: Int = 50): DataFrame = {
    val init = edges
      .select(col(uCol).cast(LongType).as("u"), col(vCol).cast(LongType).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()

    // large-star: connect every neighbor v > u to m = min(N(u) ∪ {u}).
    // No intermediate distinct (r16): duplicate (v, m) edges are
    // min-agg-invariant inside small-star and small-star's own final
    // distinct dedups the round's output, so the extra exchange bought
    // nothing — dup multiplicity is bounded by a node's degree, which on
    // near-dup graphs is the (tiny) component size.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star: direct each edge large→small, connect every smaller
    // neighbor (and u itself) to m = min of the smaller neighborhood.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(
        greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = dir.groupBy("u").agg(min("v").as("m"))
      val body = dir.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      // v < u always holds in `dir`, so u != m and the center edge (u, m)
      // is never a self-loop.
      body.union(mins.select(col("u"), col("m").as("v"))).distinct()
    }

    // Materialize one round's edge set with truncated lineage AND return
    // its count in ONE job (r16): `localCheckpoint(true)` runs a
    // count-shaped materialization job internally and throws the number
    // away, so the separate `.count()` per round was a second pass over
    // the same blocks. Marking the InternalRow RDD for local checkpoint
    // and counting IT does both at once; the frame is rebuilt over the
    // truncated-lineage RDD. The previous round's blocks unpersist
    // explicitly once the new round is materialized (they are
    // unreachable — the loop only ever reads the latest round).
    val spark = edges.sparkSession
    def materialize(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_], Long) = {
      val rdd = df.queryExecution.toRdd.map(_.copy())
      rdd.localCheckpoint()
      val n = rdd.count()
      (org.apache.spark.sql.graft.ColumnBridge.internalDataFrame(
        spark, rdd, df.schema), rdd, n)
    }
    var (cur, curRdd, curCount) = materialize(init)
    var converged = curCount == 0
    var it = 0
    while (!converged) {
      it += 1
      require(it <= maxIter,
        s"connectedComponents did not converge in $maxIter rounds — " +
          "pathological graph or a bug; raise maxIter only with evidence")
      val (next, nextRdd, nextCount) = materialize(smallStar(largeStar(cur)))
      // Exact fixpoint test: small-star emits canonical (big, small) pairs,
      // so set equality is count-equality + empty anti-join. The count is
      // a by-product of the materialization job and the anti-join
      // short-circuits at the first novel edge (limit 1), so the test
      // costs one early-out probe per round beyond the round's own job.
      converged = nextCount == curCount &&
        next.join(cur, Seq("u", "v"), "left_anti").limit(1).isEmpty
      curRdd.unpersist(false)
      cur = next
      curRdd = nextRdd
      curCount = nextCount
    }
    // Converged edges are stars (x, m): every member points at the
    // component minimum. Centers appear only on the v side — close them.
    cur.select(col("u").as("node"), col("v").as("component"))
      .union(cur.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }
}
