package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank (q178): serial-model equivalence, probability conservation
  * with dangling nodes, known-structure sanity, and bit-determinism under
  * repartitioning (the decimal-snapped contribution sums).
  */
class PageRankSpec extends SparkSpec {

  private def model(edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val out = es.groupBy(_._1).view.mapValues(_.size).toMap
    val inE = es.groupBy(_._2)
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dmass = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val inflow = inE.getOrElse(v, Nil).map { case (u, _) => r(u) / out(u) }.sum
        v -> ((1 - d) / n + d * (inflow + dmass / n))
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], parts: Int = 3,
      d: Double = 0.85, iters: Int = 10): Map[Long, Double] = {
    val spark2 = spark
    import spark2.implicits._
    PageRank.ranks(edges.toDF("s", "t").repartition(parts), "s", "t", d, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("matches the serial model on a mixed graph with dangling nodes") {
    // chain + hub + dangling sink: 1→2→3, 4→3, 3→5 (5 dangling), 6→1
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (4, 3), (3, 5), (6, 1))
    val got = run(edges)
    val want = model(edges, 0.85, 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) <= 1e-9, s"node $v: $r vs ${want(v)}")
    }
    // probability is conserved through dangling redistribution
    assert(math.abs(got.values.sum - 1.0) <= 1e-9, got.values.sum)
  }

  test("a directed cycle is uniform; a sink out-ranks its feeders") {
    val cyc = run(Seq[(Long, Long)]((1, 2), (2, 3), (3, 1)))
    cyc.values.foreach(r => assert(math.abs(r - 1.0 / 3) <= 1e-9, cyc))
    val star = run(Seq[(Long, Long)]((1, 9), (2, 9), (3, 9)))
    assert(star(9) > star(1) && star(1) == star(2) && star(2) == star(3), star)
  }

  test("bit-identical under repartitioning (decimal contribution sums)") {
    val edges = (1L to 200L).map(i => (i, i * 7 % 83))
    val a = run(edges, parts = 1)
    val b = run(edges, parts = 13)
    assert(a == b) // exact double equality, not tolerance
  }

  test("zero iterations returns the uniform start over all touched nodes") {
    val got = run(Seq[(Long, Long)]((1, 2), (3, 2)), iters = 0)
    assert(got.keySet == Set(1L, 2L, 3L))
    got.values.foreach(v => assert(v == 1.0 / 3, got))
  }
}
