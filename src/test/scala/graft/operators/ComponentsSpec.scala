package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find, the brute-force ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Roots are component minima because unions always point max -> min.
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("multi-hop chain collapses to one component rooted at the min") {
    val chain = (1L to 9L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got == (1L to 10L).map(_ -> 1L).toMap)
  }

  test("disjoint components stay disjoint") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (20L, 30L), (100L, 100L), (7L, 7L)))
    // Self-loops are dropped: 100 and 7 never appear.
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("empty edge set yields empty result") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 40
      val edges = Seq.fill(30 + trial * 5)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val expected = unionFind(edges)
      assert(cc(edges) == expected, s"trial $trial, edges $edges")
    }
  }

  test("star-heavy and path-heavy shapes agree with union-find") {
    // A hub (0 connected to 1..15) unioned with a long path (20..35) and a
    // bridge 15-20: exercises both star operations' hub handling.
    val hub = (1L to 15L).map((0L, _))
    val path = (20L until 35L).map(i => (i, i + 1))
    val edges = hub ++ path :+ ((15L, 20L))
    val expected = unionFind(edges)
    assert(cc(edges) == expected)
    assert(cc(edges).values.toSet == Set(0L))
  }

  test("superseded iteration checkpoints unpersist: at most the final " +
      "round's blocks remain (r16 loop internals)") {
    import spark.implicits._
    // settle any pending cleanup from earlier tests before snapshotting
    spark.sparkContext.getPersistentRDDs // force store init
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // a long path needs several large/small-star rounds, so the loop
    // materializes several generations — every superseded one must be
    // unpersisted by the time the result returns (the pre-r16 loop left
    // one persisted RDD per round behind)
    val chain = (1L to 33L).map(i => (i, i + 1))
    val got = Components.connectedComponents(chain.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 34L).map(_ -> 1L).toMap)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"iteration checkpoints leaked past the loop: rdd ids $leaked")
  }

  test("non-convergence guard trips rather than looping forever") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val ex = intercept[IllegalArgumentException] {
      Components.connectedComponents(e, "u", "v", maxIter = 0)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
