package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** MMR diversity re-rank (q155): exact equality with an independent
  * reference implementation of the Carbonell–Goldstein greedy, the λ=1
  * degeneration to pure relevance order, and a measured diversity gain
  * over the plain top-k.
  */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
    while (j < a.length) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Independent greedy MMR over (id, rel, vec) candidates. */
  private def refMmr(cands: Seq[(Long, Double, Array[Double])], k: Int,
      lam: Double): Seq[(Int, Long)] = {
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val left = scala.collection.mutable.ArrayBuffer(cands: _*)
    val out = Seq.newBuilder[(Int, Long)]
    for (r <- 1 to math.min(k, cands.size)) {
      val best = left.map { case (id, rel, v) =>
        val pen = if (chosen.isEmpty) 0.0 else chosen.map(s => cos(v, s._2)).max
        (lam * rel - (1.0 - lam) * pen, id, v)
      }.minBy { case (sc, id, _) => (-sc, id) }
      out += ((r, best._2))
      chosen += ((best._2, best._3))
      left --= left.filter(_._1 == best._2)
    }
    out.result()
  }

  private def vectors(): Map[Long, Array[Double]] =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  test("mmrRerank equals the independent reference greedy on every query") {
    val e = Tables(spark, dir, "embeddings")
    val vecs = vectors()
    val got = Similarity.mmrRerank(e.filter(col("vec_id") < 10), e,
        kCand = 20, k = 5, lam = 0.7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val top = Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.nonEmpty)
    top.foreach { case (qid, nids) =>
      val qv = vecs(qid)
      val cands = nids.sorted.map(id => (id, cos(qv, vecs(id)), vecs(id)))
      val want = refMmr(cands, 5, 0.7).map(_._2)
      assert(got(qid) == want, s"query $qid: got ${got(qid)}, want $want")
    }
  }

  test("lambda=1 degenerates to pure relevance order (the plain top-k)") {
    val e = Tables(spark, dir, "embeddings")
    val mmr = Similarity.mmrRerank(e.filter(col("vec_id") < 3), e,
        kCand = 20, k = 5, lam = 1.0)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val top = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(mmr == top)
  }

  test("MMR selection is measurably more diverse than the plain top-k") {
    val e = Tables(spark, dir, "embeddings")
    val vecs = vectors()
    def meanPairwise(sel: Map[Long, Seq[Long]]): Double = {
      val vals = sel.toSeq.flatMap { case (_, ids) =>
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield cos(vecs(ids(i)), vecs(ids(j)))
      }
      vals.sum / vals.size
    }
    val mmr = Similarity.mmrRerank(e.filter(col("vec_id") < 10), e,
        kCand = 20, k = 5, lam = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val top = Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val (dm, dt) = (meanPairwise(mmr), meanPairwise(top))
    assert(dm <= dt, f"MMR mean pairwise cos $dm%.4f should be <= top-k $dt%.4f")
  }
}
