package graft.llm

import graft.SparkSpec

/** The q216/q217 folds vs an INDEPENDENT brute-force pair count — the
  * oracle SQL mirrors the histogram formula, so cross-engine agreement
  * alone would not catch a wrong formula; this spec counts the
  * (pos, neg) pairs directly.
  */
class EvalSpec extends SparkSpec {

  private def bruteAuc(rows: Seq[(Long, Long)]): Double = {
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val num2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    num2.toDouble / (2.0 * pos.size * neg.size)
  }

  private def aucOf(rows: Seq[(Long, Long)]): Double = {
    import spark.implicits._
    Eval.aucExact(rows.toDF("pos", "s")).collect()(0).getDouble(2)
  }

  test("AUC equals the brute-force pair count on tie-heavy random data") {
    val rnd = new scala.util.Random(11)
    // Score domain of 8 forces massive ties — the 0.5-credit path.
    val rows = (0 until 400).map { _ =>
      (if (rnd.nextBoolean()) 1L else 0L, rnd.nextInt(8).toLong)
    }
    assert(math.abs(aucOf(rows) - bruteAuc(rows)) < 1e-12)
  }

  test("AUC hits the exact anchors: separation 1, reversal 0, constant 0.5") {
    val sep = (0 until 50).map(i => (if (i < 20) 1L else 0L, if (i < 20) 9L else 1L))
    assert(aucOf(sep) == 1.0)
    val rev = sep.map { case (p, s) => (1L - p, s) }
    assert(aucOf(rev) == 0.0)
    val const = (0 until 50).map(i => (i.toLong % 2, 3L))
    assert(aucOf(const) == 0.5)
  }

  test("ROC points equal the brute-force cumulative counts and are monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { _ =>
      (if (rnd.nextInt(3) == 0) 1L else 0L, rnd.nextInt(5).toLong)
    }
    val got = Eval.rocCurve(rows.toDF("pos", "bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p = rows.count(_._1 == 1L).toLong
    val n = rows.count(_._1 == 0L).toLong
    got.foreach { case (b, fpr, tpr) =>
      val cp = rows.count { case (pp, bb) => pp == 1L && bb >= b }.toLong
      val cn = rows.count { case (pp, bb) => pp == 0L && bb >= b }.toLong
      assert(fpr == cn * 1000000L / n, s"bucket $b fpr")
      assert(tpr == cp * 1000000L / p, s"bucket $b tpr")
    }
    // Descending thresholds: both rates grow as the bucket drops.
    got.sortBy(-_._1).sliding(2).foreach {
      case Array((_, f1, t1), (_, f2, t2)) => assert(f2 >= f1 && t2 >= t1)
      case _ =>
    }
  }

  test("calibration bins equal the brute-force integer floors per bin") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map { _ =>
      val s = rnd.nextInt(1000001).toLong
      // Correlated label so bins differ in observed rate.
      (if (rnd.nextInt(1000000) < s) 1L else 0L, s)
    }
    val got = Eval.calibrationBins(rows.toDF("pos", "s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (bin, n, mp, fp) =>
      val in = rows.filter { case (_, s) => (if (s >= 1000000L) 9L else s / 100000L) == bin }
      assert(n == in.size)
      assert(mp == in.map(_._2).sum / n)
      assert(fp == in.map(_._1).sum * 1000000L / n)
    }
    assert(got.map(_._2).sum == rows.size, "bins must partition the corpus")
  }

  test("calibration score: Brier and ECE match brute force; perfect prediction is 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (0 until 500).map { _ =>
      val s = rnd.nextInt(1000001).toLong
      (if (rnd.nextInt(1000000) < s) 1L else 0L, s)
    }
    val r = Eval.calibrationScore(rows.toDF("pos", "s")).collect()(0)
    val brier = rows.map { case (p, s) =>
      val d = s - p * 1000000L; d.toDouble * d.toDouble }.sum / (1.0e12 * rows.size)
    assert(math.abs(r.getDouble(1) - brier) < 1e-12)
    val ece = (0L to 9L).map { b =>
      val in = rows.filter { case (_, s) => (if (s >= 1000000L) 9L else s / 100000L) == b }
      math.abs(in.map(_._1).sum * 1000000.0 - in.map(_._2).sum.toDouble)
    }.sum / (1.0e6 * rows.size)
    assert(math.abs(r.getDouble(2) - ece) < 1e-9)
    // A perfectly calibrated hard predictor: score 0/1e6 equals the label.
    val perfect = (0 until 100).map(i => ((i % 2).toLong, (i % 2).toLong * 1000000L))
    val pr = Eval.calibrationScore(perfect.toDF("pos", "s")).collect()(0)
    assert(pr.getDouble(1) == 0.0 && pr.getDouble(2) == 0.0)
  }

  test("retrieval metrics: perfect system scores exactly 1, disjoint 0, hand example") {
    import spark.implicits._
    def df(rows: Seq[(Long, Int, Long)]) =
      rows.toDF("query_id", "rank", "neighbor_id")
    val truth = df(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val perfect = Eval.retrievalMetrics(truth, truth, k = 3).collect()(0)
    assert(perfect.getDouble(1) == 1.0 && perfect.getDouble(2) == 1.0 &&
      perfect.getDouble(3) == 1.0)
    val disjoint = Eval.retrievalMetrics(truth,
      df(Seq((1L, 1, 90L), (1L, 2, 91L), (1L, 3, 92L))), k = 3).collect()(0)
    assert(disjoint.getDouble(1) == 0.0 && disjoint.getDouble(2) == 0.0 &&
      disjoint.getDouble(3) == 0.0)
    // Hand example: sys = (miss, hit@2, hit@3) → recall 2/3, MRR 1/2,
    // nDCG = (g2 + g3) / (g1 + g2 + g3) with gains on the DECIMAL(18,9) grid.
    val r = Eval.retrievalMetrics(truth,
      df(Seq((1L, 1, 90L), (1L, 2, 10L), (1L, 3, 12L))), k = 3).collect()(0)
    def g(rk: Int) = BigDecimal(1.0 / (math.log(rk + 1.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(r.getDouble(1) - 2.0 / 3.0) < 1e-15)
    assert(r.getDouble(2) == 0.5)
    val want = ((g(2) + g(3)).toDouble / (g(1) + g(2) + g(3)).toDouble)
    assert(math.abs(r.getDouble(3) - want) < 1e-15)
    // The q225 composition runs and stays in [0, 1] with exact-ranker recall 1.
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val exactTruth = Similarity.bruteForceTopK(q, e, 5)
    val self = Eval.retrievalMetrics(exactTruth, exactTruth, 5).collect()
    assert(self.length == 10 && self.forall(row =>
      row.getDouble(1) == 1.0 && row.getDouble(2) == 1.0 && row.getDouble(3) == 1.0))
  }
}
