package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row

/** Corpus-health audits (q205 Zipf fit, q206 token entropy): semantic
  * invariants any natural-language-like corpus must satisfy, plus the
  * partition-order-freeness the decimal-snapped moment sums buy — the
  * property that makes a 1000-executor fit hash-match a serial oracle.
  */
class CorpusHealthSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq

  test("q205: every lang fits a negative slope with a meaningful r-squared") {
    val rs = rows("q205_zipf_audit")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val (n, slope, r2) =
        (r.getLong(r.fieldIndex("n_top")), r.getDouble(r.fieldIndex("slope")),
          r.getDouble(r.fieldIndex("r2")))
      assert(n >= 2, s"$r")
      assert(slope < 0.0, s"rank-frequency must decay: $r")
      assert(r2 > 0.0 && r2 <= 1.0 + 1e-12, s"$r")
      // intercept ~ ln(max tf): the head frequency is positive
      assert(r.getDouble(r.fieldIndex("intercept")) > 0.0, s"$r")
    }
  }

  test("q206: entropy bounds, TTR bounds, and the n_types <= n_tokens sanity") {
    val rs = rows("q206_token_entropy")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val nTok = r.getLong(r.fieldIndex("n_tokens"))
      val nTyp = r.getLong(r.fieldIndex("n_types"))
      val ttr = r.getDouble(r.fieldIndex("ttr"))
      val h = r.getDouble(r.fieldIndex("entropy"))
      val hn = r.getDouble(r.fieldIndex("norm_entropy"))
      assert(nTyp >= 1 && nTyp <= nTok, s"$r")
      assert(ttr > 0.0 && ttr <= 1.0, s"$r")
      // decimal-snapped ln terms can undershoot 0 by at most the snap grain
      assert(h >= -1e-9 && h <= math.log(nTyp.toDouble) + 1e-9, s"$r")
      assert(hn >= -1e-9 && hn <= 1.0 + 1e-9, s"$r")
    }
  }

  // The EvalSpec lesson applies to the whole audit family: the DuckDB
  // oracles replay the same integer-ppm/snapped-ln formulations, so
  // cross-engine agreement alone cannot catch a formula that is wrong
  // the same way in both engines. Each audit below is re-derived by an
  // INDEPENDENT naive double model over the collected fixture and must
  // agree within the ppm-floor / ln-snap error budget.

  private def contingency(): (Map[(String, String), Long], Map[String, Long],
      Map[String, Long], Long) = {
    val cells = graft.Tables(spark, dir, "documents")
      .groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rowt = cells.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val colt = cells.groupBy(_._1._2).map { case (s, m) => s -> m.values.sum }
    (cells, rowt, colt, cells.values.sum)
  }

  test("q236 chi² agrees with an independent double model within the ppm floor") {
    val (cells, rowt, colt, n) = contingency()
    val out = rows("q236_chi2_independence")
    assert(out.size == cells.size)
    var chi2 = 0.0
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val o = cells(key).toDouble
      val e = rowt(key._1).toDouble * colt(key._2).toDouble / n
      val contrib = (o - e) * (o - e) / e
      chi2 += contrib
      // each ppm value floors the exact rational: within 1 ppm below
      val ePpm = r.getLong(r.fieldIndex("e_ppm")).toDouble / 1e6
      val cPpm = r.getLong(r.fieldIndex("contrib_ppm")).toDouble / 1e6
      assert(ePpm <= e + 1e-12 && ePpm > e - 2e-6, s"$key e=$e got $ePpm")
      assert(cPpm <= contrib + 1e-12 && cPpm > contrib - 2e-6,
        s"$key contrib=$contrib got $cPpm")
    }
    val totPpm = out.head.getLong(out.head.fieldIndex("chi2_total_ppm")).toDouble / 1e6
    // total of per-cell floors: undershoots by < cells · 1 ppm
    assert(totPpm <= chi2 + 1e-9 && totPpm > chi2 - cells.size * 2e-6,
      s"chi2 $chi2 got $totPpm")
  }

  test("q238 effect sizes agree with an independent double model") {
    val (cells, rowt, colt, n) = contingency()
    val r = rows("q238_chi2_effect").head
    val rl = rowt.size.toLong; val cl = colt.size.toLong
    assert(r.getLong(r.fieldIndex("r_levels")) == rl)
    assert(r.getLong(r.fieldIndex("c_levels")) == cl)
    assert(r.getLong(r.fieldIndex("dof")) == (rl - 1) * (cl - 1))
    var chi2 = 0.0; var g = 0.0
    cells.foreach { case ((l, s), o) =>
      val e = rowt(l).toDouble * colt(s).toDouble / n
      chi2 += (o - e) * (o - e) / e
      g += 2.0 * o * math.log(o / e)
    }
    val v2 = chi2 / (n.toDouble * (math.min(rl, cl) - 1))
    val v2Ppm = r.getLong(r.fieldIndex("cramers_v2_ppm")).toDouble / 1e6
    assert(math.abs(v2Ppm - v2) < cells.size * 2e-6 + 2e-6, s"V² $v2 got $v2Ppm")
    // g_total: ln snapped at 1e-9, error ≤ Σ 2·o · 1e-9 = 2n·1e-9
    val gGot = r.getDouble(r.fieldIndex("g_total"))
    assert(math.abs(gGot - g) < 2.0 * n * 1e-9 + 1e-9, s"G $g got $gGot")
    assert(v2Ppm >= 0.0 && v2Ppm <= 1.0 + 1e-6, s"V² out of range: $v2Ppm")
  }

  test("q241 JSD agrees with an independent double model; bounds hold") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tf = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (src, text) =>
      text.split(" ").filter(_.nonEmpty).foreach { w =>
        tf((src, w)) = tf.getOrElse((src, w), 0L) + 1
      }
    }
    val bySrc = tf.groupBy(_._1._1)
    val nBySrc = bySrc.map { case (s, m) => s -> m.values.sum }
    val nTot = nBySrc.values.sum
    val gtf = tf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val out = rows("q241_source_jsd")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == bySrc.keySet)
    bySrc.keys.foreach { src =>
      val nP = nBySrc(src); val nQ = nTot - nP
      // naive model over the FULL union vocabulary, plain doubles
      var kl_p = 0.0; var kl_q = 0.0
      gtf.foreach { case (w, g) =>
        val tp = tf.getOrElse((src, w), 0L); val tq = g - tp
        val p = tp.toDouble / nP; val q = tq.toDouble / nQ
        val m = (p + q) / 2.0
        if (tp > 0) kl_p += p * math.log(p / m)
        if (tq > 0) kl_q += q * math.log(q / m)
      }
      val want = 0.5 * (kl_p + kl_q)
      val (gotNp, gotNq, gotJsd) = out(src)
      assert(gotNp == nP && gotNq == nQ, s"$src token counts")
      assert(math.abs(gotJsd - want) < 1e-6, s"$src jsd $want got $gotJsd")
      assert(gotJsd >= -1e-9 && gotJsd <= math.log(2.0) + 1e-9,
        s"$src jsd out of [0, ln 2]: $gotJsd")
    }
  }

  test("q205/q206 are partition-order-free (exact decimal moment sums)") {
    val conf = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(conf)
    def capture(): (Seq[Row], Seq[Row]) =
      (rows("q205_zipf_audit"), rows("q206_token_entropy"))
    val (z4, e4) = capture()
    try {
      spark.conf.set(conf, "13")
      val (z13, e13) = capture()
      assert(z4 == z13, "zipf fit must not depend on partitioning")
      assert(e4 == e13, "entropy must not depend on partitioning")
    } finally spark.conf.set(conf, saved)
  }
}
