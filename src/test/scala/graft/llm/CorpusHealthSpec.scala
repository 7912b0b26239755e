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
