package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Classifier-evaluation folds (q216/q217): exact AUC and ROC points
  * computed over the per-score histogram instead of a corpus-wide rank —
  * the score domain is metadata-scale, the corpus is not. All pair
  * arithmetic stays BIGINT/DECIMAL-exact; doubles appear only in the one
  * final division, so results are engine-portable bit for bit.
  */
object Eval {

  /** Exact AUC (Mann-Whitney with the standard 0.5 tie credit) of an
    * integer score against a 0/1 label. `base` needs (pos: long 0/1,
    * s: long). AUC·2PN = Σ_s np(s)·(2·nn_below(s) + nn(s)) — the pair
    * count folded over the score histogram; one histogram shuffle plus a
    * bounded window over score levels. Returns one row
    * (n_pos, n_neg, auc, gini).
    */
  def aucExact(base: DataFrame): DataFrame = {
    val h = base.groupBy("s").agg(sum("pos").as("np"),
      (count(lit(1)) - sum("pos")).as("nn"))
    val wLev = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("s")
    val cum = h.select(col("np"), col("nn"),
      (sum(col("nn")).over(wLev) - col("nn")).as("nn_below"))
    cum.agg(sum("np").as("p"), sum("nn").as("n"),
        sum(col("np").cast(DecimalType(38, 0)) *
          (lit(2) * col("nn_below") + col("nn"))).as("num2"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        (col("num2").cast(DoubleType) /
          (lit(2.0) * col("p").cast(DoubleType) * col("n").cast(DoubleType)))
          .as("auc"))
      .select(col("n_pos"), col("n_neg"), col("auc"),
        (lit(2.0) * col("auc") - lit(1.0)).as("gini"))
  }

  /** Reliability diagram (calibration curve): 10 equal-width bins over a
    * ppm-scaled probability score, per bin the doc count, the mean
    * predicted probability, and the observed positive rate — all exact
    * integer ppm floors. `base` needs (pos: long 0/1, s: long ppm in
    * [0, 1e6]). One histogram shuffle; no window at all.
    */
  def calibrationBins(base: DataFrame): DataFrame = {
    base.selectExpr("pos", "s",
        "CASE WHEN s >= 1000000 THEN 9 ELSE s DIV 100000 END AS bin")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"),
        sum("s").as("ssum"))
      .selectExpr("bin", "n",
        "ssum DIV n AS mean_pred_ppm",
        "(np * CAST(1000000 AS BIGINT)) DIV n AS frac_pos_ppm")
      .orderBy("bin")
  }

  /** Scalar calibration quality of the same ppm score: Brier score
    * (mean squared error of s/1e6 vs the 0/1 label) and 10-bin expected
    * calibration error — numerators folded as exact DECIMAL(38,0)
    * integer sums (per-row (s − pos·1e6)² ≤ 1e12 — the sums overflow
    * BIGINT at real corpus counts), one double division each at the end.
    * Returns one row (n_docs, brier, ece).
    */
  def calibrationScore(base: DataFrame): DataFrame = {
    val binned = base.selectExpr("pos", "s",
      "CASE WHEN s >= 1000000 THEN 9 ELSE s DIV 100000 END AS bin")
    val bins = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"), sum("s").as("ssum"),
        sum(((col("s") - col("pos") * lit(1000000L)) *
          (col("s") - col("pos") * lit(1000000L))).cast(DecimalType(38, 0)))
          .as("sq"))
    bins.agg(sum("n").as("nd"), sum("sq").as("sqsum"),
        sum(abs(col("np").cast(DecimalType(38, 0)) * lit(1000000) - col("ssum")))
          .as("gap"))
      .select(col("nd").as("n_docs"),
        (col("sqsum").cast(DoubleType) /
          (lit(1.0e12) * col("nd").cast(DoubleType))).as("brier"),
        (col("gap").cast(DoubleType) /
          (lit(1.0e6) * col("nd").cast(DoubleType))).as("ece"))
  }

  /** Retrieval metrics of a ranked system against exact ground truth
    * (q225): per query, recall@k, MRR@k (reciprocal rank of the first
    * relevant hit), and nDCG@k with binary relevance = membership in the
    * truth top-k. Both inputs carry (query_id, rank, neighbor_id) — the
    * ANN family's shape — and truth is assumed to hold exactly k rows
    * per query (the exact top-k contract), so IDCG is the constant
    * Σ_{r≤k} 1/log2(r+1). Every 1/log2 gain snaps to DECIMAL(18,9)
    * (both in the per-rank gains and in the scala-side IDCG constant,
    * same HALF_UP grid) so a system identical to the truth scores
    * EXACTLY 1.0. One truth-key join + one per-query agg — both sides
    * are |Q|·k rows, metadata-scale relative to the corpus the rankers
    * scanned.
    */
  def retrievalMetrics(truth: DataFrame, sys: DataFrame, k: Int): DataFrame = {
    val rel = truth.select(col("query_id"), col("neighbor_id"), lit(1L).as("rel"))
    val gain9 = (lit(1.0) / log2(col("rank").cast(DoubleType) + lit(1.0)))
      .cast(DecimalType(18, 9))
    val idcg = (1 to k).map { r =>
      BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    sys.join(rel, Seq("query_id", "neighbor_id"), "left")
      .na.fill(0L, Seq("rel"))
      .groupBy("query_id")
      .agg(
        (sum(col("rel")).cast(DoubleType) / lit(k.toDouble)).as("recall"),
        coalesce(lit(1.0) /
            min(when(col("rel") === 1L, col("rank"))).cast(DoubleType),
          lit(0.0)).as("mrr"),
        (sum(when(col("rel") === 1L, gain9)
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 9))))
          .cast(DoubleType) / lit(idcg.toDouble)).as("ndcg"))
  }

  /** ROC points over coarse score buckets, thresholds scanned descending
    * (predict positive iff bucket ≥ t); cumulative TPR/FPR as exact
    * integer ppm floors. `base` needs (pos: long 0/1, bucket: long).
    * Same single histogram shuffle; the cumulative window runs over the
    * bucket rows only.
    */
  def rocCurve(base: DataFrame): DataFrame = {
    val h = base.groupBy("bucket").agg(sum("pos").as("np"),
      (count(lit(1)) - sum("pos")).as("nn"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("bucket").desc)
    val tot = base.agg(sum("pos").as("p"),
      (count(lit(1)) - sum("pos")).as("nneg"))
    h.select(col("bucket"),
        sum(col("np")).over(wDesc).as("cp"),
        sum(col("nn")).over(wDesc).as("cn"))
      .crossJoin(broadcast(tot))
      .selectExpr("bucket",
        "(cn * CAST(1000000 AS BIGINT)) DIV nneg AS fpr_ppm",
        "(cp * CAST(1000000 AS BIGINT)) DIV p AS tpr_ppm")
      .orderBy("bucket")
  }
}
