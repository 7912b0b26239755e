package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Deterministic stratified sampling for training-data mixture control:
  * keep a row iff a hash of its stable id falls under its stratum's
  * rate threshold.
  *
  * Why hash-threshold instead of `df.sample()`: the decision is a pure
  * function of (seed, id), so it is reproducible across runs, engines
  * (md5 is md5 everywhere — the DuckDB oracle computes the identical
  * sample), task retries, and data layout changes; and supersets nest —
  * raising a stratum's rate strictly grows its sample, which matters when
  * a mixture is re-weighted mid-project. `sample()` guarantees none of
  * these.
  *
  * Scale shape: zero shuffle — the rate lookup is a broadcast join and
  * the predicate is a per-row filter fused into the scan stage.
  */
object Sampling {

  /** First 16 bits of md5(seed:id) as a lowercase 4-hex-char string.
    * Uniform over [0, 2^16); string comparison on fixed-width hex is
    * numeric comparison. */
  def hashBucket(idCol: Column, seed: String): Column =
    substring(md5(concat(lit(seed + ":"), idCol.cast(StringType)).cast(BinaryType)), 1, 4)

  /** Rate → the 4-hex threshold `hashBucket` is compared against. */
  def threshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val n = math.round(rate * 65536.0).toInt
    // rate 1.0 needs a sentinel above every bucket: "g" sorts after every
    // hex digit, so `bucket < "g"` keeps all rows.
    if (n >= 65536) "g" else f"$n%04x"
  }

  /** Per-group COUNT cap (the other half of mixture control: "at most n
    * docs per source"): keep the n rows of each group whose id-hash orders
    * first. Hash order, not insertion/file order, so the kept set is a
    * uniform, reproducible draw with the same nesting property as
    * [[stratifiedSample]] — raising n strictly grows the sample.
    *
    * One hash shuffle on the group key. A pathologically hot group is
    * bounded by the window's per-partition sort, not by memory (Spark's
    * window sort spills); if one group dominates a 100 TB corpus, cut it
    * first with a rate via [[stratifiedSample]], then cap exactly.
    */
  def capPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      n: Int,
      seed: String = "s42"): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      // full md5, not hashBucket's 16-bit prefix: the tie-break id makes
      // either exact, but 128 bits keeps the draw order collision-free
      .orderBy(
        md5(concat(lit(seed + ":"), col(idCol).cast(StringType)).cast(BinaryType)),
        col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Per-stratum deterministic sample: keep each row of `df` with its
    * stratum's rate (`defaultRate` for strata not in `rates`).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      seed: String = "s42"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = broadcast(
      rates.toSeq.map { case (k, r) => (k, threshold(r)) }.toDF(stratumCol, "__thr"))
    df.join(rateDf, Seq(stratumCol), "left")
      .withColumn("__thr", coalesce(col("__thr"), lit(threshold(defaultRate))))
      .filter(hashBucket(col(idCol), seed) < col("__thr"))
      .drop("__thr")
  }

  /** Token-budget selection (q215): the greedy prefix of `base` in
    * (score desc, doc_id) order whose inclusive `n_tok` cumsum stays
    * within the budget — computed WITHOUT a global sort. Phase 1
    * aggregates supply per score level (metadata-scale: bounded by the
    * score domain, not the corpus), cumsums the levels in a bounded
    * window, and broadcasts the cut back: levels that fit whole are kept
    * with no sort at all. Phase 2 ranks only the single boundary level
    * (partitionBy(score) window) and fills the residual budget in doc_id
    * order — identical selection to the serial greedy by construction.
    * If the boundary level is itself skewed, the same level-cut recurses
    * on doc_id buckets.
    *
    * `base`: (doc_id, n_tok, score) — any long-typed score works.
    * `budget`: a 1-row (budget: long) frame (kept as a frame so the
    * whole selection stays one lazy plan).
    */
  def tokenBudgetSelect(base: DataFrame, budget: DataFrame): DataFrame = {
    val wLev = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("score").desc)
    val levels = base.groupBy("score").agg(sum(col("n_tok")).as("tok_s"))
      .crossJoin(broadcast(budget))
      .select(col("score"), col("tok_s"), col("budget"),
        (sum(col("tok_s")).over(wLev) - col("tok_s")).as("cum_before"))
    val fullLevels = levels
      .filter(col("cum_before") + col("tok_s") <= col("budget"))
      .select("score")
    val boundary = levels
      .filter(col("cum_before") <= col("budget") &&
        col("cum_before") + col("tok_s") > col("budget"))
      .select(col("score"), (col("budget") - col("cum_before")).as("resid"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("score").orderBy("doc_id")
    val keptFull = base.join(broadcast(fullLevels), Seq("score"))
    val keptBoundary = base.join(broadcast(boundary), Seq("score"))
      .withColumn("cum_in", sum(col("n_tok")).over(wIn))
      .filter(col("cum_in") <= col("resid"))
    keptFull.select("doc_id", "score", "n_tok")
      .unionByName(keptBoundary.select("doc_id", "score", "n_tok"))
  }
}
