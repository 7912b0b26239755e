package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned temporal range join: pair each left row with every right row
  * whose timestamp falls in `[l.ts + lower, l.ts + upper]`.
  *
  * Spark plans a bare `l.join(r, r.ts between ...)` as BroadcastNestedLoop
  * (or worse, cartesian) — O(|L|·|R|) comparisons and a single-task
  * bottleneck once the small side stops fitting in memory. The scale-safe
  * shape is the standard bin/bucket rewrite: quantize time into
  * `binWidth`-sized buckets, explode the LEFT side onto every bucket its
  * window overlaps (a bounded, known fan-out of
  * `ceil(window/binWidth)+1`), bucket the RIGHT side once, hash-join on
  * the bucket id, and re-check the exact predicate. Same output, but the
  * work is one shuffle partitioned by time bucket — embarrassingly
  * parallel and AQE-splittable if one bucket is hot.
  *
  * The rewrite is lossless for any `binWidth > 0`; choose it near the
  * window size so left fan-out stays at ~2 and each bucket pairs only
  * temporal neighbors.
  */
object RangeJoin {

  /** @param left/right inputs; all their columns survive (prefixed)
    * @param leftTs/rightTs  timestamp column names
    * @param lowerUs/upperUs window bounds relative to left ts, microseconds
    * @param binWidthUs      bucket width, microseconds
    */
  def timestampRangeJoin(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lowerUs: Long, upperUs: Long,
      binWidthUs: Long): DataFrame = {
    require(upperUs >= lowerUs, s"empty window [$lowerUs, $upperUs]")
    require(binWidthUs > 0, "binWidth must be positive")
    def usOf(c: Column): Column = unix_micros(c)
    def binOf(us: Column): Column = floor(us / binWidthUs)

    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
      .withColumn("w_lo", usOf(col(s"l_$leftTs")) + lowerUs)
      .withColumn("w_hi", usOf(col(s"l_$leftTs")) + upperUs)
      .withColumn("bin",
        explode(sequence(binOf(col("w_lo")), binOf(col("w_hi")))))
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn("r_us", usOf(col(s"r_$rightTs")))
      .withColumn("bin", binOf(col("r_us")))

    l.join(r, Seq("bin"))
      .filter(col("r_us") >= col("w_lo") && col("r_us") <= col("w_hi"))
      .drop("bin", "w_lo", "w_hi", "r_us")
  }
}
