package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

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
    // Static fan-out bound: the window is a constant offset of the left ts,
    // so bins-per-row is known here. Refuse an explode blow-up up front.
    val fanout = (upperUs - lowerUs) / binWidthUs + 2
    require(fanout <= 65536,
      s"window [$lowerUs, $upperUs] spans ~$fanout bins of $binWidthUs us; " +
        "choose a binWidth near the window size (fan-out should stay small)")
    def usOf(c: Column): Column = unix_micros(c)
    // Integer floor division: floor(us / w) through a double misbins
    // |us| > 2^53 (year-9999 sentinels), silently losing boundary rows.
    def binOf(us: Column): Column = ColumnBridge.column(
      StaticInvoke(classOf[java.lang.Math], LongType, "floorDiv",
        Seq(ColumnBridge.expression(us), Literal(binWidthUs)),
        Seq(LongType, LongType)))
    // Scratch columns use a collision-proof prefix: a user column named
    // e.g. `us` becomes r_us after prefixing and must not be clobbered.
    val wLo = "__graft_w_lo"; val wHi = "__graft_w_hi"
    val bin = "__graft_bin"; val rUs = "__graft_r_us"

    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
      .withColumn(wLo, usOf(col(s"l_$leftTs")) + lowerUs)
      .withColumn(wHi, usOf(col(s"l_$leftTs")) + upperUs)
      .withColumn(bin,
        explode(sequence(binOf(col(wLo)), binOf(col(wHi)))))
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn(rUs, usOf(col(s"r_$rightTs")))
      .withColumn(bin, binOf(col(rUs)))

    l.join(r, Seq(bin))
      .filter(col(rUs) >= col(wLo) && col(rUs) <= col(wHi))
      .drop(bin, wLo, wHi, rUs)
  }
}
