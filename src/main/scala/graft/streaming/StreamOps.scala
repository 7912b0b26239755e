package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing and dedup operators (SURVEY.md §2B streaming rows).
  *
  * Every function here takes a plain DataFrame and works identically on a
  * batch frame or a streaming one (`spark.readStream`) — Spark's unified
  * semantics. The batch path is what the DuckDB oracle replays; the
  * streaming path (with watermarks and state) is exercised by
  * StreamingSpec over MemoryStream inputs.
  *
  * Scale: windowed aggregations shuffle once on (window, key); session
  * windows use Spark's native session state; dedup's per-key top-1 is a
  * single shuffle + row_number (or state-store lookup when streaming).
  */
object StreamOps {

  /** Tumbling event-time windows: counts + exact sum per (window, key). */
  def tumbling(df: DataFrame, ts: String, key: String, value: String,
      every: String = "10 minutes"): DataFrame =
    df.groupBy(window(col(ts), every).as("w"), col(key))
      .agg(count(lit(1)).as("cnt"),
        sum(col(value).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col(key), col("cnt"), col("sum_value"))

  /** Sliding event-time windows (length `every`, step `slide`). */
  def sliding(df: DataFrame, ts: String, key: String,
      every: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    df.groupBy(window(col(ts), every, slide).as("w"), col(key))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col(key), col("cnt"))

  /** Session windows with a fixed inactivity gap, per key. */
  def sessions(df: DataFrame, ts: String, key: String,
      gap: String = "5 minutes"): DataFrame =
    df.groupBy(session_window(col(ts), gap).as("w"), col(key))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Deterministic dedup: first row per key set, ordered by `ord` columns.
    * (Streaming uses `dropDuplicates`/`dropDuplicatesWithinWatermark`,
    * which keep the first *arrival*; this batch form pins the same result
    * deterministically for oracle replay.)
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Event-time watermark wrapper (streaming lateness bound). */
  def watermarked(df: DataFrame, ts: String, delay: String): DataFrame =
    df.withWatermark(ts, delay)

  /** Stream-stream interval join: each left row pairs with right rows of
    * the same key whose event time lies in [leftTs - before, leftTs].
    * Callers watermark both inputs; the time bound is what lets Spark
    * evict join state, keeping state O(key × window) instead of unbounded.
    * Column names must be disjoint apart from `key`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, before: String = "10 minutes"): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(rightTs) <= col(leftTs))
      .drop(right(key))
}
