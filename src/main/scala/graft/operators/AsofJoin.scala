package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single right
  * row with the greatest right timestamp <= the left timestamp, per key —
  * "the last known state as of this moment" (market data, feature
  * backfill, CDC state at event time). Spark has no native as-of join;
  * this composes one from union + a running `last(ignoreNulls)` window,
  * the standard shuffle-minimal formulation.
  *
  * Scale shape: ONE hash shuffle of left+right on the key, then a
  * per-partition sort — identical cost to a single window query. No
  * join explosion: each row is examined once. Skewed keys are the same
  * hazard as any window partitionBy; salt upstream if one key dominates.
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND
  * l.ts >= r.ts`: inclusive (a right row AT the left timestamp matches),
  * unmatched left rows keep null value columns. Right rows must be unique
  * per (key, ts) for a deterministic result — enforced here with a
  * max-aggregate per (key, ts), which also resolves DuckDB's own
  * ambiguity the same way.
  */
object AsofJoin {

  /** @param left      probe side; all its columns survive
    * @param right     state side: key ++ rightTs ++ valueCols (others dropped)
    * @param keys      equi-join key columns, present on both sides
    * @param leftTs    left ordering column
    * @param rightTs   right ordering column (renamed internally; may equal leftTs)
    * @param valueCols right columns to carry; names must not collide with left's
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one right value column")
    require(valueCols.forall(!left.columns.contains(_)),
      s"right value columns ${valueCols.mkString(",")} collide with left columns")
    val leftCols = left.columns.toSeq

    // One row per (key, ts) on the right: ties are unobservable afterwards,
    // so `last(ignoreNulls)` below is deterministic.
    val r = right
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => max(c).as(c)): _*)
      .select(
        keys.map(col) ++
          Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
          valueCols.map(col): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).as(c)): _*)

    // Right rows sort BEFORE left rows at an equal timestamp (__side 0 < 1),
    // which is exactly the inclusive <= semantics.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The carried state is ONE struct, not per-column last()s: a right row
    // with a null in one value column must still supersede older rows for
    // ALL columns, or the output would stitch together fields of different
    // right rows.
    r.unionByName(l)
      .withColumn("__state",
        when(col("__side") === 0, struct(valueCols.map(col): _*)))
      .withColumn("__state", last("__state", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__state.$c").as(c)): _*)
  }
}
