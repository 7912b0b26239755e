package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC latest-image materialization: collapse a change stream into the
  * current snapshot of each primary key.
  *
  * This is the reference's end-to-end behavior (binlog → ordered change
  * topic) restated as a table: per pk keep only the change with the highest
  * ordinal (the reference's `id`/`pos` sequence, monotone per event,
  * `/root/reference/src/main.rs:107,123`) and drop keys whose latest change
  * is a DELETE.
  *
  * Scale: one hash shuffle on the pk — the minimum possible; the per-key
  * top-1 is a `row_number` that AQE skew-split handles for hot keys. For an
  * incremental pipeline the same function runs inside `foreachBatch`
  * against the previous snapshot (see [[graft.streaming.CdcSnapshot]]).
  */
object CdcMerge {

  def latestImage(
      changes: DataFrame,
      pkCols: Seq[String],
      ordCol: String,
      typeCol: String = "type"): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(ordCol).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(typeCol) =!= "DELETE")
      .drop("__rn")
  }

  /** DBLog/Debezium-style snapshot bootstrap (public algorithm: Andreakis
    * et al., "DBLog: A Watermark Based Change-Data-Capture Framework",
    * 2020; Debezium's incremental snapshot implements the same idea):
    * reconcile a chunked consistent snapshot — each key carrying the
    * binlog position its read happened at (`snapPosCol`) — with the
    * change stream that ran concurrently. A change applies to a key only
    * when its position is PAST that key's snapshot watermark (earlier
    * changes are already reflected in the snapshot read — re-applying
    * them would resurrect stale images); keys absent from the snapshot
    * take every change. The final image is latest-by-position across
    * surviving changes and snapshot rows (surfaced with `type` =
    * SNAPSHOT), DELETEs dropping the key.
    *
    * Scale: both inputs hash-shuffle once on the pk; the watermark join,
    * the union and the top-1 window all run under that one partitioning.
    * Nothing data-scale broadcasts, per-key state is the window's top-1.
    */
  def bootstrapMerge(
      snapshot: DataFrame,
      changes: DataFrame,
      pkCols: Seq[String],
      posCol: String,
      snapPosCol: String,
      typeCol: String = "type"): DataFrame = {
    val marks = snapshot.select((pkCols :+ snapPosCol).map(col): _*)
    val surviving = changes.join(marks, pkCols, "left")
      .filter(col(snapPosCol).isNull || col(posCol) > col(snapPosCol))
      .drop(snapPosCol)
    val snapAsChange = snapshot
      .withColumnRenamed(snapPosCol, posCol)
      .withColumn(typeCol, lit("SNAPSHOT"))
    latestImage(
      surviving.unionByName(snapAsChange, allowMissingColumns = true),
      pkCols, posCol, typeCol)
  }

  /** SCD2 (type-2 slowly-changing-dimension) history: one row per surviving
    * version of each pk, valid over the half-open ordinal interval
    * `[valid_from, valid_to)` — `valid_from` is the change's own ordinal,
    * `valid_to` the NEXT change's ordinal on that pk (any type; a DELETE
    * closes the last version without opening one), null while current.
    *
    * Same scale shape as [[latestImage]]: one pk hash shuffle, one window
    * pass (lead), no per-key state beyond the sort.
    */
  def scd2(
      changes: DataFrame,
      pkCols: Seq[String],
      ordCol: String,
      typeCol: String = "type"): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(ordCol))
    changes
      .withColumn("valid_from", col(ordCol))
      .withColumn("valid_to", lead(col(ordCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .filter(col(typeCol) =!= "DELETE")
  }
}
