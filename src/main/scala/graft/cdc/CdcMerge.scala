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
