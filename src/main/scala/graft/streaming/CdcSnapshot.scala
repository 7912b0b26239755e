package graft.streaming

import graft.cdc.CdcMerge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental CDC latest-image materialization: a Structured Streaming
  * sink that folds each micro-batch of change rows into a parquet snapshot
  * — the reference's end-to-end dataflow (binlog → Canal topic → consumer
  * merge) collapsed to one streaming query with exactly-once semantics
  * from the checkpoint + atomic snapshot swap.
  *
  * At scale the union+merge re-ranks only pks present in the batch when the
  * snapshot is stored partitioned by pk bucket; here the snapshot is
  * re-written whole per batch (fixture-sized), with the directory swap
  * keeping readers consistent.
  */
object CdcSnapshot {

  /** Merge `batch` into the parquet snapshot at `snapshotDir`. Batch rows
    * must carry the pk columns, `ordCol`, and a `type` column with
    * INSERT/UPDATE/DELETE.
    */
  def mergeBatch(batch: DataFrame, pkCols: Seq[String], ordCol: String,
      snapshotDir: String): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val snap = new Path(snapshotDir)
    val backup = new Path(snapshotDir + "__old")
    val tmp = new Path(snapshotDir + "__tmp")
    val fs = snap.getFileSystem(conf)
    // Crash-safe swap: every failure window leaves either `snap` or `backup`
    // present, and reads fall back to `backup` — a naive delete-then-rename
    // would lose the whole snapshot if the process died between the two.
    val source =
      if (fs.exists(snap)) Some(snap)
      else if (fs.exists(backup)) Some(backup)
      else None
    val prev = source match {
      case Some(p) => spark.read.parquet(p.toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    }
    val merged = CdcMerge.latestImage(prev.unionByName(batch), pkCols, ordCol)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(snap)) fs.rename(snap, backup)
    fs.rename(tmp, snap)
    fs.delete(backup, true)
  }

  /** Start the streaming merge over a change-row stream. */
  def start(changes: DataFrame, pkCols: Seq[String], ordCol: String,
      snapshotDir: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, pkCols, ordCol, snapshotDir)
      }
      .start()
}
