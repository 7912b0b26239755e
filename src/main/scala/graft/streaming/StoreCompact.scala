package graft.streaming

import org.apache.spark.sql.SparkSession

/** Compaction for the append-accumulated parquet stores the streaming
  * dedup screens keep ([[ImageDedupStream]] (media_id, h),
  * [[TextDedupStream]] (doc_id, sig), [[SemDedupStream]]'s vector store):
  * every trigger appends one small file, so a one-trigger-per-minute
  * ingest leaves half a million files a year — the classic small-file
  * failure, where the per-trigger store RE-READ (the screens' exact
  * backstop) spends its time opening footers instead of scanning rows.
  *
  * `compact` rewrites the store into `targetFiles` coalesced files via a
  * temp directory and a rename swap. The swap is two renames, not one
  * atomic operation — safe here because a foreachBatch ingest is the
  * store's ONLY writer and triggers run serially, so compaction runs
  * BETWEEN triggers (same maintenance slot as the index rebuilds), and a
  * crash INSIDE the rename window (store retired, replacement not yet
  * published) is healed by [[recover]], which the ingest bodies run
  * before every store read — without it a missing-store crash residue
  * would read as bootstrap and silently re-admit every rejected
  * duplicate. A concurrent reader outside the ingest would need a
  * manifest layer (CdcSnapshot's generation scheme) instead.
  */
object StoreCompact {

  /** Recover from a compaction interrupted between the two renames: in
    * that window the store path does not exist but the retired copy at
    * `dir + "_compact_old"` holds every row — without this check the next
    * trigger's missing-store test would read as BOOTSTRAP and the screen
    * would silently re-admit everything it ever rejected. The ingest
    * bodies call this before reading (two fs.exists checks on the happy
    * path); `compact` calls it first for the same reason. Returns true if
    * a retired copy was restored. A tmp dir alongside a LIVE store is the
    * other crash residue (died before the first rename) — stale, deleted
    * by the next compact's rewrite.
    */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + "_compact_old")
    if (!fs.exists(path) && fs.exists(old)) {
      require(fs.rename(old, path), s"recover: could not restore $old")
      true
    } else false
  }

  /** Row-identical rewrite of `dir` into at most `targetFiles` files.
    * Returns (filesBefore, filesAfter). No-op (returns counts) when the
    * store is already at or under the target.
    */
  def compact(spark: SparkSession, dir: String,
      targetFiles: Int = 8): (Int, Int) = {
    require(targetFiles >= 1, s"targetFiles $targetFiles")
    recover(spark, dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count { st =>
        val n = st.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
      }
    val before = dataFiles(path)
    if (before <= targetFiles) return (before, before)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + "_compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(dir)
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val after = dataFiles(tmp)
    require(fs.rename(path, old), s"compact: could not retire $dir")
    require(fs.rename(tmp, path), s"compact: could not publish $tmp")
    fs.delete(old, true)
    (before, after)
  }

  /** Rewrite `dir` as `f(current rows)` under the same temp-dir + rename
    * swap (and so the same [[recover]] healing) as [[compact]] — the
    * physical-removal primitive behind tombstone application
    * ([[CurationChain.applyTombstones]]): logical deletes filter reads
    * until a cadence pass rewrites the store without the retired rows.
    */
  def rewrite(spark: SparkSession, dir: String,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      targetFiles: Int = 8): Unit = {
    require(targetFiles >= 1, s"targetFiles $targetFiles")
    recover(spark, dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + "_compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    f(spark.read.parquet(dir))
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(path, old), s"rewrite: could not retire $dir")
    require(fs.rename(tmp, path), s"rewrite: could not publish $tmp")
    fs.delete(old, true)
    ()
  }
}
