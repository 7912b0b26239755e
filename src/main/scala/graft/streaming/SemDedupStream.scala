package graft.streaming

import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SEMANTIC dedup — the embedding-side of [[CorpusIngest]] and
  * the production form of the q208 incremental operator: every ingest
  * micro-batch is screened against the STANDING embedding corpus (and
  * against itself), and only semantically novel vectors are admitted —
  * the corpus then grows by exactly the admitted rows, so a paraphrase
  * of something admitted two triggers ago is rejected just like one
  * admitted two years ago.
  *
  * Shape: `foreachBatch` (the [[CdcSnapshot]] idiom) — inside a trigger
  * the batch is a static DataFrame, so the screen IS the batch operator
  * (`Similarity.semDedupPairsAgainst`: corpus-trained cells, batch side
  * multi-probes, only new×corpus pairs scored) followed by the in-batch
  * keep-lowest drop (`semDedupPairs`, the q71 greedy rule). No new
  * semantics exist here — the streaming layer only sequences the
  * oracle-gated batch operators and owns the corpus append.
  *
  * Scale: per-trigger work is |batch|·cellSize cosines + one corpus
  * cell-assignment pass; the corpus side re-reads per trigger (the
  * exact backstop — a production deployment fronts it with the q147
  * Bloom screen and caches the trained cell model between triggers,
  * retraining on a cadence as the corpus drifts; centroid training is
  * already sample-bounded so even per-trigger retraining is
  * metadata-scale driver work).
  */
object SemDedupStream {

  /** Screen one micro-batch: drop in-batch near-dup higher ids (greedy
    * q71 rule), then drop everything with a near-dup neighbor in the
    * corpus. Both screens share the corpus-trained cell space when the
    * corpus is non-empty; an empty corpus (bootstrap trigger) applies
    * only the in-batch screen with cells trained on the batch itself.
    * Pure batch-side function — `foreachBatch` calls it per trigger.
    */
  /** Below one cell's worth of vectors the exact screen (nlist = 1) is
    * cheaper than training a cell map — and cell geometry degenerates
    * when k outgrows the trainable sample anyway.
    */
  private val ExactScreenCeiling = 512L

  def admitBatch(batch: DataFrame, corpus: DataFrame, threshold: Double,
      probes: Int = 4): DataFrame = {
    if (batch.isEmpty) return batch // an idle trigger has nothing to train on
    val inBatchDrops = {
      val exact = batch.count() <= ExactScreenCeiling
      Similarity.semDedupPairs(batch, threshold,
          nlist = if (exact) 1 else 0, probes = if (exact) 1 else probes)
        .select(col("db").as("vec_id")).distinct()
    }
    val survivors = batch.join(inBatchDrops, Seq("vec_id"), "left_anti")
    if (corpus.isEmpty) survivors
    else {
      val exact = corpus.count() <= ExactScreenCeiling
      val dupIds = Similarity
        .semDedupPairsAgainst(survivors, corpus, threshold,
          nlist = if (exact) 1 else 0, probes = if (exact) 1 else probes)
        .select(col("new_id").as("vec_id")).distinct()
      survivors.join(dupIds, Seq("vec_id"), "left_anti")
    }
  }

  /** The full trigger body for a parquet-backed corpus store: screen the
    * batch against `corpusDir` (missing/empty dir = bootstrap) and
    * append the admitted rows to it. Wire as
    * `stream.writeStream.foreachBatch(SemDedupStream.ingestInto(dir, t) _)`.
    * `compactEvery` > 0 runs [[StoreCompact]] after every that-many
    * triggers (keyed on batchId so restarts keep the cadence).
    */
  def ingestInto(corpusDir: String, threshold: Double, probes: Int = 4,
      compactEvery: Int = 0)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    StoreCompact.recover(spark, corpusDir) // heal an interrupted compaction
    // Bootstrap detection by actual path existence (Hadoop FileSystem),
    // not by matching the AnalysisException message text — error phrasing
    // varies across Spark versions/locales and a mismatch would crash the
    // first trigger instead of bootstrapping.
    val path = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasData: Boolean = fs.exists(path) &&
      fs.listStatus(path).exists { st =>
        val n = st.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
      }
    val corpus =
      if (hasData) spark.read.parquet(corpusDir).select("vec_id", "embedding")
      else spark.emptyDataFrame
    // foreachBatch re-executes the batch plan per action (two here:
    // the screen's pair jobs and the append) — persist, the soak lesson
    val pinned = batch.persist()
    try {
      val admitted = admitBatch(pinned, corpus, threshold, probes)
      admitted.select("vec_id", "embedding")
        .write.mode("append").parquet(corpusDir)
    } finally { pinned.unpersist(); () }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      StoreCompact.compact(spark, corpusDir); ()
    }
  }

  /** How many corpus rows must exist before the persisted index is worth
    * founding: below ~4 vectors/cell the trained quantizer is noise and
    * the per-trigger screens are cheap anyway.
    */
  private def indexFloor(nlist: Int): Long = 4L * nlist

  private def dirHasData(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).exists { st =>
      val n = st.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Retrain the index from the corpus and swap it in with the
    * [[StoreCompact]] rename discipline (retire → publish → drop), so a
    * crash inside the swap window is healed by the `recover` call at the
    * top of the next trigger instead of reading half an index.
    */
  private def rebuildIndex(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, indexDir: String, nlist: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(indexDir + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(indexDir + "_compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    Similarity.buildIvfIndex(
      spark.read.parquet(corpusDir).select("vec_id", "embedding"),
      tmp.toString, nlist)
    val live = new org.apache.hadoop.fs.Path(indexDir)
    if (fs.exists(live))
      require(fs.rename(live, old), s"rebuild: could not retire $indexDir")
    require(fs.rename(tmp, live), s"rebuild: could not publish $tmp")
    fs.delete(old, true)
    ()
  }

  /** The INDEXED trigger body — [[ingestInto]] with the persisted-IVF
    * lifecycle composed in (r12 verdict item 2). Layout under `rootDir`:
    * `corpus` (vec_id, embedding — the source of truth) and `ivf`
    * (centroids + cell-partitioned postings — derived). Per trigger:
    *
    *  1. screen — in-batch greedy drop, then the corpus side through the
    *     STANDING index ([[Similarity.ivfThresholdPairs]]: frozen
    *     centroids, partition-pruned postings, exact cosine verify)
    *     instead of retraining a cell map per trigger (before the index
    *     exists — corpus below [[indexFloor]] — the per-trigger
    *     [[admitBatch]] path screens, so bootstrap semantics are the
    *     gated operator's);
    *  2. publish — admitted rows stage to BOTH the corpus and the
    *     index's postings (frozen-centroid assignment, no posting
    *     rewrite) and land through [[StoreTxn]]'s exactly-once protocol:
    *     with TWO stores a replay after a crash between appends would
    *     otherwise re-admit (index stale → duplicate corpus rows) or
    *     lose rows (index ahead → rejected before the corpus append);
    *  3. maintain — once the corpus clears the floor the index is
    *     founded; every `rebuildCheckEvery` triggers
    *     [[Similarity.ivfNeedsRebuild]] runs (appends land under frozen
    *     centroids, so a cell drifting past `rebuildFactor`× its fair
    *     share means the corpus outgrew its quantizer and probes of the
    *     hot cell degrade toward a scan) and [[rebuildIndex]] retrains
    *     when it fires. Maintenance runs AFTER commit on derived state
    *     only, swap-healed — admit decisions never depend on a
    *     half-built index.
    */
  def ingestIntoIndexed(rootDir: String, threshold: Double,
      nlist: Int = 16, nprobe: Int = 4, probes: Int = 4,
      rebuildCheckEvery: Int = 4, rebuildFactor: Double = 4.0)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val corpusDir = s"$rootDir/corpus"
    val indexDir = s"$rootDir/ivf"
    StoreCompact.recover(spark, corpusDir)
    StoreCompact.recover(spark, indexDir) // heal an interrupted rebuild swap
    val indexed = dirHasData(spark, s"$indexDir/centroids")
    if (!StoreTxn.isCommitted(spark, rootDir, batchId)) {
      if (!StoreTxn.isStaged(spark, rootDir, batchId)) {
        StoreTxn.clearForeignStaged(spark, rootDir, batchId)
        val pinned = batch.persist()
        try {
          val admitted =
            if (indexed) {
              val surv = admitBatch(pinned, spark.emptyDataFrame,
                threshold, probes) // in-batch screen only
              val dupIds = Similarity
                .ivfThresholdPairs(indexDir, surv, threshold, nprobe)
                .select(col("query_id").as("vec_id")).distinct()
              surv.join(dupIds, Seq("vec_id"), "left_anti")
            } else {
              val corpus =
                if (dirHasData(spark, corpusDir))
                  spark.read.parquet(corpusDir).select("vec_id", "embedding")
                else spark.emptyDataFrame
              admitBatch(pinned, corpus, threshold, probes)
            }
          // the staged writes must not re-read the stores the publish
          // below grows — truncate the lineage to the computed rows
          val keep = admitted.select("vec_id", "embedding").localCheckpoint()
          keep.write.mode("overwrite")
            .parquet(StoreTxn.stagePath(rootDir, batchId, "corpus"))
          if (indexed)
            Similarity.stageIvfAppend(keep, indexDir,
              StoreTxn.stagePath(rootDir, batchId, "ivf") + "/postings")
          StoreTxn.seal(spark, rootDir, batchId)
        } finally { pinned.unpersist(); () }
      }
      StoreTxn.publish(spark, rootDir, batchId)
    }
    // maintenance — derived state only, after commit
    if (!indexed) {
      if (dirHasData(spark, corpusDir) &&
          spark.read.parquet(corpusDir).count() >= indexFloor(nlist))
        rebuildIndex(spark, corpusDir, indexDir, nlist)
    } else if (rebuildCheckEvery > 0 && batchId > 0 &&
        batchId % rebuildCheckEvery == 0 &&
        Similarity.ivfNeedsRebuild(spark, indexDir, rebuildFactor)) {
      rebuildIndex(spark, corpusDir, indexDir, nlist)
    }
  }
}
