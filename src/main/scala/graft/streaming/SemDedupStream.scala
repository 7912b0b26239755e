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
}
