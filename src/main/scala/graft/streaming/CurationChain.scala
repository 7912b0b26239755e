package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The WHOLE streaming curation pipeline as ONE trigger body — the LLM
  * analogue of the CDC side's composed wire chain (ReplicaStream →
  * TxnStream → Pipeline): each micro-batch of documents runs

  *  1. quality gate — normalize, word window, repetition ratio,
  *     blocklist ([[CorpusIngest.gateBatch]], per-row kernels);
  *  2. EXACT screen — in-batch first-of-hash, then anti-join against the
  *     standing content-hash store (cheapest screen first);
  *  3. NEAR-DUP text screen — MinHash signatures banded against the
  *     standing signature store ([[TextDedupStream]]);
  *  4. SEMANTIC screen (only when the batch carries an `embedding`
  *     column) — cosine screen against the standing embedding store
  *     ([[SemDedupStream]]);
  *
  * and only documents surviving EVERY stage are admitted. All four
  * stores then grow by exactly the admitted rows — a doc rejected at a
  * late stage leaves NO residue in any store, so future arrivals are
  * always judged against admitted content only (a rejected doc's exact
  * hash must not block its own re-arrival from being re-judged: the
  * stores are the corpus's memory, not the reject log's).
  *
  * Stage order is cost order: the exact hash anti-join kills recrawl
  * storms before the signature agg runs, and the signature screen kills
  * light edits before any cosine is computed. Per-trigger work is one
  * gate pass + three key-colocated joins; every store is parquet the
  * screens re-read per trigger (the exact backstop — q147's Bloom screen
  * fronts the hash store at scale), compacted on the `compactEvery`
  * cadence and healed by [[StoreCompact.recover]] after a mid-swap
  * crash.
  *
  * Wire as `stream.writeStream.foreachBatch(CurationChain.ingestInto(root) _)`
  * with a (doc_id, text[, embedding]) batch; admitted docs append to
  * `root/admitted`.
  */
object CurationChain {

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).exists { st =>
      val n = st.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
    }
  }

  private def readStore(spark: SparkSession, dir: String,
      cols: Seq[String]): Option[DataFrame] =
    if (hasData(spark, dir)) Some(spark.read.parquet(dir).select(cols.map(col): _*))
    else None

  /** The full trigger body. `rootDir` holds the four stores
    * (`exact`, `sigs`, `vecs`, `admitted`); `threshold` is the semantic
    * screen's cosine gate; `compactEvery` > 0 compacts every store on
    * that trigger cadence.
    */
  def ingestInto(rootDir: String, threshold: Double = 0.92,
      compactEvery: Int = 0)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val exactDir = s"$rootDir/exact"
    val sigDir = s"$rootDir/sigs"
    val vecDir = s"$rootDir/vecs"
    val admittedDir = s"$rootDir/admitted"
    Seq(exactDir, sigDir, vecDir, admittedDir)
      .foreach(StoreCompact.recover(spark, _))
    val semantic = batch.columns.contains("embedding")

    // stage 1+2a: gate, then first-of-hash within the batch (lowest id
    // keeps, matching the near-dup screens' greedy rule)
    val wH = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy("doc_id")
    val gated = CorpusIngest.gateBatch(batch,
        passThrough = if (semantic) Seq("doc_id", "embedding") else Seq("doc_id"))
      .withColumn("rn", row_number().over(wH))
      .filter(col("rn") === 1).drop("rn")
    // the gated projection feeds every later stage and foreachBatch
    // re-executes the plan per action — pin it (the q226 lesson)
    val pinned = gated.persist()
    try {
      // stage 2b: exact screen against the standing hash store
      val afterExact = readStore(spark, exactDir, Seq("content_hash"))
        .map(st => pinned.join(st, Seq("content_hash"), "left_anti"))
        .getOrElse(pinned)

      // stage 3: near-dup signature screen (in-batch + store). The sig
      // pipeline (shingle explode + k-minima agg + band joins) is the
      // most expensive stage and feeds BOTH the admitted set and the
      // store append — pin it, or keepSigs below re-runs it end to end.
      // (admitBatch's isEmpty probe alone re-runs the full k-minima agg
      // when its input is unpinned — an agg can't short-circuit to one
      // row)
      val sigs = TextDedupStream.signatures(afterExact).persist()
      val afterSig = TextDedupStream
        .admitBatch(sigs, readStore(spark, sigDir, Seq("doc_id", "sig"))
          .getOrElse(spark.emptyDataFrame))
        .select("doc_id", "sig")
        .persist()
      val survivedSig = afterExact.join(afterSig, Seq("doc_id"), "left_semi")

      // stage 4: semantic screen (in-batch + store), when embeddings ride
      val admitted =
        if (!semantic) survivedSig
        else {
          val vecs = survivedSig
            .select(col("doc_id").as("vec_id"), col("embedding"))
          val ok = SemDedupStream
            .admitBatch(vecs, readStore(spark, vecDir, Seq("vec_id", "embedding"))
              .getOrElse(spark.emptyDataFrame), threshold)
            .select(col("vec_id").as("doc_id"))
          survivedSig.join(ok, Seq("doc_id"), "left_semi")
        }

      // Grow every store by exactly the admitted rows — no reject
      // residue. The admitted plan READS the very stores the appends
      // below WRITE, and an append recaches/invalidates every cached
      // plan over that path — a persist() here silently recomputes
      // against the half-updated stores (the first append's rows then
      // poison the later appends' screens: measured as an admitted doc
      // anti-joined away by its own just-written hash). localCheckpoint
      // truncates the lineage to the computed ROWS, so the appends
      // cannot reach back into the plan.
      val keep = admitted.localCheckpoint()
      val keepSigs = afterSig
        .join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
        .localCheckpoint()
      sigs.unpersist(); afterSig.unpersist()
      keep.select("content_hash")
        .write.mode("append").parquet(exactDir)
      keepSigs.write.mode("append").parquet(sigDir)
      if (semantic)
        keep.select(col("doc_id").as("vec_id"), col("embedding"))
          .write.mode("append").parquet(vecDir)
      keep.select("doc_id", "text", "content_hash")
        .write.mode("append").parquet(admittedDir)
    } finally { pinned.unpersist(); () }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      Seq(exactDir, sigDir, vecDir, admittedDir)
        .filter(hasData(spark, _))
        .foreach(StoreCompact.compact(spark, _))
    }
  }
}
