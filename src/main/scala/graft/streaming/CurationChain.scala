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
  *  3. PERCEPTUAL media screen (only when the batch carries a `content`
  *     binary column) — each doc's media bytes hash through the ONE
  *     modality-dispatching kernel
  *     ([[graft.multimodal.MultimodalQueries.perceptualHash]]: image
  *     dHash / audio envelope / video temporal-mean dHash) into a SHARED
  *     8-band hamming store screened by [[ImageDedupStream]]'s banded
  *     join (hot-bucket cap on the store side, exact
  *     bit_count(xor) ≤ 7 verify) — a re-crop/re-encode of media
  *     admitted fifty triggers ago is rejected here even under novel
  *     text; docs whose bytes don't decode pass unscreened (decode
  *     failure is data, not an error);
  *  4. NEAR-DUP text screen — MinHash signatures banded against the
  *     standing signature store ([[TextDedupStream]]);
  *  5. SEMANTIC screen (only when the batch carries an `embedding`
  *     column) — cosine screen against the standing embedding store
  *     ([[SemDedupStream]]);
  *
  * and only documents surviving EVERY stage are admitted. All the
  * stores then grow by exactly the admitted rows — a doc rejected at a
  * late stage leaves NO residue in any store, so future arrivals are
  * always judged against admitted content only (a rejected doc's exact
  * hash must not block its own re-arrival from being re-judged: the
  * stores are the corpus's memory, not the reject log's).
  *
  * Stage order is cost order: the exact hash anti-join kills recrawl
  * storms before anything decodes, the perceptual screen (one linear
  * decode pass, 16 bytes/row after it) kills media recrawls before the
  * shuffle-heavy signature agg runs, and the signature screen kills
  * light edits before any cosine is computed. Per-trigger work is one
  * gate pass + one decode pass + key-colocated joins; every store is parquet the
  * screens re-read per trigger (the exact backstop — q147's Bloom screen
  * fronts the hash store at scale), compacted on the `compactEvery`
  * cadence and healed by [[StoreCompact.recover]] after a mid-swap
  * crash.
  *
  * EXACTLY-ONCE store publication (r12 ADVICE): `foreachBatch` is
  * at-least-once, and the naive sequential appends break under replay —
  * a crash after the exact-store append but before the admitted append
  * leaves the replayed batch's docs anti-joined away by their OWN
  * half-written hashes, permanently dropping them while their reject
  * residue persists. So the trigger body never appends directly: the
  * admitted rows are derived once (against pre-batch store state) and
  * go through [[StoreTxn]]'s stage → seal → publish → commit protocol —
  * replay of a committed batch no-ops, a mid-publish crash finishes
  * publication without recompute, a mid-staging crash recomputes
  * safely.
  *
  * Wire as `stream.writeStream.foreachBatch(CurationChain.ingestInto(root) _)`
  * with a (doc_id, text[, content][, embedding]) batch; admitted docs
  * append to `root/admitted`.
  */
object CurationChain {

  /** The store subdirectories the publish step knows how to move. */
  private val StoreNames = Seq("exact", "phash", "sigs", "vecs", "admitted")

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val (fs, path) = hadoopFs(spark, dir)
    fs.exists(path) && fs.listStatus(path).exists { st =>
      val n = st.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
    }
  }

  private def readStore(spark: SparkSession, dir: String,
      cols: Seq[String]): Option[DataFrame] =
    if (hasData(spark, dir)) Some(spark.read.parquet(dir).select(cols.map(col): _*))
    else None

  /** Derive the admitted set against the CURRENT store state and stage
    * all outputs under `_staged/<batchId>/`, sealing with `_STAGED`.
    * Touches no store — the crash window before [[StoreTxn.publish]] is
    * recompute-safe. Split from [[ingestInto]] so the crash-replay spec
    * can stop exactly here.
    */
  private[streaming] def stageBatch(rootDir: String, threshold: Double)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val exactDir = s"$rootDir/exact"
    val phashDir = s"$rootDir/phash"
    val sigDir = s"$rootDir/sigs"
    val vecDir = s"$rootDir/vecs"
    def staged(store: String): String = StoreTxn.stagePath(rootDir, batchId, store)
    val semantic = batch.columns.contains("embedding")
    val media = batch.columns.contains("content")

    // stage 1+2a: gate, then first-of-hash within the batch (lowest id
    // keeps, matching the near-dup screens' greedy rule)
    val wH = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy("doc_id")
    val gated = CorpusIngest.gateBatch(batch,
        passThrough = Seq("doc_id") ++ (if (media) Seq("content") else Nil) ++
          (if (semantic) Seq("embedding") else Nil))
      .withColumn("rn", row_number().over(wH))
      .filter(col("rn") === 1).drop("rn")
    // the gated projection feeds every later stage and foreachBatch
    // re-executes the plan per action — pin it (the q226 lesson)
    val pinned = gated.persist()
    var hashed: Option[DataFrame] = None
    var percDrops: Option[DataFrame] = None
    try {
      // stage 2b: exact screen against the standing hash store
      val afterExact = readStore(spark, exactDir, Seq("content_hash"))
        .map(st => pinned.join(st, Seq("content_hash"), "left_anti"))
        .getOrElse(pinned)

      // stage 3: perceptual media screen (in-batch + shared band store).
      // The decode is the expensive kernel and feeds BOTH the screen and
      // the staged phash append — hash once, persist the 16-byte/row
      // projection (the q226/ImageDedupStream lesson). Docs carrying no
      // decodable media pass unscreened.
      val afterPerc =
        if (!media) afterExact
        else {
          val ph = udf((b: Array[Byte]) =>
            graft.multimodal.MultimodalQueries.perceptualHash(b))
          val h = afterExact.filter(col("content").isNotNull)
            .select(col("doc_id").as("media_id"), ph(col("content")).as("h"))
            .filter(col("h").isNotNull)
            .persist()
          hashed = Some(h)
          val okIds = ImageDedupStream
            .admitBatch(h, readStore(spark, phashDir, Seq("media_id", "h"))
              .getOrElse(spark.emptyDataFrame))
            .select(col("media_id").as("doc_id"))
          // pin the drop DECISION, not just the hashes: every downstream
          // action (sig isEmpty probe, semantic counts, checkpoint, five
          // staged writes) re-executes this subplan otherwise, and the
          // band self-join + store join re-running ~10× per trigger
          // measured 3× the whole trigger time (the q226/sigs lesson
          // applied one stage earlier)
          val dropIds = h.select(col("media_id").as("doc_id"))
            .join(okIds, Seq("doc_id"), "left_anti")
            .persist()
          percDrops = Some(dropIds)
          afterExact.join(dropIds, Seq("doc_id"), "left_anti")
        }

      // stage 4: near-dup signature screen (in-batch + store). The sig
      // pipeline (shingle explode + k-minima agg + band joins) is the
      // most expensive stage and feeds BOTH the admitted set and the
      // store append — pin it, or keepSigs below re-runs it end to end.
      // (admitBatch's isEmpty probe alone re-runs the full k-minima agg
      // when its input is unpinned — an agg can't short-circuit to one
      // row)
      val sigs = TextDedupStream.signatures(afterPerc).persist()
      val afterSig = TextDedupStream
        .admitBatch(sigs, readStore(spark, sigDir, Seq("doc_id", "sig"))
          .getOrElse(spark.emptyDataFrame))
        .select("doc_id", "sig")
        .persist()
      val survivedSig = afterPerc.join(afterSig, Seq("doc_id"), "left_semi")

      // stage 5: semantic screen (in-batch + store), when embeddings ride
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

      // The admitted plan READS the very stores the publish step will
      // grow, and a later read invalidation would silently recompute
      // against half-updated stores — localCheckpoint truncates the
      // lineage to the computed ROWS, so nothing downstream can reach
      // back into the plan.
      // (media bytes never reach a store or the checkpoint — the stores
      // hold hashes, not pixels)
      val keep = admitted.drop("content").localCheckpoint()
      val keepSigs = afterSig
        .join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
        .localCheckpoint()
      sigs.unpersist(); afterSig.unpersist()
      keep.select("content_hash")
        .write.mode("overwrite").parquet(staged("exact"))
      hashed.foreach { h =>
        h.join(keep.select(col("doc_id").as("media_id")),
            Seq("media_id"), "left_semi")
          .write.mode("overwrite").parquet(staged("phash"))
      }
      keepSigs.write.mode("overwrite").parquet(staged("sigs"))
      if (semantic)
        keep.select(col("doc_id").as("vec_id"), col("embedding"))
          .write.mode("overwrite").parquet(staged("vecs"))
      keep.select("doc_id", "text", "content_hash")
        .write.mode("overwrite").parquet(staged("admitted"))
      StoreTxn.seal(spark, rootDir, batchId)
    } finally {
      pinned.unpersist(); hashed.foreach(_.unpersist())
      percDrops.foreach(_.unpersist()); ()
    }
  }

  /** The full trigger body. `rootDir` holds the stores (`exact`,
    * `phash`, `sigs`, `vecs`, `admitted` — `phash`/`vecs` only when
    * media/embeddings ride); `threshold` is the semantic screen's cosine
    * gate; `compactEvery` > 0 compacts every store on that trigger
    * cadence. Idempotent per `batchId` — see the commit protocol in the
    * object doc.
    */
  def ingestInto(rootDir: String, threshold: Double = 0.92,
      compactEvery: Int = 0)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    StoreNames.map(s => s"$rootDir/$s").foreach(StoreCompact.recover(spark, _))
    if (!StoreTxn.isCommitted(spark, rootDir, batchId)) {
      if (!StoreTxn.isStaged(spark, rootDir, batchId)) {
        StoreTxn.clearForeignStaged(spark, rootDir, batchId)
        stageBatch(rootDir, threshold)(batch, batchId)
      }
      // a sealed staged copy (this call's, or a mid-publish crash's)
      // publishes WITHOUT recompute — the stores may already hold some of
      // its files, and recomputing against them is the replay bug
      StoreTxn.publish(spark, rootDir, batchId)
    }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      StoreNames.map(s => s"$rootDir/$s")
        .filter(hasData(spark, _))
        .foreach(StoreCompact.compact(spark, _))
    }
  }
}
