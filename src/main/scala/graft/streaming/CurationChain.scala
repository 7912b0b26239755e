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
  * MUTABLE-corpus curation (r13): a CDC-fed documents table UPDATEs and
  * DELETEs, and without retirement a doc's new version is forever
  * rejected as a near-dup of its own past (and a deleted doc's re-offer
  * is blocked by a ghost). [[ingestCdcInto]] takes (op, ord, doc_id,
  * text, …) batches: the LAST op per doc wins, UPDATE/DELETE write a
  * TOMBSTONE (doc_id, asOf = batchId) through the same staged commit,
  * every store row carries its admit batch `b`, and the screens exclude
  * rows with a tombstone newer than their batch — so an UPDATE's new
  * text is screened against the corpus MINUS its own retired version,
  * in the same trigger, exactly-once. Tombstones are logical until the
  * `compactEvery` cadence runs [[applyTombstones]] — a crash-healed
  * rewrite ([[StoreCompact.rewrite]] swap) that removes retired rows
  * physically and clears the tombstone store; a crash mid-apply leaves
  * tombstones in place, so the logical exclusion still holds and the
  * next cadence finishes (idempotent).
  *
  * Wire as `stream.writeStream.foreachBatch(CurationChain.ingestInto(root) _)`
  * with a (doc_id, text[, content][, embedding]) batch; admitted docs
  * append to `root/admitted`. For the CDC shape, wire
  * [[ingestCdcInto]] (see [[CdcCorpusChain.startCdc]]).
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
    * can stop exactly here. `batchTombstones` (doc_id rows), when
    * present, retire those docs' standing store rows as of THIS batch —
    * the screens below exclude them, and the tombstone delta stages
    * into the same atomic publish.
    */
  private[streaming] def stageCurated(rootDir: String, threshold: Double,
      offers: DataFrame, batchTombstones: Option[DataFrame],
      batchId: Long): Unit = {
    val spark = offers.sparkSession
    val exactDir = s"$rootDir/exact"
    val phashDir = s"$rootDir/phash"
    val sigDir = s"$rootDir/sigs"
    val vecDir = s"$rootDir/vecs"
    def staged(store: String): String = StoreTxn.stagePath(rootDir, batchId, store)
    val semantic = offers.columns.contains("embedding")
    val media = offers.columns.contains("content")

    // effective tombstones: standing (un-applied) ∪ this batch's, one
    // max-asOf row per doc — tiny (bounded by churn since the last
    // cadence), pinned because every store read below joins it
    val tombOpt: Option[DataFrame] = {
      val standing = readStore(spark, s"$rootDir/tombstones",
        Seq("doc_id", "asOf"))
      val fresh = batchTombstones.map(
        _.select(col("doc_id")).withColumn("asOf", lit(batchId)))
      (standing, fresh) match {
        case (None, None) => None
        case (a, b) => Some((a.toSeq ++ b.toSeq).reduce(_ unionByName _)
          .groupBy("doc_id").agg(max("asOf").as("asOf")).persist())
      }
    }
    /** A store's LIVE rows: minus rows retired by a newer tombstone
      * (`b < asOf`; a row written by the retiring batch itself
      * survives — that is how an UPDATE's new version coexists with its
      * own tombstone).
      */
    def readLive(dir: String, key: String, cols: Seq[String]): Option[DataFrame] =
      readStore(spark, dir, (Seq(key) ++ cols :+ "b").distinct).map { df =>
        tombOpt match {
          case None => df.select(cols.map(col): _*)
          case Some(t) =>
            df.join(t.select(col("doc_id").as(key), col("asOf").as("_asof")),
                Seq(key), "left")
              .filter(col("_asof").isNull || col("b") >= col("_asof"))
              .select(cols.map(col): _*)
        }
      }

    // stage 1+2a: gate, then first-of-hash within the batch (lowest id
    // keeps, matching the near-dup screens' greedy rule)
    val wH = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy("doc_id")
    val gated = CorpusIngest.gateBatch(offers,
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
      val afterExact = readLive(exactDir, "doc_id", Seq("content_hash"))
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
          // the decode kernel inherits the INPUT's partitioning and a
          // media batch is small in BYTES but big in compute — a 5 MB
          // batch reads as ONE partition and would decode
          // single-threaded; spread it across the executors before the
          // kernel (one shuffle of the batch's media bytes). Measured
          // NEUTRAL at bench scale, where the kernel is ms-class and the
          // stage cost is its ~8 fixed jobs — the guard exists for
          // decode-heavy media (video, large images) where one reader
          // partition would serialize the whole trigger.
          val src = afterExact.filter(col("content").isNotNull)
            .select(col("doc_id").as("media_id"), col("content"))
          val par = spark.sparkContext.defaultParallelism
          val spread =
            if (src.rdd.getNumPartitions >= par) src else src.repartition(par)
          val h = spread
            .select(col("media_id"), ph(col("content")).as("h"))
            .filter(col("h").isNotNull)
            .persist()
          hashed = Some(h)
          val okIds = ImageDedupStream
            .admitBatch(h, readLive(phashDir, "media_id", Seq("media_id", "h"))
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
        .admitBatch(sigs, readLive(sigDir, "doc_id", Seq("doc_id", "sig"))
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
            .admitBatch(vecs, readLive(vecDir, "vec_id", Seq("vec_id", "embedding"))
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
      // every store row carries its admit batch: the tombstone exclusion
      // and the physical apply are both keyed on (id, b < asOf)
      keep.select("doc_id", "content_hash").withColumn("b", lit(batchId))
        .write.mode("overwrite").parquet(staged("exact"))
      hashed.foreach { h =>
        h.join(keep.select(col("doc_id").as("media_id")),
            Seq("media_id"), "left_semi")
          .withColumn("b", lit(batchId))
          .write.mode("overwrite").parquet(staged("phash"))
      }
      keepSigs.withColumn("b", lit(batchId))
        .write.mode("overwrite").parquet(staged("sigs"))
      if (semantic)
        keep.select(col("doc_id").as("vec_id"), col("embedding"))
          .withColumn("b", lit(batchId))
          .write.mode("overwrite").parquet(staged("vecs"))
      keep.select("doc_id", "text", "content_hash")
        .withColumn("b", lit(batchId))
        .write.mode("overwrite").parquet(staged("admitted"))
      batchTombstones.foreach { t =>
        t.select(col("doc_id")).distinct().withColumn("asOf", lit(batchId))
          .write.mode("overwrite").parquet(staged("tombstones"))
      }
      StoreTxn.seal(spark, rootDir, batchId)
    } finally {
      pinned.unpersist(); hashed.foreach(_.unpersist())
      percDrops.foreach(_.unpersist()); tombOpt.foreach(_.unpersist()); ()
    }
  }

  private[streaming] def stageBatch(rootDir: String, threshold: Double)(
      batch: DataFrame, batchId: Long): Unit =
    stageCurated(rootDir, threshold, batch, None, batchId)

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

  /** The LIVE admitted corpus: the admitted store minus rows retired by
    * a newer tombstone — what a consumer reads between tombstone-apply
    * cadences (after [[applyTombstones]] the raw store and this view are
    * identical).
    */
  def readAdmitted(spark: SparkSession, rootDir: String): DataFrame =
    readStore(spark, s"$rootDir/admitted",
        Seq("doc_id", "text", "content_hash", "b")).map { adm =>
      readStore(spark, s"$rootDir/tombstones", Seq("doc_id", "asOf")) match {
        case None => adm.select("doc_id", "text", "content_hash")
        case Some(t0) =>
          val t = t0.groupBy("doc_id").agg(max("asOf").as("_asof"))
          adm.join(t, Seq("doc_id"), "left")
            .filter(col("_asof").isNull || col("b") >= col("_asof"))
            .select("doc_id", "text", "content_hash")
      }
    }.getOrElse(spark.emptyDataFrame)

  /** Which id column retires a store's rows when its doc tombstones. */
  private val StoreKeys = Seq("exact" -> "doc_id", "phash" -> "media_id",
    "sigs" -> "doc_id", "vecs" -> "vec_id", "admitted" -> "doc_id")

  /** Physically remove tombstoned rows (a row retires when a tombstone
    * with `asOf > b` exists for its doc) from every store, then clear
    * the tombstone store. Each rewrite goes through the
    * [[StoreCompact.rewrite]] swap, so a crash mid-apply is healed by
    * the next trigger's recover; a crash BEFORE the final clear leaves
    * tombstones standing — the logical exclusion still holds and the
    * next cadence finishes the apply (idempotent: rewriting an
    * already-clean store drops nothing).
    */
  def applyTombstones(spark: SparkSession, rootDir: String): Unit = {
    val tombDir = s"$rootDir/tombstones"
    if (!hasData(spark, tombDir)) return
    val t = spark.read.parquet(tombDir)
      .groupBy("doc_id").agg(max("asOf").as("_asof"))
      .localCheckpoint() // the rewrites below retire the dirs this reads
    StoreKeys.foreach { case (store, key) =>
      val dir = s"$rootDir/$store"
      if (hasData(spark, dir))
        StoreCompact.rewrite(spark, dir, df =>
          df.join(t.select(col("doc_id").as(key), col("_asof")), Seq(key), "left")
            .filter(col("_asof").isNull || col("b") >= col("_asof"))
            .drop("_asof"))
    }
    val (fs, p) = hadoopFs(spark, tombDir)
    fs.delete(p, true)
    ()
  }

  /** The CDC trigger body — [[ingestInto]] for a batch of ROW OPERATIONS
    * `(op, ord, doc_id, text[, content][, embedding])` with `op` ∈
    * INSERT/UPDATE/DELETE and `ord` the within-batch event order (see
    * [[CdcCorpusChain.cdcDocsFromChunks]]). The LAST op per doc wins;
    * UPDATE and DELETE tombstone the doc's standing store rows as of
    * this batch, and INSERT/UPDATE texts re-offer through the full
    * screen chain against the corpus MINUS the retired rows — all under
    * ONE staged publish, so replay cannot half-apply a retire/re-admit
    * pair. An UPDATE whose new text fails the gate (or screens against
    * OTHER docs) removes the doc from the corpus entirely — the current
    * version failed curation. Tombstones apply physically on the
    * `compactEvery` cadence, before compaction.
    */
  def ingestCdcInto(rootDir: String, threshold: Double = 0.92,
      compactEvery: Int = 0)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    StoreNames.map(s => s"$rootDir/$s").foreach(StoreCompact.recover(spark, _))
    if (!StoreTxn.isCommitted(spark, rootDir, batchId)) {
      if (!StoreTxn.isStaged(spark, rootDir, batchId)) {
        StoreTxn.clearForeignStaged(spark, rootDir, batchId)
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("ord").desc)
        val last = batch
          .withColumn("rn", row_number().over(wOrd))
          .filter(col("rn") === 1).drop("rn")
          .persist()
        try {
          val tombIds = last
            .filter(col("op").isin("UPDATE", "DELETE")).select("doc_id")
          val offers = last
            .filter(col("op").isin("INSERT", "UPDATE")).drop("op", "ord")
          stageCurated(rootDir, threshold, offers, Some(tombIds), batchId)
        } finally { last.unpersist(); () }
      }
      StoreTxn.publish(spark, rootDir, batchId)
    }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      applyTombstones(spark, rootDir)
      StoreNames.map(s => s"$rootDir/$s")
        .filter(hasData(spark, _))
        .foreach(StoreCompact.compact(spark, _))
    }
  }
}
