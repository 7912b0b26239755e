package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming TEXT near-dup admission — [[SemDedupStream]] /
  * [[ImageDedupStream]]'s pattern on the text modality, composing the q42
  * MinHash machinery into the ingest path (r11 verdict item 3):
  * [[CorpusIngest]] rejects exact (normalized-content-hash) duplicates
  * only, so a lightly-edited crawl duplicate sailed through to the next
  * batch dedup; this screen rejects it AT INGEST, whether its original
  * arrived in the same trigger or was admitted fifty triggers ago.
  *
  * Mechanics: each micro-batch's docs get k-minima MinHash signatures
  * (ONE hash agg per trigger — the q42 kernel via [[Dedup]]), are
  * screened against themselves (banded candidates, greedy keep-lowest)
  * and against the STANDING signature store (band join with the q42
  * hot-bucket cap on the store side), and only novel docs' signatures
  * append. Verification uses the MinHash ESTIMATE — matching minima /
  * k ≥ num/den — on both sides of the screen: one admission rule, and
  * the store never needs text (the unbiased estimator is the standard
  * trade for bounding state by signatures instead of shingle sets;
  * TextDedupStreamSpec measures the planted-dup estimates clearing the
  * threshold). Docs too short to shingle (< 3 words) carry no signature
  * and are admitted — near-dup screening is undefined on them, and the
  * exact screen upstream already holds.
  *
  * State is BOUNDED by admitted content: one logical (doc_id, sig) row —
  * k longs + id — per admitted doc, never text, persisted PRE-BANDED
  * (8 band rows each) under the same [[StoreLayout]] as the composed
  * [[CurationChain]]'s signature store: bucketed by the (band, bh) join
  * key and bloom-fronted, so a trigger reads candidate buckets instead
  * of re-banding the whole store (r14 verdict item 1 — the standalone
  * body previously kept a flat store and paid O(corpus) per trigger).
  */
object TextDedupStream {

  /** (doc_id, text) → (doc_id, sig ARRAY<LONG>[k]) via the shared q42
    * signature kernel — ONE definition of the minima (seeded
    * permutations), so batch dedup and streaming admission agree.
    */
  def signatures(docs: DataFrame, k: Int = 32): DataFrame =
    Dedup.minhashSignatures(docs, "text", "doc_id", k)
      .select(col("sid").as("doc_id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))

  /** Band rows from signature arrays: the q42 band layout on the array
    * form, through the ONE shared layout definition
    * ([[Dedup.bandStructs]] — r12 verdict item 3: the batch and
    * streaming paths screen the same corpus, so the recall-critical
    * minima→band grouping must have a single source of truth).
    * Public as the STORE row shape: [[graft.streaming.CurationChain]]
    * persists the signature store pre-banded and bucketed by the
    * (band, bh) join key, so a trigger's screen reads candidate buckets
    * instead of re-exploding (and re-scanning) the whole store.
    */
  def bandRows(sigs: DataFrame, idAs: String, bands: Int = 8,
      k: Int = 32): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    bandize(sigs, idAs, bands, k / bands)
  }

  private def bandize(sigs: DataFrame, idAs: String, bands: Int,
      rows: Int): DataFrame = {
    val bandCols =
      Dedup.bandStructs(i => element_at(col("sig"), i + 1), bands, rows)
    sigs.select(col("doc_id").as(idAs), col("sig"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col(idAs), col("sig"), col("bk.band").as("band"),
        col("bk.bh").as("bh"))
  }

  /** Matching minima between two equal-length signature arrays — k times
    * the unbiased MinHash Jaccard estimate.
    */
  private def sigMatches(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), _ + _)

  /** Near-dup pairs BETWEEN `newSigs` and `storeSigs` (both
    * (doc_id, sig)): candidates share a band bucket (store side
    * hot-bucket capped — an over-cap band value is non-discriminative
    * and alone would put |bucket|·|batch| candidates on one reducer; a
    * true pair keeps its other bands), verified by the signature
    * estimate matches·den ≥ num·k. Returns (new_id, store_id, matches).
    */
  def sigPairsAgainst(newSigs: DataFrame, storeSigs: DataFrame,
      bands: Int = 8, k: Int = 32, num: Int = 7, den: Int = 10,
      maxBucket: Int = 10000): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    sigPairsAgainstBands(bandize(newSigs, "new_id", bands, k / bands),
      bandize(storeSigs, "store_id", bands, k / bands)
        .select(col("store_id").as("doc_id"), col("sig"), col("band"), col("bh")),
      k, num, den, maxBucket)
  }

  /** [[sigPairsAgainst]] when the store side is ALREADY band rows
    * (doc_id, sig, band, bh) — the bucketed store layout persists them
    * that way, pruned to the batch's candidate buckets before this call.
    * The store side is first restricted to the batch's exact (band, bh)
    * keys (a filter ON the group key, so the hot-bucket cap still counts
    * whole buckets), then capped, then verified by the signature
    * estimate. Returns (new_id, store_id, matches).
    */
  def sigPairsAgainstBands(newBands: DataFrame, storeBands: DataFrame,
      k: Int = 32, num: Int = 7, den: Int = 10,
      maxBucket: Int = 10000): DataFrame = {
    val nB = newBands.select(col("new_id"),
      col("sig").as("sig_n"), col("band"), col("bh"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val storeB = storeBands
      .select(col("doc_id").as("store_id"), col("sig").as("sig_s"),
        col("band"), col("bh"))
      .join(nB.select("band", "bh").distinct(), Seq("band", "bh"), "left_semi")
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucket).drop("bsz")
    nB.join(storeB, Seq("band", "bh"))
      .select("new_id", "store_id", "sig_n", "sig_s").distinct()
      .select(col("new_id"), col("store_id"),
        sigMatches(col("sig_n"), col("sig_s")).as("matches"))
      .filter(col("matches") * den >= num * k)
  }

  /** In-batch near-dup pairs (da < db) under the same band + estimate
    * rule — the self-join form of [[sigPairsAgainst]].
    */
  def sigSelfPairs(sigs: DataFrame, bands: Int = 8, k: Int = 32,
      num: Int = 7, den: Int = 10, maxBucket: Int = 10000): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rows = k / bands
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val sized = bandize(sigs, "doc_id", bands, rows)
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucket).drop("bsz")
    sized.as("a").join(sized.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .select(col("da"), col("db"),
        sigMatches(col("sig_a"), col("sig_b")).as("matches"))
      .filter(col("matches") * den >= num * k)
  }

  /** Screen one micro-batch of signatures: drop in-batch near-dup higher
    * ids (the greedy q71 keep-lowest rule), then drop everything with a
    * near-dup in the store. Pure batch-side function.
    */
  def admitBatch(batchSigs: DataFrame, storeSigs: DataFrame,
      bands: Int = 8, k: Int = 32, num: Int = 7, den: Int = 10,
      maxBucket: Int = 10000): DataFrame = {
    if (batchSigs.isEmpty) return batchSigs
    val inBatchDrops = sigSelfPairs(batchSigs, bands, k, num, den, maxBucket)
      .select(col("db").as("doc_id")).distinct()
    val survivors = batchSigs.join(inBatchDrops, Seq("doc_id"), "left_anti")
    if (storeSigs.isEmpty) survivors
    else {
      val dupIds =
        sigPairsAgainst(survivors, storeSigs, bands, k, num, den, maxBucket)
          .select(col("new_id").as("doc_id")).distinct()
      survivors.join(dupIds, Seq("doc_id"), "left_anti")
    }
  }

  /** The admitted signatures a consumer (or a spec) reads: one
    * (doc_id, sig) row per admitted doc, reconstructed from the banded
    * store (main + un-merged tail). The band rows are the store's
    * physical layout; this is its logical content.
    */
  def storeRows(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame = {
    val parts = Seq(s"$storeDir/sigs", s"$storeDir/sigs_tail")
      .filter(StoreCompact.hasData(spark, _)).map(spark.read.parquet(_))
    require(parts.nonEmpty, s"signature store has no data under $storeDir")
    parts.map(_.select("doc_id", "sig")).reduce(_ unionByName _).distinct()
  }

  private def storePresent(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): Boolean =
    StoreCompact.hasData(spark, s"$storeDir/sigs") ||
      StoreCompact.hasData(spark, s"$storeDir/sigs_tail")

  /** The full trigger body for a parquet-backed signature store root:
    * sign the batch's (doc_id, text) rows, screen against the standing
    * store (missing/empty = bootstrap), admit the novel docs. Wire as
    * `stream.writeStream.foreachBatch(TextDedupStream.ingestInto(dir) _)`
    * — downstream of [[CorpusIngest]]'s quality + exact-hash gate when
    * composing the full curation ingest.
    *
    * LAYOUT-BACKED (r14 verdict item 1 — this body used to re-read and
    * re-band a FLAT (doc_id, sig) store per trigger, the exact
    * O(admitted-corpus)/trigger regime the composed [[CurationChain]]
    * escaped): `storeDir` is a [[StoreLayout]] root — `sigs` holds
    * PRE-BANDED rows (doc_id, sig, band, bh) bucketed by the (band, bh)
    * join key, `sigs_tail` the flat deltas since the last merge, and
    * `sigbloom` the bloom front. A trigger probes the front (a batch
    * band key whose blobs miss has no store partner — only near-dups
    * collide on a band hash, so a novel batch reads ZERO main buckets),
    * reads the candidates' buckets plus the cadence-bounded tail, and
    * screens via [[sigPairsAgainstBands]] — per-trigger cost is bounded
    * by the batch and its true duplicates, not store size
    * (StandaloneStoreBench measures the curve).
    *
    * CONVERGENCE without a txn (the single-store argument extended to
    * the front): the bloom delta appends BEFORE the band rows, so every
    * crash window leaves the front a safe SUPERSET of the store — a
    * false positive only costs a bucket read; the reverse order could
    * leave published rows uncovered and re-admit their duplicates. A
    * replayed batch re-screens against the grown store and its rows
    * reject as their own duplicates, so nothing double-appends.
    *
    * `compactEvery` > 0 folds the tail into the bucketed main
    * ([[StoreCompact.mergeTail]]) and rebuilds the front every that-many
    * triggers (keyed on batchId so restarts keep the cadence).
    */
  def ingestInto(storeDir: String, bands: Int = 8, k: Int = 32,
      num: Int = 7, den: Int = 10, maxBucket: Int = 10000,
      compactEvery: Int = 0)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val sigDir = s"$storeDir/sigs"
    val bloomDir = s"$storeDir/sigbloom"
    Seq(sigDir, s"${sigDir}_tail", bloomDir)
      .foreach(StoreCompact.recover(spark, _))
    val P = StoreLayout.ensureLayout(spark, storeDir, Seq("sigs"))
    // the signature agg is the expensive stage and foreachBatch re-executes
    // the plan per action (screen jobs + append) — sign once, persist the
    // k-long/row projection (the q226/SemDedupStream lesson)
    val signed = signatures(batch, k).persist()
    try {
      if (!signed.isEmpty) {
        val inDrops = sigSelfPairs(signed, bands, k, num, den, maxBucket)
          .select(col("db").as("doc_id")).distinct()
        val survivors = signed.join(inDrops, Seq("doc_id"), "left_anti")
        val admitted =
          if (!storePresent(spark, storeDir)) survivors
          else {
            val nBands = bandize(survivors, "new_id", bands, k / bands)
              .withColumn("__h", StoreLayout.keyHash(col("band"), col("bh")))
              .withColumn("pb", StoreLayout.bucketOf(col("__h"), P))
            // driver-cached front probe — one filter in the batch plan,
            // no per-trigger blob read job (StoreLayout.bloomScreen)
            val maybe = StoreLayout.bloomScreen(spark, bloomDir, nBands)
              .map(_.dropDuplicates("new_id", "band", "bh"))
              .getOrElse(nBands)
            val storeB = {
              val tailDir = sigDir + "_tail"
              // an empty candidate-bucket list means every batch key
              // definitely missed the front — skip the main read entirely
              val pbs = StoreLayout.bucketsPresent(maybe)
              val parts = Seq(
                if (pbs.nonEmpty && StoreCompact.hasData(spark, sigDir))
                  Some(StoreLayout.prunedRead(spark, sigDir, "pb", pbs))
                else None,
                if (StoreCompact.hasData(spark, tailDir))
                  Some(spark.read.parquet(tailDir))
                else None).flatten
              if (parts.isEmpty) None
              else Some(parts.map(_.select("doc_id", "sig", "band", "bh"))
                .reduce(_ unionByName _))
            }
            storeB match {
              case None => survivors
              case Some(st) =>
                val dups = sigPairsAgainstBands(maybe, st, k, num, den,
                    maxBucket)
                  .select(col("new_id").as("doc_id")).distinct()
                survivors.join(dups, Seq("doc_id"), "left_anti")
            }
          }
        // the appends read nothing they grow, but the admitted plan DOES
        // read the store — truncate the lineage before writing
        val keepBands = bandize(admitted, "doc_id", bands, k / bands)
          .withColumn("pb", StoreLayout.bucketOf(
            StoreLayout.keyHash(col("band"), col("bh")), P))
          .localCheckpoint()
        // the delta's keys collect to the driver (batch-scale) so the
        // blobs build locally and merge into the cached front after the
        // append — the next trigger's probe then runs without a blob
        // read job. Bloom FIRST (superset-safe — see the object doc),
        // then rows.
        val keys = keepBands
          .select(StoreLayout.keyHash(col("band"), col("bh")).as("__h"),
            col("pb"))
          .collect().map(r => (r.getLong(0), r.getInt(1)))
        val blobs = StoreLayout.bloomDeltaLocal(keys,
          math.max(1L, keys.length.toLong), P)
        val sess = spark
        import sess.implicits._
        blobs.toDF("pb", "bloom")
          .coalesce(1).write.mode("append").parquet(bloomDir)
        StoreLayout.noteFrontDelta(spark, bloomDir, blobs)
        keepBands.repartition(col("pb"))
          .write.mode("append").parquet(sigDir + "_tail")
      }
    } finally { signed.unpersist(); () }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      StoreCompact.mergeTail(spark, sigDir, Seq("pb"))
      if (storePresent(spark, storeDir)) {
        val rows = Seq(sigDir, sigDir + "_tail")
          .filter(StoreCompact.hasData(spark, _))
          .map(spark.read.parquet(_).select("band", "bh"))
          .reduce(_ unionByName _)
          .withColumn("__h", StoreLayout.keyHash(col("band"), col("bh")))
          .withColumn("pb", StoreLayout.bucketOf(col("__h"), P))
        val blobs = StoreLayout.bloomDelta(rows,
          math.max(1L, rows.count()), P)
        if (StoreCompact.hasData(spark, bloomDir))
          StoreCompact.rewrite(spark, bloomDir, _ => blobs, targetFiles = 1)
        else blobs.coalesce(1).write.mode("overwrite").parquet(bloomDir)
      }
    }
  }
}
