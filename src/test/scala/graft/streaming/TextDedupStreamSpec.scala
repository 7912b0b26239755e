package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming text near-dup admission: per-trigger MinHash signatures,
  * in-batch banded drop, standing signature-store screen — a
  * shingle-level near-dup of a doc admitted triggers ago must be
  * rejected, state stays one (doc_id, sig) row per admitted doc, and the
  * hot-bucket cap bounds candidate generation.
  */
class TextDedupStreamSpec extends SparkSpec {

  /** ~40-word doc over an id-NAMESPACED vocabulary: distinct ids share
    * zero 3-shingles by construction (a first draft drew 38-shingle
    * windows from one shared stride cycle and late novels' windows
    * overlapped earlier ones — the closed-vocabulary fixture trap, again;
    * LSH recall under shared vocabulary is LshSpec's job, this suite
    * tests the screen mechanics). `edit = true` replaces one mid-doc
    * word — a 3-shingle change, Jaccard = 75/81 ≈ 0.93 against the base
    * (80 words, not 40: at J ≈ 0.85 the k = 32 MinHash estimate dips
    * under the 7/10 gate for ~0.4% of id pairs — two leaked across the
    * soak's ~180 planted dups; at 0.93 the dip is a 5σ event, so the
    * fixture measures the screen, not the estimator's tail), the
    * lightly-edited crawl duplicate the screen exists to reject.
    */
  private def doc(id: Long, edit: Boolean = false): String =
    (0 until 80).map { j =>
      if (edit && j == 40) s"edited$id" else s"w${id}x$j"
    }.mkString(" ")

  private def sigsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextDedupStream.signatures(rows.toDF("doc_id", "text"))
  }

  test("planted edit clears the estimate threshold; distinct docs do not") {
    import spark.implicits._
    val pairs = TextDedupStream.sigPairsAgainst(
        sigsOf(Seq((101L, doc(1, edit = true)), (102L, doc(2, edit = true)),
          (103L, doc(3)))),
        sigsOf(Seq((1L, doc(1)), (2L, doc(2)), (4L, doc(4)))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((101L, 1L), (102L, 2L)),
      s"exactly the planted edits pair with their bases: ${pairs.toSeq}")
    // the estimate is comfortably above the 7/10 gate, not a squeaker
    pairs.foreach(p => assert(p._3 * 10 >= 7 * 32, s"estimate too low: $p"))
  }

  test("admitBatch: in-batch greedy drop, then store screen, idle no-op") {
    val batch = sigsOf(Seq((1L, doc(1)), (2L, doc(2)),
      (103L, doc(1, edit = true))))
    val boot = TextDedupStream.admitBatch(batch, spark.emptyDataFrame)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(boot == Set(1L, 2L), s"greedy rule keeps the lower id: $boot")

    val store = sigsOf(Seq((1L, doc(1)), (2L, doc(2))))
    val next = sigsOf(Seq((4L, doc(4)), (105L, doc(2, edit = true))))
    val admitted = TextDedupStream.admitBatch(next, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(4L), s"store near-dup must be rejected: $admitted")

    assert(TextDedupStream.admitBatch(batch.limit(0), store).isEmpty)
  }

  test("foreachBatch ingest: cross-trigger near-dup rejected, bounded store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("textdedup_stream")
      .resolve("store").toString
    val in = MemoryStream[(Long, String)]
    val query = in.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(TextDedupStream.ingestInto(dir) _)
      .start()
    try {
      def storeIds() = TextDedupStream.storeRows(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // trigger 1 (bootstrap): 103 is an in-batch edit of 1
      in.addData((1L, doc(1)), (2L, doc(2)), (103L, doc(1, edit = true)))
      query.processAllAvailable()
      assert(storeIds() == Set(1L, 2L))
      // trigger 2: 4 novel, 104 edits store doc 2
      in.addData((4L, doc(4)), (104L, doc(2, edit = true)))
      query.processAllAvailable()
      assert(storeIds() == Set(1L, 2L, 4L))
      // trigger 3: 105 edits a doc admitted TWO triggers ago, 106 edits
      // one admitted last trigger, 7 is novel
      in.addData((105L, doc(1, edit = true)), (106L, doc(4, edit = true)),
        (7L, doc(7)))
      query.processAllAvailable()
      assert(storeIds() == Set(1L, 2L, 4L, 7L))
      // the store is BOUNDED: one logical (doc_id, sig) row per admitted
      // doc — k minima + id, never text, never a re-appended id.
      // Physically the banded layout holds exactly 8 band rows per doc.
      val rows = TextDedupStream.storeRows(spark, dir)
      assert(rows.columns.toSet == Set("doc_id", "sig"))
      assert(rows.count() == 4L)
      val counts = spark.read.parquet(s"$dir/sigs_tail")
        .groupBy("doc_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(counts.values.forall(_ == 8L), counts)
      // a doc too short to shingle carries no signature: admitted-by-
      // -absence (the exact screen upstream owns it), never a crash
      in.addData((900L, "only two"))
      query.processAllAvailable()
      assert(storeIds() == Set(1L, 2L, 4L, 7L))
    } finally query.stop()
  }

  test("60-trigger soak: text edits at lags from 1 to 30 triggers all " +
      "rejected, store is exactly the planted novels", SoakTest) {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // novel id space spread so distinct vocabulary draws stay apart
    def novelId(t: Int): Long = 50000L + t * 97L
    val dir = java.nio.file.Files.createTempDirectory("textdedup_soak")
      .resolve("store").toString
    val in = MemoryStream[(Long, String)]
    // compactEvery exercises the layout's merge cadence mid-soak: tails
    // fold into the bucketed main, the bloom front rebuilds, and later
    // triggers screen against BOTH main and fresh tail
    val query = in.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(TextDedupStream.ingestInto(dir, compactEvery = 8) _)
      .start()
    try {
      for (t <- 0 until 60) {
        val rows = Seq.newBuilder[(Long, String)]
        rows += ((novelId(t), doc(novelId(t))))
        // in-batch edit, every trigger
        rows += ((200000L + t, doc(novelId(t), edit = true)))
        if (t > 0) { // edit of a novel admitted `lag` triggers ago
          val lag = t / 2 + 1
          val target = math.max(0, t - lag)
          rows += ((300000L + t, doc(novelId(target), edit = true)))
        }
        in.addData(rows.result(): _*)
        query.processAllAvailable()
      }
      val ids = TextDedupStream.storeRows(spark, dir).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.toSet == (0 until 60).map(novelId).toSet,
        s"store must be exactly the 60 planted novels, got ${ids.sorted.take(70)}")
      assert(ids.length == 60, "exactly one row per admitted id")
    } finally query.stop()
  }

  test("composes downstream of CorpusIngest: quality gate and exact screen " +
      "first, the near-dup signature screen last") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("textdedup_compose")
      .resolve("store").toString
    // empty static corpus (bootstrap), with the contract's hash column
    val corpus = Seq.empty[String].toDF("text")
      .select(CorpusIngest.contentHash(
        graft.llm.NormalizeText(org.apache.spark.sql.functions.col("text")))
        .as("content_hash"))
    val in = MemoryStream[(Long, String)]
    // the full ingest chain: normalize → quality gates → in-stream exact
    // dedup → corpus screen (CorpusIngest) → near-dup signature screen
    // (this operator) — one writeStream
    val query = CorpusIngest.curate(in.toDS().toDF("doc_id", "text"), corpus)
      .writeStream
      .foreachBatch(TextDedupStream.ingestInto(dir) _)
      .start()
    try {
      def storeIds() = TextDedupStream.storeRows(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // trigger 1: 1 is novel; 50 is an EXACT dup of 1 (curate's
      // in-stream hash dedup owns it); 60 carries a blocklisted phrase
      // (the gate owns it) — neither reaches the signature store
      in.addData((1L, doc(1)), (50L, doc(1)),
        (60L, doc(60) + " table scan inside"))
      query.processAllAvailable()
      assert(storeIds() == Set(1L))
      // trigger 2: 2 is novel; 105 is an EDIT of doc 1 — new content
      // hash, so it passes every exact screen, and only the near-dup
      // signature screen can (and must) reject it
      in.addData((2L, doc(2)), (105L, doc(1, edit = true)))
      query.processAllAvailable()
      assert(storeIds() == Set(1L, 2L),
        "the edit must be rejected by the near-dup screen, the novel admitted")
    } finally query.stop()
  }

  test("a PRE-LAYOUT standalone store (flat parquet at the root) fails " +
      "loudly instead of silently bootstrapping over it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("textdedup_legacy")
      .resolve("store").toString
    // the r14-and-earlier standalone layout: (doc_id, sig) parts written
    // DIRECTLY under storeDir
    Seq((1L, Seq(1L, 2L, 3L))).toDF("doc_id", "sig")
      .write.parquet(dir)
    val e = intercept[IllegalStateException] {
      TextDedupStream.ingestInto(dir)(
        Seq((2L, doc(2))).toDF("doc_id", "text"), 0L)
    }
    assert(e.getMessage.contains("_layout"),
      s"migration must fail loudly, got: ${e.getMessage}")
    // the legacy rows are untouched — nothing bootstrapped over them
    assert(spark.read.parquet(dir).count() == 1L)
  }

  test("hot-bucket cap: an over-cap store band drops from candidates; " +
      "a true pair survives on its other bands") {
    import spark.implicits._
    // signatures built DIRECTLY (k = 32, 8 bands × 4 minima): store rows
    // share band 0 (minima 1..4) but differ everywhere else — with
    // maxBucket = 2 that band is non-discriminative and must drop
    def sig(band0: Seq[Long], rest: Long): Seq[Long] =
      band0 ++ (4 until 32).map(i => rest * 100 + i)
    val store = Seq(
      (10L, sig(Seq(1L, 2L, 3L, 4L), 10)),
      (11L, sig(Seq(1L, 2L, 3L, 4L), 11)),
      (12L, sig(Seq(1L, 2L, 3L, 4L), 12))
    ).toDF("doc_id", "sig")
    // the probe matches store row 10 in bands 1–7 (28/32 minima ≥ the
    // 7/10 gate) AND in the capped band 0; rows 11/12 share ONLY band 0
    val probe = Seq((99L, sig(Seq(1L, 2L, 3L, 4L), 10)))
      .toDF("doc_id", "sig")
    val pairs = TextDedupStream
      .sigPairsAgainst(probe, store, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((99L, 10L)),
      s"true pair must survive via uncapped bands: ${pairs.toSeq}")
  }
}
