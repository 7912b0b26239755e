package graft.streaming

import graft.llm.{NormalizeText, WordPhraseHits}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus curation — the LLM-data surface (q143 normalize,
  * q152-style quality gates, q173 blocklist, q40/q88 dedup) as ONE
  * continuous Structured Streaming pipeline: the shape a crawl/firehose
  * ingest runs forever, admitting only documents that are clean, novel
  * within the stream, AND novel against the existing corpus.
  *
  * Stages (all append-mode compatible):
  *  1. normalize (codegen'd NFC/control/whitespace kernel)
  *  2. per-row quality gate: word-count window, distinct-word repetition
  *     ratio, blocklist (one Aho–Corasick pass)
  *  3. in-stream exact dedup: `dropDuplicates` on the content hash —
  *     keyed state in the state store holds ONE row per distinct
  *     document ever admitted (the production semantic for an ingest
  *     that must never re-admit content; bound it with
  *     `dropDuplicatesWithinWatermark` when re-admittance after a
  *     horizon is acceptable)
  *  4. corpus screen: stream-static LEFT ANTI join against the existing
  *     corpus's content hashes (static side re-read per micro-batch; at
  *     scale this is the q147 Bloom screen's exact backstop)
  *
  * Scale: stages 1-2 are stateless per-row kernels; the dedup is one
  * hash-keyed stateful exchange; the anti join broadcasts or
  * shuffle-joins by the same hash. Emitted rows carry the audit flags so
  * a downstream sink can count WHY documents dropped (only `admitted`
  * rows pass the final filter).
  */
object CorpusIngest {

  /** Content key shared with the batch dedup family (q40): sha256 of the
    * NORMALIZED text, so trivially-reformatted duplicates collapse.
    */
  def contentHash(normalized: Column): Column = sha2(normalized, 256)

  /** `docs`: streaming (doc_id LONG, text STRING). `corpus`: static
    * DataFrame holding `content_hash` for everything already admitted.
    * Returns the admitted stream: (doc_id, text, content_hash) — text
    * normalized, quality-gated, first-of-its-hash in the stream, absent
    * from the corpus.
    */
  /** Stages 1-2 + hashing, shared by both dedup variants: normalize,
    * quality-gate, stamp the content hash; `passThrough` columns ride
    * along untouched (e.g. the event-time column).
    */
  private def gate(docs: DataFrame, passThrough: Seq[String],
      blocklist: Seq[String], minWords: Int, maxWords: Int,
      minUniqRatio: Double): DataFrame = {
    val keep = passThrough.map(col)
    val norm = docs
      .select(keep :+ NormalizeText(col("text")).as("text"): _*)
    val words = split(col("text"), " ")
    val nWords = size(words).cast(LongType)
    val uniqRatio = size(array_distinct(words)).cast(DoubleType) /
      nWords.cast(DoubleType)
    norm
      .withColumn("ok_words", nWords >= minWords && nWords <= maxWords)
      .withColumn("ok_repetition", uniqRatio >= minUniqRatio)
      .withColumn("ok_blocklist",
        size(WordPhraseHits(col("text"), blocklist)) === 0)
      .filter(col("ok_words") && col("ok_repetition") && col("ok_blocklist"))
      .select(keep ++ Seq(col("text"),
        contentHash(col("text")).as("content_hash")): _*)
  }

  /** Stages 1-2 as a batch-side function — the gate [[CurationChain]]
    * runs inside its foreachBatch trigger body (curate/curateBounded wrap
    * the same kernel for the declarative streaming form). Returns
    * (passThrough..., text, content_hash) for rows passing the gate.
    */
  def gateBatch(docs: DataFrame, passThrough: Seq[String] = Seq("doc_id"),
      blocklist: Seq[String] = graft.llm.Blocklist.phrases,
      minWords: Int = 8, maxWords: Int = 200,
      minUniqRatio: Double = 0.3): DataFrame =
    gate(docs, passThrough, blocklist, minWords, maxWords, minUniqRatio)

  def curate(docs: DataFrame, corpus: DataFrame,
      blocklist: Seq[String] = graft.llm.Blocklist.phrases,
      minWords: Int = 8, maxWords: Int = 200,
      minUniqRatio: Double = 0.3): DataFrame =
    gate(docs, Seq("doc_id"), blocklist, minWords, maxWords, minUniqRatio)
      .dropDuplicates("content_hash")
      .join(corpus.select(col("content_hash")), Seq("content_hash"), "left_anti")
      .select("doc_id", "text", "content_hash")

  /** The state-BOUNDED ingest — what actually runs at 100 TB. [[curate]]'s
    * `dropDuplicates` keeps one state row per distinct document EVER seen:
    * exact, but state grows with corpus-lifetime distinct content. This
    * variant bounds it with the watermark horizon:
    * `dropDuplicatesWithinWatermark` evicts a hash's state once the
    * watermark passes its event time + `horizon`, so state holds only the
    * horizon's worth of distinct content — the firehose contract where
    * in-stream duplicates cluster in time (crawl recrawls, retry storms).
    * Re-admittance beyond the horizon is then screened by the STATIC
    * corpus side (the q147 Bloom screen's exact backstop), which is the
    * durable memory; in-stream state is only the hot window. `docs` must
    * carry an event-time column `eventTimeCol` (TIMESTAMP).
    */
  def curateBounded(docs: DataFrame, corpus: DataFrame, eventTimeCol: String,
      horizon: String, blocklist: Seq[String] = graft.llm.Blocklist.phrases,
      minWords: Int = 8, maxWords: Int = 200,
      minUniqRatio: Double = 0.3): DataFrame =
    gate(docs, Seq("doc_id", eventTimeCol), blocklist, minWords, maxWords,
      minUniqRatio)
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
      .join(corpus.select(col("content_hash")), Seq("content_hash"), "left_anti")
      .select("doc_id", eventTimeCol, "text", "content_hash")
}
