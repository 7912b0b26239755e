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
  def curate(docs: DataFrame, corpus: DataFrame,
      blocklist: Seq[String] = graft.llm.Blocklist.phrases,
      minWords: Int = 8, maxWords: Int = 200,
      minUniqRatio: Double = 0.3): DataFrame = {
    val norm = docs
      .select(col("doc_id"), NormalizeText(col("text")).as("text"))
    val words = split(col("text"), " ")
    val nWords = size(words).cast(LongType)
    val uniqRatio = size(array_distinct(words)).cast(DoubleType) /
      nWords.cast(DoubleType)
    val gated = norm
      .withColumn("ok_words", nWords >= minWords && nWords <= maxWords)
      .withColumn("ok_repetition", uniqRatio >= minUniqRatio)
      .withColumn("ok_blocklist",
        size(WordPhraseHits(col("text"), blocklist)) === 0)
      .filter(col("ok_words") && col("ok_repetition") && col("ok_blocklist"))
      .select(col("doc_id"), col("text"), contentHash(col("text")).as("content_hash"))
    gated
      .dropDuplicates("content_hash")
      .join(corpus.select(col("content_hash")), Seq("content_hash"), "left_anti")
      .select("doc_id", "text", "content_hash")
  }
}
