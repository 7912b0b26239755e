package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming corpus curation: quality gates, cross-trigger in-stream
  * dedup (the state survives triggers), the static-corpus anti screen,
  * and normalization-collapsed duplicates.
  */
class CorpusIngestSpec extends SparkSpec {

  private val good =
    "the quick data table holds a clean stream of fresh value rows today"
  private val goodDup = "  the quick data  table holds a clean stream " +
    "of fresh value rows today " // normalizes to `good` → same content hash
  private val short = "too short"
  private val repetitive = Array.fill(40)("spark").mkString(" ")
  private val blocked =
    "a long enough document that sadly mentions a full table scan inside it " +
      "and therefore must be screened out by the phrase blocklist rules"
  private val inCorpus =
    "this one was already admitted in some earlier corpus generation run " +
      "and the static screen must reject it on sight every single time"

  test("gates, cross-trigger dedup state, corpus screen, normalization collapse") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(inCorpus).toDF("text")
      .select(CorpusIngest.contentHash(
        graft.llm.NormalizeText(col("text"))).as("content_hash"))
    val in = MemoryStream[(Long, String)]
    val query = CorpusIngest.curate(
        in.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      in.addData((1L, good), (2L, short), (3L, repetitive),
        (4L, blocked), (5L, inCorpus))
      query.processAllAvailable()
      def ids() = spark.table("ingest_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids() == Set(1L), ids())
      // trigger 2: a reformatted duplicate of doc 1 (different raw bytes,
      // same normalized hash) must be caught by STATE from trigger 1
      in.addData((6L, goodDup), (7L, good + " extra"))
      query.processAllAvailable()
      assert(ids() == Set(1L, 7L), ids())
      // the admitted rows carry the normalized text + its hash
      val row1 = spark.table("ingest_out")
        .filter(col("doc_id") === 1L).collect().head
      assert(row1.getString(1) == good)
      assert(row1.getString(2) ==
        corpus.sparkSession.range(1).select(
          sha2(lit(good), 256)).collect().head.getString(0))
    } finally query.stop()
  }
}
