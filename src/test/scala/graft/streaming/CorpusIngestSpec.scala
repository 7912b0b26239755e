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

  test("bounded variant: horizon dedup, state EVICTS past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(inCorpus).toDF("text")
      .select(CorpusIngest.contentHash(
        graft.llm.NormalizeText(col("text"))).as("content_hash"))
    val fresh = "a different clean document with plenty of distinct useful " +
      "words that sails through every quality gate easily"
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val query = CorpusIngest.curateBounded(
        in.toDS().toDF("doc_id", "ts", "text"), corpus, "ts", "10 minutes")
      .writeStream.format("memory").queryName("bounded_out")
      .outputMode("append").start()
    def ids() = spark.table("bounded_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      // same-batch and next-batch duplicates inside the horizon drop
      in.addData((1L, ts(0), good), (2L, ts(1), good))
      query.processAllAvailable()
      assert(ids() == Set(1L), ids())
      in.addData((3L, ts(5), good))
      query.processAllAvailable()
      assert(ids() == Set(1L), ids())
      // an event far past the horizon advances the watermark; the state
      // row for `good` (ts 0 + 10 min horizon) is then evicted
      in.addData((4L, ts(60), fresh))
      query.processAllAvailable()
      assert(ids() == Set(1L, 4L), ids())
      val afterEvict = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // the SAME text re-arrives beyond the horizon: in-stream state no
      // longer remembers it — re-admitted (the STATIC corpus screen is
      // the durable memory; this is the bounded-state contract)
      in.addData((5L, ts(61), good))
      query.processAllAvailable()
      assert(ids() == Set(1L, 4L, 5L), ids())
      // the static screen itself never expires
      in.addData((6L, ts(62), inCorpus))
      query.processAllAvailable()
      assert(ids() == Set(1L, 4L, 5L), ids())
      // measured eviction: state holds only the horizon's content, not
      // every hash ever seen (4 distinct hashes crossed the stream)
      assert(afterEvict <= 2L, s"state not evicted: $afterEvict rows")
    } finally query.stop()
  }
}
