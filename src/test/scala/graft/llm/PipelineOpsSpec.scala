package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-5 training-pipeline operators: decontamination overlap,
  * repetition-quality kernels, int8 embedding quantization.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("TokenTopCount: max single-token frequency; empty array -> 0") {
    val df = Seq(
      (1L, "a b a c a"), // 'a' x3
      (2L, "x y"), // all distinct -> 1
      (3L, "") // split("") = [""], one empty token -> 1
    ).toDF("id", "text")
    val got = df.select($"id", TokenTopCount(TextOps.tokens($"text")).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1))
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT token_top_count(CAST(array() AS ARRAY<STRING>)) AS c")
      .as[Int].head() == 0)
  }

  test("Decontaminate.overlap counts shared distinct 5-grams, train side only") {
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val train = Seq(
      // 3 shingles, one of them ("one two three four five") in the bench set
      (1L, "zzz one two three four five yyy"),
      (2L, "totally different words here now ok"), // no overlap -> absent
      (3L, "one two three four five") // exactly 1 shingle, hit
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlap(train, bench, "text", "doc_id")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 3), (3L, 1L, 1)))
  }

  test("int8 quantization: values bounded, max|x| maps to ±127, zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = df.withColumn("scale", Embeddings.int8Scale($"embedding"))
      .withColumn("q", Embeddings.int8Quantize($"embedding", $"scale"))
    val r1 = q.filter($"vec_id" === 1).select($"scale", $"q").head()
    assert(math.abs(r1.getDouble(0) - 1.0 / 127.0) < 1e-15)
    assert(r1.getSeq[Int](1) == Seq(64, -127, 32))
    val r2 = q.filter($"vec_id" === 2).select($"scale", $"q").head()
    assert(r2.getDouble(0) == 0.0 && r2.getSeq[Int](1) == Seq(0, 0, 0))
    // dequantization error is bounded by scale/2 per element
    val err = q.filter($"vec_id" === 1).select(
      array_max(zip_with($"embedding", $"q",
        (x, qq) => abs(x.cast(DoubleType) - qq * $"scale")))).as[Double].head()
    assert(err <= (1.0 / 127.0) / 2 + 1e-12, s"err=$err")
  }

  test("WordSpans keeps every position; spanSharedStats counts cross-doc spans") {
    val df = Seq((1L, "a b c a b c"), (2L, "x a b y")).toDF("doc_id", "text")
    val spans = df.select($"doc_id",
        WordSpans(TextOps.tokens($"text"), 2).as("sp"))
      .as[(Long, Seq[String])].collect().toMap
    assert(spans(1L) == Seq("a b", "b c", "c a", "a b", "b c")) // duplicates kept
    assert(spans(2L) == Seq("x a", "a b", "b y"))
    val stats = Dedup.spanSharedStats(df, "text", "doc_id", k = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // "a b" is the only cross-doc span: doc 1 has it at 2 of 5 positions,
    // doc 2 at 1 of 3.
    assert(stats == Seq((1L, 5L, 2L, 0.4), (2L, 3L, 1L, 1.0 / 3.0)))
  }

  test("scd2 versions: half-open intervals, DELETE closes without opening") {
    val chg = Seq(
      (1L, 10L, "INSERT", "v1"), (1L, 20L, "UPDATE", "v2"), (1L, 30L, "DELETE", null),
      (2L, 15L, "INSERT", "w1")
    ).toDF("pk", "cid", "type", "payload")
    val got = graft.cdc.CdcMerge.scd2(chg, Seq("pk"), "cid")
      .select($"pk", $"valid_from", $"valid_to", $"is_current", $"payload")
      .as[(Long, Long, Option[Long], Boolean, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 10L, Some(20L), false, "v1"),
      (1L, 20L, Some(30L), false, "v2"), // closed by the DELETE, no v3 row
      (2L, 15L, None, true, "w1")))
  }

  test("quality repetition fractions: duplicated text scores high") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps high")
    ).toDF("doc_id", "text")
    val toks = TextOps.tokens($"text")
    val stats = df.select($"doc_id",
        (lit(1.0) - size(TextOps.shingles($"text", 2)).cast(DoubleType)
          / (size(toks) - 1).cast(DoubleType)).as("dup2"),
        (TokenTopCount(toks).cast(DoubleType) / size(toks).cast(DoubleType)).as("topf"))
      .as[(Long, Double, Double)].collect()
      .map { case (id, d, tp) => id -> ((d, tp)) }.toMap
    val (dup1, top1) = stats(1L)
    val (dup2, top2) = stats(2L)
    assert(dup1 == 0.8 && top1 == 1.0) // one distinct bigram of 5, all tokens same
    assert(dup2 == 0.0 && top2 == 1.0 / 6.0)
  }

  test("q156 LM scoring emits a sentinel row for docs too short to hold a trigram") {
    // The fixture corpus has no <3-token docs, so the driver oracle can't
    // exercise this path: build a tiny documents table with degenerate docs
    // and run the corpus query against it (round-8 advice).
    val dir = java.nio.file.Files.createTempDirectory("lm-short").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0", 43L),
      (1L, "ok", "en", "src0", 2L),     // 1 token: no trigram, no bigram
      (2L, "hello world", "en", "src1", 11L), // 2 tokens: no trigram
      (3L, "", "en", "src1", 0L),       // empty
      (4L, "the quick brown fox sleeps", "en", "src2", 26L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q156_lm_stupid_backoff")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.isNullAt(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), "every doc_id must appear")
    assert(out(1L) == ((0L, true)) && out(2L) == ((0L, true)) && out(3L) == ((0L, true)),
      s"short docs must carry n_scored=0 and a null avg_logprob: $out")
    assert(out(0L)._1 == 7L && !out(0L)._2, "9-token doc scores 7 trigrams")
  }
}
