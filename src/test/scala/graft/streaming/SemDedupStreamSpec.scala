package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming semantic dedup: in-batch greedy drop + standing-corpus
  * screen per trigger, the corpus growing by exactly the admitted rows —
  * a paraphrase of something admitted two triggers ago must be rejected
  * like one admitted at bootstrap.
  */
class SemDedupStreamSpec extends SparkSpec {

  private val dim = 8
  private def basis(i: Int): Seq[Float] =
    Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
  /** A near-duplicate of basis(i): cosine > 0.99, well over threshold. */
  private def nearDup(i: Int): Seq[Float] =
    Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.01f)

  test("admitBatch: bootstrap in-batch screen, then corpus screen") {
    import spark.implicits._
    val batch = Seq(
      (1L, basis(0)), (2L, basis(1)), (3L, nearDup(0)) // 3 dups 1 in-batch
    ).toDF("vec_id", "embedding")
    val boot = SemDedupStream.admitBatch(batch, spark.emptyDataFrame, 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(boot == Set(1L, 2L), s"greedy in-batch rule keeps the lower id: $boot")

    val corpus = Seq((1L, basis(0)), (2L, basis(1))).toDF("vec_id", "embedding")
    val next = Seq((4L, basis(2)), (5L, nearDup(1))).toDF("vec_id", "embedding")
    val admitted = SemDedupStream.admitBatch(next, corpus, 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(4L), s"corpus near-dup must be rejected: $admitted")

    // an idle trigger is a no-op, not a crash
    assert(SemDedupStream.admitBatch(batch.limit(0), corpus, 0.9).isEmpty)
  }

  test("foreachBatch ingest: the corpus compounds across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semdedup_stream")
      .resolve("corpus").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val query = in.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(SemDedupStream.ingestInto(dir, threshold = 0.9) _)
      .start()
    try {
      def corpusIds() =
        spark.read.parquet(dir).select("vec_id")
          .collect().map(_.getLong(0)).toSet
      // trigger 1 (bootstrap): 3 is an in-batch near-dup of 1
      in.addData((1L, basis(0)), (2L, basis(1)), (3L, nearDup(0)))
      query.processAllAvailable()
      assert(corpusIds() == Set(1L, 2L))
      // trigger 2: 4 novel, 5 duplicates corpus vector 2
      in.addData((4L, basis(2)), (5L, nearDup(1)))
      query.processAllAvailable()
      assert(corpusIds() == Set(1L, 2L, 4L))
      // trigger 3: 6 duplicates a vector admitted TWO triggers ago,
      // 7 duplicates one admitted last trigger, 8 is novel
      in.addData((6L, nearDup(0)), (7L, nearDup(2)), (8L, basis(3)))
      query.processAllAvailable()
      assert(corpusIds() == Set(1L, 2L, 4L, 8L))
      // the store holds exactly one row per admitted id (no double append
      // from plan re-execution — the persist() guard)
      val counts = spark.read.parquet(dir).groupBy("vec_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(counts.values.forall(_ == 1L), counts)
    } finally query.stop()
  }

  test("60-trigger soak: dup lags from 1 to 30 triggers all rejected, " +
      "corpus is exactly the planted novels", SoakTest) {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d32 = 32
    val rnd = new scala.util.Random(42)
    // deterministic unit novels; seeded so the precondition is stable
    val novels = Array.fill(60) {
      val v = Array.fill(d32)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    // precondition of the plant: novels are pairwise FAR below threshold
    for (i <- novels.indices; j <- 0 until i) {
      val cos = novels(i).zip(novels(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(cos) < 0.8, s"seeded novels degenerate at ($i,$j): $cos")
    }
    def dupOf(v: Seq[Float]): Seq[Float] =
      v.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.01f else 0f) }

    val dir = java.nio.file.Files.createTempDirectory("semdedup_soak")
      .resolve("corpus").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val query = in.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(SemDedupStream.ingestInto(dir, threshold = 0.9) _)
      .start()
    try {
      for (t <- 0 until 60) {
        val novelId = 1000L + t
        val rows = Seq.newBuilder[(Long, Seq[Float])]
        rows += ((novelId, novels(t)))
        rows += ((2000L + t, dupOf(novels(t)))) // in-batch dup, every trigger
        if (t > 0) { // dup of a novel admitted `lag` triggers ago
          val lag = t / 2 + 1
          val target = math.max(0, t - lag)
          rows += ((3000L + t, dupOf(novels(target))))
        }
        in.addData(rows.result(): _*)
        query.processAllAvailable()
      }
      val ids = spark.read.parquet(dir).select("vec_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.toSet == (0 until 60).map(1000L + _).toSet,
        s"corpus must be exactly the 60 planted novels, got ${ids.sorted.take(70)}")
      assert(ids.length == 60, "exactly one row per admitted id")
    } finally query.stop()
  }
}
