package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bloom membership screen (q147): the one-sided-error contract (zero
  * false negatives, bounded false positives), build determinism across
  * partitionings, sharding behavior, and the loud-failure blob checks.
  */
class BloomSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("zero false negatives: screening the corpus against itself is empty") {
    val docs = Tables(spark, dir, "documents")
    val filters = Bloom.filterDf(docs, col("text"), expectedN = docs.count())
    assert(Bloom.newKeys(docs, col("text"), filters, shards = 4).count() == 0L)
  }

  test("false-positive rate stays near the design point") {
    val docs = Tables(spark, dir, "documents")
    val n = docs.count()
    val filters = Bloom.filterDf(docs, col("text"), expectedN = n, fp = 0.01)
    val probes = 20000
    val foreign = spark.range(probes)
      .select(concat(lit("bloom-probe-never-in-corpus-"), col("id")).as("key"))
    val newOnes = Bloom.newKeys(foreign, col("key"), filters, shards = 4).count()
    val fpRate = (probes - newOnes).toDouble / probes
    // 3x headroom over the design epsilon covers sizing quantization
    assert(fpRate <= 0.03, s"false-positive rate $fpRate > 3x design 0.01")
  }

  test("filter bytes are partition-count independent (OR-monoid merge)") {
    val docs = Tables(spark, dir, "documents")
    val n = docs.count()
    def blobs(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Byte]] =
      Bloom.filterDf(df, col("text"), expectedN = n).collect()
        .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(blobs(docs.repartition(1)) == blobs(docs.repartition(7)))
  }

  test("q147 semantics: output is exactly new-keys minus designed FP loss") {
    val docs = Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val filters = Bloom.filterDf(corpus, col("text"), expectedN = corpus.count())
    val flagged = Bloom.newKeys(docs, col("text"), filters, shards = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact ground truth: docs whose TEXT does not appear in the corpus
    val exactNew = docs.join(corpus.select(col("text").as("ct")),
        col("text") === col("ct"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(exactNew), "bloom flagged a key the corpus contains")
    assert(exactNew.nonEmpty)
    val kept = flagged.size.toDouble / exactNew.size
    assert(kept >= 0.95, s"kept only $kept of genuinely-new keys (ε should be ~0.01)")
  }

  test("corrupt blobs fail loudly, never silently report absent") {
    intercept[IllegalArgumentException] {
      BloomKernels.contains(Array[Byte](1, 2, 3), 42L)
    }
    val blob = BloomKernels.seal(new Array[Byte](8), 64L, 3)
    blob(0) = 0x00 // break the magic
    intercept[IllegalArgumentException] {
      BloomKernels.contains(blob, 42L)
    }
    val truncated = BloomKernels.seal(new Array[Byte](8), 512L, 3) // m lies
    intercept[IllegalArgumentException] {
      BloomKernels.contains(truncated, 42L)
    }
  }

  test("params sizing matches the standard optimum") {
    val (m, k) = BloomKernels.params(1000, 0.01)
    // -n ln p / ln^2 2 = 9585.06 -> 9586; k = m/n ln2 = 6.64 -> 7
    assert(m >= 9585 && m <= 9600, s"m=$m")
    assert(k == 7, s"k=$k")
  }

  test("the driver-side delta blob build is BIT-IDENTICAL to the " +
      "distributed BloomAgg blobs — the fronts' correctness rides on it") {
    import graft.streaming.StoreLayout
    val s = spark
    import s.implicits._
    val P = 16
    val keyed = spark.range(5000)
      .select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("id")).as("__h"))
      .withColumn("pb", StoreLayout.bucketOf(
        org.apache.spark.sql.functions.col("__h"), P))
    val distributed = StoreLayout.bloomDelta(keyed, 5000L, P)
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1))).toMap
    val local = StoreLayout.bloomDeltaLocal(
      keyed.collect().map(r => (r.getLong(0), r.getInt(1))), 5000L, P).toMap
    assert(distributed.keySet == local.keySet)
    // merge order cannot matter (OR is commutative/idempotent), so the
    // sealed blobs must match byte for byte — any divergence would let
    // the cached-front probe and the on-disk blobs disagree
    distributed.foreach { case (pb, blob) =>
      assert(java.util.Arrays.equals(blob, local(pb)), s"bucket $pb differs")
    }
  }
}
