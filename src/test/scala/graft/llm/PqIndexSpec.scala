package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted compressed indexes (q231 flat PQ, q232 IVF-PQ): probe ≡
  * the inline path at equal parameters, the IVF-PQ probe scan is
  * partition-pruned to the probed cells, and a rebuild replaces the
  * previous generation.
  */
class PqIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val pqIdx = "/tmp/graft_pq_idx_spec"
  private val ivfpqIdx = "/tmp/graft_ivfpq_idx_spec"

  private def triples(df: org.apache.spark.sql.DataFrame) = df
    .orderBy("query_id", "rank")
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("flat-PQ probe of the persisted index equals the inline pqTopK exactly") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildPqIndex(e, pqIdx)
    val q = e.filter(col("vec_id") < 10)
    val got = triples(Similarity.probePqIndex(pqIdx, q, e, k = 5))
    val want = triples(Similarity.pqTopK(q, e, k = 5))
    assert(got == want, s"persisted PQ probe diverged: got ${got.take(5)}…")
    assert(got.nonEmpty)
  }

  test("flat-PQ append ≡ one-shot encoding under the same codebooks, exactly") {
    val e = Tables(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val idxApp = pqIdx + "_app"
    Similarity.buildPqIndex(a, idxApp)
    Similarity.appendToPqIndex(b, idxApp)
    val idxRef = pqIdx + "_ref"
    Similarity.buildPqIndex(a, idxRef) // deterministic training → same codebooks
    Similarity.assignPqCodes(a.unionByName(b), idxRef, "overwrite")
    val q = e.filter(col("vec_id") < 10)
    val got = triples(Similarity.probePqIndex(idxApp, q, e, k = 5))
    assert(got == triples(Similarity.probePqIndex(idxRef, q, e, k = 5)),
      s"PQ append diverged from one-shot: ${got.take(5)}…")
    assert(got.nonEmpty && got.exists(_._3 % 2 == 1),
      "no appended vector ever surfaced")
    assert(spark.read.parquet(idxApp + "/codes").count() == e.count())
  }

  test("IVF-PQ append ≡ one-shot assignment under the same artifacts, exactly") {
    val e = Tables(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val idxApp = ivfpqIdx + "_app"
    Similarity.buildIvfPqIndex(a, idxApp, nlist = 16)
    Similarity.appendToIvfPqIndex(b, idxApp)
    val idxRef = ivfpqIdx + "_ref"
    Similarity.buildIvfPqIndex(a, idxRef, nlist = 16)
    Similarity.assignIvfPqPostings(a.unionByName(b), idxRef, "overwrite")
    val q = e.filter(col("vec_id") < 10)
    val got = triples(Similarity.probeIvfPqIndex(idxApp, q, e, k = 5, nprobe = 12))
    assert(got == triples(Similarity.probeIvfPqIndex(idxRef, q, e, k = 5, nprobe = 12)),
      s"IVF-PQ append diverged from one-shot: ${got.take(5)}…")
    assert(got.nonEmpty && got.exists(_._3 % 2 == 1),
      "no appended vector ever surfaced")
    assert(spark.read.parquet(idxApp + "/postings").count() == e.count())
  }

  test("IVF-PQ probe of the persisted index equals the inline ivfpqTopK exactly") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfPqIndex(e, ivfpqIdx, nlist = 16)
    val q = e.filter(col("vec_id") < 10)
    val got = triples(Similarity.probeIvfPqIndex(ivfpqIdx, q, e, k = 5, nprobe = 12))
    val want = triples(Similarity.ivfpqTopK(q, e, k = 5, nlist = 16, nprobe = 12))
    assert(got == want, s"persisted IVF-PQ probe diverged: got ${got.take(5)}…")
    assert(got.nonEmpty)
  }

  test("IVF-PQ postings scan is statically pruned to the probed cells") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfPqIndex(e, ivfpqIdx, nlist = 16)
    val one = e.filter(col("vec_id") === 0)
    val plan = Similarity.probeIvfPqIndex(ivfpqIdx, one, e, k = 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(4000))
    val pf = plan.split("PartitionFilters").lift(1).getOrElse("")
    assert(pf.contains("cell"),
      "cell filter missing from partition filters\n" + plan.take(4000))
  }

  test("the index stores codes, not vectors; rebuild replaces the generation") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfPqIndex(e, ivfpqIdx, nlist = 16)
    val postings = spark.read.parquet(ivfpqIdx + "/postings")
    assert(postings.columns.toSet == Set("neighbor_id", "codes", "cell"),
      postings.columns.mkString(","))
    // m=8 one-byte codes per vector, one row per corpus vector
    assert(postings.count() == e.count())
    assert(postings.select(max(size(col("codes")))).head.getInt(0) == 8)
    // rebuild on a shifted corpus fully replaces the previous generation
    val half = e.filter(col("vec_id") % 2 === 0)
    Similarity.buildIvfPqIndex(half, ivfpqIdx, nlist = 16)
    val rebuilt = spark.read.parquet(ivfpqIdx + "/postings")
    assert(rebuilt.count() == half.count())
    assert(rebuilt.filter(col("neighbor_id") % 2 =!= 0).count() == 0)
  }
}
