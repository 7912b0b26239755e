package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted IVF index (q220): probe ≡ the inline ivfTopK at equal
  * parameters, the probe scan is partition-pruned to the probed cells,
  * and a rebuild fully replaces the previous generation.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val idx = "/tmp/graft_ivf_idx_spec"

  test("probe of the persisted index equals the inline ivfTopK exactly") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfIndex(e, idx, nlist = 16)
    val q = e.filter(col("vec_id") < 10)
    val got = Similarity.probeIvfIndex(idx, q, k = 5, nprobe = 12)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = Similarity.ivfTopK(q, e, k = 5, nlist = 16, nprobe = 12)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, s"persisted probe diverged: got ${got.take(5)}…")
    assert(got.nonEmpty)
  }

  test("probe scan is statically pruned to the probed cells") {
    val e = Tables(spark, dir, "embeddings")
    Similarity.buildIvfIndex(e, idx, nlist = 16)
    val one = e.filter(col("vec_id") === 0)
    val plan = Similarity.probeIvfIndex(idx, one, k = 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    // The cell IN (...) predicate must land in the scan's partition
    // filters — the unprobed cells' files are never opened.
    assert(plan.contains("PartitionFilters"), plan.take(4000))
    val pf = plan.split("PartitionFilters").lift(1).getOrElse("")
    assert(pf.contains("cell"), "cell filter missing from partition filters\n" + plan.take(4000))
  }

  test("rebuild replaces the previous generation completely") {
    val e = Tables(spark, dir, "embeddings")
    // Generation 1: only even vectors. A probe can never return an odd id.
    Similarity.buildIvfIndex(e.filter(col("vec_id") % 2 === 0), idx, nlist = 8)
    val q = e.filter(col("vec_id") === 1)
    val g1 = Similarity.probeIvfIndex(idx, q, k = 10, nprobe = 8)
      .collect().map(_.getLong(2))
    assert(g1.nonEmpty && g1.forall(_ % 2 == 0))
    // Generation 2: full corpus. Odd neighbors must now be reachable.
    Similarity.buildIvfIndex(e, idx, nlist = 8)
    val g2 = Similarity.probeIvfIndex(idx, q, k = 10, nprobe = 8)
      .collect().map(_.getLong(2))
    assert(g2.exists(_ % 2 == 1), "rebuild did not surface the new vectors")
  }
}
