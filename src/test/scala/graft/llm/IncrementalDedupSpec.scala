package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** jaccardPairsAgainst (incremental new-vs-corpus dedup): losslessness
  * against the unfiltered cross set, side discipline, and the batch-cost
  * contract the scale story rests on.
  */
class IncrementalDedupSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("cross pairs = exact self-join pairs restricted to new x corpus") {
    val docs = Tables(spark, dir, "documents")
    val isNew = col("doc_id") % 5 === 0
    val cross = Dedup.jaccardPairsAgainst(
        docs.filter(isNew), docs.filter(!isNew), "text", "doc_id")
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the full self-join, keeping only new-corpus pairs
    // (either orientation — the self-join emits da < db).
    val all = Dedup.jaccardPairs(docs, "text", "doc_id")
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = all.flatMap { case (a, b) =>
      (a % 5 == 0, b % 5 == 0) match {
        case (true, false) => Some((a, b))
        case (false, true) => Some((b, a))
        case _ => None
      }
    }.toSet
    assert(cross == want,
      s"missing=${(want -- cross).take(5)} extra=${(cross -- want).take(5)}")
  }

  test("no corpus-corpus or new-new pairs leak") {
    val docs = Tables(spark, dir, "documents")
    val isNew = col("doc_id") % 5 === 0
    val out = Dedup.jaccardPairsAgainst(
      docs.filter(isNew), docs.filter(!isNew), "text", "doc_id")
    assert(out.filter(col("new_id") % 5 =!= 0 || col("corpus_id") % 5 === 0).isEmpty)
  }

  test("empty batch yields empty pairs without touching corpus pairs") {
    val docs = Tables(spark, dir, "documents")
    val out = Dedup.jaccardPairsAgainst(
      docs.filter(lit(false)), docs, "text", "doc_id")
    assert(out.isEmpty)
  }
}
