package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** signalAgreement sampled mode (the q189 audit's corpus-scale path):
  * sample determinism, equivalence contracts, and the fixed-budget cost
  * shape the flat-at-10× claim rests on.
  */
class SignalAgreementSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents")
  private def embs = Tables(spark, dir, "embeddings")

  test("budget >= corpus is exactly the exhaustive audit") {
    val n = docs.count().toInt
    val full = Dedup.signalAgreement(docs, embs).collect().toSeq
    val capped = Dedup.signalAgreement(docs, embs, Some(n + 10)).collect().toSeq
    assert(capped == full)
  }

  test("sampled audit = exhaustive audit over the sample subset") {
    val m = 40
    // the sample is defined by the md5 order, independent of the audit
    val ids = docs
      .orderBy(md5(concat(lit("ns:"), col("doc_id").cast("string"))), col("doc_id"))
      .limit(m).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size == m)
    val sampled = Dedup.signalAgreement(docs, embs, Some(m)).collect().toSeq
    // every pair is within the sample
    sampled.foreach { r =>
      assert(ids(r.getLong(0)) && ids(r.getLong(1)), s"pair outside sample: $r")
    }
    // and equals running the exhaustive audit on the pre-filtered subset
    val want = Dedup.signalAgreement(
      docs.filter(col("doc_id").isin(ids.toSeq: _*)),
      embs.filter(col("vec_id").isin(ids.toSeq: _*))).collect().toSeq
    assert(sampled == want)
  }

  test("sample is deterministic across runs and partitionings") {
    val a = Dedup.signalAgreement(docs, embs, Some(250)).collect().toSeq
    val b = Dedup.signalAgreement(docs.repartition(13), embs.repartition(7),
      Some(250)).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sampled plan takes the budget via TakeOrderedAndProject, no global sort") {
    val plan = Dedup.signalAgreement(docs, embs, Some(50))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
