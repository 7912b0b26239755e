package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming token-budget admission: FCFS-with-skip semantics, exhaustion
  * persisting across triggers, per-source independence, and equality with
  * a serial replay of the same offer sequence.
  */
class BudgetAdmitSpec extends SparkSpec {

  /** Serial model: fold offers in (trigger, docId) order per source. */
  private def serial(batches: Seq[Seq[OfferedDoc]],
      budgets: Map[String, Long]): Set[(String, Long, Boolean, Long)] = {
    val used = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    batches.flatMap { b =>
      b.sortBy(d => (d.source, d.docId)).map { d =>
        val ok = used(d.source) + d.nTok <= budgets.getOrElse(d.source, 0L)
        if (ok) used(d.source) += d.nTok
        (d.source, d.docId, ok, used(d.source))
      }
    }.toSet
  }

  private def run(batches: Seq[Seq[OfferedDoc]],
      budgets: Map[String, Long]): Set[(String, Long, Boolean, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[OfferedDoc]
    val name = s"budget_admit_${System.nanoTime()}"
    val q = BudgetAdmit.admit(in.toDS(), budgets).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3), r.getLong(4)))
        .toSet
    } finally q.stop()
  }

  test("admission equals the serial replay; exhaustion persists across triggers") {
    val budgets = Map("a" -> 25L, "b" -> 100L)
    val batches = Seq(
      Seq(OfferedDoc("a", 1, 10), OfferedDoc("a", 2, 20), OfferedDoc("b", 1, 60)),
      Seq(OfferedDoc("a", 3, 15), OfferedDoc("a", 4, 1), OfferedDoc("b", 2, 50)),
      Seq(OfferedDoc("a", 5, 1)))
    val got = run(batches, budgets)
    assert(got == serial(batches, budgets))
    // The specific decisions the contract promises:
    // a1 (10 <= 25) in; a2 (30 > 25) SKIPPED; a3 (10+15 = 25) exact fit in;
    // a4 and a5 (26 > 25) rejected forever after. b2 (110 > 100) out.
    assert(got.contains(("a", 1L, true, 10L)))
    assert(got.contains(("a", 2L, false, 10L)))
    assert(got.contains(("a", 3L, true, 25L)))
    assert(got.contains(("a", 4L, false, 25L)))
    assert(got.contains(("a", 5L, false, 25L)))
    assert(got.contains(("b", 1L, true, 60L)))
    assert(got.contains(("b", 2L, false, 60L)))
  }

  test("unknown sources fall to the default budget (0 = closed gate)") {
    val got = run(Seq(Seq(OfferedDoc("ghost", 1, 1))), Map("a" -> 10L))
    assert(got == Set(("ghost", 1L, false, 0L)))
  }

  test("a 200-trigger drip keeps state at one counter and admits exactly the budget") {
    val budgets = Map("s" -> 150L)
    // 200 one-doc triggers of 1 token each: exactly 150 admitted, 50 rejected.
    val batches = (1 to 200).map(i => Seq(OfferedDoc("s", i.toLong, 1L)))
    val got = run(batches, budgets)
    assert(got.count(_._3) == 150)
    assert(got.filter(_._3).map(_._2).max == 150L)
    assert(got.forall { case (_, id, ok, _) => ok == (id <= 150L) })
  }
}
