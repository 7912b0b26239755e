package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PackSampleSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("packing: offsets are the running token stream cut at cap") {
    val cap = 100
    val out = Packing.packSequences(Tables(spark, dir, "documents"),
        "doc_id", "text", cap = cap, shards = 4)
      .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // Replay each shard serially: the operator must equal the sequential
    // concat-then-chunk definition.
    out.groupBy(_._2).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, packId, off) =>
        assert(packId == shard * 1000000L + cum / cap, s"doc $id pack")
        assert(off == cum % cap, s"doc $id offset")
        cum += n
      }
    }
    // Every pack id of a shard stays in its shard's stride.
    assert(out.forall { case (_, shard, _, packId, _) =>
      packId / 1000000L == shard })
  }

  test("packing: shards partition the corpus and offsets stay below cap") {
    val docs = Tables(spark, dir, "documents")
    val out = Packing.packSequences(docs, "doc_id", "text", cap = 64, shards = 8)
    assert(out.count() == docs.count())
    assert(out.filter(col("pack_offset") >= 64 || col("pack_offset") < 0).isEmpty)
  }

  test("sampling: deterministic, rate-accurate, and nested across rates") {
    val docs = Tables(spark, dir, "documents")
    def ids(rate: Double) =
      Sampling.stratifiedSample(docs, "doc_id", "lang",
          rates = Map.empty, defaultRate = rate)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = ids(0.5)
    assert(ids(0.5) == half, "same seed+rate must re-draw the same sample")
    val quarter = ids(0.25)
    assert(quarter.subsetOf(half), "lower rate must nest inside higher rate")
    val n = docs.count().toDouble
    assert(math.abs(half.size / n - 0.5) < 0.1, s"got ${half.size / n}")
    assert(math.abs(quarter.size / n - 0.25) < 0.1, s"got ${quarter.size / n}")
    assert(ids(0.0).isEmpty)
    assert(ids(1.0).size == n.toInt)
  }

  test("sampling: per-stratum rates apply per stratum") {
    val docs = Tables(spark, dir, "documents")
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 1.0), defaultRate = 0.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
    assert(out.count() == docs.filter(col("lang") === "en").count())
  }

  test("sampling: the filter reaches the scan stage (no shuffle of the fact side)") {
    val docs = Tables(spark, dir, "documents")
    val plan = Sampling.stratifiedSample(docs, "doc_id", "lang",
        rates = Map("en" -> 0.5), defaultRate = 0.25)
      .queryExecution.executedPlan.toString
    // Broadcast the rate table; never exchange the documents side.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("ShuffleExchange"), plan)
  }

  /** Serial greedy the stratum cut must reproduce: take docs in
    * (score desc, doc_id) order while the inclusive cumsum fits. */
  private def serialBudget(rows: Seq[(Long, Long, Long)], b: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, _, sc) => (-sc, id) }.flatMap { case (id, n, _) =>
      cum += n; if (cum <= b) Some(id) else None
    }.toSet
  }

  private def budgetIds(rows: Seq[(Long, Long, Long)], b: Long): Set[Long] = {
    import spark.implicits._
    val base = rows.toDF("doc_id", "n_tok", "score")
    val budget = Seq(b).toDF("budget")
    Sampling.tokenBudgetSelect(base, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("token budget: stratum cut equals the serial greedy at every budget") {
    val rnd = new scala.util.Random(7)
    // Small score domain forces multi-doc levels (real boundary strata);
    // sweep budgets across the whole supply including both edges.
    val rows = (0L until 300L).map(id =>
      (id, 1L + rnd.nextInt(40).toLong, rnd.nextInt(6).toLong))
    val total = rows.map(_._2).sum
    for (b <- Seq(0L, 1L, total / 7, total / 3, total / 2, total - 1, total, total + 50)) {
      assert(budgetIds(rows, b) == serialBudget(rows, b), s"budget $b")
    }
  }

  test("FFD bin packing: serial model per shard, cap respected, beats arrival order") {
    val cap = 512L
    val docs = Tables(spark, dir, "documents")
    val out = Packing.packBinsFfd(docs, "doc_id", "text", cap, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val in = docs.selectExpr("doc_id", "CAST(size(split(text, ' ', -1)) AS LONG) AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Every doc exactly once, with its true token count.
    assert(out.map(_._1).sorted.toSeq == in.map(_._1).sorted.toSeq)
    val nOf = in.toMap
    assert(out.forall { case (id, n, _, _, _) => n == nOf(id) })
    // No bin over cap; rejected iff longer than cap.
    out.groupBy(r => (r._3, r._4)).foreach { case ((_, bin), rows) =>
      if (bin >= 0) assert(rows.map(_._2).sum <= cap)
    }
    assert(out.forall { case (_, n, _, bin, _) => (bin == -1L) == (n > cap) })
    // Shard-local serial FFD replay must match exactly.
    out.groupBy(_._3).foreach { case (shard, rows) =>
      val ds = rows.map(r => (r._1, r._2)).sortBy { case (id, n) => (-n, id) }
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      val model = ds.map { case (id, n) =>
        if (n > cap) (id, -1L)
        else {
          var b = 0
          while (b < rem.length && rem(b) < n) b += 1
          if (b == rem.length) rem += cap
          rem(b) -= n
          (id, b.toLong)
        }
      }.toMap
      rows.foreach { case (id, _, _, bin, _) =>
        assert(bin == model(id), s"shard $shard doc $id") }
      // The decreasing order is the point: never more bins than
      // arrival-order (doc_id) first-fit on the same shard.
      val remA = scala.collection.mutable.ArrayBuffer.empty[Long]
      ds.sortBy(_._1).filter(_._2 <= cap).foreach { case (_, n) =>
        var b = 0
        while (b < remA.length && remA(b) < n) b += 1
        if (b == remA.length) remA += cap
        remA(b) -= n
      }
      assert(rem.length <= remA.length, s"shard $shard: FFD ${rem.length} vs arrival ${remA.length}")
    }
  }

  test("token budget: exact level-edge budgets keep whole levels, resid 0 keeps none") {
    // Two levels: score 2 holds 30 tokens, score 1 holds 20.
    val rows = Seq((1L, 10L, 2L), (2L, 20L, 2L), (3L, 20L, 1L))
    assert(budgetIds(rows, 30L) == Set(1L, 2L)) // exact fit of level 2
    assert(budgetIds(rows, 29L) == Set(1L))     // boundary inside level 2
    assert(budgetIds(rows, 9L) == Set.empty)    // resid smaller than first doc
    assert(budgetIds(rows, 50L) == Set(1L, 2L, 3L))
  }
}
