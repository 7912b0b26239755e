package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LevenshteinGuardRule: plan shape (guard conjunct + banded threshold
  * kernel), row equivalence vs the rule disabled, and rewrite
  * idempotence under the optimizer's fixed point.
  */
class LevGuardSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(3)
    // 60 shared bases; each row is a base or a light mutation of one, so
    // rows sharing a base ARE within small edit distance of each other
    val bases = (0 until 60).map(_ =>
      (0 until 20 + rnd.nextInt(60)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    (0 until 300).map { i =>
      val base = bases(i % 60)
      val t =
        if (i < 60) base
        else base.map(c =>
          if (rnd.nextInt(25) == 0) ('a' + rnd.nextInt(4)).toChar else c)
      (i.toLong, t)
    }.toDF("id", "t")
  }

  test("filter predicate rewrites to length guard + banded levenshtein") {
    graft.GraftExtensions.register(spark)
    val df = corpus
    val a = df.select(col("id").as("ia"), col("t").as("ta"))
    val b = df.select(col("id").as("ib"), col("t").as("tb"))
    val q = a.crossJoin(b).filter(col("ia") < col("ib"))
      .filter(levenshtein(col("ta"), col("tb")) <= 5)
    val p = q.queryExecution.optimizedPlan.toString
    assert(p.contains("levenshtein(ta"), p)
    assert("levenshtein\\(ta#\\d+, tb#\\d+, Some\\(5\\)\\)".r.findFirstIn(p).isDefined,
      "predicate must use the banded threshold kernel\n" + p)
    assert(p.contains("abs((length(ta") || p.contains("abs((length(tb"),
      "the O(1) length-gap guard must be injected\n" + p)
    // idempotent under re-optimization: optimizing the optimized plan's
    // DataFrame again must not stack more guards
    val guards = "abs\\(\\(length\\(".r.findAllIn(p).length
    assert(guards == 1, s"expected exactly one guard, saw $guards\n" + p)
  }

  test("join-condition predicates get the same rewrite") {
    graft.GraftExtensions.register(spark)
    val df = corpus
    val a = df.select(col("id").as("ia"), col("t").as("ta"))
    val b = df.select(col("id").as("ib"), col("t").as("tb"))
    val q = a.join(b, col("ia") < col("ib") &&
      levenshtein(col("ta"), col("tb")) <= 4)
    val p = q.queryExecution.optimizedPlan.toString
    assert("levenshtein\\(ta#\\d+, tb#\\d+, Some\\(4\\)\\)".r.findFirstIn(p).isDefined, p)
    assert(p.contains("abs((length("), p)
  }

  test("rows are identical with the rule disabled (equivalence oracle)") {
    graft.GraftExtensions.register(spark)
    val df = corpus.cache()
    def pairs() = {
      val a = df.select(col("id").as("ia"), col("t").as("ta"))
      val b = df.select(col("id").as("ib"), col("t").as("tb"))
      a.crossJoin(b).filter(col("ia") < col("ib"))
        .filter(levenshtein(col("ta"), col("tb")) <= 6)
        .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val withRule = pairs()
    spark.conf.set("spark.graft.levguard.enabled", "false")
    val without = try pairs() finally
      spark.conf.set("spark.graft.levguard.enabled", "true")
    assert(withRule == without, s"rule changed results: " +
      s"only-with=${(withRule -- without).take(5)} only-without=${(without -- withRule).take(5)}")
    assert(withRule.nonEmpty, "equivalence check must actually cover matching pairs")
    df.unpersist()
  }

  test("strict < and flipped >= forms are matched; thresholded calls are left alone") {
    graft.GraftExtensions.register(spark)
    val df = corpus
    val a = df.select(col("id").as("ia"), col("t").as("ta"))
    val b = df.select(col("id").as("ib"), col("t").as("tb"))
    val lt = a.crossJoin(b).filter(levenshtein(col("ta"), col("tb")) < 3)
      .queryExecution.optimizedPlan.toString
    assert(lt.contains("abs((length("), "strict < must still get the guard\n" + lt)
    val flipped = a.crossJoin(b).filter(lit(3) >= levenshtein(col("ta"), col("tb")))
      .queryExecution.optimizedPlan.toString
    assert("levenshtein\\(ta#\\d+, tb#\\d+, Some\\(3\\)\\)".r.findFirstIn(flipped).isDefined, flipped)
    val already = a.crossJoin(b)
      .filter(expr("levenshtein(ta, tb, 7) >= 0"))
      .queryExecution.optimizedPlan.toString
    assert(!already.contains("abs((length("),
      "already-banded predicates must be left untouched\n" + already)
  }
}
