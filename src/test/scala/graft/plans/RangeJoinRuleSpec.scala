package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimizer rule must turn a naive BETWEEN range join into the binned
  * equi-join (no nested loop) without changing its rows.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  private lazy val left =
    (1 to 50).map(i => (i.toLong, ts(i * 37 % 5000))).toDF("lid", "lts")
  private lazy val right =
    (1 to 80).map(i => (100L + i, ts(i * 59 % 5000))).toDF("rid", "rts")

  private def naive: DataFrame = left.join(right,
    $"rts" >= $"lts" && $"rts" <= $"lts" + expr("INTERVAL 3 MINUTES"))

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select($"lid", $"rid").as[(Long, Long)].collect().toSet

  test("naive BETWEEN join rewrites to a bin hash join with identical rows") {
    val expected = try {
      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      rows(naive) // rule disabled -> Spark's own nested-loop plan
    } finally spark.conf.set("spark.graft.rangejoin.enabled", "true")
    assert(expected.nonEmpty)

    graft.GraftExtensions.register(spark)
    val df = naive
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(rows(df) == expected)

    // manual operator agrees too
    val manual = graft.operators.RangeJoin.timestampRangeJoin(
        left, right, "lts", "rts", 0L, 180L * 1000000, 3600L * 1000000)
      .select(col("l_lid").as("lid"), col("r_rid").as("rid"))
    assert(rows(manual.toDF("lid", "rid").select($"lid", $"rid")) == expected)
  }

  test("equi + range joins compose into a (key, bin) hash join, rows identical") {
    graft.GraftExtensions.register(spark)
    val l9 = (1 to 60).map(i => ((i % 4).toLong, i.toLong, ts(i * 37 % 5000)))
      .toDF("k", "lid", "lts")
    val r9 = (1 to 90).map(i => ((i % 4).toLong, 100L + i, ts(i * 59 % 5000)))
      .toDF("k", "rid", "rts")
    def j = l9.join(r9, l9("k") === r9("k") &&
      $"rts" >= $"lts" && $"rts" <= $"lts" + expr("INTERVAL 5 MINUTES"))
    val expected = try {
      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      rows(j)
    } finally spark.conf.set("spark.graft.rangejoin.enabled", "true")
    assert(expected.nonEmpty)
    val df = j
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("__bin"), opt) // rewrite fired despite the equi key
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(rows(df) == expected)
  }

  test("pure equi joins (no range bounds) are left alone") {
    graft.GraftExtensions.register(spark)
    val l = Seq((1L, 1L, ts(10))).toDF("k", "lid", "lts")
    val r = Seq((1L, 2L, ts(15))).toDF("k", "rid", "rts")
    val j = l.join(r, l("k") === r("k"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(!opt.contains("__bin"), opt)
    assert(j.count() == 1)
  }

  test("broadcast-hinted joins are left alone (user chose a strategy)") {
    graft.GraftExtensions.register(spark)
    val j = left.join(broadcast(right),
      $"rts" >= $"lts" && $"rts" <= $"lts" + expr("INTERVAL 3 MINUTES"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(!opt.contains("__bin"), opt)
  }

  test("year-9999 timestamps keep identical rows under small bins") {
    graft.GraftExtensions.register(spark)
    val base = java.sql.Timestamp.valueOf("9999-12-31 12:00:00").getTime
    def tms(ms: Long) = new java.sql.Timestamp(base + ms)
    val l9 = (0 until 30).map(i => (i.toLong, tms(i * 7L))).toDF("lid", "lts")
    val r9 = (0 until 50).map(i => (100L + i, tms(i * 5L))).toDF("rid", "rts")
    def j = l9.join(r9, $"rts" >= $"lts" &&
      $"rts" <= $"lts" + expr("INTERVAL 0.02 SECONDS"))
    val expected = try {
      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      rows(j)
    } finally spark.conf.set("spark.graft.rangejoin.enabled", "true")
    assert(expected.nonEmpty)
    try {
      spark.conf.set("spark.graft.rangejoin.binwidth.us", "1000")
      assert(rows(j) == expected)
    } finally spark.conf.unset("spark.graft.rangejoin.binwidth.us")
  }

  test("a window spanning more than maxbins bins fails loudly, not silently") {
    graft.GraftExtensions.register(spark)
    try {
      spark.conf.set("spark.graft.rangejoin.binwidth.us", "1000") // 1ms bins
      spark.conf.set("spark.graft.rangejoin.maxbins", "100")
      val wide = left.join(right, $"rts" >= $"lts" &&
        $"rts" <= $"lts" + expr("INTERVAL 10 MINUTES")) // 600k bins
      val e = intercept[Exception] { wide.count() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("graft range join")), e.toString)
    } finally {
      spark.conf.unset("spark.graft.rangejoin.binwidth.us")
      spark.conf.unset("spark.graft.rangejoin.maxbins")
    }
  }

  // Regression for the injectOptimizerRule wiring: there the rule shares a
  // fixed-point batch with PushPredicateThroughJoin, which pushes the
  // residual range bounds back into the rewritten join each iteration.
  // Before the generated-attribute refusal in rewritable(), any range join
  // on such a session died with 'Max iterations (100) reached' and a
  // StackOverflowError. experimental.extraOptimizations (the other tests
  // above) runs in its own single-rule batch and never reproduced this.
  test("withExtensions session: pure and equi+range joins converge and match") {
    import org.apache.spark.sql.SparkSession
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // Reuses the live SparkContext; extensions apply because the builder
    // creates a NEW SparkSession object. Never .stop() it — shared context.
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val sqlCtx = s2.sqlContext
      import sqlCtx.implicits._
      val l2 = (1 to 50).map(i => (i.toLong, ts(i * 37 % 5000))).toDF("lid", "lts")
      val r2 = (1 to 80).map(i => (100L + i, ts(i * 59 % 5000))).toDF("rid", "rts")

      // pure range join
      val pure = l2.join(r2,
        $"rts" >= $"lts" && $"rts" <= $"lts" + expr("INTERVAL 3 MINUTES"))
      val pureOpt = pure.queryExecution.optimizedPlan.toString
      assert(pureOpt.contains("__bin"), pureOpt)
      val purePlan = pure.queryExecution.executedPlan.toString
      assert(!purePlan.contains("NestedLoop") && !purePlan.contains("CartesianProduct"),
        purePlan)
      val expectedPure = try {
        s2.conf.set("spark.graft.rangejoin.enabled", "false")
        pure.select($"lid", $"rid").as[(Long, Long)].collect().toSet
      } finally s2.conf.set("spark.graft.rangejoin.enabled", "true")
      assert(expectedPure.nonEmpty)
      assert(pure.select($"lid", $"rid").as[(Long, Long)].collect().toSet == expectedPure)

      // equi + range join
      val lk = (1 to 60).map(i => ((i % 4).toLong, i.toLong, ts(i * 37 % 5000)))
        .toDF("k", "lid", "lts")
      val rk = (1 to 90).map(i => ((i % 4).toLong, 100L + i, ts(i * 59 % 5000)))
        .toDF("k", "rid", "rts")
      val both = lk.join(rk, lk("k") === rk("k") &&
        $"rts" >= $"lts" && $"rts" <= $"lts" + expr("INTERVAL 5 MINUTES"))
      val bothOpt = both.queryExecution.optimizedPlan.toString
      assert(bothOpt.contains("__bin"), bothOpt)
      val expectedBoth = try {
        s2.conf.set("spark.graft.rangejoin.enabled", "false")
        both.select($"lid", $"rid").as[(Long, Long)].collect().toSet
      } finally s2.conf.set("spark.graft.rangejoin.enabled", "true")
      assert(expectedBoth.nonEmpty)
      assert(both.select($"lid", $"rid").as[(Long, Long)].collect().toSet == expectedBoth)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("disabled flag leaves the naive plan untouched") {
    graft.GraftExtensions.register(spark)
    try {
      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      val opt = naive.queryExecution.optimizedPlan.toString
      assert(!opt.contains("__bin"), opt)
    } finally spark.conf.set("spark.graft.rangejoin.enabled", "true")
  }
}
