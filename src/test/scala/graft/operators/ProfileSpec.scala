package graft.operators

import graft.SparkSpec

/** Profile: per-column metrics with nulls present, and the approx path's
  * plan shape (single aggregate, no per-column expand).
  */
class ProfileSpec extends SparkSpec {

  test("profile counts nulls/distincts and casts min/max to strings") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(3L), Some("b")), (None, Some("a"))
    ).toDF("id", "s")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(p("id") == ((1L, 2L, Some("1"), Some("3"))))
    assert(p("s") == ((1L, 2L, Some("a"), Some("b"))))
  }

  test("approx path keeps one aggregate without a count-distinct Expand") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"v${i % 7}")).toDF("id", "s")
    val exactCounts = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(exactCounts("s") == 7L)
    // HLL++ path: same sweep, single pass — no Expand node in the plan.
    val approxDf = df.agg(
      org.apache.spark.sql.functions.approx_count_distinct("id"),
      org.apache.spark.sql.functions.approx_count_distinct("s"))
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"))
    val approx = Profile.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // HLL++ at these cardinalities is exact-ish; allow 5%
    assert(math.abs(approx("s") - 7L) <= 1)
    assert(math.abs(approx("id") - 100L) <= 5)
  }
}
