package graft

/** Smoke: every declared query runs at sf0.001 and returns a well-formed
  * result (the sf0.01 hash gate is the driver's DuckDB compare; this keeps
  * `sbt test` self-contained and fast).
  */
class CorpusSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("corpus names are unique and every oracle key has a query") {
    val names = SparkEntry.corpus.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.corpus.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
