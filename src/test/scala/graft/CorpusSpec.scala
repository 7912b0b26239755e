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

  /** The driver's DuckDB/pandas harness sorts + hashes every top-level
    * output column; array/map/struct columns are unhashable there and turn
    * the whole row red even on a rows-only check (r8's q154). Any new
    * query must emit atomic columns (join arrays to strings) or be added
    * here with a reason.
    */
  val nonAtomicWhitelist: Set[(String, String)] = Set()

  SparkEntry.corpus.foreach { q =>
    test(s"${q.name} runs at sf0.001 with sortable output columns") {
      val df = q.fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val bad = df.schema.fields
        .filter(_.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _                                         => false
        })
        .filterNot(f => nonAtomicWhitelist((q.name, f.name)))
      assert(bad.isEmpty,
        s"non-atomic output columns (driver harness cannot sort/hash them): " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q32 approx distinct within 5% of exact") {
    val approx = SparkEntry.queries("q32_agg_approx_distinct")(spark, dir)
      .collect().head.getLong(0).toDouble
    val exact = Tables(spark, dir, "orders")
      .select(org.apache.spark.sql.functions.countDistinct("o_custkey"))
      .collect().head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
  }

  test("q179 sketch union: per-type and unioned estimates within 5% of exact") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("q179_sketch_union")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables(spark, dir, "events")
    val exactPer = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.select(countDistinct("user_id")).collect().head.getLong(0)
    (exactPer + ("__all__" -> exactAll)).foreach { case (k, exact) =>
      val e = est(k)
      assert(math.abs(e - exact).toDouble / exact <= 0.05, s"$k: est $e vs exact $exact")
    }
    // union of sketches estimates the union of sets: never (materially)
    // above the sum of the per-type estimates
    assert(est("__all__") <= est.filter(_._1 != "__all__").values.sum,
      est.toString)
  }

  test("q123 heavy-hitter sketch: top set and counts match the exact agg") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("q123_sketch_heavyhitters")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, dir, "documents")
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the sketch's top-20 must contain at least 18 of the exact top-20,
    // each with an estimate within 5% of the true count
    val hits = exact.keys.count(est.contains)
    assert(hits >= 18, s"only $hits of exact top-20 in sketch top-20")
    exact.foreach { case (tok, cnt) =>
      est.get(tok).foreach { e =>
        assert(math.abs(e - cnt).toDouble / cnt <= 0.05, s"$tok: est $e vs exact $cnt")
      }
    }
  }

  test("q97 approx percentiles within 2% of exact") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q97_agg_approx_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = Tables(spark, dir, "lineitem").groupBy("l_returnflag").agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    exact.foreach { case (flag, (e50, e95)) =>
      val (a50, a95) = approx(flag)
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$flag p50 approx=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 <= 0.02, s"$flag p95 approx=$a95 exact=$e95")
    }
  }
}
