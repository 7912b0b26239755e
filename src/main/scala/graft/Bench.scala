package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver.
  *
  * Timing = full materialization through the `noop` datasource (a bare
  * `count()` would let Catalyst prune projected expressions and undercount
  * the work). One untimed warm-up query first absorbs JVM/codegen/parquet
  * footer warm-up so per-query numbers reflect steady state.
  */
object Bench {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () } // warm-up, untimed

    // Two timed passes per query, keep the min: absorbs first-pass codegen
    // and host-level CPU burst noise; min-of-2 is the steady-state number.
    def timed(q: Q): Double = {
      val t0 = System.nanoTime()
      run(q.fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.corpus.map { q =>
      val t = try math.min(timed(q), timed(q)) catch { case _: Throwable => -1.0 }
      q.name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
