package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench isolator: `runMain graft.BenchOne <query> [iters]`
  * times one declared query `iters` times (default 3) on
  * SPARK_GRAFT_SF_DIR with the same session/config/noop-sink as [[Bench]],
  * printing per-iteration seconds and the min. Exists because the shared
  * host's CPU is bursty (PERFORMANCE.md): a full-corpus run can tag an
  * innocent query with a 2-4x outlier, and this isolates it.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [iters]")
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.corpus.find(_.name == name).getOrElse(
      sys.error(s"unknown query $name; known: ${SparkEntry.corpus.map(_.name).mkString(", ")}"))
    try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
    catch { case e: Throwable => println(s"warm-up failed: $e") }
    val times = (1 to iters).map { i =>
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"iter $i: $s%.3f s")
      s
    }
    println(f"""{"query":"$name","min":${times.min}%.3f,"iters":$iters}""")
    spark.stop()
  }
}
