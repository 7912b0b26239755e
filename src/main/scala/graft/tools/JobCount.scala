package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Noise-free action-count evidence for iterative-loop optimizations:
  * `runMain graft.tools.JobCount <query>` runs one declared query through
  * the noop sink (same session shape as [[graft.Bench]]) and prints the
  * number of Spark JOBS and stages it launched. Wall-clock on this host
  * swings ±50% with external bursts, but the job count of a
  * deterministic driver loop is exact — the r16 Components change is
  * "fewer actions per round", which this measures directly.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCount <queryName>")
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.corpus.find(_.name == name).getOrElse(
      sys.error(s"unknown query $name"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        stages.addAndGet(e.stageInfos.size)
        ()
      }
    })
    q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // the listener bus is async; give it a moment to drain before reading
    Thread.sleep(2000)
    println(s"""{"query":"$name","jobs":${jobs.get},"stages":${stages.get}}""")
    spark.stop()
  }
}
