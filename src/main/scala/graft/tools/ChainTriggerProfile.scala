package graft.tools

import graft.streaming.CurationChain
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-JOB profile of one curation-chain trigger — the diagnostic behind
  * the r14 verdict's item 2 (ChainBench throughput is fixed-overhead
  * bound: a 200-doc trigger costs what a 2000-doc one does, so the
  * lever is the NUMBER of per-trigger Spark jobs, not row throughput).
  * Prints every job the trigger ran with its wall duration and callsite,
  * so "which fixed jobs dominate" is measured, not guessed.
  *
  * `runMain graft.tools.ChainTriggerProfile [docsPerTrigger] [triggers]`
  */
object ChainTriggerProfile {
  def main(args: Array[String]): Unit = {
    val perTrigger = if (args.length > 0) args(0).toInt else 500
    val nTriggers = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the chain stamps its stages via setJobDescription; fall back
        // to the callsite for unlabeled jobs (staged writes, publish)
        val site = Option(j.properties).map { p =>
          Option(p.getProperty("spark.job.description"))
            .getOrElse(p.getProperty("callSite.short", "?"))
        }.getOrElse("?")
        jobs.put(j.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(j.jobId)
        if (st != null)
          done.add((j.jobId, st._1, (System.nanoTime() - st._2) / 1e9))
      }
    })

    val root = java.nio.file.Files
      .createTempDirectory("graft_ctp").toFile.getAbsolutePath + "/c"
    def emb(src: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(src, i), lit(2000)).cast("float") / 1000.0f)
          - lit(1.0f))
    def batch(t: Int) = {
      val s = spark
      import s.implicits._
      spark.range(perTrigger.toLong)
        .select((col("id") + t.toLong * perTrigger).as("doc_id"))
        .select(col("doc_id"),
          concat_ws(" ", (0 until 60).map(j =>
            concat(lit("w"), col("doc_id"), lit(s"x$j"))): _*).as("text"),
          emb(col("doc_id")).as("embedding"))
    }
    (0 until nTriggers).foreach { t =>
      done.clear()
      val t0 = System.nanoTime()
      CurationChain.ingestInto(root)(batch(t), t.toLong)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events arrive on an async bus — drain before reading,
      // or the trailing jobs (staged writes, publish) go uncounted
      var waitedMs = 0
      while (!jobs.isEmpty && waitedMs < 3000) {
        Thread.sleep(50); waitedMs += 50
      }
      if (t == nTriggers - 1) {
        println(f"== trigger $t: $wall%.2f s wall, ${done.size} jobs ==")
        val rows = done.toArray(Array.empty[(Int, String, Double)])
          .sortBy(_._1)
        rows.foreach { case (id, site, s) =>
          println(f"  job $id%4d  $s%6.3f s  $site")
        }
        val bySite = rows.groupBy(_._2).view
          .mapValues(g => (g.length, g.map(_._3).sum)).toSeq
          .sortBy(-_._2._2)
        println("== by callsite ==")
        bySite.foreach { case (site, (n, s)) =>
          println(f"  $s%6.3f s  x$n%-3d  $site")
        }
        println(f"== sum of job walls: ${rows.map(_._3).sum}%.2f s of $wall%.2f s trigger wall ==")
      }
    }
    spark.stop()
  }
}
