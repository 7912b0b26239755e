package graft.tools

import graft.{Bench, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scale-curve runner: `runMain graft.tools.ScaleBench <sfDir> [iters] [q,...]`
  * times the named queries (default: the hot dedup/ANN/components family
  * from VERDICT r5) min-of-N on one warm JVM and prints a JSON line, plus
  * the end-to-end CDC merge throughput. Pair with [[GenData]] fixtures to
  * measure sf0.1g → sf1g ratios for PERFORMANCE.md.
  */
object ScaleBench {
  private val DefaultQs = Seq(
    "q41_dedup_jaccard", "q42_dedup_minhash_lsh", "q52_dedup_embedding",
    "q79_dedup_components", "q88_dedup_incremental", "q106_pipeline_curation")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleBench <sfDir> [iters] [q1,q2,...]")
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args(2).split(",").toSeq else DefaultQs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOne(name: String): Double = {
      val q = SparkEntry.corpus.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      (1 to iters).map(_ => once()).min
    }

    val timed = names.map { n =>
      val s = timeOne(n)
      println(f"$n: $s%.3f s")
      n -> s
    }
    val cdc = (1 to iters).map(_ => Bench.cdcThroughput(spark, sfDir)).max
    val qs = timed.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""{"sf":"$sfDir","queries":$qs,"cdc_rows_per_sec":$cdc%.0f}""")
    spark.stop()
  }
}
