package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-capture tool for the optimization rounds:
  * `runMain graft.tools.PlanDump <outDir> <tag> <query...>` writes each
  * named declared query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` (tag = "before" / "after"), using the same
  * session shape as [[graft.Bench]] so the captured plan is the one the
  * bench actually executes. `all` expands to the whole corpus.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...|all>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    val names =
      if (args.drop(2).sameElements(Array("all"))) graft.SparkEntry.corpus.map(_.name)
      else args.drop(2).toSeq
    // GRAFT_PLANDUMP_EXEC=1: execute the query through the noop sink
    // FIRST, so the captured plan is the FINAL adaptive plan
    // (isFinalPlan=true) with runtime artifacts visible — AQE stage reuse
    // (ReusedQueryStage/ReusedExchange) and coalesced AQEShuffleReads do
    // not exist in the static explain, so a reuse claim is only provable
    // from this mode's capture.
    val exec = sys.env.get("GRAFT_PLANDUMP_EXEC").contains("1")
    // the noop write runs under its own QueryExecution (the command's, not
    // the DataFrame's), so the executed adaptive plan is only reachable
    // through the listener
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    if (exec) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
          lastQe = qe
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
    names.foreach { name =>
      val q = graft.SparkEntry.corpus.find(_.name == name).getOrElse(
        sys.error(s"unknown query $name"))
      val df = q.fn(spark, sfDir)
      val txt = if (exec) {
        lastQe = null
        df.write.format("noop").mode("overwrite").save()
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (lastQe == null && System.nanoTime() < deadline) Thread.sleep(50)
        require(lastQe != null, s"listener never delivered the executed plan for $name")
        lastQe.explainString(org.apache.spark.sql.execution.FormattedMode)
      } else df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
