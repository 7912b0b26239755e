package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's rows") {
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nkey"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nkey"), col("n_name"))
    val plain = customer.join(nation, "nkey")
      .select("c_custkey", "n_name").orderBy("c_custkey", "n_name")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(customer, nation, "nkey", salt = 7)
      .select("c_custkey", "n_name").orderBy("c_custkey", "n_name")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("map-typed columns on the large side are skipped, not fatal") {
    // xxhash64 rejects MapType; the salt must hash only hashable columns.
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nkey"),
        map(lit("k"), col("c_name")).as("attrs"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nkey"), col("n_name"))
    val plain = customer.join(nation, "nkey").count()
    val salted = Skew.saltedJoin(customer, nation, "nkey", salt = 5).count()
    assert(salted == plain)
  }

  test("AQE splits a genuinely skewed join: OptimizeSkewedJoin fires, straggler shrinks") {
    import spark.implicits._
    // One hot key holds 20% of 200k fat rows (~8 MB in one reduce
    // partition vs ~32 KB median). Thresholds are scaled to the fixture;
    // at production scale the same defaults-ratio logic fires at 256 MB.
    def fixture = {
      // payload is hash-derived so shuffle compression cannot flatten the
      // skew out of the map output sizes AQE inspects
      val left = spark.range(0, 200000, 1, 8).select(
        when($"id" % 5 === 0, lit(7L)).otherwise(pmod($"id", lit(1000))).as("k"),
        concat(sha2($"id".cast("string"), 512),
          sha2(concat($"id".cast("string"), lit("b")), 512)).as("payload"))
      val right = spark.range(0, 1000).select($"id".as("k"),
        concat(lit("dim_"), $"id").as("name"))
      left.join(right, "k")
    }
    def maxTaskMs(f: => Unit): Long = {
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) durations.add(t.taskInfo.duration)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(l)
      import scala.jdk.CollectionConverters._
      durations.asScala.map(_.toLong).max
    }
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = fixture
      val plainMax = maxTaskMs(assert(plain.collect().length == 200000))
      assert(!plain.queryExecution.executedPlan.toString.contains("skew=true"))

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val split = fixture
      val splitMax = maxTaskMs(assert(split.collect().length == 200000))
      val plan = split.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
      info(s"max task: skewJoin off ${plainMax}ms -> on ${splitMax}ms")
      assert(splitMax < plainMax,
        s"skew split did not shrink the straggler: $splitMax >= $plainMax ms")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("salt column does not leak into the result") {
    val customer = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nkey"))
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nkey"), col("n_name"))
    val out = Skew.saltedJoin(customer, nation, "nkey", salt = 3)
    assert(!out.columns.contains("__salt"))
  }
}
