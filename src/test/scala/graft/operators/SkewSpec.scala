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
    // Straggler metric: max per-task SHUFFLE-READ BYTES, not duration —
    // bytes are content-determined, so the assertion cannot flake under
    // host load the way wall-clock task times do (full-suite parallel
    // runs made the timing version nondeterministically red).
    def maxTaskShuffleBytes(f: => Unit): Long = {
      val bytes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytes.add(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(l)
      import scala.jdk.CollectionConverters._
      bytes.asScala.map(_.toLong).max
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
      val plainMax = maxTaskShuffleBytes(assert(plain.collect().length == 200000))
      assert(!plain.queryExecution.executedPlan.toString.contains("skew=true"))

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val split = fixture
      val splitMax = maxTaskShuffleBytes(assert(split.collect().length == 200000))
      val plan = split.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
      info(s"max task shuffle read: skewJoin off ${plainMax}B -> on ${splitMax}B")
      assert(splitMax < plainMax / 2,
        s"skew split did not shrink the straggler: $splitMax >= $plainMax/2 bytes")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q122's bigram pair join: AQE is blind to agg-fed joins; the salt spreads") {
    import spark.implicits._
    // q122's exact join shape at a Zipfian bigram distribution: every doc
    // contains the hot bigram ("of the" holds a constant fraction of any
    // corpus), so its (doc, bigram) pair rows all hash to ONE reducer of
    // the pairs ⋈ counts join.
    //
    // Part 1 — why q122 salts instead of relying on AQE:
    // OptimizeSkewedJoin pattern-matches SMJ(Sort(ShuffleStage),
    // Sort(ShuffleStage)); the counts side of this join is
    // Sort(HashAggregate(ShuffleRead)) — an agg-fed join side — so the
    // rule never fires, however skewed the pairs side is (here the hot
    // partition is ~11× the median and well past every threshold, and
    // even forceOptimizeSkewedJoin leaves it unsplit).
    def mkPairs = spark.range(0, 30000, 1, 8).select($"id".as("doc"),
      explode(array((lit("of the") +: (0 until 6).map(i =>
        concat(lit(s"w$i "), pmod($"id" * 41 + i, lit(40000))))): _*)).as("bg"))
      .select(concat(sha2($"doc".cast("string"), 512), $"doc").as("doc_id"),
        $"bg", when($"bg" === "of the", lit(5L)).otherwise(lit(1L)).as("m"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // 100 TB vocab: not broadcastable
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pairs = mkPairs
      val counts = pairs.groupBy("bg").agg(sum("m").as("cnt"))
      val unsalted = pairs.join(counts, "bg")
        .groupBy("doc_id")
        .agg(sum("m").as("n_bigrams"), sum($"m" * $"cnt").as("fam_sum"))
      val plainRows = unsalted.collect()
      assert(!unsalted.queryExecution.executedPlan.toString.contains("skew=true"),
        "if AQE learned to split agg-fed joins, q122 can drop its salt")

      // Part 2 — Skew.saltedJoin is row-identical AND actually spreads:
      // per-reduce-partition row counts computed with the same murmur3
      // hash Spark's hash partitioning uses, with the salt column built
      // exactly as saltedJoin builds it (xxhash64 over the row).
      val salted = Skew.saltedJoin(pairs, counts, "bg", salt = 16)
        .groupBy("doc_id")
        .agg(sum("m").as("n_bigrams"), sum($"m" * $"cnt").as("fam_sum"))
      val saltedRows = salted.collect()
      def key(r: org.apache.spark.sql.Row) = r.getString(0) -> (r.getLong(1), r.getLong(2))
      assert(saltedRows.map(key).toMap == plainRows.map(key).toMap)
      assert(plainRows.length == 30000)

      val spreadOf = (withSalt: Boolean) => {
        val keyed = if (withSalt)
          mkPairs.withColumn("__salt",
            pmod(xxhash64($"doc_id", $"bg", $"m"), lit(16L)).cast("int"))
            .select(pmod(hash($"bg", $"__salt"), lit(64)).as("p"))
        else mkPairs.select(pmod(hash($"bg"), lit(64)).as("p"))
        keyed.groupBy("p").count().agg(max("count")).collect()(0).getLong(0)
      }
      val (unsaltedMax, saltedMax) = (spreadOf(false), spreadOf(true))
      info(s"hot reduce partition: $unsaltedMax rows unsalted -> $saltedMax salted")
      assert(unsaltedMax > 30000, "fixture lost its hot key")
      // 16 sub-keys over 64 partitions: a few collide into one reducer
      // (birthday), so the worst partition drops ~4×, not a full 16×;
      // at production reducer counts (thousands) the collisions vanish
      // and the spread approaches the salt factor.
      assert(saltedMax < unsaltedMax / 3,
        s"salt spread too weak: $saltedMax vs $unsaltedMax")
    } finally {
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
