package graft.streaming

import graft.SparkSpec
import graft.cdc.{MysqlReplicaSession, SocketTransport}
import org.apache.spark.sql.functions._

/** LIVE-endpoint smoke tests (r14 verdict item 7) — skip-by-default in
  * the sandbox (no mysqld, no broker, no kafka jar) and ACTIVE the day
  * the platform provides endpoints:
  *
  *  - `MYSQL_HOST` (+ optional `MYSQL_PORT`/`MYSQL_USER`/
  *    `MYSQL_PASSWORD`/`MYSQL_SERVER_ID`/`MYSQL_TLS`) drives the real
  *    [[SocketTransport]] session — TCP connect, handshake, auth,
  *    registration, COM_BINLOG_DUMP — against a genuine server and
  *    requires binlog events back (the FORMAT_DESCRIPTION event arrives
  *    immediately after the dump command on any healthy primary).
  *  - `KAFKA_BOOTSTRAP` (+ optional `KAFKA_SMOKE_TOPIC`) round-trips a
  *    Canal envelope through the real `kafka` format: the
  *    [[Sinks.kafkaProjection]] record batch-writes to the topic and
  *    reads back. Requires the spark-sql-kafka jar on the classpath —
  *    if the env var is set but the jar is absent, the test FAILS
  *    loudly (a configured endpoint with missing plumbing is an error,
  *    not a skip).
  *
  * Everything these drive is otherwise gated up to the sandbox boundary
  * (SocketTransportSpec's real-socket/TLS loopback fake server; the
  * kafka option/projection contract tests + the executable jar-absence
  * boundary test in StreamingSpec).
  */
class LiveEndpointSpec extends SparkSpec {

  test("live MySQL: SocketTransport completes bring-up against a real " +
      "server and receives binlog events") {
    val host = sys.env.get("MYSQL_HOST")
    assume(host.isDefined,
      "set MYSQL_HOST (and optionally MYSQL_PORT/MYSQL_USER/" +
        "MYSQL_PASSWORD/MYSQL_SERVER_ID/MYSQL_TLS) to run the live " +
        "MySQL smoke test")
    val port = sys.env.getOrElse("MYSQL_PORT", "3306").toInt
    val cfg = MysqlReplicaSession.Config(
      user = sys.env.getOrElse("MYSQL_USER", "repl"),
      password = sys.env.getOrElse("MYSQL_PASSWORD", ""),
      serverId = sys.env.getOrElse("MYSQL_SERVER_ID", "4242").toLong,
      tls = sys.env.get("MYSQL_TLS").exists(_.nonEmpty))
    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val res = SocketTransport.run(host.get, port, cfg,
      ev => { events += ev; () },
      maxEvents = 3, connectTimeoutMs = 10000, readTimeoutMs = 30000)
    assert(res.stop.isEmpty,
      s"live session ended early: ${res.stop.get} (events=${res.events})")
    assert(events.nonEmpty,
      "a healthy primary sends FORMAT_DESCRIPTION right after the dump " +
        "command — zero events means the dump phase never started")
    // every event is a framed binlog event: 19-byte header minimum
    assert(events.forall(_.length >= 19))
  }

  test("live Kafka: a Canal envelope round-trips through the real " +
      "kafka format") {
    import spark.implicits._
    import graft.cdc.Envelope
    val brokers = sys.env.get("KAFKA_BOOTSTRAP")
    assume(brokers.isDefined,
      "set KAFKA_BOOTSTRAP (and optionally KAFKA_SMOKE_TOPIC) to run " +
        "the live Kafka smoke test")
    // unique-enough topic per run so reruns don't read stale records
    val topic = sys.env.getOrElse("KAFKA_SMOKE_TOPIC",
      s"graft_smoke_${System.currentTimeMillis()}")
    val msg =
      """{"data":[{"id":"1","name":"alice"}],"database":"smokedb","es":1767322800000,
        |"id":0,"isDdl":false,"mysqlType":{"id":"bigint"},"old":[{}],"pkNames":["id"],
        |"sql":"","sqlType":{"id":-5},"table":"users","ts":1767322800123,"type":"INSERT"}"""
        .stripMargin.replace("\n", "")
    val envelopes = Seq(msg).toDF("raw")
      .select(Envelope.parse(col("raw")).as("e")).select("e.*")
    Sinks.kafkaProjection(envelopes)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers.get)
      .option("topic", topic)
      .save()
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers.get)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string"), col("value").cast("string"))
      .collect()
    assert(back.exists(_.getString(0) == "smokedb.users"),
      s"the written record must read back from $topic")
    val value = back.find(_.getString(0) == "smokedb.users").get.getString(1)
    val parsed = Seq(value).toDF("raw")
      .select(Envelope.parse(col("raw")).as("e")).select("e.*").collect().head
    assert(parsed.getAs[String]("type") == "INSERT")
  }

  test("live Redis: RPUSH through the real client round-trips LRANGE") {
    val host = sys.env.get("REDIS_HOST")
    assume(host.isDefined,
      "set REDIS_HOST (and optionally REDIS_PORT/REDIS_PASSWORD/" +
        "REDIS_DB) to run the live Redis smoke test")
    val port = sys.env.getOrElse("REDIS_PORT", "6379").toInt
    val auth = sys.env.get("REDIS_PASSWORD").filter(_.nonEmpty)
    val db = sys.env.getOrElse("REDIS_DB", "0").toInt
    val key = s"graft_smoke_${System.currentTimeMillis()}"
    val c = new RedisSink.RedisClient(host.get, port, auth, db)
    try {
      assert(c.rpush(key, Seq("one", "two", "three")) == 3L)
      assert(c.lrange(key, 0, -1) == Seq("one", "two", "three"))
      c.command("DEL", key)
      ()
    } finally c.close()
  }
}
