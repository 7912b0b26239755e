package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{InetAddress, ServerSocket, Socket}

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Redis list sink: RESP codec golden frames, the streaming
  * RPUSH round-trip against a REAL socket server (an in-JVM fake
  * speaking actual RESP — the SocketTransportSpec pattern on the sink
  * side), chunked multi-value pushes, AUTH, and loud failure on server
  * errors.
  */
class RedisSinkSpec extends SparkSpec {
  import RedisSink.Resp

  /** A loopback RESP2 server: AUTH/SELECT/RPUSH/LRANGE over real
    * sockets, lists in memory, optional error injection.
    */
  final class FakeRedis(password: Option[String] = None,
      failRpush: Boolean = false) extends AutoCloseable {
    val lists = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.List[String]]()
    private val server =
      new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    @volatile private var running = true
    private val pool = java.util.concurrent.Executors.newCachedThreadPool()
    pool.submit(new Runnable {
      def run(): Unit =
        while (running)
          try { val s = server.accept(); pool.submit(handler(s)); () }
          catch { case _: Exception => () }
    })

    private def handler(s: Socket) = new Runnable {
      def run(): Unit = {
        val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
        val out = new BufferedOutputStream(s.getOutputStream)
        def simple(v: String): Unit = {
          out.write(s"+$v\r\n".getBytes("UTF-8")); out.flush()
        }
        def err(v: String): Unit = {
          out.write(s"-ERR $v\r\n".getBytes("UTF-8")); out.flush()
        }
        def num(n: Long): Unit = {
          out.write(s":$n\r\n".getBytes("UTF-8")); out.flush()
        }
        var authed = password.isEmpty
        try while (true) {
          Resp.readReply(in) match {
            case Resp.Arr(parts) =>
              val cmd = parts.map {
                case Resp.Bulk(b) => new String(b, "UTF-8")
                case other => sys.error(s"fake redis: non-bulk arg $other")
              }
              cmd.head.toUpperCase match {
                case "AUTH" =>
                  if (password.contains(cmd(1))) { authed = true; simple("OK") }
                  else err("invalid password")
                case _ if !authed => err("NOAUTH Authentication required.")
                case "SELECT" => simple("OK")
                case "RPUSH" =>
                  if (failRpush) err("injected failure")
                  else {
                    val l = lists.computeIfAbsent(cmd(1),
                      _ => java.util.Collections.synchronizedList(
                        new java.util.ArrayList[String]()))
                    cmd.drop(2).foreach(l.add)
                    num(l.size.toLong)
                  }
                case "LRANGE" =>
                  val l = Option(lists.get(cmd(1)))
                    .map(_.toArray(Array.empty[String]).toSeq)
                    .getOrElse(Seq.empty)
                  val from = cmd(2).toInt
                  val to = if (cmd(3).toInt < 0) l.size - 1 else cmd(3).toInt
                  val slice = l.slice(from, to + 1)
                  out.write(s"*${slice.size}\r\n".getBytes("UTF-8"))
                  slice.foreach { v =>
                    val b = v.getBytes("UTF-8")
                    out.write(s"$$${b.length}\r\n".getBytes("UTF-8"))
                    out.write(b); out.write("\r\n".getBytes("UTF-8"))
                  }
                  out.flush()
                case other => err(s"unknown command '$other'")
              }
            case other => sys.error(s"fake redis: non-array command $other")
          }
        } catch { case _: Exception => () } finally s.close()
      }
    }

    override def close(): Unit = {
      running = false
      server.close(); pool.shutdownNow(); ()
    }
  }

  private val canalMsg =
    """{"data":[{"id":"1","name":"alice"}],"database":"testdb","es":1767322800000,
      |"id":0,"isDdl":false,"mysqlType":{"id":"bigint"},"old":[{}],"pkNames":["id"],
      |"sql":"","sqlType":{"id":-5},"table":"users","ts":1767322800123,"type":"INSERT"}"""
      .stripMargin.replace("\n", "")

  test("RESP codec: command frames and all five reply types round-trip") {
    val cmd = Resp.encodeCommand(
      Seq("RPUSH", "k", "v").map(_.getBytes("UTF-8")))
    assert(new String(cmd, "UTF-8") ==
      "*3\r\n$5\r\nRPUSH\r\n$1\r\nk\r\n$1\r\nv\r\n")
    def parse(s: String) = Resp.readReply(new DataInputStream(
      new java.io.ByteArrayInputStream(s.getBytes("UTF-8"))))
    assert(parse("+OK\r\n") == Resp.Simple("OK"))
    assert(parse(":42\r\n") == Resp.Num(42L))
    assert(parse("-ERR boom\r\n") == Resp.Err("ERR boom"))
    assert(parse("$5\r\nhello\r\n") match {
      case Resp.Bulk(b) => new String(b, "UTF-8") == "hello"
      case _ => false
    })
    assert(parse("$-1\r\n") == Resp.NullBulk)
    assert(parse("*2\r\n:1\r\n+A\r\n") ==
      Resp.Arr(Seq(Resp.Num(1), Resp.Simple("A"))))
  }

  test("streaming envelopes RPUSH to the list over a real socket, in " +
      "order, and parse back as Canal-JSON") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val redis = new FakeRedis()
    val ckpt = java.nio.file.Files
      .createTempDirectory("redis_sink_ckpt").toString
    try {
      val in = MemoryStream[String]
      val envelopes = in.toDS().toDF("raw")
        .select(graft.cdc.Envelope.parse(col("raw")).as("e")).select("e.*")
      val q = RedisSink.redisCanal(envelopes, "127.0.0.1", redis.port,
        "canal:testdb", ckpt)
      try {
        in.addData(canalMsg); q.processAllAvailable()
        in.addData(canalMsg.replace("\"alice\"", "\"bob\""))
        q.processAllAvailable()
      } finally q.stop()
      val got = redis.lists.get("canal:testdb")
      assert(got != null && got.size == 2, s"expected 2 pushed, got $got")
      val back = Seq(got.get(0)).toDF("raw")
        .select(graft.cdc.Envelope.parse(col("raw")).as("e"))
        .select("e.*").collect().head
      assert(back.getAs[String]("table") == "users")
      assert(back.getAs[collection.Seq[Map[String, String]]]("data")
        .head("name") == "alice")
      assert(got.get(1).contains("bob"), "stream order preserved")
    } finally redis.close()
  }

  test("multi-value RPUSH chunks: 1200 payloads in one partition " +
      "arrive complete and ordered") {
    val redis = new FakeRedis()
    try {
      val c = new RedisSink.RedisClient("127.0.0.1", redis.port)
      try {
        val n = c.rpush("big", (0 until 1200).map(i => s"v$i"))
        assert(n == 1200L)
      } finally c.close()
      val got = redis.lists.get("big")
      assert(got.size == 1200)
      assert((0 until 1200).forall(i => got.get(i) == s"v$i"), "ordered")
    } finally redis.close()
  }

  test("AUTH: required by the server, sent by the client; a missing or " +
      "wrong password fails loudly") {
    val redis = new FakeRedis(password = Some("s3cret"))
    try {
      val c = new RedisSink.RedisClient("127.0.0.1", redis.port,
        auth = Some("s3cret"))
      try assert(c.rpush("k", Seq("v")) == 1L) finally c.close()
      val noAuth = new RedisSink.RedisClient("127.0.0.1", redis.port)
      try {
        val e = intercept[IllegalStateException](noAuth.rpush("k", Seq("v")))
        assert(e.getMessage.contains("NOAUTH"))
      } finally noAuth.close()
      intercept[IllegalStateException] {
        new RedisSink.RedisClient("127.0.0.1", redis.port,
          auth = Some("wrong")).close()
      }
    } finally redis.close()
  }

  test("a server -ERR fails the batch loudly — never silent data loss") {
    import spark.implicits._
    val redis = new FakeRedis(failRpush = true)
    try {
      val batch = Seq("a", "b").toDF("value")
      val e = intercept[Exception] {
        RedisSink.pushBatch(batch.coalesce(1), "127.0.0.1", redis.port, "k")
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("injected failure")), chain(e))
    } finally redis.close()
  }
}
