package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A REAL Redis list sink for the Canal envelope stream — the
  * reference's second delivery transport
  * (`/root/reference/src/message_queue.rs:137-172`: serialize the
  * envelope, RPUSH it onto a configured list, consumers BLPOP). The
  * generic [[Sinks.queueSink]] gave the SHAPE with an injected client;
  * this is the actual protocol client, pure JDK sockets like the MySQL
  * transport ([[graft.cdc.SocketTransport]]) — RESP2 is five frame
  * types and needs no library.
  *
  * Delivery semantics: at-least-once (foreachBatch replays a failed
  * trigger; RPUSH is not idempotent) — same as the reference's
  * fire-and-forget producer, and the standard pairing is an idempotent
  * consumer keyed on the envelope id. Per-partition connections,
  * multi-value RPUSH in [[RedisClient.PipelineChunk]]-sized chunks (one
  * round trip per chunk, the rdkafka-batching analogue), server errors
  * fail the task LOUDLY (a swallowed -ERR is silent data loss).
  */
object RedisSink {

  /** RESP2 wire codec — request arrays and the five reply types. */
  object Resp {
    sealed trait Reply
    final case class Simple(s: String) extends Reply
    final case class Err(msg: String) extends Reply
    final case class Num(n: Long) extends Reply
    final case class Bulk(bytes: Array[Byte]) extends Reply
    case object NullBulk extends Reply
    final case class Arr(items: Seq[Reply]) extends Reply

    def encodeCommand(parts: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def crlf(): Unit = { out.write('\r'); out.write('\n') }
      out.write('*'); out.write(parts.size.toString.getBytes("UTF-8")); crlf()
      parts.foreach { p =>
        out.write('$'); out.write(p.length.toString.getBytes("UTF-8")); crlf()
        out.write(p); crlf()
      }
      out.toByteArray
    }

    private def readLine(in: DataInputStream): String = {
      val sb = new StringBuilder
      while (true) {
        val b = in.read()
        if (b < 0) throw new EOFException("redis: connection closed mid-reply")
        if (b == '\r') {
          val nl = in.read()
          require(nl == '\n', s"redis: bare CR in reply (next byte $nl)")
          return sb.toString
        }
        sb.append(b.toChar)
      }
      throw new IllegalStateException("unreachable")
    }

    def readReply(in: DataInputStream): Reply = {
      val t = in.read()
      if (t < 0) throw new EOFException("redis: connection closed")
      t.toChar match {
        case '+' => Simple(readLine(in))
        case '-' => Err(readLine(in))
        case ':' => Num(readLine(in).toLong)
        case '$' =>
          val n = readLine(in).toInt
          if (n < 0) NullBulk
          else {
            val buf = new Array[Byte](n)
            in.readFully(buf)
            require(in.read() == '\r' && in.read() == '\n',
              "redis: bulk reply missing trailing CRLF")
            Bulk(buf)
          }
        case '*' =>
          val n = readLine(in).toInt
          if (n < 0) Arr(Seq.empty)
          else Arr((0 until n).map(_ => readReply(in)))
        case c => throw new IllegalArgumentException(
          s"redis: unknown reply type byte '$c'")
      }
    }
  }

  /** One connection; not thread-safe (one per partition task). Errors
    * from the server throw — a sink that swallows -ERR loses data
    * silently.
    */
  final class RedisClient(host: String, port: Int,
      auth: Option[String] = None, db: Int = 0,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000) extends AutoCloseable {
    val PipelineChunk = 512

    private val sock = new Socket()
    sock.setTcpNoDelay(true)
    // a stalled or half-open server must FAIL the task, not wedge the
    // streaming trigger forever on a blocking read (the SocketTransport
    // lesson: connect timeout alone does not cover post-connect stalls)
    sock.setSoTimeout(readTimeoutMs)
    sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    private val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream))
    private val out = new BufferedOutputStream(sock.getOutputStream)
    auth.foreach { pass =>
      command("AUTH", pass) match {
        case Resp.Simple(_) => ()
        case r => throw new IllegalStateException(s"redis AUTH failed: $r")
      }
    }
    if (db != 0) command("SELECT", db.toString) match {
      case Resp.Simple(_) => ()
      case r => throw new IllegalStateException(s"redis SELECT $db failed: $r")
    }

    def command(parts: String*): Resp.Reply = {
      out.write(Resp.encodeCommand(parts.map(_.getBytes("UTF-8"))))
      out.flush()
      Resp.readReply(in) match {
        case Resp.Err(m) => throw new IllegalStateException(s"redis: -ERR $m")
        case r => r
      }
    }

    /** RPUSH `values` onto `key` in multi-value chunks; returns the
      * list length after the last push.
      */
    def rpush(key: String, values: Seq[String]): Long = {
      var len = 0L
      values.grouped(PipelineChunk).foreach { chunk =>
        command(("RPUSH" +: key +: chunk): _*) match {
          case Resp.Num(n) => len = n
          case r => throw new IllegalStateException(s"redis RPUSH: $r")
        }
      }
      len
    }

    def lrange(key: String, from: Long, to: Long): Seq[String] =
      command("LRANGE", key, from.toString, to.toString) match {
        case Resp.Arr(items) => items.map {
          case Resp.Bulk(b) => new String(b, "UTF-8")
          case r => throw new IllegalStateException(s"redis LRANGE item: $r")
        }
        case r => throw new IllegalStateException(s"redis LRANGE: $r")
      }

    override def close(): Unit = { sock.close() }
  }

  /** Envelope rows → Canal-JSON → RPUSH onto `listKey` — the
    * reference's Redis delivery path as a streaming sink. Per
    * partition: one connection, chunked multi-value RPUSH, closed in
    * a finally.
    */
  def redisCanal(envelopes: DataFrame, host: String, port: Int,
      listKey: String, checkpointDir: String,
      auth: Option[String] = None, db: Int = 0): StreamingQuery =
    envelopes
      .select(graft.cdc.Envelope.render(
        struct(envelopes.columns.map(col): _*)).as("value"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        pushBatch(batch, host, port, listKey, auth, db)
      }
      .start()

  /** The batch body of [[redisCanal]], factored so a spec (or a batch
    * backfill) can drive it without a streaming query.
    */
  def pushBatch(batch: DataFrame, host: String, port: Int,
      listKey: String, auth: Option[String] = None, db: Int = 0): Unit = {
    batch.select(col("value")).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val c = new RedisClient(host, port, auth, db)
        try {
          rows.grouped(c.PipelineChunk).foreach { g =>
            c.rpush(listKey, g.map(_.getString(0)).toSeq); ()
          }
        } finally c.close()
      }
    }
  }
}
