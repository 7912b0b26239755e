package graft.cdc

import java.io.{DataInputStream, EOFException, IOException, OutputStream}
import java.net.{InetSocketAddress, Socket}

/** The ~50 lines of transport glue the pure session was designed for: a
  * blocking `java.net.Socket` loop that frames/deframes MySQL packets and
  * folds every received payload through [[MysqlReplicaSession.onPayload]],
  * writing back whatever the state machine says to send. This is the
  * counterpart of the reference's connect + read_exact loop
  * (`/root/reference/src/main.rs:74-130`, `mysql.rs:47-94`) — but all
  * protocol logic stays in the pure fold, so this file owns ONLY syscalls
  * and framing. Point it at a real server with
  * `runMain graft.cdc.SocketTransport host port user password [serverId]`.
  *
  * Scale note: one replica connection is inherently a single-reader loop
  * (the reference's too); parallelism starts AFTER it, where events are
  * handed to the streaming chain (hash-by-table repartition, see
  * `streaming/ReplicaStream.scala`).
  */
object SocketTransport {

  /** Terminal outcome of a drive loop: how many binlog events were
    * delivered and why the loop stopped (None = maxEvents reached).
    */
  final case class Result(events: Long, stop: Option[String])

  /** Reads one logical packet payload: 4-byte header (3-byte LE length +
    * seq), then the body; frames of exactly 0xffffff bytes are continued
    * by the next frame (the protocol's >16MB rule, same contract as
    * [[MysqlProtocolCodec.drainFrames]] for captured streams).
    */
  def readPayload(in: DataInputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    var more = true
    while (more) {
      val hdr = new Array[Byte](4)
      in.readFully(hdr)
      val len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16)
      val body = new Array[Byte](len)
      in.readFully(body)
      out.write(body)
      more = len == MysqlProtocolCodec.MaxFrame
    }
    out.toByteArray
  }

  private def writeAll(os: OutputStream, send: Seq[(Int, Array[Byte])]): Unit = {
    send.foreach { case (seq, payload) =>
      os.write(MysqlProtocolCodec.writePacket(seq, payload))
    }
    if (send.nonEmpty) os.flush()
  }

  /** A socket factory that encrypts without verifying the peer — parity
    * with mysql's default ssl-mode=REQUIRED (which also skips
    * verification); `tlsVerify = true` selects the JVM default context
    * (VERIFY_CA posture) instead.
    */
  private def tlsFactory(verify: Boolean): javax.net.ssl.SSLSocketFactory =
    if (verify) javax.net.ssl.SSLContext.getDefault.getSocketFactory
    else {
      val trustAll: javax.net.ssl.X509TrustManager =
        new javax.net.ssl.X509TrustManager {
          override def checkClientTrusted(
              chain: Array[java.security.cert.X509Certificate], t: String): Unit = ()
          override def checkServerTrusted(
              chain: Array[java.security.cert.X509Certificate], t: String): Unit = ()
          override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
            Array.empty
        }
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, Array(trustAll), new java.security.SecureRandom())
      ctx.getSocketFactory
    }

  /** Connects and drives the replica session until the state machine
    * fails, the server closes the connection, or `maxEvents` binlog
    * events have been delivered to `onEvent` (each a whole event with the
    * 0x00 packet marker stripped, ready for `BinlogDecode.eventSplit`).
    * With `config.tls` the loop performs the mid-stream upgrade the fold
    * signals via `Step.upgradeTls`: wrap the socket, then ask the fold
    * for the post-upgrade client packets (`afterTlsUpgrade`).
    */
  def run(host: String, port: Int, config: MysqlReplicaSession.Config,
      onEvent: Array[Byte] => Unit, maxEvents: Long = Long.MaxValue,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 0): Result = {
    val sock = new Socket()
    var tlsSock: Socket = null
    try {
      sock.setTcpNoDelay(true)
      sock.setSoTimeout(readTimeoutMs)
      sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      var in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
      var os = sock.getOutputStream
      var st = MysqlReplicaSession.initial(config)
      var events = 0L
      while (true) {
        val payload =
          try readPayload(in)
          catch {
            case _: EOFException => return Result(events, Some("server closed connection"))
          }
        val step = MysqlReplicaSession.onPayload(st, payload)
        writeAll(os, step.send)
        st = step.state
        if (step.upgradeTls) {
          val ssl = tlsFactory(config.tlsVerify)
            .createSocket(sock, host, port, true)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          ssl.setUseClientMode(true)
          ssl.startHandshake()
          tlsSock = ssl
          in = new DataInputStream(new java.io.BufferedInputStream(ssl.getInputStream))
          os = ssl.getOutputStream
          val cont = MysqlReplicaSession.afterTlsUpgrade(st)
          writeAll(os, cont.send)
          st = cont.state
        }
        step.event.foreach { ev =>
          onEvent(ev)
          events += 1
          if (events >= maxEvents) return Result(events, None)
        }
        st.phase match {
          case MysqlReplicaSession.Failed(reason) => return Result(events, Some(reason))
          case _                                  => ()
        }
      }
      throw new IllegalStateException("unreachable")
    } catch {
      case e: IOException => Result(0L, Some(s"io: ${e.getMessage}"))
      case e: java.security.GeneralSecurityException =>
        Result(0L, Some(s"tls: ${e.getMessage}"))
    } finally {
      if (tlsSock != null) tlsSock.close()
      sock.close()
    }
  }

  /** CLI: tap a live server and print one line per binlog event.
    * Flags anywhere among the args: `--rsa-full-auth` opts into the
    * caching_sha2 RSA key exchange on a cache miss (trusted networks
    * only), `--register=host:port` sends COM_REGISTER_SLAVE first,
    * `--tls` upgrades the connection before authenticating
    * (`--tls-verify` additionally checks the server certificate against
    * the JVM trust store).
    */
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length >= 4, "usage: SocketTransport host port user password " +
      "[serverId] [maxEvents] [--rsa-full-auth] [--register=host:port] " +
      "[--tls] [--tls-verify]")
    val register = flags.find(_.startsWith("--register=")).map { f =>
      val hp = f.stripPrefix("--register=").split(":", 2)
      require(hp.length == 2 && hp(1).forall(_.isDigit),
        s"--register wants host:port, got $f")
      (hp(0), hp(1).toInt)
    }
    val cfg = MysqlReplicaSession.Config(pos(2), pos(3),
      serverId = if (pos.length > 4) pos(4).toLong else 1234L,
      rsaFullAuth = flags.contains("--rsa-full-auth"),
      registerSlave = register,
      tls = flags.contains("--tls") || flags.contains("--tls-verify"),
      tlsVerify = flags.contains("--tls-verify"))
    val max = if (pos.length > 5) pos(5).toLong else Long.MaxValue
    val res = run(pos(0), pos(1).toInt, cfg, { ev =>
      val hdr = BinlogRowCodec.decodeHeader(ev, packetMarker = false)
      println(s"event type=${hdr.getInt(1)} len=${ev.length}")
    }, maxEvents = max)
    println(s"done: ${res.events} events, stop=${res.stop.getOrElse("maxEvents")}")
  }
}
