package graft.cdc

import java.io.DataInputStream
import java.net.ServerSocket

import graft.SparkSpec
import MysqlProtocolCodec.writePacket

/** Drives [[SocketTransport]] against a loopback fake server speaking the
  * MysqlSessionSpec bring-up conversation over a REAL `java.net.Socket` —
  * the last §2A link: login → auth switch → checksum ack → show master
  * status → COM_BINLOG_DUMP → typed events, end-to-end over TCP.
  */
class SocketTransportSpec extends SparkSpec {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val ok = hx("00" + "00" + "00" + "0200" + "0000")
  private val eof = hx("fe" + "0000" + "0200")

  private def lenencStr(s: String): Array[Byte] = {
    require(s.length < 0xfb)
    s.length.toByte +: s.getBytes("UTF-8")
  }

  private def handshake(seed: Array[Byte]): Array[Byte] = {
    require(seed.length == 20)
    val out = new java.io.ByteArrayOutputStream()
    out.write(10); out.write("8.0.42-log".getBytes); out.write(0)
    out.write(Array[Byte](0x39, 0x30, 0, 0))
    out.write(seed, 0, 8)
    out.write(0)
    out.write(0xff); out.write(0xf7)
    out.write(0xff)
    out.write(Array[Byte](2, 0))
    out.write(0x08); out.write(0x00)
    out.write(21)
    for (_ <- 0 until 10) out.write(0)
    out.write(seed, 8, 12); out.write(0)
    out.write("mysql_native_password".getBytes); out.write(0)
    out.toByteArray
  }

  private def authSwitch(seed: Array[Byte]): Array[Byte] =
    (0xfe.toByte +: ("mysql_native_password".getBytes :+ 0.toByte)) ++ seed :+ 0.toByte

  test("frame reader reassembles a >16MB continued packet") {
    val big = new Array[Byte](MysqlProtocolCodec.MaxFrame + 100)
    big(0) = 42; big(big.length - 1) = 43
    val framed = writePacket(0, big)
    val in = new DataInputStream(new java.io.ByteArrayInputStream(framed))
    val got = SocketTransport.readPayload(in)
    assert(got.length == big.length && got(0) == 42 && got(got.length - 1) == 43)
    assert(in.available() == 0, "both frames consumed")
  }

  test("loopback TCP: login → dump → events delivered, server EOF ends loudly") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev1 = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))))
    val ev2 = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](8L))))

    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Option[Throwable] = None
    val clientPackets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        def recv(): Unit = { clientPackets += SocketTransport.readPayload(in) }
        os.write(writePacket(0, handshake(seed1))); os.flush()
        recv() // HandshakeResponse41
        os.write(writePacket(2, authSwitch(seed2))); os.flush()
        recv() // scramble proof
        os.write(writePacket(4, ok)); os.flush()
        recv() // set @master_binlog_checksum
        os.write(writePacket(1, ok)); os.flush()
        recv() // show master status
        os.write(writePacket(1, Array(5.toByte)))
        for (i <- 0 until 5) os.write(writePacket(2 + i, hx("deadbeef")))
        os.write(writePacket(7, eof))
        os.write(writePacket(8, lenencStr("bin.000042") ++ lenencStr("1337") ++
          lenencStr("") ++ lenencStr("") ++ lenencStr("")))
        os.write(writePacket(9, eof)); os.flush()
        recv() // COM_BINLOG_DUMP
        os.write(writePacket(1, 0.toByte +: ev1))
        os.write(writePacket(2, 0.toByte +: ev2))
        os.write(writePacket(3, eof)); os.flush()
        s.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()

    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L),
      ev => events += ev, readTimeoutMs = 10000)
    t.join(10000)
    server.close()
    assert(serverErr.isEmpty, s"fake server failed: $serverErr")

    // both events crossed the wire intact and decode as typed rows
    assert(events.size == 2)
    assert(java.util.Arrays.equals(events(0), ev1))
    assert(java.util.Arrays.equals(events(1), ev2))
    val hdr = BinlogRowCodec.decodeHeader(events(1), packetMarker = false)
    assert(hdr.getInt(1) == BinlogRowCodec.WriteV2)
    // the post-stream EOF is a loud stop, not a silent hang
    assert(res.events == 2 && res.stop.isDefined)

    // the client bytes on the wire are the state machine's exact packets
    assert(java.util.Arrays.equals(clientPackets(0),
      MysqlProtocolCodec.encodeHandshakeResponse(
        MysqlReplicaSession.Caps, 1L << 24, 0xff, "repl", Array.emptyByteArray,
        None, Some("mysql_native_password"), Nil, 0)))
    assert(java.util.Arrays.equals(clientPackets(1),
      MysqlProtocolCodec.nativePasswordAuth("secret".getBytes, seed2)))
    assert(java.util.Arrays.equals(clientPackets(4),
      MysqlProtocolCodec.encodeComBinlogDump(1337L, 0, 100L, "bin.000042")))
  }

  test("loopback TCP caching_sha2: fast path over a real socket") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev1 = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))))

    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Option[Throwable] = None
    val clientPackets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        def recv(): Unit = { clientPackets += SocketTransport.readPayload(in) }
        os.write(writePacket(0, handshake(seed1))); os.flush()
        recv() // HandshakeResponse41
        os.write(writePacket(2,
          (0xfe.toByte +: ("caching_sha2_password".getBytes :+ 0.toByte)) ++
            seed2 :+ 0.toByte)); os.flush()
        recv() // 32-byte fast-path proof
        // fast_auth_success, then the bare OK — no client bytes between
        os.write(writePacket(4, Array[Byte](0x01, 0x03)))
        os.write(writePacket(5, ok)); os.flush()
        recv() // set @master_binlog_checksum
        os.write(writePacket(1, ok)); os.flush()
        recv() // show master status
        os.write(writePacket(1, Array(5.toByte)))
        for (i <- 0 until 5) os.write(writePacket(2 + i, hx("deadbeef")))
        os.write(writePacket(7, eof))
        os.write(writePacket(8, lenencStr("bin.000042") ++ lenencStr("1337") ++
          lenencStr("") ++ lenencStr("") ++ lenencStr("")))
        os.write(writePacket(9, eof)); os.flush()
        recv() // COM_BINLOG_DUMP
        os.write(writePacket(1, 0.toByte +: ev1))
        os.write(writePacket(2, eof)); os.flush()
        s.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()

    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L),
      ev => events += ev, readTimeoutMs = 10000)
    t.join(10000)
    server.close()
    assert(serverErr.isEmpty, s"fake server failed: $serverErr")
    assert(events.size == 1 && java.util.Arrays.equals(events(0), ev1))
    assert(res.events == 1 && res.stop.isDefined)
    // the proof on the wire is the exact XOR-of-SHA256 scramble
    assert(java.util.Arrays.equals(clientPackets(1),
      MysqlProtocolCodec.cachingSha2Auth("secret".getBytes, seed2)))
    assert(clientPackets(1).length == 32)
  }

  test("loopback TCP caching_sha2: full-auth request stops with the reason") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Option[Throwable] = None
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        os.write(writePacket(0, handshake(seed1))); os.flush()
        SocketTransport.readPayload(in)
        os.write(writePacket(2,
          (0xfe.toByte +: ("caching_sha2_password".getBytes :+ 0.toByte)) ++
            seed1 :+ 0.toByte)); os.flush()
        SocketTransport.readPayload(in)
        os.write(writePacket(4, Array[Byte](0x01, 0x04))); os.flush()
        s.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L),
      _ => (), readTimeoutMs = 10000)
    t.join(10000)
    server.close()
    assert(serverErr.isEmpty, s"fake server failed: $serverErr")
    assert(res.events == 0 && res.stop.exists(_.contains("full authentication")))
  }

  test("loopback TCP caching_sha2 RSA full auth: key exchange end-to-end") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev1 = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))))
    val kp = java.security.KeyPairGenerator.getInstance("RSA")
    kp.initialize(2048)
    val pair = kp.generateKeyPair()
    val pem = "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(pair.getPublic.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"

    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Option[Throwable] = None
    @volatile var decrypted: Array[Byte] = Array.emptyByteArray
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        os.write(writePacket(0, handshake(seed1))); os.flush()
        SocketTransport.readPayload(in) // HandshakeResponse41
        os.write(writePacket(2,
          (0xfe.toByte +: ("caching_sha2_password".getBytes :+ 0.toByte)) ++
            seed1 :+ 0.toByte)); os.flush()
        SocketTransport.readPayload(in) // fast-path proof
        os.write(writePacket(4, Array[Byte](0x01, 0x04))); os.flush()
        val req = SocketTransport.readPayload(in) // public-key request
        require(req.toSeq == Seq(0x02.toByte), s"bad key request ${req.toSeq}")
        os.write(writePacket(6, 0x01.toByte +: pem.getBytes("UTF-8"))); os.flush()
        val ct = SocketTransport.readPayload(in) // RSA ciphertext
        val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE, pair.getPrivate)
        decrypted = c.doFinal(ct)
        os.write(writePacket(8, ok)); os.flush()
        SocketTransport.readPayload(in) // checksum query
        os.write(writePacket(1, ok)); os.flush()
        SocketTransport.readPayload(in) // show master status
        os.write(writePacket(1, Array(5.toByte)))
        for (i <- 0 until 5) os.write(writePacket(2 + i, hx("deadbeef")))
        os.write(writePacket(7, eof))
        os.write(writePacket(8, lenencStr("bin.000042") ++ lenencStr("1337") ++
          lenencStr("") ++ lenencStr("") ++ lenencStr("")))
        os.write(writePacket(9, eof)); os.flush()
        SocketTransport.readPayload(in) // COM_BINLOG_DUMP
        os.write(writePacket(1, 0.toByte +: ev1))
        os.write(writePacket(2, eof)); os.flush()
        s.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()

    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L,
        rsaFullAuth = true),
      ev => events += ev, readTimeoutMs = 10000)
    t.join(10000)
    server.close()
    assert(serverErr.isEmpty, s"fake server failed: $serverErr")
    // the full-auth exchange completed and streaming followed it
    assert(java.util.Arrays.equals(decrypted,
      MysqlProtocolCodec.xorPasswordWithSeed("secret".getBytes, seed1)))
    assert(events.size == 1 && java.util.Arrays.equals(events(0), ev1))
    assert(res.events == 1 && res.stop.isDefined)
  }

  test("loopback TCP semi-sync: announcement on the wire, ACK bytes sent back") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev1 = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))),
      logPos = 4242L)

    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Option[Throwable] = None
    val clientPackets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        def recv(): Unit = { clientPackets += SocketTransport.readPayload(in) }
        os.write(writePacket(0, handshake(seed1))); os.flush()
        recv() // HandshakeResponse41
        os.write(writePacket(2, authSwitch(seed2))); os.flush()
        recv() // scramble proof
        os.write(writePacket(4, ok)); os.flush()
        recv() // set @master_binlog_checksum
        os.write(writePacket(1, ok)); os.flush()
        recv() // set @rpl_semi_sync_slave= 1 <- the announcement
        os.write(writePacket(1, ok)); os.flush()
        recv() // show master status
        os.write(writePacket(1, Array(5.toByte)))
        for (i <- 0 until 5) os.write(writePacket(2 + i, hx("deadbeef")))
        os.write(writePacket(7, eof))
        os.write(writePacket(8, lenencStr("bin.000042") ++ lenencStr("1337") ++
          lenencStr("") ++ lenencStr("") ++ lenencStr("")))
        os.write(writePacket(9, eof)); os.flush()
        recv() // COM_BINLOG_DUMP
        // flagged semi-sync event: 0x00 marker + 0xef magic + flag 1
        os.write(writePacket(1, Array[Byte](0, 0xef.toByte, 1) ++ ev1)); os.flush()
        recv() // the semi-sync ACK
        os.write(writePacket(3, eof)); os.flush()
        s.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()

    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L,
        semiSync = true),
      ev => events += ev, readTimeoutMs = 10000)
    t.join(10000)
    server.close()
    assert(serverErr.isEmpty, s"fake server failed: $serverErr")
    assert(events.size == 1 && java.util.Arrays.equals(events(0), ev1))
    assert(res.events == 1 && res.stop.isDefined)
    // the announcement crossed the wire after the checksum ack
    assert(java.util.Arrays.equals(clientPackets(3),
      MysqlProtocolCodec.encodeComQuery("set @rpl_semi_sync_slave= 1")))
    // the ACK packet: 0xef + u8 LE end-log-pos + current binlog file
    val ack = clientPackets.last
    val wantAck = 0xef.toByte +:
      ((0 until 8).map(i => ((4242L >> (8 * i)) & 0xff).toByte).toArray ++
        "bin.000042".getBytes("UTF-8"))
    assert(java.util.Arrays.equals(ack, wantAck),
      ack.map(b => f"$b%02x").mkString(" "))
  }

  test("maxEvents stops the loop cleanly with stop=None") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))))
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        def recv(): Unit = { SocketTransport.readPayload(in); () }
        os.write(writePacket(0, handshake(seed1))); os.flush()
        recv()
        os.write(writePacket(2, authSwitch(seed2))); os.flush()
        recv()
        os.write(writePacket(4, ok)); os.flush()
        recv()
        os.write(writePacket(1, ok)); os.flush()
        recv()
        os.write(writePacket(1, Array(5.toByte)))
        for (i <- 0 until 5) os.write(writePacket(2 + i, hx("deadbeef")))
        os.write(writePacket(7, eof))
        os.write(writePacket(8, lenencStr("bin.000001") ++ lenencStr("4") ++
          lenencStr("") ++ lenencStr("") ++ lenencStr("")))
        os.write(writePacket(9, eof)); os.flush()
        recv()
        // endless stream: client must cut at maxEvents, not drain us
        var i = 1
        while (true) { os.write(writePacket(i, 0.toByte +: ev)); os.flush(); i += 1 }
      } catch { case _: Throwable => () } // client hangup is the expected exit
    })
    t.start()
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 7L),
      _ => (), maxEvents = 3, readTimeoutMs = 10000)
    server.close()
    t.join(10000)
    assert(res.events == 3 && res.stop.isEmpty)
  }

  /** A server-side SSLContext backed by a keytool-generated self-signed
    * cert (keytool ships with the JDK — no new dependencies, no egress).
    */
  private lazy val serverTlsContext: javax.net.ssl.SSLContext = {
    val ksFile = java.io.File.createTempFile("graft-tls-", ".p12")
    ksFile.delete() // keytool refuses an existing file
    ksFile.deleteOnExit()
    val keytool = new java.io.File(System.getProperty("java.home"),
      "bin/keytool").getAbsolutePath
    val p = new ProcessBuilder(keytool, "-genkeypair", "-alias", "srv",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-dname", "CN=localhost", "-keystore", ksFile.getAbsolutePath,
      "-storetype", "PKCS12", "-storepass", "changeit")
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    assert(p.waitFor() == 0, s"keytool failed: $out")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ksFile)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** handshake() with CLIENT_SSL (bit 11) advertised in the low caps. */
  private def handshakeSsl(seed: Array[Byte]): Array[Byte] = {
    val hs = handshake(seed)
    // caps low bytes sit after proto(1) + version(10+NUL) + tid(4) +
    // seed[0..8) + filler(1) = offsets 25..26; the 0xf7 (bit 11 clear)
    // is the SECOND byte of the little-endian pair
    assert((hs(26) & 0xff) == 0xf7)
    hs(26) = 0xff.toByte
    hs
  }

  test("loopback TLS: SSLRequest, upgraded stream, login, dump, events") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev1 = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))))

    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Option[Throwable] = None
    // (seq, payload, overTls) for every client packet, in arrival order
    val clientPackets =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte], Boolean)]
    val t = new Thread(() => {
      try {
        val plain = server.accept()
        val pin = new DataInputStream(plain.getInputStream)
        def recvFrame(in: DataInputStream, tls: Boolean): Unit = {
          val hdr = new Array[Byte](4)
          in.readFully(hdr)
          val len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16)
          val body = new Array[Byte](len)
          in.readFully(body)
          clientPackets += ((hdr(3) & 0xff, body, tls))
        }
        plain.getOutputStream.write(writePacket(0, handshakeSsl(seed1)))
        plain.getOutputStream.flush()
        recvFrame(pin, tls = false) // SSLRequest — the ONLY plaintext client packet
        // upgrade the server side, continue the conversation encrypted
        val s = serverTlsContext.getSocketFactory
          .createSocket(plain, null, plain.getPort, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        s.setUseClientMode(false)
        s.startHandshake()
        val in = new DataInputStream(s.getInputStream)
        val os = s.getOutputStream
        def recv(): Unit = recvFrame(in, tls = true)
        recv() // HandshakeResponse41
        os.write(writePacket(3, authSwitch(seed2))); os.flush()
        recv() // scramble proof
        os.write(writePacket(5, ok)); os.flush()
        recv() // set @master_binlog_checksum
        os.write(writePacket(1, ok)); os.flush()
        recv() // show master status
        os.write(writePacket(1, Array(5.toByte)))
        for (i <- 0 until 5) os.write(writePacket(2 + i, hx("deadbeef")))
        os.write(writePacket(7, eof))
        os.write(writePacket(8, lenencStr("bin.000042") ++ lenencStr("1337") ++
          lenencStr("") ++ lenencStr("") ++ lenencStr("")))
        os.write(writePacket(9, eof)); os.flush()
        recv() // COM_BINLOG_DUMP
        os.write(writePacket(1, 0.toByte +: ev1))
        os.write(writePacket(2, eof)); os.flush()
        s.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.start()

    val events = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 100L, tls = true),
      ev => events += ev, readTimeoutMs = 15000)
    t.join(15000)
    server.close()
    assert(serverErr.isEmpty, s"fake server failed: $serverErr")

    // the event crossed the encrypted wire intact; the dump-stream EOF is
    // still a loud stop
    assert(events.size == 1 && java.util.Arrays.equals(events(0), ev1))
    assert(res.events == 1 && res.stop.isDefined)

    // exactly one plaintext client packet: the 32-byte SSLRequest, seq 1
    val plaintext = clientPackets.filter(!_._3)
    assert(plaintext.size == 1)
    val (1, sslReq, false) = plaintext(0)
    assert(java.util.Arrays.equals(sslReq, MysqlProtocolCodec.encodeSslRequest(
      MysqlReplicaSession.Caps | MysqlProtocolCodec.ClientSsl, 1L << 24, 0xff)))

    // over TLS: the full response at seq 2 (CLIENT_SSL in caps), then the
    // shifted auth proof at seq 4, then command phases back at seq 0
    val (2, resp, true) = clientPackets(1)
    assert(java.util.Arrays.equals(resp,
      MysqlProtocolCodec.encodeHandshakeResponse(
        MysqlReplicaSession.Caps | MysqlProtocolCodec.ClientSsl, 1L << 24,
        0xff, "repl", Array.emptyByteArray, None,
        Some("mysql_native_password"), Nil, 0)))
    val (4, proof, true) = clientPackets(2)
    assert(java.util.Arrays.equals(proof,
      MysqlProtocolCodec.nativePasswordAuth("secret".getBytes, seed2)))
    val (0, dump, true) = clientPackets.last
    assert(java.util.Arrays.equals(dump,
      MysqlProtocolCodec.encodeComBinlogDump(1337L, 0, 100L, "bin.000042")))
  }

  test("tls against a server without CLIENT_SSL stops before any credential") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val received = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val t = new Thread(() => {
      try {
        val s = server.accept()
        s.getOutputStream.write(writePacket(0, handshake(seed1))) // no SSL cap
        s.getOutputStream.flush()
        // drain whatever the client might (wrongly) send until it hangs up
        val in = new DataInputStream(s.getInputStream)
        while (true) received += SocketTransport.readPayload(in)
      } catch { case _: Throwable => () } // client hangup = expected exit
    })
    t.start()
    val res = SocketTransport.run("127.0.0.1", server.getLocalPort,
      MysqlReplicaSession.Config("repl", "secret", serverId = 1L, tls = true),
      _ => fail("no event can arrive"), readTimeoutMs = 10000)
    server.close()
    t.join(10000)
    assert(res.stop.exists(_.contains("CLIENT_SSL")))
    assert(received.isEmpty, "no byte may leave the client before failing")
  }
}
