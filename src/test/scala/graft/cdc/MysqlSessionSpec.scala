package graft.cdc

import graft.SparkSpec
import MysqlReplicaSession._

/** Drives the pure replica state machine through the reference's exact
  * bring-up conversation (mysql.rs:47-94, main.rs:80-101) with
  * synthesized server payloads, asserting every client byte.
  */
class MysqlSessionSpec extends SparkSpec {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val ok = hx("00" + "00" + "00" + "0200" + "0000")
  private val eof = hx("fe" + "0000" + "0200")

  private def lenencStr(s: String): Array[Byte] = {
    require(s.length < 0xfb)
    s.length.toByte +: s.getBytes("UTF-8")
  }

  private def handshake(seed: Array[Byte], deprecateEof: Boolean = false,
      ssl: Boolean = false): Array[Byte] = {
    require(seed.length == 20)
    val out = new java.io.ByteArrayOutputStream()
    out.write(10); out.write("8.0.42-log".getBytes); out.write(0)
    out.write(Array[Byte](0x39, 0x30, 0, 0))
    out.write(seed, 0, 8)
    out.write(0)
    // caps low: 0xf7ff leaves CLIENT_SSL (bit 11) CLEAR; ssl sets it
    out.write(0xff); out.write(if (ssl) 0xff else 0xf7)
    out.write(0xff)
    out.write(Array[Byte](2, 0))
    // caps high: PLUGIN_AUTH (bit 19); optionally DEPRECATE_EOF (bit 24)
    out.write(0x08); out.write(if (deprecateEof) 0x01 else 0x00)
    out.write(21)
    for (_ <- 0 until 10) out.write(0)
    out.write(seed, 8, 12); out.write(0)
    out.write("mysql_native_password".getBytes); out.write(0)
    out.toByteArray
  }

  private def authSwitch(seed: Array[Byte]): Array[Byte] =
    (0xfe.toByte +: ("mysql_native_password".getBytes :+ 0.toByte)) ++ seed :+ 0.toByte

  test("full bring-up conversation: every client packet byte-asserted") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", serverId = 100L))

    val s1 = onPayload(st, handshake(seed1))
    st = s1.state
    assert(st.phase == AwaitAuthSwitch)
    assert(java.util.Arrays.equals(st.seed, seed1))
    val Seq((1, resp)) = s1.send
    assert(java.util.Arrays.equals(resp, MysqlProtocolCodec.encodeHandshakeResponse(
      Caps, 1L << 24, 0xff, "repl", Array.emptyByteArray, None,
      Some("mysql_native_password"), Nil, 0)))

    val s2 = onPayload(st, authSwitch(seed2))
    st = s2.state
    assert(st.phase == AwaitAuthResult)
    val Seq((3, proof)) = s2.send
    assert(java.util.Arrays.equals(proof,
      MysqlProtocolCodec.nativePasswordAuth("secret".getBytes, seed2)))

    val s3 = onPayload(st, ok)
    st = s3.state
    assert(st.phase == AwaitChecksumAck)
    val Seq((0, q1)) = s3.send
    assert(java.util.Arrays.equals(q1, MysqlProtocolCodec.encodeComQuery(
      "set @master_binlog_checksum= @@global.binlog_checksum")))

    val s4 = onPayload(st, ok)
    st = s4.state
    assert(st.phase == AwaitStatusColCount)
    val Seq((0, q2)) = s4.send
    assert(java.util.Arrays.equals(q2,
      MysqlProtocolCodec.encodeComQuery("show master status")))

    st = onPayload(st, Array(5.toByte)).state // 5 columns
    assert(st.phase == AwaitStatusCols(5))
    for (_ <- 0 until 5) st = onPayload(st, hx("deadbeef")).state // opaque col defs
    // this server did NOT advertise DEPRECATE_EOF → classic protocol: an
    // EOF terminates the column definitions before the rows
    assert(st.phase == AwaitStatusRows(colEofSeen = false))
    st = onPayload(st, eof).state
    assert(st.phase == AwaitStatusRows(colEofSeen = true))

    st = onPayload(st, lenencStr("bin.000042") ++ lenencStr("1337") ++
      lenencStr("") ++ lenencStr("") ++ lenencStr("")).state
    assert(st.masterFile == "bin.000042" && st.masterPos == 1337L)

    val s5 = onPayload(st, eof)
    st = s5.state
    assert(st.phase == Streaming)
    val Seq((0, dump)) = s5.send
    assert(java.util.Arrays.equals(dump, MysqlProtocolCodec.encodeComBinlogDump(
      1337L, 0, 100L, "bin.000042")))

    // dump phase: 0x00-marked packets yield whole events for the shared decoder
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))))
    val s6 = onPayload(st, 0.toByte +: ev)
    assert(s6.send.isEmpty)
    assert(java.util.Arrays.equals(s6.event.get, ev))
    val hdr = BinlogRowCodec.decodeHeader(s6.event.get, packetMarker = false)
    assert(hdr.getInt(1) == BinlogRowCodec.WriteV2)

    // server EOF ends the stream loudly
    val s7 = onPayload(s6.state, eof)
    assert(s7.state.phase.isInstanceOf[Failed])
  }

  test("semi-sync: announcement, prefix strip, flagged ACK, rotate/FDE tracking") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", serverId = 100L,
      resumeAt = Some(("bin.000077", 4L)), semiSync = true))
    st = onPayload(st, handshake(seed1)).state
    st = onPayload(st, authSwitch(seed2)).state
    st = onPayload(st, ok).state // auth OK → checksum query out
    assert(st.phase == AwaitChecksumAck)
    val sAnn = onPayload(st, ok) // checksum ack → semi-sync announcement
    st = sAnn.state
    assert(st.phase == AwaitSemiSyncAck)
    val Seq((0, ann)) = sAnn.send
    assert(java.util.Arrays.equals(ann,
      MysqlProtocolCodec.encodeComQuery("set @rpl_semi_sync_slave= 1")))
    st = onPayload(st, ok).state
    assert(st.phase == AwaitStatusColCount)
    st = onPayload(st, Array(2.toByte)).state
    st = onPayload(st, hx("deadbeef")).state
    st = onPayload(st, hx("deadbeef")).state
    st = onPayload(st, eof).state // classic col-def terminator
    st = onPayload(st, lenencStr("bin.000001") ++ lenencStr("4")).state
    val sDump = onPayload(st, eof)
    st = sDump.state
    assert(st.phase == Streaming && st.currentFile == "bin.000077")

    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def rowEv(logPos: Long) = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](7L))),
      logPos = logPos)
    // unflagged: the 2-byte prefix is stripped, no ack goes out
    val e1 = rowEv(100L)
    val s1 = onPayload(st, Array[Byte](0, 0xef.toByte, 0) ++ e1)
    assert(s1.send.isEmpty && java.util.Arrays.equals(s1.event.get, e1))
    // flagged: ACK = 0xef + u8 LE end-log-pos + current file name
    val e2 = rowEv(5555L)
    val s2 = onPayload(s1.state, Array[Byte](0, 0xef.toByte, 1) ++ e2)
    assert(java.util.Arrays.equals(s2.event.get, e2))
    val Seq((0, ack)) = s2.send
    val wantAck = 0xef.toByte +:
      ((0 until 8).map(i => ((5555L >> (8 * i)) & 0xff).toByte).toArray ++
        "bin.000077".getBytes("UTF-8"))
    assert(java.util.Arrays.equals(ack, wantAck))
    // ROTATE (no checksums yet): name runs to the event end
    val rot1 = BinlogRowCodec.encodeEvent(BinlogFileCodec.RotateType,
      (0 until 8).map(i => ((4L >> (8 * i)) & 0xff).toByte).toArray ++
        "bin.000078".getBytes("UTF-8"))
    var stS = onPayload(s2.state, Array[Byte](0, 0xef.toByte, 0) ++ rot1).state
    assert(stS.currentFile == "bin.000078")
    // FDE declaring CRC32 → later ROTATE names exclude the 4-byte tail
    val fde = BinlogRowCodec.encodeEvent(BinlogFileCodec.FdeType,
      new Array[Byte](40) ++ Array[Byte](1, 9, 9, 9, 9)) // alg=CRC32 + CRC
    stS = onPayload(stS, Array[Byte](0, 0xef.toByte, 0) ++ fde).state
    assert(stS.checksumLen == 4)
    val rot2 = BinlogRowCodec.encodeEvent(BinlogFileCodec.RotateType,
      (0 until 8).map(i => ((4L >> (8 * i)) & 0xff).toByte).toArray ++
        "bin.000079".getBytes("UTF-8") ++ Array[Byte](9, 9, 9, 9))
    stS = onPayload(stS, Array[Byte](0, 0xef.toByte, 0) ++ rot2).state
    assert(stS.currentFile == "bin.000079")
    // a dump packet WITHOUT the magic is a protocol violation
    val bad = onPayload(stS, 0.toByte +: rowEv(1L))
    assert(bad.state.phase.isInstanceOf[Failed])
  }

  test("saved position overrides show-master-status (the resume path)") {
    var st = initial(Config("repl", "pw", 7L, resumeAt = Some(("bin.000007", 4L))))
      .copy(phase = AwaitStatusRows(colEofSeen = true),
        masterFile = "bin.000042", masterPos = 999L)
    val s = onPayload(st, eof)
    assert(s.state.phase == Streaming)
    val Seq((0, dump)) = s.send
    assert(java.util.Arrays.equals(dump,
      MysqlProtocolCodec.encodeComBinlogDump(4L, 0, 7L, "bin.000007")))
  }

  test("a resume GTID set switches the dump to auto-position") {
    val text = "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-77"
    var st = initial(Config("repl", "pw", 7L,
      resumeAt = Some(("bin.000007", 4L)), // ignored under auto-position
      resumeGtids = Some(text)))
      .copy(phase = AwaitStatusRows(colEofSeen = true),
        masterFile = "bin.000042", masterPos = 999L)
    val s = onPayload(st, eof)
    assert(s.state.phase == Streaming)
    val Seq((0, dump)) = s.send
    val (flags, sid, fn, pos, got) =
      MysqlProtocolCodec.decodeComBinlogDumpGtid(dump)
    assert(flags == MysqlProtocolCodec.BinlogThroughGtid && sid == 7L)
    assert(fn == "" && pos == 4L && got == text)
    // a malformed set fails the session loudly, never dumps from garbage
    val bad = initial(Config("repl", "pw", 7L, resumeGtids = Some("zzz:1")))
      .copy(phase = AwaitStatusRows(colEofSeen = true), masterFile = "f")
    assert(onPayload(bad, eof).state.phase.isInstanceOf[Failed])
  }

  test("DEPRECATE_EOF server: no col-def EOF, one terminator ends the rows") {
    val seed = (1 to 20).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", 100L))
    st = onPayload(st, handshake(seed, deprecateEof = true)).state
    st = onPayload(st, authSwitch(seed)).state
    st = onPayload(st, ok).state // auth OK → checksum query sent
    st = onPayload(st, ok).state // checksum OK → show master status sent
    st = onPayload(st, Array(2.toByte)).state
    for (_ <- 0 until 2) st = onPayload(st, hx("deadbeef")).state
    // colEofSeen pre-set: the next row packet arrives directly
    assert(st.phase == AwaitStatusRows(colEofSeen = true))
    st = onPayload(st, lenencStr("bin.000099") ++ lenencStr("42")).state
    val s = onPayload(st, eof)
    assert(s.state.phase == Streaming)
    val Seq((0, dump)) = s.send
    assert(java.util.Arrays.equals(dump,
      MysqlProtocolCodec.encodeComBinlogDump(42L, 0, 100L, "bin.000099")))
  }

  test("registerSlave: COM_REGISTER_SLAVE goes out before the dump, acked") {
    val seed = (1 to 20).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", 100L,
      registerSlave = Some(("replica-1", 3307))))
    st = onPayload(st, handshake(seed)).state
    st = onPayload(st, authSwitch(seed)).state
    st = onPayload(st, ok).state // auth OK → checksum query
    val reg = onPayload(st, ok) // checksum ack → registration
    st = reg.state
    assert(st.phase == AwaitRegisterAck)
    val Seq((0, regBytes)) = reg.send
    assert(java.util.Arrays.equals(regBytes,
      MysqlProtocolCodec.encodeComRegisterSlave(100L, "replica-1", "repl", 3307)))
    val s = onPayload(st, ok) // registration ack → master position
    assert(s.state.phase == AwaitStatusColCount)
    val Seq((0, q)) = s.send
    assert(java.util.Arrays.equals(q,
      MysqlProtocolCodec.encodeComQuery("show master status")))

    // with semi-sync, registration follows the announcement
    var st2 = initial(Config("repl", "secret", 100L, semiSync = true,
      registerSlave = Some(("replica-1", 3307))))
    st2 = onPayload(st2, handshake(seed)).state
    st2 = onPayload(st2, authSwitch(seed)).state
    st2 = onPayload(st2, ok).state // auth → checksum
    st2 = onPayload(st2, ok).state // checksum → announce
    assert(st2.phase == AwaitSemiSyncAck)
    val r2 = onPayload(st2, ok) // announce ack → registration
    assert(r2.state.phase == AwaitRegisterAck && r2.send.nonEmpty)
    assert(onPayload(r2.state, ok).state.phase == AwaitStatusColCount)
    // an ERR on the registration is terminal like everywhere else
    val err = 0xff.toByte +: (Array[Byte](0x47, 0x04) ++ "#HY000".getBytes ++
      "not allowed".getBytes)
    assert(onPayload(r2.state, err).state.phase.isInstanceOf[Failed])
  }

  test("empty-password fast path: OK instead of AuthSwitchRequest proceeds") {
    val seed = (1 to 20).map(_.toByte).toArray
    var st = initial(Config("repl", "", 100L))
    st = onPayload(st, handshake(seed)).state
    val s = onPayload(st, ok)
    assert(s.state.phase == AwaitChecksumAck)
    val Seq((0, q)) = s.send
    assert(java.util.Arrays.equals(q, MysqlProtocolCodec.encodeComQuery(
      "set @master_binlog_checksum= @@global.binlog_checksum")))
  }

  private def authSwitchSha2(seed: Array[Byte]): Array[Byte] =
    (0xfe.toByte +: ("caching_sha2_password".getBytes :+ 0.toByte)) ++ seed :+ 0.toByte

  test("caching_sha2 fast path: switch, 32-byte proof, AuthMoreData 0x03, OK") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", serverId = 100L))
    st = onPayload(st, handshake(seed1)).state

    val sw = onPayload(st, authSwitchSha2(seed2))
    st = sw.state
    assert(st.phase == AwaitSha2MoreData)
    val Seq((3, proof)) = sw.send
    // independent hashlib golden: SHA256(pass) XOR SHA256(SHA256²(pass)++seed)
    assert(proof.toSeq == hx(
      "d3cca0c87047b9edc64299e9c79775b631cbe3b140b44865013e68bbc8015e13").toSeq)

    // fast_auth_success carries no client response; a bare OK follows
    val more = onPayload(st, Array[Byte](0x01, 0x03))
    st = more.state
    assert(st.phase == AwaitAuthResult && more.send.isEmpty)
    val s = onPayload(st, ok)
    assert(s.state.phase == AwaitChecksumAck)
    val Seq((0, q)) = s.send
    assert(java.util.Arrays.equals(q, MysqlProtocolCodec.encodeComQuery(
      "set @master_binlog_checksum= @@global.binlog_checksum")))
  }

  test("caching_sha2 full-auth request (cache miss) is refused loudly") {
    val seed = (1 to 20).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", 100L))
    st = onPayload(st, handshake(seed)).state
    st = onPayload(st, authSwitchSha2(seed)).state
    val f = onPayload(st, Array[Byte](0x01, 0x04))
    val reason = f.state.phase.asInstanceOf[Failed].reason
    assert(reason.contains("full authentication") && reason.contains("TLS"))
    // and the failure is terminal — a later OK does not resurrect it
    assert(onPayload(f.state, ok).state.phase == f.state.phase)
  }

  test("caching_sha2 empty password: empty proof, direct OK proceeds") {
    val seed = (1 to 20).map(_.toByte).toArray
    // force the switch path (a non-empty user with empty password)
    var st = initial(Config("repl", "", 100L))
    st = onPayload(st, handshake(seed)).state
    val sw = onPayload(st, authSwitchSha2(seed))
    st = sw.state
    val Seq((3, proof)) = sw.send
    assert(proof.isEmpty && st.phase == AwaitSha2MoreData)
    val s = onPayload(st, ok)
    assert(s.state.phase == AwaitChecksumAck && s.send.nonEmpty)
  }

  test("caching_sha2 RSA full auth: opt-in key request, ciphertext decrypts") {
    val seed = (1 to 20).map(_.toByte).toArray
    val kp = java.security.KeyPairGenerator.getInstance("RSA")
    kp.initialize(2048)
    val pair = kp.generateKeyPair()
    val pem = "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(pair.getPublic.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"

    var st = initial(Config("repl", "secret", 100L, rsaFullAuth = true))
    st = onPayload(st, handshake(seed)).state
    st = onPayload(st, authSwitchSha2(seed)).state
    val req = onPayload(st, Array[Byte](0x01, 0x04))
    st = req.state
    assert(st.phase == AwaitSha2PublicKey)
    val Seq((5, reqBytes)) = req.send
    assert(reqBytes.toSeq == Seq(0x02.toByte)) // "send me your public key"
    val enc = onPayload(st, 0x01.toByte +: pem.getBytes("UTF-8"))
    st = enc.state
    assert(st.phase == AwaitAuthResult)
    val Seq((7, ct)) = enc.send
    // OAEP is randomized: verify by decrypting with the private key
    val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE, pair.getPrivate)
    assert(c.doFinal(ct).toSeq ==
      MysqlProtocolCodec.xorPasswordWithSeed("secret".getBytes, seed).toSeq)
    val s = onPayload(st, ok)
    assert(s.state.phase == AwaitChecksumAck)

    // a garbage key fails loudly, never sends bytes
    var st2 = initial(Config("repl", "secret", 100L, rsaFullAuth = true))
    st2 = onPayload(st2, handshake(seed)).state
    st2 = onPayload(st2, authSwitchSha2(seed)).state
    st2 = onPayload(st2, Array[Byte](0x01, 0x04)).state
    val bad = onPayload(st2, 0x01.toByte +: "not a pem".getBytes)
    assert(bad.state.phase.asInstanceOf[Failed].reason.contains("RSA") &&
      bad.send.isEmpty)
    // and a non-AuthMoreData packet in the key phase fails too
    assert(onPayload(st2, Array[Byte](0x42)).state.phase.isInstanceOf[Failed])
  }

  test("caching_sha2 malformed AuthMoreData fails, never hangs") {
    val seed = (1 to 20).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", 100L))
    st = onPayload(st, handshake(seed)).state
    st = onPayload(st, authSwitchSha2(seed)).state
    assert(onPayload(st, Array[Byte](0x01)).state.phase.isInstanceOf[Failed])
    assert(onPayload(st, Array[Byte](0x01, 0x07)).state
      .phase.asInstanceOf[Failed].reason.contains("0x07"))
    assert(onPayload(st, Array[Byte](0x05)).state.phase.isInstanceOf[Failed])
    // ERR (wrong password) in this phase reports the server's message
    val err = 0xff.toByte +: (Array[Byte](0x15, 0x04) ++ "#28000".getBytes ++
      "Access denied".getBytes)
    assert(onPayload(st, err).state.phase.asInstanceOf[Failed]
      .reason.contains("Access denied"))
  }

  test("ERR anywhere is terminal; unexpected plugin/marker fail loudly") {
    val err = 0xff.toByte +: (Array[Byte](0x48, 0x04) ++ "#HY000".getBytes ++
      "denied".getBytes)
    val f1 = onPayload(initial(Config("u", "p", 1L)), err)
    assert(f1.state.phase.asInstanceOf[Failed].reason.contains("1096") ||
      f1.state.phase.asInstanceOf[Failed].reason.contains("denied"))
    // sink state: further input is ignored
    assert(onPayload(f1.state, ok).send.isEmpty)

    val badPlugin = onPayload(
      initial(Config("u", "p", 1L)).copy(phase = AwaitAuthSwitch, seed = new Array[Byte](20)),
      (0xfe.toByte +: ("sha256_password".getBytes :+ 0.toByte)) ++ new Array[Byte](21))
    assert(badPlugin.state.phase.isInstanceOf[Failed])

    val badMarker = onPayload(
      initial(Config("u", "p", 1L)).copy(phase = Streaming), Array(0x01.toByte))
    assert(badMarker.state.phase.isInstanceOf[Failed])

    // malformed AuthSwitchRequest (no NUL) must land in Failed, not throw
    val noNul = onPayload(
      initial(Config("u", "p", 1L)).copy(phase = AwaitAuthSwitch, seed = new Array[Byte](20)),
      0xfe.toByte +: "mysql_native_password".getBytes)
    assert(noNul.state.phase.asInstanceOf[Failed].reason.contains("unterminated"))
  }

  test("pure-fold contract: truncated/adversarial bytes never throw") {
    // truncated ERR (just the 0xff header), truncated handshake, short
    // seed on both sides of the auth switch — every one must land in
    // Failed with the phase named, not escape onPayload
    val s0 = initial(Config("u", "p", 1L))
    assert(onPayload(s0, Array(0xff.toByte)).state.phase.isInstanceOf[Failed])
    assert(onPayload(s0, Array(10.toByte, 65)).state.phase.isInstanceOf[Failed])
    val shortSeed = s0.copy(phase = AwaitAuthSwitch, seed = Array[Byte](1, 2, 3))
    val r = onPayload(shortSeed,
      (0xfe.toByte +: ("mysql_native_password".getBytes :+ 0.toByte)) ++ Array[Byte](9))
    assert(r.state.phase.isInstanceOf[Failed])
    // Failed keeps its ROOT CAUSE: later ERR packets don't overwrite it
    val kept = onPayload(r.state,
      0xff.toByte +: (Array[Byte](1, 0) ++ "#HY000x".getBytes))
    assert(kept.state.phase == r.state.phase && kept.send.isEmpty)
  }

  test("positions beyond u4 are refused, not silently truncated") {
    val st = initial(Config("repl", "pw", 7L,
      resumeAt = Some(("bin.000007", 5000000000L))))
      .copy(phase = AwaitStatusRows(colEofSeen = true), masterFile = "x", masterPos = 4L)
    val s = onPayload(st, eof)
    assert(s.state.phase.asInstanceOf[Failed].reason.contains("u4"))
  }

  test("DEPRECATE_EOF terminator at 9+ bytes still ends the result set") {
    val seed = (1 to 20).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", 100L))
    st = onPayload(st, handshake(seed, deprecateEof = true)).state
    st = st.copy(phase = AwaitStatusRows(colEofSeen = true),
      masterFile = "bin.000001", masterPos = 4L)
    // OK-with-0xfe-header, 9 bytes (deprecated-EOF layout)
    val s = onPayload(st, hx("fe" + "00" + "00" + "0200" + "0000" + "0000"))
    assert(s.state.phase == Streaming)
    assert(s.send.nonEmpty)
  }

  test("text-protocol row decode: lenenc tags and NULL cells") {
    val row = lenencStr("abc") ++ Array(0xfb.toByte) ++
      (0xfc.toByte +: Array[Byte](3, 0)) ++ "xyz".getBytes
    assert(decodeTextRow(row).toSeq == Seq("abc", null, "xyz"))
    intercept[IllegalArgumentException] {
      decodeTextRow(Array(0x05.toByte, 'a'.toByte)) // claims 5, has 1
    }
    // an 8-byte lenenc is an UNSIGNED u64: with the high bit set it lands
    // negative in a signed Long and must throw cleanly, never reach
    // String with a negative count (found by the session fold fuzz)
    intercept[IllegalArgumentException] {
      decodeTextRow(0xfe.toByte +: Array.fill[Byte](8)(0xff.toByte))
    }
    intercept[IllegalArgumentException] {
      // the exact fuzz counterexample shape: count = 0xFF000000 << 32
      decodeTextRow(0xfe.toByte +: Array[Byte](0, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    }
  }

  test("MySQL 8.4: parse error on show master status retries ONCE with " +
      "SHOW BINARY LOG STATUS; permission errors never retry") {
    val st0 = initial(Config("u", "p", 1L)).copy(phase = AwaitStatusColCount)
    // ER_PARSE_ERROR 1064 = 0x0428 — what 8.4 answers the removed syntax
    val parseErr = 0xff.toByte +: (Array[Byte](0x28, 0x04) ++
      "#42000".getBytes ++ "You have an error in your SQL syntax".getBytes)
    val s1 = onPayload(st0, parseErr)
    assert(s1.state.phase == AwaitStatusColCount && s1.state.statusRetried)
    val Seq((0, q)) = s1.send
    assert(java.util.Arrays.equals(q,
      MysqlProtocolCodec.encodeComQuery("show binary log status")))
    // the renamed command's result set then proceeds through the shared
    // transitions (same File/Position columns)
    assert(onPayload(s1.state, Array(5.toByte)).state.phase == AwaitStatusCols(5))
    // a SECOND parse error is terminal — the fallback never loops
    assert(onPayload(s1.state, parseErr).state.phase.isInstanceOf[Failed])
    // a non-parse ERR (e.g. missing REPLICATION CLIENT privilege) fails
    // immediately: retrying cannot fix permissions
    val denied = 0xff.toByte +: (Array[Byte](0x48, 0x04) ++
      "#HY000".getBytes ++ "denied".getBytes)
    assert(onPayload(st0, denied).state.phase.isInstanceOf[Failed])
  }

  test("tls: SSLRequest at seq 1, upgrade signaled, full response at seq 2") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    val st0 = initial(Config("repl", "secret", serverId = 100L, tls = true))

    val s1 = onPayload(st0, handshake(seed1, ssl = true))
    assert(s1.upgradeTls && s1.state.phase == AwaitTlsUpgrade
      && s1.state.seqOff == 1)
    val Seq((1, sslReq)) = s1.send
    assert(java.util.Arrays.equals(sslReq, MysqlProtocolCodec.encodeSslRequest(
      Caps | MysqlProtocolCodec.ClientSsl, 1L << 24, 0xff)))
    // wire shape: 32 bytes — u4 caps (CLIENT_SSL = bit 11 → byte 1 bit 3),
    // u4 max packet, charset 0xff, 23 zero filler
    assert(sslReq.length == 32 && (sslReq(1) & 0x08) != 0
      && (sslReq(8) & 0xff) == 0xff && sslReq.drop(9).forall(_ == 0))

    // a server packet before the upgrade is a protocol violation
    assert(onPayload(s1.state, ok).state.phase.isInstanceOf[Failed])

    // transport wrapped the stream: same caps, next seq, over TLS
    val s2 = afterTlsUpgrade(s1.state)
    assert(s2.state.phase == AwaitAuthSwitch)
    val Seq((2, resp)) = s2.send
    assert(java.util.Arrays.equals(resp,
      MysqlProtocolCodec.encodeHandshakeResponse(
        Caps | MysqlProtocolCodec.ClientSsl, 1L << 24, 0xff, "repl",
        Array.emptyByteArray, None, Some("mysql_native_password"), Nil, 0)))

    // every later auth-phase packet shifts by one: native proof at seq 4
    val s3 = onPayload(s2.state, authSwitch(seed2))
    val Seq((4, proof)) = s3.send
    assert(java.util.Arrays.equals(proof,
      MysqlProtocolCodec.nativePasswordAuth("secret".getBytes, seed2)))
    assert(s3.state.phase == AwaitAuthResult)

    // afterTlsUpgrade out of phase is a loud failure, not a resend
    assert(afterTlsUpgrade(s3.state).state.phase.isInstanceOf[Failed])
  }

  test("tls refused loudly when the server does not advertise CLIENT_SSL") {
    val st = initial(Config("repl", "secret", serverId = 1L, tls = true))
    val s = onPayload(st, handshake((1 to 20).map(_.toByte).toArray))
    val reason = s.state.phase.asInstanceOf[Failed].reason
    assert(reason.contains("CLIENT_SSL"))
    assert(s.send.isEmpty && !s.upgradeTls)
  }

  test("caching_sha2 full auth over TLS: cleartext password NUL-terminated") {
    val seed1 = (1 to 20).map(_.toByte).toArray
    val seed2 = (50 until 70).map(_.toByte).toArray
    var st = initial(Config("repl", "secret", serverId = 100L, tls = true))
    st = onPayload(st, handshake(seed1, ssl = true)).state
    st = afterTlsUpgrade(st).state

    val sw = onPayload(st, authSwitchSha2(seed2))
    st = sw.state
    assert(st.phase == AwaitSha2MoreData)
    val Seq((4, _)) = sw.send // the 32-byte scramble proof, shifted seq

    // perform_full_authentication: legitimate over the encrypted stream —
    // the password goes in clear, NUL-terminated, no RSA round
    val full = onPayload(st, Array[Byte](0x01, 0x04))
    assert(full.state.phase == AwaitAuthResult)
    val Seq((6, pw)) = full.send
    assert(java.util.Arrays.equals(pw, "secret".getBytes :+ 0.toByte))
    assert(onPayload(full.state, ok).state.phase == AwaitChecksumAck)
  }
}
