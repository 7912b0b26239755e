package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MySQL wire-protocol codecs: framing, HandshakeV10, native-password
  * scramble (goldens computed independently with Python hashlib),
  * client command builders, OK/EOF/ERR classification.
  */
class MysqlProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- scramble: independent goldens (python hashlib, 2026-08-13) ------

  test("native_password scramble matches hashlib-computed vectors") {
    val seed = (1 to 20).map(_.toByte).toArray
    assert(MysqlProtocolCodec.nativePasswordAuth("secret".getBytes, seed).toSeq ==
      hx("b32bb3a583e1340c0a1108d58b1be49781ad8c2f").toSeq)
    assert(MysqlProtocolCodec.nativePasswordAuth(Array.emptyByteArray, seed).toSeq ==
      hx("60252de9f0fbe9f1526ec3ec3968223e50a072f8").toSeq)
    val seed2 = (100 until 120).map(_.toByte).toArray
    assert(MysqlProtocolCodec.nativePasswordAuth("p4ssw0rd!".getBytes, seed2).toSeq ==
      hx("36b0f4ce72fe8283a077bcec5fef2235614267b5").toSeq)
    // the expression form agrees
    val got = Seq(("secret".getBytes, seed)).toDF("p", "s")
      .select(hex(MysqlScramble(col("p"), col("s"))).as("h"))
      .as[String].head()
    assert(got.equalsIgnoreCase("b32bb3a583e1340c0a1108d58b1be49781ad8c2f"))
  }

  test("caching_sha2 fast-path scramble matches hashlib-computed vectors") {
    val seed = (1 to 20).map(_.toByte).toArray
    assert(MysqlProtocolCodec.cachingSha2Auth("secret".getBytes, seed).toSeq ==
      hx("746ebe205d56a0707acb3e796e834e0dd7b1d61743b26bd5202c7a623230c7c9").toSeq)
    val seed2 = (100 until 120).map(_.toByte).toArray
    assert(MysqlProtocolCodec.cachingSha2Auth("p4ssw0rd!".getBytes, seed2).toSeq ==
      hx("6dc06c46e097f8f7ea9855dc438a5fdaa6ffec0f8037ac1ddc2280f3c0aa14b9").toSeq)
    // empty password → empty proof (wire convention); bytes past the
    // 20-byte nonce are ignored (servers append a NUL the digest excludes)
    assert(MysqlProtocolCodec.cachingSha2Auth(Array.emptyByteArray, seed).isEmpty)
    assert(MysqlProtocolCodec.cachingSha2Auth("secret".getBytes, seed :+ 0.toByte).toSeq ==
      MysqlProtocolCodec.cachingSha2Auth("secret".getBytes, seed).toSeq)
    intercept[IllegalArgumentException] {
      MysqlProtocolCodec.cachingSha2Auth("x".getBytes, seed.take(19))
    }
  }

  test("caching_sha2 full-auth: XOR obfuscation golden + RSA-OAEP roundtrip") {
    val seed = (1 to 20).map(_.toByte).toArray
    // (password ++ NUL) XOR cyclic nonce — deterministic, hashlib-checked
    assert(MysqlProtocolCodec.xorPasswordWithSeed("secret".getBytes, seed).toSeq ==
      hx("72676076607207").toSeq)
    // a password longer than the nonce wraps the seed cyclically
    val long = MysqlProtocolCodec.xorPasswordWithSeed(("x" * 45).getBytes, seed)
    assert(long.length == 46 && (long(40) & 0xff) == ('x' ^ seed(0)))
    // PEM parse + OAEP encrypt: verified by decrypting with the private key
    val kp = java.security.KeyPairGenerator.getInstance("RSA")
    kp.initialize(2048)
    val pair = kp.generateKeyPair()
    val pem = "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(pair.getPublic.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"
    val key = MysqlProtocolCodec.parseRsaPublicKeyPem(pem)
    val plain = MysqlProtocolCodec.xorPasswordWithSeed("p4ss".getBytes, seed)
    val ct = MysqlProtocolCodec.rsaEncryptOaep(plain, key)
    assert(ct.length == 256) // 2048-bit modulus
    val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE, pair.getPrivate)
    assert(c.doFinal(ct).toSeq == plain.toSeq)
    intercept[java.security.spec.InvalidKeySpecException] {
      MysqlProtocolCodec.parseRsaPublicKeyPem("-----BEGIN PUBLIC KEY-----\n!!!\n-----END PUBLIC KEY-----")
    }
  }

  test("COM_REGISTER_SLAVE: byte-exact layout") {
    val got = MysqlProtocolCodec.encodeComRegisterSlave(100L, "replica-1",
      "repl", 3307)
    val want = Array[Byte](0x15, 100, 0, 0, 0) ++
      (9.toByte +: "replica-1".getBytes) ++
      (4.toByte +: "repl".getBytes) ++
      Array[Byte](0) ++ // empty report password
      Array[Byte]((3307 & 0xff).toByte, (3307 >> 8).toByte) ++
      new Array[Byte](8) // rank + master_id, both zero
    assert(got.toSeq == want.toSeq)
    intercept[IllegalArgumentException] {
      MysqlProtocolCodec.encodeComRegisterSlave(1L, "h" * 256, "u", 1)
    }
    intercept[IllegalArgumentException] {
      MysqlProtocolCodec.encodeComRegisterSlave(1L, "h", "u", 70000)
    }
  }

  // ---- HandshakeV10 ----------------------------------------------------

  /** Build a HandshakeV10 payload byte-exactly per the wire layout the
    * reference decodes (protocal.rs:21-77).
    */
  private def handshakePayload(caps: Long, authLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(10) // protocol version
    out.write("8.0.42-log".getBytes); out.write(0)
    out.write(Array[Byte](0x39, 0x30, 0, 0)) // thread id 12345 LE
    out.write((1 to 8).map(_.toByte).toArray) // seed part 1
    out.write(0) // filler
    out.write(((caps & 0xff)).toInt); out.write(((caps >> 8) & 0xff).toInt)
    out.write(0xff) // charset
    out.write(Array[Byte](2, 0)) // status = 2
    out.write(((caps >> 16) & 0xff).toInt); out.write(((caps >> 24) & 0xff).toInt)
    out.write(authLen)
    for (_ <- 0 until 10) out.write(0) // reserved
    if (authLen > 0) {
      out.write((9 to 20).map(_.toByte).toArray) // seed part 2 (12 bytes)
      out.write(0) // NUL inside the 13-byte chunk
    }
    if ((caps & MysqlProtocolCodec.ClientPluginAuth) != 0) {
      out.write("mysql_native_password".getBytes); out.write(0)
    }
    out.toByteArray
  }

  test("HandshakeV10 decode: split auth seed reassembles to 20 bytes") {
    val caps = MysqlProtocolCodec.ClientPluginAuth | 0x0000f7ffL
    val row = MysqlProtocolCodec.decodeHandshake(handshakePayload(caps, 21))
    assert(row.getInt(0) == 10)
    assert(row.getUTF8String(1).toString == "8.0.42-log")
    assert(row.getLong(2) == 12345L)
    assert((row.getLong(3) & MysqlProtocolCodec.ClientPluginAuth) != 0)
    assert(row.getInt(4) == 0xff)
    assert(row.getInt(5) == 2)
    assert(row.getUTF8String(6).toString == "mysql_native_password")
    assert(row.getBinary(7).toSeq == (1 to 20).map(_.toByte).toSeq)
    // handshake → scramble → response round-trip composes
    val proof = MysqlProtocolCodec.nativePasswordAuth("secret".getBytes, row.getBinary(7))
    assert(proof.toSeq == hx("b32bb3a583e1340c0a1108d58b1be49781ad8c2f").toSeq)
  }

  test("HandshakeV10 decode rejects wrong protocol version") {
    intercept[IllegalArgumentException] {
      MysqlProtocolCodec.decodeHandshake(Array(9.toByte, 0))
    }
  }

  // ---- HandshakeResponse41 / COM_* builders ----------------------------

  test("HandshakeResponse41 layout: caps gates each optional section") {
    val caps = MysqlProtocolCodec.ClientPluginAuth |
      MysqlProtocolCodec.ClientConnectWithDb
    val bs = MysqlProtocolCodec.encodeHandshakeResponse(
      caps, 1 << 24, 0xff, "repl", hx("aabbcc"), Some("db1"),
      Some("mysql_native_password"), Nil, 0)
    // caps u4 LE
    assert((bs(0) & 0xffL | ((bs(1) & 0xffL) << 8) | ((bs(2) & 0xffL) << 16) |
      ((bs(3) & 0xffL) << 24)) == caps)
    // 23 zero filler after caps+maxpacket+charset
    assert(bs.slice(9, 32).forall(_ == 0))
    assert(bs.slice(32, 37).toSeq == ("repl".getBytes.toSeq :+ 0.toByte))
    val afterUser = bs.drop(32 + 5)
    assert(afterUser(0) == 3 && afterUser.slice(1, 4).toSeq == hx("aabbcc").toSeq)
    assert(afterUser.drop(4).toSeq ==
      (("db1".getBytes.toSeq :+ 0.toByte) ++
        ("mysql_native_password".getBytes.toSeq :+ 0.toByte)) :+ 0.toByte)
  }

  test("connect-attrs block is prefixed by its BYTE length, not pair count") {
    val caps = MysqlProtocolCodec.ClientConnectAttrs
    val bs = MysqlProtocolCodec.encodeHandshakeResponse(
      caps, 1 << 24, 0xff, "u", Array.emptyByteArray, None, None,
      Seq("_client_name" -> "graft"), 0)
    // after user "u"+NUL at 32..34 and the 1-byte empty auth blob:
    val at = 32 + 2 + 1
    val kv = lenenc("_client_name") ++ lenenc("graft")
    assert((bs(at) & 0xff) == kv.length) // byte length (19), not 1
    assert(bs.slice(at + 1, at + 1 + kv.length).toSeq == kv.toSeq)
    assert(bs.length == at + 1 + kv.length + 1) // + zstd byte
  }

  private def lenenc(s: String): Array[Byte] =
    s.length.toByte +: s.getBytes("UTF-8")

  test("non-lenenc auth blob over 255 bytes is refused, not truncated") {
    intercept[IllegalArgumentException] {
      MysqlProtocolCodec.encodeHandshakeResponse(
        MysqlProtocolCodec.ClientPluginAuth, 1 << 24, 0xff, "u",
        new Array[Byte](256), None, Some("x"), Nil, 0)
    }
  }

  test("COM builders match the reference byte layouts") {
    assert(MysqlProtocolCodec.encodeComPing().toSeq == Seq(0x0e.toByte))
    assert(MysqlProtocolCodec.encodeComQuery("show master status").toSeq ==
      (0x03.toByte +: "show master status".getBytes.toSeq))
    val dump = MysqlProtocolCodec.encodeComBinlogDump(4L, 0, 1001L, "bin.000007")
    assert(dump(0) == 0x12)
    assert(dump.slice(1, 5).toSeq == Seq[Byte](4, 0, 0, 0))
    assert(dump.slice(5, 7).toSeq == Seq[Byte](0, 0))
    assert(dump.slice(7, 11).toSeq == Seq[Byte](0xe9.toByte, 3, 0, 0))
    assert(new String(dump.drop(11)) == "bin.000007")
  }

  test("COM_BINLOG_DUMP_GTID: auto-position round-trips the executed set") {
    val sets = Seq(
      "3e11fa47-71ca-11e1-9e33-c80aa9429562" -> Seq((1L, 77L), (80L, 80L)),
      "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee" -> Seq((5L, 9L)))
    val bs = MysqlProtocolCodec.encodeComBinlogDumpGtid(1001L, sets)
    assert(bs(0) == 0x1e)
    val (flags, sid, fn, pos, text) = MysqlProtocolCodec.decodeComBinlogDumpGtid(bs)
    assert(flags == MysqlProtocolCodec.BinlogThroughGtid)
    assert(sid == 1001L && fn == "" && pos == 4L)
    assert(text == "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-77:80," +
      "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:5-9")
    // text → sets parse is the exact inverse of the canonical rendering
    assert(BinlogGtidCodec.parseSetText(text) == sets)
    assert(BinlogGtidCodec.parseSetText("") == Nil)
    intercept[IllegalArgumentException](BinlogGtidCodec.parseSetText("nope"))
    intercept[IllegalArgumentException](
      BinlogGtidCodec.parseSetText("3e11fa47-71ca-11e1-9e33-c80aa9429562:9-5"))
    intercept[IllegalArgumentException](
      MysqlProtocolCodec.decodeComBinlogDumpGtid(bs.take(10)))
  }

  // ---- packet framing --------------------------------------------------

  test("packet framing round-trips and validates exactly") {
    val p1 = MysqlProtocolCodec.writePacket(0, hx("010203"))
    val p2 = MysqlProtocolCodec.writePacket(1, Array.emptyByteArray)
    val p3 = MysqlProtocolCodec.writePacket(2, "hello".getBytes)
    val arr = MysqlProtocolCodec.splitPackets(p1 ++ p2 ++ p3)
    assert(arr.numElements() == 3)
    val r3 = arr.getStruct(2, 2)
    assert(r3.getInt(0) == 2 && new String(r3.getBinary(1)) == "hello")
    intercept[IllegalArgumentException] {
      MysqlProtocolCodec.splitPackets((p1 ++ p2 ++ p3).dropRight(2))
    }
  }

  test("16MB continuation rule: large payloads split and reassemble exactly") {
    val M = MysqlProtocolCodec.MaxFrame
    // MaxFrame+5: one full frame + 5-byte terminator; exactly MaxFrame:
    // one full frame + EMPTY terminator (the corner that loses a packet
    // if the terminating-frame rule is skipped)
    for (n <- Seq(M + 5, M)) {
      val payload = new Array[Byte](n)
      var i = 0
      while (i < n) { payload(i) = (i * 31 + n).toByte; i += 97 }
      val framed = MysqlProtocolCodec.writePacket(3, payload)
      // wire shape: first frame claims MaxFrame, seq increments per frame
      assert((framed(0) & 0xff) == 0xff && (framed(1) & 0xff) == 0xff &&
        (framed(2) & 0xff) == 0xff)
      assert((framed(3) & 0xff) == 3)
      assert((framed(4 + M + 3) & 0xff) == 4)
      val tail = MysqlProtocolCodec.writePacket(5, "after".getBytes)
      val arr = MysqlProtocolCodec.splitPackets(framed ++ tail)
      assert(arr.numElements() == 2)
      val big = arr.getStruct(0, 2)
      assert(big.getInt(0) == 3)
      assert(java.util.Arrays.equals(big.getBinary(1), payload))
      assert(new String(arr.getStruct(1, 2).getBinary(1)) == "after")
    }
    intercept[IllegalArgumentException] { // ends inside a continued packet
      MysqlProtocolCodec.splitPackets(
        MysqlProtocolCodec.writePacket(0, new Array[Byte](M + 5)).dropRight(9))
    }
  }

  // ---- OK / EOF / ERR --------------------------------------------------

  test("OK/EOF/ERR classification with lenenc fields") {
    val ok = MysqlProtocolCodec.decodeOk(hx("00" + "fc1027" + "05" + "0200" + "0100"))
    assert(ok.getUTF8String(0).toString == "OK")
    assert(ok.getLong(1) == 10000L && ok.getLong(2) == 5L)
    assert(ok.getInt(3) == 2 && ok.getInt(4) == 1)
    // deprecated-EOF (CLIENT_DEPRECATE_EOF, reference mysql.rs:59): an
    // OK-layout packet with the 0xfe header at 9+ bytes
    val dep = MysqlProtocolCodec.decodeOk(
      hx("fe" + "00" + "00" + "0200" + "0000" + "0000"))
    assert(dep.getUTF8String(0).toString == "EOF")
    assert(dep.getInt(3) == 2)
    // classic 5-byte EOF (the mysql.rs:160 terminator heuristic):
    // warnings u2 then status u2 — NOT the lenenc OK layout
    val eof = MysqlProtocolCodec.decodeOk(hx("fe" + "0100" + "0200"))
    assert(eof.getUTF8String(0).toString == "EOF")
    assert(eof.getInt(3) == 2 && eof.getInt(4) == 1)
    val err = MysqlProtocolCodec.decodeOk(
      0xff.toByte +: (Array[Byte](0x48, 0x04) ++ "#HY000".getBytes ++
        "no such table".getBytes))
    assert(err.getUTF8String(0).toString == "ERR")
    assert(err.getInt(5) == 0x0448)
    assert(err.getUTF8String(6).toString == "HY000")
    assert(err.getUTF8String(7).toString == "no such table")
  }

  // ---- SQL registration ------------------------------------------------

  test("functions are SQL-registered via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT size(mysql_packet_split(unhex('03000000AABBCC'))) AS n")
      .as[Int].head()
    assert(n == 1)
    val kind = spark.sql(
      "SELECT mysql_ok_decode(unhex('FE01000200')).kind AS k").as[String].head()
    assert(kind == "EOF")
  }

  // ---- dump-session composition (the q120 shape, minimal) --------------

  test("COM_BINLOG_DUMP response stream replays to typed rows") {
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val ev = BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema,
        Seq(Seq[Any](42L))), packetMarker = true)
    val stream = MysqlProtocolCodec.writePacket(1, ev) ++
      MysqlProtocolCodec.writePacket(2, Array[Byte](0xfe.toByte, 0, 0, 2, 0))
    val ps = Seq(Tuple1(stream)).toDF("s")
      .select(explode(MysqlPacketSplit(col("s"))).as("p"))
      .select(col("p.seq").as("seq"), col("p.payload").as("payload"))
    val pk = ps.filter(expr("substring(payload, 1, 1) = X'00'"))
      .select(BinlogDecode.eventSplit(col("payload"), packetMarker = true).as("h"))
      .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(element_at(col("m"), "pk").cast("long").as("pk"))
      .as[Long].head()
    assert(pk == 42L)
    val eofKind = ps.filter(expr("substring(payload, 1, 1) = X'FE'"))
      .select(MysqlOkDecode(col("payload")).getField("kind").as("k"))
      .as[String].head()
    assert(eofKind == "EOF")
  }
}
