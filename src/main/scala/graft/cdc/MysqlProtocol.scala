package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MySQL client/server wire-protocol codecs — the byte layer under the
  * reference's replica registration (`/root/reference/src/protocal.rs:10-170`
  * handshake/auth, `:277-293` COM_BINLOG_DUMP, `:305-360` OK/ERR;
  * `/root/reference/src/mysql.rs:480-494` native-password scramble,
  * `:96-145` packet framing). The reference drives these over a live
  * socket; the socket loop itself is the declared transport exclusion
  * (SURVEY §2C), but every byte transform is pure and lives here:
  * frame/unframe packets, decode HandshakeV10, build HandshakeResponse41
  * with the SHA1 scramble, build COM_QUERY/COM_PING/COM_BINLOG_DUMP,
  * classify OK/EOF/ERR. A user pointing any transport (socket, proxy
  * capture, pcap export) at these codecs gets the reference's exact
  * session bytes — golden-tested against independently computed vectors.
  */
object MysqlProtocolCodec {

  // ---- packet framing (3-byte LE length + 1-byte sequence + payload) ---

  val packetType: StructType = StructType(Seq(
    StructField("seq", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Largest single-frame payload; a logical payload of this size or more
    * continues in the next frame and terminates at the first frame
    * shorter than it (the 16 MB continuation rule — an exactly-16MB-1
    * payload is followed by an empty terminating frame).
    */
  final val MaxFrame = 0xffffff

  /** Incremental frame drain — the ONE implementation of the framing +
    * 16 MB-continuation rules, shared by [[splitPackets]] (batch, must
    * consume everything) and [[graft.streaming.PacketReassembly]]
    * (streaming, keeps the undrained tail). Parses as many whole frames
    * from `bs(from..)` as available, merging [[MaxFrame]] continuations.
    *
    * @return (logical packets as (seq, payload), bytes consumed,
    *   continuation seq, continuation bytes accumulated but not yet
    *   terminated — null when no continuation is in flight)
    */
  def drainFrames(bs: Array[Byte], from: Int, contSeq0: Int,
      contBytes0: Array[Byte])
      : (Seq[(Int, Array[Byte])], Int, Int, Array[Byte]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var cont: java.io.ByteArrayOutputStream =
      if (contBytes0 == null) null
      else {
        val b = new java.io.ByteArrayOutputStream(contBytes0.length + 64)
        b.write(contBytes0, 0, contBytes0.length); b
      }
    var contSeq = contSeq0
    var pos = from
    var fits = true
    while (fits && bs.length - pos >= 4) {
      val len = (bs(pos) & 0xff) | ((bs(pos + 1) & 0xff) << 8) |
        ((bs(pos + 2) & 0xff) << 16)
      if (bs.length - pos < 4 + len) fits = false
      else {
        if (len == MaxFrame) {
          if (cont == null) {
            cont = new java.io.ByteArrayOutputStream(); contSeq = bs(pos + 3) & 0xff
          }
          cont.write(bs, pos + 4, len)
        } else if (cont != null) {
          cont.write(bs, pos + 4, len)
          out += ((contSeq, cont.toByteArray))
          cont = null
        } else {
          out += ((bs(pos + 3) & 0xff,
            java.util.Arrays.copyOfRange(bs, pos + 4, pos + 4 + len)))
        }
        pos += 4 + len
      }
    }
    (out.toSeq, pos - from, contSeq, if (cont == null) null else cont.toByteArray)
  }

  /** Split a contiguous packet stream into (seq, payload) logical packets:
    * frames of exactly [[MaxFrame]] bytes concatenate with their
    * continuation frames (seq = the first frame's). The framing is
    * validated exactly — a short tail throws rather than yielding a
    * garbage frame.
    */
  def splitPackets(stream: Array[Byte]): GenericArrayData = {
    val (pkts, consumed, contSeq, cont) = drainFrames(stream, 0, 0, null)
    if (cont != null) throw new IllegalArgumentException(
      s"stream ends inside a continued packet (seq $contSeq)")
    if (consumed < stream.length) {
      val left = stream.length - consumed
      if (left < 4) throw new IllegalArgumentException(
        s"truncated packet header at $consumed")
      val len = (stream(consumed) & 0xff) | ((stream(consumed + 1) & 0xff) << 8) |
        ((stream(consumed + 2) & 0xff) << 16)
      throw new IllegalArgumentException(
        s"packet at $consumed claims $len bytes; ${left - 4} left")
    }
    new GenericArrayData(pkts.map { case (s, p) => InternalRow(s, p) }.toArray[Any])
  }

  /** Frame one logical payload as wire packets, splitting into
    * [[MaxFrame]]-sized continuation frames (consecutive seq) past 16 MB.
    */
  def writePacket(seq: Int, payload: Array[Byte]): Array[Byte] = {
    if (payload.length < MaxFrame) {
      val out = new Array[Byte](4 + payload.length)
      out(0) = (payload.length & 0xff).toByte
      out(1) = ((payload.length >> 8) & 0xff).toByte
      out(2) = ((payload.length >> 16) & 0xff).toByte
      out(3) = (seq & 0xff).toByte
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    } else {
      val out = new java.io.ByteArrayOutputStream(payload.length + 64)
      var pos = 0
      var s = seq
      while (payload.length - pos >= MaxFrame) {
        out.write(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, (s & 0xff).toByte))
        out.write(payload, pos, MaxFrame)
        pos += MaxFrame; s += 1
      }
      // terminating frame — empty when the payload is a MaxFrame multiple
      val rest = payload.length - pos
      out.write(Array[Byte]((rest & 0xff).toByte, ((rest >> 8) & 0xff).toByte,
        ((rest >> 16) & 0xff).toByte, (s & 0xff).toByte))
      out.write(payload, pos, rest)
      out.toByteArray
    }
  }

  // ---- HandshakeV10 ----------------------------------------------------

  val handshakeType: StructType = StructType(Seq(
    StructField("protocol_version", IntegerType, nullable = false),
    StructField("server_version", StringType, nullable = false),
    StructField("thread_id", LongType, nullable = false),
    StructField("capabilities", LongType, nullable = false),
    StructField("charset", IntegerType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("auth_plugin_name", StringType, nullable = false),
    StructField("auth_plugin_data", BinaryType, nullable = false)))

  final val ClientPluginAuth = 0x00080000L
  final val ClientConnectWithDb = 0x00000008L
  final val ClientConnectAttrs = 0x00100000L
  final val ClientPluginAuthLenencData = 0x00200000L
  final val ClientSsl = 0x00000800L

  private final class Reader(bs: Array[Byte]) {
    var pos = 0
    private def need(n: Int): Unit =
      if (bs.length - pos < n) throw new IllegalArgumentException(
        s"truncated at $pos: need $n of ${bs.length - pos}")
    def u1(): Int = { need(1); pos += 1; bs(pos - 1) & 0xff }
    def uLE(n: Int): Long = {
      need(n); var v = 0L; var i = 0
      while (i < n) { v |= (bs(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += n; v
    }
    def bytes(n: Int): Array[Byte] = {
      need(n); pos += n
      java.util.Arrays.copyOfRange(bs, pos - n, pos)
    }
    def nulStr(): Array[Byte] = {
      val start = pos
      while (pos < bs.length && bs(pos) != 0) pos += 1
      if (pos >= bs.length) throw new IllegalArgumentException(
        s"unterminated string at $start")
      pos += 1
      java.util.Arrays.copyOfRange(bs, start, pos - 1)
    }
    def lenenc(): Long = u1() match {
      case v if v < 0xfb => v.toLong
      case 0xfc => uLE(2)
      case 0xfd => uLE(3)
      case 0xfe => uLE(8)
      case other => throw new IllegalArgumentException(s"bad lenenc tag $other")
    }
    def remaining: Int = bs.length - pos
  }

  /** Decode a HandshakeV10 payload (reference `protocal.rs:21-77`): the
    * auth seed arrives split as 8 bytes + max(13, len-8) bytes whose last
    * byte is a NUL terminator — the usable 20-byte scramble is the
    * concatenation without it.
    */
  def decodeHandshake(payload: Array[Byte]): InternalRow = {
    val r = new Reader(payload)
    val proto = r.u1()
    if (proto != 10)
      throw new IllegalArgumentException(s"unsupported handshake protocol $proto")
    val serverVersion = r.nulStr()
    val threadId = r.uLE(4)
    val seed1 = r.bytes(8)
    r.u1() // filler
    val capsLow = r.uLE(2)
    val charset = r.u1()
    val status = r.uLE(2).toInt
    val capsHigh = r.uLE(2)
    val caps = capsLow | (capsHigh << 16)
    val authLen = r.u1()
    r.bytes(10) // reserved
    val seed2 =
      if (authLen > 0) r.bytes(math.max(13, authLen - 8)) else Array.emptyByteArray
    val plugin =
      if ((caps & ClientPluginAuth) != 0) r.nulStr() else Array.emptyByteArray
    // drop the NUL terminator inside the second seed chunk
    val seed = seed1 ++ (if (seed2.nonEmpty && seed2.last == 0) seed2.dropRight(1) else seed2)
    InternalRow(proto, UTF8String.fromBytes(serverVersion), threadId, caps,
      charset, status, UTF8String.fromBytes(plugin), seed)
  }

  // ---- mysql_native_password scramble ----------------------------------

  /** SHA1(pass) XOR SHA1(seed[0..20] ++ SHA1(SHA1(pass))) — the
    * mysql_native_password proof (reference `mysql.rs:480-494`).
    */
  def nativePasswordAuth(password: Array[Byte], seed: Array[Byte]): Array[Byte] = {
    require(seed.length >= 20, s"auth seed must carry 20 bytes, got ${seed.length}")
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    val h1 = sha1.digest(password)
    sha1.reset()
    val h2 = sha1.digest(h1)
    sha1.reset()
    sha1.update(seed, 0, 20)
    val multi = sha1.digest(h2)
    val out = new Array[Byte](20)
    var i = 0
    while (i < 20) { out(i) = (h1(i) ^ multi(i)).toByte; i += 1 }
    out
  }

  // ---- caching_sha2_password fast-path scramble -------------------------

  /** SHA256(pass) XOR SHA256(SHA256(SHA256(pass)) ++ seed[0..20]) — the
    * caching_sha2_password FAST-PATH proof (the MySQL 8.0+ default
    * plugin; public algorithm, 32 bytes). The fast path succeeds whenever
    * the server has the account's SHA256 digest cached; a cache miss
    * triggers `perform_full_authentication` (RSA/TLS), which the session
    * machine refuses loudly rather than send password material.
    * Convention: an empty password sends an empty proof.
    */
  def cachingSha2Auth(password: Array[Byte], seed: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    require(seed.length >= 20, s"auth seed must carry 20 bytes, got ${seed.length}")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val h1 = sha.digest(password)
    sha.reset()
    val h2 = sha.digest(h1)
    sha.reset()
    sha.update(h2)
    sha.update(seed, 0, 20)
    val h3 = sha.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) { out(i) = (h1(i) ^ h3(i)).toByte; i += 1 }
    out
  }

  // ---- caching_sha2_password RSA full-auth path -------------------------

  /** Full-auth plaintext obfuscation: (password ++ NUL) XOR the 20-byte
    * nonce repeated cyclically — what the client RSA-encrypts when the
    * server's digest cache misses on a non-TLS connection (public
    * protocol; the XOR binds the ciphertext to this session's nonce so a
    * captured blob cannot be replayed against a new handshake).
    */
  def xorPasswordWithSeed(password: Array[Byte], seed: Array[Byte]): Array[Byte] = {
    require(seed.length >= 20, s"auth seed must carry 20 bytes, got ${seed.length}")
    val buf = password :+ 0.toByte
    val out = new Array[Byte](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = (buf(i) ^ seed(i % 20)).toByte; i += 1 }
    out
  }

  /** Parses the PEM `-----BEGIN PUBLIC KEY-----` (X.509 SubjectPublicKeyInfo)
    * blob the server sends in AuthMoreData after a public-key request.
    */
  def parseRsaPublicKeyPem(pem: String): java.security.PublicKey = {
    val body = pem.linesIterator
      .filterNot(l => l.contains("-----") || l.isBlank)
      .mkString
    val der = java.util.Base64.getMimeDecoder.decode(body)
    java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
  }

  /** RSA-OAEP(SHA-1/MGF1) encryption of the obfuscated password — MySQL's
    * RSA_PKCS1_OAEP_PADDING. NOT deterministic (OAEP is randomized by
    * design); tests verify by decrypting with the private key.
    */
  def rsaEncryptOaep(data: Array[Byte], key: java.security.PublicKey): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, key)
    c.doFinal(data)
  }

  // ---- client-side packet builders ------------------------------------

  private def writeLE(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** HandshakeResponse41 (reference `protocal.rs:95-131`). */
  /** SSLRequest (Protocol::SSLRequest): the 32-byte prefix of a
    * HandshakeResponse41 — u4 capabilities (must carry [[ClientSsl]]),
    * u4 max packet, u1 charset, 23 zero filler. The client sends this
    * INSTEAD of the full response, upgrades the transport to TLS, then
    * sends the full HandshakeResponse41 (same caps) over the encrypted
    * stream with the next sequence number.
    */
  def encodeSslRequest(caps: Long, maxPacket: Long, charset: Int): Array[Byte] = {
    require((caps & ClientSsl) != 0, "SSLRequest needs CLIENT_SSL in caps")
    val out = new java.io.ByteArrayOutputStream(32)
    writeLE(out, caps, 4)
    writeLE(out, maxPacket, 4)
    out.write(charset)
    for (_ <- 0 until 23) out.write(0)
    out.toByteArray
  }

  def encodeHandshakeResponse(caps: Long, maxPacket: Long, charset: Int,
      user: String, authResp: Array[Byte], database: Option[String],
      pluginName: Option[String], attrs: Seq[(String, String)],
      zstdLevel: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeLE(out, caps, 4)
    writeLE(out, maxPacket, 4)
    out.write(charset)
    for (_ <- 0 until 23) out.write(0)
    out.write(user.getBytes("UTF-8")); out.write(0)
    if ((caps & ClientPluginAuthLenencData) != 0) writeLenenc(out, authResp)
    else {
      // one length byte on the wire in this branch — a longer blob would
      // silently truncate the length and desynchronize the packet
      require(authResp.length <= 255,
        s"auth response is ${authResp.length} bytes; needs ClientPluginAuthLenencData")
      out.write(authResp.length); out.write(authResp, 0, authResp.length)
    }
    if ((caps & ClientConnectWithDb) != 0) {
      out.write(database.getOrElse("default").getBytes("UTF-8")); out.write(0)
    }
    if ((caps & ClientPluginAuth) != 0) {
      out.write(pluginName.getOrElse("").getBytes("UTF-8")); out.write(0)
    }
    if ((caps & ClientConnectAttrs) != 0) {
      val body = new java.io.ByteArrayOutputStream()
      attrs.foreach { case (k, v) =>
        writeLenenc(body, k.getBytes("UTF-8")); writeLenenc(body, v.getBytes("UTF-8"))
      }
      // the lenenc prefix is the BYTE length of the kv block, not the
      // pair count (the reference only ever sends empty attrs, where the
      // two coincide as lenenc(0))
      writeLenencInt(out, body.size.toLong)
      val b = body.toByteArray; out.write(b, 0, b.length)
    }
    // trailing zstd level unconditionally, matching the reference byte
    // stream (protocal.rs:125) — per the documented protocol the byte is
    // only present under CLIENT_ZSTD_COMPRESSION_ALGORITHM; real servers
    // tolerate the tail
    out.write(zstdLevel)
    out.toByteArray
  }

  private def writeLenencInt(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v < 0xfb) out.write(v.toInt)
    else if (v < (1L << 16)) { out.write(0xfc); writeLE(out, v, 2) }
    else if (v < (1L << 24)) { out.write(0xfd); writeLE(out, v, 3) }
    else { out.write(0xfe); writeLE(out, v, 8) }

  private def writeLenenc(out: java.io.ByteArrayOutputStream, bs: Array[Byte]): Unit = {
    writeLenencInt(out, bs.length.toLong)
    out.write(bs, 0, bs.length)
  }

  /** COM_BINLOG_DUMP (0x12): pos u4, flags u2, server_id u4, filename
    * (reference `protocal.rs:277-293`).
    */
  def encodeComBinlogDump(pos: Long, flags: Int, serverId: Long,
      filename: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x12)
    writeLE(out, pos, 4)
    writeLE(out, flags.toLong, 2)
    writeLE(out, serverId, 4)
    out.write(filename.getBytes("UTF-8"))
    out.toByteArray
  }

  /** BINLOG_THROUGH_GTID flag of COM_BINLOG_DUMP_GTID. */
  final val BinlogThroughGtid = 0x04

  /** COM_BINLOG_DUMP_GTID (0x1e) — GTID auto-position replication
    * (beyond-reference: `protocal.rs` builds only the file+pos dump):
    * flags u2, server_id u4, filename_size u4 + filename, pos u8, and
    * under BINLOG_THROUGH_GTID a u4-sized SID block — n_sids u8, then per
    * sid 16 uuid bytes, n_intervals u8, (start u8, end-exclusive u8)* —
    * the same encoding PREVIOUS_GTIDS bodies carry. The server resumes
    * from the first transaction NOT covered by the set; file/pos become
    * advisory (the auto-position convention sends '' / 4).
    */
  def encodeComBinlogDumpGtid(serverId: Long,
      gtidSet: Seq[(String, Seq[(Long, Long)])], filename: String = "",
      pos: Long = 4L, flags: Int = BinlogThroughGtid): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1e)
    writeLE(out, flags.toLong, 2)
    writeLE(out, serverId, 4)
    val fn = filename.getBytes("UTF-8")
    writeLE(out, fn.length.toLong, 4)
    out.write(fn)
    writeLE(out, pos, 8)
    if ((flags & BinlogThroughGtid) != 0) {
      // PREVIOUS_GTIDS body layout minus the engine's 4-byte tail
      val sidBlock = BinlogGtidCodec.encodePreviousGtids(gtidSet).dropRight(4)
      writeLE(out, sidBlock.length.toLong, 4)
      out.write(sidBlock)
    }
    out.toByteArray
  }

  /** Decode [[encodeComBinlogDumpGtid]] (spec/round-trip use): returns
    * (flags, server_id, filename, pos, canonical gtid-set text).
    */
  def decodeComBinlogDumpGtid(bs: Array[Byte]): (Int, Long, String, Long, String) = {
    require(bs.length >= 1 + 2 + 4 + 4 + 8 && (bs(0) & 0xff) == 0x1e,
      s"not a COM_BINLOG_DUMP_GTID packet (${bs.length} bytes)")
    val flags = BinlogRowCodec.uLE(bs, 1, 2).toInt
    val serverId = BinlogRowCodec.uLE(bs, 3, 4)
    val fnLen = BinlogRowCodec.uLE(bs, 7, 4).toInt
    require(bs.length >= 11 + fnLen + 8, "truncated COM_BINLOG_DUMP_GTID filename")
    val fn = new String(bs, 11, fnLen, "UTF-8")
    val pos = BinlogRowCodec.uLE(bs, 11 + fnLen, 8)
    val text = if ((flags & BinlogThroughGtid) == 0) "" else {
      val at = 11 + fnLen + 8
      require(bs.length >= at + 4, "truncated COM_BINLOG_DUMP_GTID data_size")
      val size = BinlogRowCodec.uLE(bs, at, 4).toInt
      require(bs.length >= at + 4 + size, "truncated COM_BINLOG_DUMP_GTID SID block")
      // reuse the event-body decoder: it expects the engine tail
      BinlogGtidCodec.decodePreviousGtids(
        java.util.Arrays.copyOfRange(bs, at + 4, at + 4 + size) ++
          Array[Byte](0, 0, 0, 0)).toString
    }
    (flags, serverId, fn, pos, text)
  }

  /** COM_QUERY (0x03) — reference `protocal.rs:177-183`. */
  def encodeComQuery(query: String): Array[Byte] =
    0x03.toByte +: query.getBytes("UTF-8")

  /** COM_PING (0x0e) — reference `protocal.rs:296-303`. */
  def encodeComPing(): Array[Byte] = Array(0x0e.toByte)

  /** COM_REGISTER_SLAVE (0x15) — beyond-reference: the registration a
    * real replica sends before COM_BINLOG_DUMP so it appears in the
    * master's `SHOW REPLICAS` and report-host bookkeeping (some managed
    * masters require it). Public layout: server_id u32, then
    * u8-length-prefixed report-host / user / password, port u16,
    * replication rank u32 (ignored by servers) and master_id u32 (0 =
    * "let the master fill it"). The password field is conventionally
    * empty — it is reporting metadata, not authentication.
    */
  def encodeComRegisterSlave(serverId: Long, reportHost: String,
      reportUser: String, reportPort: Int): Array[Byte] = {
    def lstr(s: String, what: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      require(b.length <= 255, s"$what exceeds the u8 length prefix: ${b.length}")
      b.length.toByte +: b
    }
    require(reportPort >= 0 && reportPort <= 0xffff, s"bad port $reportPort")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x15)
    writeLE(out, serverId, 4)
    out.write(lstr(reportHost, "report host"))
    out.write(lstr(reportUser, "report user"))
    out.write(lstr("", "report password"))
    writeLE(out, reportPort.toLong, 2)
    writeLE(out, 0L, 4) // replication rank (unused by servers)
    writeLE(out, 0L, 4) // master id: 0 = assigned by the master
    out.toByteArray
  }

  // ---- OK / EOF / ERR classification ----------------------------------

  val okType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false), // OK | EOF | ERR
    StructField("affected_rows", LongType, nullable = false),
    StructField("last_insert_id", LongType, nullable = false),
    StructField("status_flags", IntegerType, nullable = false),
    StructField("warnings", IntegerType, nullable = false),
    StructField("error_code", IntegerType, nullable = false),
    StructField("sql_state", StringType, nullable = false),
    StructField("message", StringType, nullable = false)))

  /** Classify a server response payload (reference `protocal.rs:305-360`,
    * EOF heuristic `mysql.rs:160`): 0x00 → OK, 0xfe under 9 bytes → the
    * classic EOF layout (warnings u2, status u2 — the reference's hot loop
    * detects these by the heuristic alone because it negotiates
    * CLIENT_DEPRECATE_EOF), 0xfe at 9+ → deprecated-EOF OK layout,
    * 0xff → ERR (code u2, '#'+sqlstate 5, message).
    */
  def decodeOk(payload: Array[Byte]): InternalRow = {
    require(payload.nonEmpty, "empty server response")
    val r = new Reader(payload)
    (r.u1(): @annotation.switch) match {
      case 0xff =>
        val code = r.uLE(2).toInt
        val state =
          if (r.remaining > 0 && payload(r.pos) == '#') { r.u1(); r.bytes(5) }
          else Array.emptyByteArray
        val msg = r.bytes(r.remaining)
        InternalRow(UTF8String.fromString("ERR"), 0L, 0L, 0, 0, code,
          UTF8String.fromBytes(state), UTF8String.fromBytes(msg))
      case 0xfe if payload.length < 9 =>
        val warnings = r.uLE(2).toInt
        val status = r.uLE(2).toInt
        InternalRow(UTF8String.fromString("EOF"), 0L, 0L, status, warnings,
          0, UTF8String.fromString(""), UTF8String.fromString(""))
      case first =>
        val kind = if (first == 0xfe) "EOF" else "OK"
        val affected = r.lenenc()
        val lastId = r.lenenc()
        val status = r.uLE(2).toInt
        val warnings = r.uLE(2).toInt
        InternalRow(UTF8String.fromString(kind), affected, lastId, status,
          warnings, 0, UTF8String.fromString(""), UTF8String.fromString(""))
    }
  }
}

/** Codegen'd packet-stream split: bytes → array<struct<seq, payload>>. */
case class MysqlPacketSplit(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(MysqlProtocolCodec.packetType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MysqlPacketSplit expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    MysqlProtocolCodec.splitPackets(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.MysqlProtocolCodec.splitPackets($c)")
  override protected def withNewChildInternal(newChild: Expression): MysqlPacketSplit =
    copy(child = newChild)
}

object MysqlPacketSplit {
  def apply(stream: Column): Column =
    ColumnBridge.column(MysqlPacketSplit(ColumnBridge.expression(stream)))
}

/** Codegen'd HandshakeV10 decode: payload bytes → handshake struct. */
case class MysqlHandshakeDecode(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = MysqlProtocolCodec.handshakeType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MysqlHandshakeDecode expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    MysqlProtocolCodec.decodeHandshake(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.MysqlProtocolCodec.decodeHandshake($c)")
  override protected def withNewChildInternal(newChild: Expression): MysqlHandshakeDecode =
    copy(child = newChild)
}

object MysqlHandshakeDecode {
  def apply(payload: Column): Column =
    ColumnBridge.column(MysqlHandshakeDecode(ColumnBridge.expression(payload)))
}

/** Codegen'd mysql_native_password scramble: (password, seed) → 20 bytes. */
case class MysqlScramble(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"MysqlScramble expects (BINARY password, BINARY seed), got (${l.sql}, ${r.sql})")
    }
  override protected def nullSafeEval(pass: Any, seed: Any): Any =
    MysqlProtocolCodec.nativePasswordAuth(
      pass.asInstanceOf[Array[Byte]], seed.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, s) =>
      s"graft.cdc.MysqlProtocolCodec.nativePasswordAuth($p, $s)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MysqlScramble =
    copy(left = newLeft, right = newRight)
}

object MysqlScramble {
  def apply(password: Column, seed: Column): Column =
    ColumnBridge.column(MysqlScramble(
      ColumnBridge.expression(password), ColumnBridge.expression(seed)))
}

/** Codegen'd OK/EOF/ERR classification: payload bytes → response struct. */
case class MysqlOkDecode(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = MysqlProtocolCodec.okType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MysqlOkDecode expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    MysqlProtocolCodec.decodeOk(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.MysqlProtocolCodec.decodeOk($c)")
  override protected def withNewChildInternal(newChild: Expression): MysqlOkDecode =
    copy(child = newChild)
}

object MysqlOkDecode {
  def apply(payload: Column): Column =
    ColumnBridge.column(MysqlOkDecode(ColumnBridge.expression(payload)))
}
