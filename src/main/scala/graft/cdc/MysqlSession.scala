package graft.cdc

/** The reference's replica bring-up as a PURE state machine
  * (`/root/reference/src/mysql.rs:47-94` login + auth switch,
  * `main.rs:80-101` checksum ack, `show master status`, COM_BINLOG_DUMP,
  * `main.rs:110-130` the event loop). The reference interleaves this
  * orchestration with blocking socket reads; here every transition is
  * `onPayload(state, packetPayload) => (state', packetsToSend, event?)`,
  * so ANY transport — a live socket a user owns, a proxy capture, a pcap
  * replay — can drive the session by folding received payloads through it
  * and writing back `send`. Combined with [[MysqlProtocolCodec]] (framing)
  * and [[graft.streaming.PacketReassembly]] (chunk reassembly), this
  * completes the socket-free replication client: the engine's declared
  * transport exclusion is now exactly the `TcpStream` calls, nothing else.
  */
object MysqlReplicaSession {

  sealed trait Phase
  /** Server speaks first: HandshakeV10 expected. */
  case object AwaitHandshake extends Phase
  /** SSLRequest sent; the transport must now upgrade the stream to TLS
    * and call [[afterTlsUpgrade]] — NO server packet is legal in between
    * (the client speaks next, over the encrypted stream).
    */
  case object AwaitTlsUpgrade extends Phase
  /** HandshakeResponse41 sent; AuthSwitchRequest expected (the reference
    * always takes the switch path — it sends an empty auth response).
    */
  case object AwaitAuthSwitch extends Phase
  /** Scramble proof sent; OK expected. */
  case object AwaitAuthResult extends Phase
  /** caching_sha2 fast-path proof sent; AuthMoreData (0x01 0x03 =
    * fast_auth_success, 0x01 0x04 = perform_full_authentication) or a
    * direct OK (empty-password accounts) expected.
    */
  case object AwaitSha2MoreData extends Phase
  /** Full auth, public key requested (0x02 sent); AuthMoreData carrying
    * the server's PEM RSA key expected. Only reachable with
    * `rsaFullAuth = true`.
    */
  case object AwaitSha2PublicKey extends Phase
  /** Checksum-session ack expected (OK). */
  case object AwaitChecksumAck extends Phase
  /** `set @rpl_semi_sync_slave= 1` ack expected (OK) — semi-sync only. */
  case object AwaitSemiSyncAck extends Phase
  /** COM_REGISTER_SLAVE ack expected (OK) — only with `registerSlave`. */
  case object AwaitRegisterAck extends Phase
  /** `show master status` sent; text-result-set column count expected. */
  case object AwaitStatusColCount extends Phase
  /** Column-definition packets expected, then rows. */
  final case class AwaitStatusCols(remaining: Int) extends Phase
  /** Row packets expected until the 0xfe terminator. Under the classic
    * (non-DEPRECATE_EOF) protocol an EOF also separates the column
    * definitions from the rows; `colEofSeen` tracks whether that one has
    * been consumed.
    */
  final case class AwaitStatusRows(colEofSeen: Boolean) extends Phase
  /** COM_BINLOG_DUMP sent; every further packet is an event or EOF/ERR. */
  case object Streaming extends Phase
  /** Server said ERR (or protocol violation); terminal. */
  final case class Failed(reason: String) extends Phase

  /** @param resumeAt overrides the master's (file, pos) — the reference's
    *   saved-position path (`check_valid_pos`); None = from `show master
    *   status` (its from-scratch path).
    * @param resumeGtids canonical gtid_executed text — when set, the dump
    *   command becomes COM_BINLOG_DUMP_GTID auto-position (the server
    *   resumes at the first uncovered transaction; file/pos are advisory
    *   and `resumeAt` is ignored). Beyond-reference: the reference only
    *   dumps by file+pos.
    */
  /** @param semiSync register as a semi-sync replica (the public
    *   rpl_semi_sync plugin protocol): `set @rpl_semi_sync_slave= 1` is
    *   announced before the dump, every dump event then arrives with the
    *   2-byte `0xef` magic + ack-flag prefix after the packet marker, and
    *   a flagged event triggers an ACK packet (`0xef` + u8 LE end-log-pos
    *   + current binlog file name) back to the master. Beyond-reference.
    */
  /** @param rsaFullAuth opt-in for caching_sha2's full-auth path on a
    *   non-TLS connection: on a server digest-cache miss the client
    *   requests the server's RSA public key and sends the nonce-XOR'd
    *   password RSA-OAEP-encrypted (the public protocol). Default FALSE —
    *   without it a cache miss fails loudly, because key-on-the-wire RSA
    *   is trust-on-first-use (a MITM could substitute its own key); opt
    *   in only where the network path is trusted.
    */
  /** @param registerSlave (report-host, report-port) — when set, a
    *   COM_REGISTER_SLAVE goes out before the dump so this replica shows
    *   in the master's `SHOW REPLICAS` (beyond-reference; some managed
    *   masters require registration).
    */
  /** @param tls upgrade the connection to TLS before authenticating (the
    *   Protocol::SSLRequest dance): the short 32-byte SSLRequest goes out
    *   in place of the HandshakeResponse, the transport wraps the socket,
    *   and the full response + auth continue encrypted. Fails loudly when
    *   the server did not advertise CLIENT_SSL. Beyond-reference (the
    *   reference declares the flag, `protocal.rs:417-418`, but never
    *   implements the upgrade). With TLS active, caching_sha2's
    *   perform_full_authentication becomes legitimate: the cleartext
    *   password goes NUL-terminated over the encrypted stream (the
    *   public protocol), no RSA needed.
    * @param tlsVerify true = verify the server certificate against the
    *   JVM default trust store (mysql's ssl-mode=VERIFY_CA posture);
    *   false = encrypt without verifying (parity with mysql's default
    *   ssl-mode=REQUIRED, which also skips verification).
    */
  final case class Config(user: String, password: String, serverId: Long,
      resumeAt: Option[(String, Long)] = None, maxPacket: Long = 1L << 24,
      resumeGtids: Option[String] = None, semiSync: Boolean = false,
      rsaFullAuth: Boolean = false,
      registerSlave: Option[(String, Int)] = None,
      tls: Boolean = false, tlsVerify: Boolean = false)

  /** `currentFile`/`checksumLen` exist for semi-sync ACKs: the file name
    * tracks the dump-start file and every ROTATE that flows by (its name
    * field excludes the trailing CRC when the FDE declared CRC32 —
    * `checksumLen` is learned from the FDE's alg byte as it passes).
    */
  /** `seqOff` is 1 once an SSLRequest has consumed a handshake-phase
    * sequence number (every later client packet in the auth exchange
    * shifts by one); command phases reset to seq 0 and are unaffected.
    * `statusRetried` marks the one-shot MySQL 8.4 fallback from
    * `show master status` to `SHOW BINARY LOG STATUS`.
    */
  final case class State(phase: Phase, config: Config,
      seed: Array[Byte] = Array.emptyByteArray,
      masterFile: String = "", masterPos: Long = 0L,
      serverCaps: Long = 0L, currentFile: String = "", checksumLen: Int = 0,
      seqOff: Int = 0, statusRetried: Boolean = false)

  final val SemiSyncMagic = 0xef

  /** One transition: packets to send (seq, payload) and, in the streaming
    * phase, the whole binlog event carried by this packet (marker
    * stripped), ready for `BinlogDecode.eventSplit`.
    */
  /** `upgradeTls` tells the transport: after writing `send`, wrap the
    * stream in TLS and call [[afterTlsUpgrade]] for the next client
    * packets — the fold stays pure, the transport owns the handshake.
    */
  final case class Step(state: State, send: Seq[(Int, Array[Byte])] = Nil,
      event: Option[Array[Byte]] = None, upgradeTls: Boolean = false)

  // the reference's exact capability set (mysql.rs:53-60) — including
  // CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA even though the first response
  // carries an empty auth blob (lenenc(0) and a 0 length byte coincide)
  final val Caps: Long = 0x00000001L | 0x00000200L | 0x00004000L |
    0x00008000L | (1L << 24) | MysqlProtocolCodec.ClientPluginAuth |
    MysqlProtocolCodec.ClientPluginAuthLenencData

  final val ClientDeprecateEof: Long = 1L << 24

  /** DEPRECATE_EOF is in effect only when both sides advertised it. */
  private def deprecateEof(st: State): Boolean =
    (st.serverCaps & ClientDeprecateEof) != 0

  def initial(config: Config): State = State(AwaitHandshake, config)

  /** Called by the transport once the stream is TLS-wrapped (phase must
    * be [[AwaitTlsUpgrade]]): emits the full HandshakeResponse41 — same
    * capabilities the SSLRequest carried — as the next sequence number,
    * over the now-encrypted stream.
    */
  def afterTlsUpgrade(st: State): Step = st.phase match {
    case AwaitTlsUpgrade =>
      val resp = MysqlProtocolCodec.encodeHandshakeResponse(
        Caps | MysqlProtocolCodec.ClientSsl, st.config.maxPacket, 0xff,
        st.config.user, Array.emptyByteArray, None,
        Some("mysql_native_password"), Nil, 0)
      Step(st.copy(phase = AwaitAuthSwitch), send = Seq(2 -> resp))
    case other =>
      fail(st, s"afterTlsUpgrade called in phase $other")
  }

  private def fail(st: State, reason: String): Step =
    Step(st.copy(phase = Failed(reason)))

  /** After the session variables are acked: register as a named replica
    * when configured, else go straight to the master-position query.
    */
  private def afterSessionSetup(st: State): Step = st.config.registerSlave match {
    case Some((host, port)) =>
      Step(st.copy(phase = AwaitRegisterAck), send = Seq(
        0 -> MysqlProtocolCodec.encodeComRegisterSlave(
          st.config.serverId, host, st.config.user, port)))
    case None =>
      Step(st.copy(phase = AwaitStatusColCount), send = Seq(
        0 -> MysqlProtocolCodec.encodeComQuery("show master status")))
  }

  /** Pure-fold contract: NEVER throws — any decode failure (truncated or
    * adversarial capture bytes) lands in [[Failed]] like every protocol
    * violation does.
    */
  def onPayload(st: State, payload: Array[Byte]): Step =
    try step(st, payload) catch {
      case e: IllegalArgumentException =>
        fail(st, s"malformed packet in ${st.phase}: ${e.getMessage}")
    }

  private def step(st: State, payload: Array[Byte]): Step = {
    if (st.phase.isInstanceOf[Failed]) return Step(st) // sink: keep the root cause
    if (payload.isEmpty) return fail(st, "empty packet payload")
    val first = payload(0) & 0xff
    st.phase match {
      // MySQL 8.4 REMOVED `show master status` (parse error 1064); retry
      // once with the renamed `SHOW BINARY LOG STATUS` — same result-set
      // shape (File, Position, ...), so every later transition is shared.
      // Only the parse-error code retries: a permission ERR must not loop.
      case AwaitStatusColCount
          if first == 0xff && !st.statusRetried &&
            MysqlProtocolCodec.decodeOk(payload).getInt(5) == 1064 =>
        Step(st.copy(statusRetried = true), send = Seq(
          0 -> MysqlProtocolCodec.encodeComQuery("show binary log status")))

      case _ if first == 0xff =>
        val err = MysqlProtocolCodec.decodeOk(payload)
        fail(st, s"server ERR ${err.getInt(5)}: ${err.getUTF8String(7)}")

      case AwaitHandshake =>
        val hs = MysqlProtocolCodec.decodeHandshake(payload)
        val seed = hs.getBinary(7)
        val serverCaps = hs.getLong(3)
        if (st.config.tls) {
          if ((serverCaps & MysqlProtocolCodec.ClientSsl) == 0)
            fail(st, "tls requested but the server did not advertise " +
              "CLIENT_SSL (ssl is disabled on the master)")
          else
            // SSLRequest consumes seq 1; the transport upgrades, then
            // afterTlsUpgrade sends the full response as seq 2
            Step(st.copy(phase = AwaitTlsUpgrade, seed = seed,
              serverCaps = serverCaps, seqOff = 1),
              send = Seq(1 -> MysqlProtocolCodec.encodeSslRequest(
                Caps | MysqlProtocolCodec.ClientSsl, st.config.maxPacket, 0xff)),
              upgradeTls = true)
        } else {
          val resp = MysqlProtocolCodec.encodeHandshakeResponse(
            Caps, st.config.maxPacket, 0xff, st.config.user,
            Array.emptyByteArray, None, Some("mysql_native_password"), Nil, 0)
          Step(st.copy(phase = AwaitAuthSwitch, seed = seed,
            serverCaps = serverCaps), send = Seq(1 -> resp))
        }

      case AwaitTlsUpgrade =>
        // the client speaks next (over TLS); any server packet here means
        // the transport skipped the upgrade or the server jumped the gun
        fail(st, "unexpected server packet while awaiting the TLS upgrade")

      case AwaitAuthSwitch if first == 0x00 =>
        // fast path: empty-password accounts get OK directly, no switch
        Step(st.copy(phase = AwaitChecksumAck), send = Seq(
          0 -> MysqlProtocolCodec.encodeComQuery(
            "set @master_binlog_checksum= @@global.binlog_checksum")))
      case AwaitAuthSwitch if first == 0xfe =>
        // AuthSwitchRequest: 0xfe, plugin name NUL, fresh seed
        var pos = 1
        while (pos < payload.length && payload(pos) != 0) pos += 1
        if (pos >= payload.length)
          fail(st, "malformed AuthSwitchRequest: unterminated plugin name")
        else {
          val plugin = new String(payload, 1, pos - 1, "UTF-8")
          val rest = java.util.Arrays.copyOfRange(payload, pos + 1, payload.length)
          val seed = if (rest.nonEmpty && rest.last == 0) rest.dropRight(1) else rest
          val useSeed = if (seed.length >= 20) seed else st.seed
          plugin match {
            case "mysql_native_password" =>
              val proof = MysqlProtocolCodec.nativePasswordAuth(
                st.config.password.getBytes("UTF-8"), useSeed)
              Step(st.copy(phase = AwaitAuthResult, seed = useSeed),
                send = Seq((3 + st.seqOff) -> proof))
            case "caching_sha2_password" =>
              // MySQL 8.0+ default plugin (reference stops at native —
              // mysql.rs:480-494; a stock 8.0 account lands here first)
              val proof = MysqlProtocolCodec.cachingSha2Auth(
                st.config.password.getBytes("UTF-8"), useSeed)
              Step(st.copy(phase = AwaitSha2MoreData, seed = useSeed),
                send = Seq((3 + st.seqOff) -> proof))
            case other =>
              fail(st, s"unsupported auth plugin $other")
          }
        }
      case AwaitAuthSwitch =>
        fail(st, f"expected AuthSwitchRequest, got first byte 0x$first%02x")

      case AwaitAuthResult =>
        // OK → ack binlog checksums, then ask for the master position
        Step(st.copy(phase = AwaitChecksumAck), send = Seq(
          0 -> MysqlProtocolCodec.encodeComQuery(
            "set @master_binlog_checksum= @@global.binlog_checksum")))

      case AwaitSha2MoreData if first == 0x00 =>
        // direct OK: empty-password accounts skip the AuthMoreData round
        Step(st.copy(phase = AwaitChecksumAck), send = Seq(
          0 -> MysqlProtocolCodec.encodeComQuery(
            "set @master_binlog_checksum= @@global.binlog_checksum")))
      case AwaitSha2MoreData if first == 0x01 =>
        // AuthMoreData: 0x03 = fast_auth_success (a bare OK follows, no
        // client bytes in between), 0x04 = perform_full_authentication —
        // the server's digest cache missed and it wants the cleartext
        // password under TLS or RSA. Refuse LOUDLY: this client never
        // transports password material; any TLS login (mysql CLI) primes
        // the cache, after which the fast path succeeds.
        if (payload.length < 2) fail(st, "empty AuthMoreData packet")
        else (payload(1) & 0xff) match {
          case 0x03 => Step(st.copy(phase = AwaitAuthResult))
          case 0x04 if st.config.tls =>
            // full auth over an ENCRYPTED stream: the cleartext password
            // goes NUL-terminated — the public protocol's TLS path (no
            // RSA round needed; the transport already upgraded). When the
            // stream is encrypted but UNVERIFIED (tlsVerify = false, the
            // ssl-mode=REQUIRED parity posture), the password is MITM-able
            // despite the encryption — warn loudly rather than silently.
            if (!st.config.tlsVerify)
              System.err.println("[graft-cdc] WARNING: sending cleartext " +
                "password for caching_sha2 full auth over a TLS stream " +
                "whose server certificate was NOT verified (tlsVerify = " +
                "false); an active MITM can capture it. Set tlsVerify = " +
                "true for this path.")
            Step(st.copy(phase = AwaitAuthResult), send = Seq(
              (5 + st.seqOff) ->
                (st.config.password.getBytes("UTF-8") :+ 0.toByte)))
          case 0x04 if st.config.rsaFullAuth =>
            // request the server's RSA public key (single 0x02 byte)
            Step(st.copy(phase = AwaitSha2PublicKey),
              send = Seq((5 + st.seqOff) -> Array(0x02.toByte)))
          case 0x04 => fail(st, "caching_sha2_password requested full " +
            "authentication (server-side digest cache miss): refusing to " +
            "send the password without TLS/RSA — log in once over TLS to " +
            "prime the cache, or opt in with rsaFullAuth = true on a " +
            "trusted network path")
          case other => fail(st, f"unexpected AuthMoreData tag 0x$other%02x")
        }
      case AwaitSha2PublicKey if first == 0x01 =>
        // AuthMoreData carrying the PEM public key: encrypt the
        // nonce-XOR'd password with RSA-OAEP and send it
        try {
          val pem = new String(payload, 1, payload.length - 1, "UTF-8")
          val key = MysqlProtocolCodec.parseRsaPublicKeyPem(pem)
          val ct = MysqlProtocolCodec.rsaEncryptOaep(
            MysqlProtocolCodec.xorPasswordWithSeed(
              st.config.password.getBytes("UTF-8"), st.seed), key)
          Step(st.copy(phase = AwaitAuthResult),
            send = Seq((7 + st.seqOff) -> ct))
        } catch {
          case e @ (_: java.security.GeneralSecurityException |
              _: IllegalArgumentException) =>
            fail(st, s"bad server RSA public key: ${e.getMessage}")
        }
      case AwaitSha2PublicKey =>
        fail(st, f"expected the server's RSA key (AuthMoreData), got " +
          f"first byte 0x$first%02x")
      case AwaitSha2MoreData =>
        fail(st, f"expected AuthMoreData or OK after the caching_sha2 " +
          f"proof, got first byte 0x$first%02x")

      case AwaitChecksumAck if st.config.semiSync =>
        Step(st.copy(phase = AwaitSemiSyncAck), send = Seq(
          0 -> MysqlProtocolCodec.encodeComQuery("set @rpl_semi_sync_slave= 1")))
      case AwaitChecksumAck => afterSessionSetup(st)

      case AwaitSemiSyncAck => afterSessionSetup(st)

      case AwaitRegisterAck =>
        Step(st.copy(phase = AwaitStatusColCount), send = Seq(
          0 -> MysqlProtocolCodec.encodeComQuery("show master status")))

      case AwaitStatusColCount =>
        // lenenc column count (one raw byte only below 0xfb)
        val n = first match {
          case v if v < 0xfb => v.toLong
          case 0xfc if payload.length >= 3 => le(payload, 1, 2)
          case 0xfd if payload.length >= 4 => le(payload, 1, 3)
          case 0xfe if payload.length >= 9 => le(payload, 1, 8)
          case _ => -1L
        }
        if (n <= 0 || n > 4096) fail(st, s"bad result-set column count $n")
        else Step(st.copy(phase = AwaitStatusCols(n.toInt)))

      case AwaitStatusCols(n) =>
        if (n > 1) Step(st.copy(phase = AwaitStatusCols(n - 1)))
        // under DEPRECATE_EOF there is no col-def terminator to consume
        else Step(st.copy(phase = AwaitStatusRows(colEofSeen = deprecateEof(st))))

      // terminator: a classic <9-byte EOF always; under negotiated
      // DEPRECATE_EOF the terminator is an OK packet with the 0xfe header
      // at ANY length (it may carry status info past 9 bytes) — a row
      // cell never starts with lenenc tag 0xfe at these sizes
      case AwaitStatusRows(colEofSeen)
          if first == 0xfe && (payload.length < 9 || deprecateEof(st)) =>
        if (!colEofSeen) // classic protocol: this EOF just ends the col defs
          Step(st.copy(phase = AwaitStatusRows(colEofSeen = true)))
        else st.config.resumeGtids match {
          case Some(text) =>
            // GTID auto-position: the executed set names the resume point;
            // file/pos are advisory ('' / 4 by convention)
            try Step(st.copy(phase = Streaming), // currentFile: first ROTATE names it
              send = Seq(0 -> MysqlProtocolCodec.encodeComBinlogDumpGtid(
                st.config.serverId, BinlogGtidCodec.parseSetText(text))))
            catch { case e: IllegalArgumentException =>
              fail(st, s"bad resume GTID set: ${e.getMessage}")
            }
          case None =>
            // result set done → dump from the chosen position
            val (file, pos) = st.config.resumeAt.getOrElse((st.masterFile, st.masterPos))
            if (file.isEmpty) fail(st, "master status returned no binlog file")
            else if (pos < 0 || pos > 0xffffffffL)
              // COM_BINLOG_DUMP carries a u4 position — truncating would
              // silently dump from a wrong mid-event offset
              fail(st, s"binlog position $pos does not fit COM_BINLOG_DUMP's u4 field")
            else Step(st.copy(phase = Streaming, currentFile = file),
              send = Seq(0 -> MysqlProtocolCodec.encodeComBinlogDump(
                pos, 0, st.config.serverId, file)))
        }

      case AwaitStatusRows(_) =>
        // text-protocol row: lenenc cells File, Position, ... — keep the
        // FIRST row like the reference's TextResultSet walk (later rows
        // are ignored WITHOUT decoding; their contents are irrelevant)
        if (st.masterFile.nonEmpty) Step(st)
        else try {
          val cells = decodeTextRow(payload)
          if (cells.length < 2 || cells(0) == null || cells(1) == null)
            fail(st, s"malformed master status row (${cells.length} cells)")
          else Step(st.copy(masterFile = cells(0), masterPos = cells(1).toLong))
        } catch {
          case _: NumberFormatException =>
            fail(st, "bad master position (not a number)")
        }

      case Streaming if first == 0xfe && payload.length < 9 =>
        fail(st, "server closed the dump stream (EOF)")
      case Streaming if first == 0x00 =>
        if (!st.config.semiSync)
          Step(st, event = Some(
            java.util.Arrays.copyOfRange(payload, 1, payload.length)))
        else if (payload.length < 3 || (payload(1) & 0xff) != SemiSyncMagic)
          fail(st, "semi-sync dump packet missing the 0xef magic prefix")
        else {
          val ackWanted = (payload(2) & 0xff) == 1
          val event = java.util.Arrays.copyOfRange(payload, 3, payload.length)
          // Track the ack coordinates as events flow by: the FDE's alg
          // byte (5 bytes from the event end) says whether ROTATE names
          // carry a trailing CRC; a ROTATE then renames the current file.
          var st2 = st
          if (event.length >= 19) {
            val tpe = event(4) & 0xff
            if (tpe == BinlogFileCodec.FdeType && event.length >= 24) {
              val alg = event(event.length - 5) & 0xff
              st2 = st2.copy(checksumLen = if (alg == 0) 0 else 4)
            } else if (tpe == BinlogFileCodec.RotateType &&
                event.length >= 19 + 8 + st2.checksumLen) {
              st2 = st2.copy(currentFile = new String(event, 19 + 8,
                event.length - 19 - 8 - st2.checksumLen, "UTF-8"))
            }
          }
          val send = if (!ackWanted) Nil else {
            val logPos = le(event, 13, 4) // the event's end position
            val out = new java.io.ByteArrayOutputStream
            out.write(SemiSyncMagic)
            var i = 0
            while (i < 8) { out.write(((logPos >> (8 * i)) & 0xff).toInt); i += 1 }
            out.write(st2.currentFile.getBytes("UTF-8"))
            Seq(0 -> out.toByteArray)
          }
          Step(st2, send = send, event = Some(event))
        }
      case Streaming =>
        fail(st, f"unexpected marker 0x$first%02x in dump stream")

      case _: Failed => Step(st) // unreachable: step() returns early on Failed
    }
  }

  /** Text-protocol result row: lenenc-string cells, 0xfb = NULL. */
  def decodeTextRow(payload: Array[Byte]): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < payload.length) {
      val tag = payload(pos) & 0xff
      if (tag == 0xfb) { out += null; pos += 1 }
      else {
        val (len, used) = tag match {
          case v if v < 0xfb => (v.toLong, 1)
          case 0xfc => (le(payload, pos + 1, 2), 3)
          case 0xfd => (le(payload, pos + 1, 3), 4)
          case 0xfe => (le(payload, pos + 1, 8), 9)
          case other => throw new IllegalArgumentException(s"bad lenenc tag $other")
        }
        val start = pos + used
        // len is an UNSIGNED u64 landing in a signed Long: a adversarial
        // 8-byte length can be negative here, which would pass a plain
        // upper-bound check and reach String with a negative count
        if (len < 0 || start + len > payload.length)
          throw new IllegalArgumentException(
            s"cell at $pos claims $len bytes; ${payload.length - start} left")
        out += new String(payload, start, len.toInt, "UTF-8")
        pos = start + len.toInt
      }
    }
    out.toArray
  }

  private def le(bs: Array[Byte], at: Int, n: Int): Long = {
    require(at + n <= bs.length, s"truncated lenenc at $at")
    var v = 0L; var i = 0
    while (i < n) { v |= (bs(at + i) & 0xffL) << (8 * i); i += 1 }
    v
  }
}
