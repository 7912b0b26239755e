package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binlog FILE replay: whole `mysqlbinlog`-shaped file bytes → the event
  * stream [[BinlogRowCodec]] already decodes. Closes the reference's
  * file-chain gap (ROTATE/FORMAT_DESCRIPTION dispatch,
  * `/root/reference/src/binlog.rs:768-828`, `main.rs:115-124`): the live
  * engine starts at bytes-on-wire, this starts at bytes-on-disk.
  *
  * File layout (public MySQL binlog format): 4-byte magic 0xfe 'b' 'i' 'n',
  * then events back-to-back, each framed by its 19-byte common header's
  * event_size. The first event is a FORMAT_DESCRIPTION (type 15) whose
  * tail carries the checksum algorithm byte (at body_len-5) + its own
  * CRC32; when the algorithm is CRC32(1), every subsequent event ends with
  * 4 CRC bytes that are VERIFIED and stripped before row decode. A ROTATE
  * (type 4) names the next file in the chain (8-byte position + name).
  *
  * Scale note: decode is per-FILE (one array of events per input row), so
  * task memory is bounded by MySQL's max_binlog_size (1 GiB hard cap,
  * commonly ~256 MiB) — a constant, not data-scale; files themselves
  * parallelize across tasks via binaryFile / one-row-per-file inputs.
  */
object BinlogFileCodec {

  final val Magic: Array[Byte] = Array(0xfe.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte)
  final val RotateType = 4
  final val FdeType = 15
  final val ChecksumCrc32 = 1
  private final val HeaderLen = 19
  private final val FdeTailLen = 5 // alg byte + FDE's own CRC32

  private def u4le(bs: Array[Byte], at: Int): Long = BinlogRowCodec.uLE(bs, at, 4)

  private def crc32(bs: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bs, from, len)
    c.getValue
  }

  /** Whole file → array of headerType rows. Bodies are NORMALIZED to the
    * engine-wide convention every stream-path decoder assumes — a 4-byte
    * trailing tail ([[BinlogRowCodec.encodeRows]]): the verified CRC (or
    * the FDE's alg+CRC tail) is stripped and four zero bytes take its
    * place, so QUERY statements don't lose their last 4 bytes and a ≤4-byte
    * final row image isn't silently dropped when file-replay events flow
    * into [[Transactions]] / [[BinlogRowsDecode]]. Malformed input throws
    * with the file offset — silent misframing would decode garbage rows
    * downstream.
    */
  def decodeFile(file: Array[Byte]): GenericArrayData = {
    require(file.length >= 4 && file(0) == Magic(0) && file(1) == Magic(1) &&
      file(2) == Magic(2) && file(3) == Magic(3),
      s"not a binlog file: bad magic in ${file.length}-byte input")
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var pos = 4
    var checksummed = false
    while (pos < file.length) {
      if (pos + HeaderLen > file.length)
        throw new IllegalArgumentException(
          s"truncated event header at offset $pos of ${file.length}")
      val ts = u4le(file, pos)
      val tpe = file(pos + 4) & 0xff
      val serverId = u4le(file, pos + 5)
      val eventSize = u4le(file, pos + 9)
      val logPos = u4le(file, pos + 13)
      val flags = ((file(pos + 17) & 0xff) | ((file(pos + 18) & 0xff) << 8))
      if (eventSize < HeaderLen || pos + eventSize > file.length)
        throw new IllegalArgumentException(
          s"event at offset $pos claims $eventSize bytes; file has ${file.length - pos} left")
      val end = pos + eventSize.toInt
      // The format writes exactly one FORMAT_DESCRIPTION, always first.
      // Enforcing both directions closes the two type-byte corruption
      // holes: a corrupted FDE type byte would otherwise leave
      // `checksummed` false (silently skipping ALL CRC verification),
      // and a mid-file event type corrupted INTO FdeType would pass the
      // FDE-CRC check (same trailing-CRC layout as a checksummed event)
      // and let its arbitrary alg byte flip verification off.
      if (pos == 4 && tpe != FdeType)
        throw new IllegalArgumentException(
          s"binlog file must start with a FORMAT_DESCRIPTION (type $FdeType) event; got type $tpe")
      if (pos != 4 && tpe == FdeType)
        throw new IllegalArgumentException(
          s"unexpected FORMAT_DESCRIPTION at mid-file offset $pos")
      val bodyEnd =
        if (tpe == FdeType) {
          // FDE tail: checksum_alg byte sits 5 bytes from the event end
          // (1 alg + 4 CRC over the FDE itself, present regardless of alg).
          val algAt = end - FdeTailLen
          if (algAt < pos + HeaderLen)
            throw new IllegalArgumentException(s"FORMAT_DESCRIPTION too short at $pos")
          val alg = file(algAt) & 0xff
          // The server writes the FDE's own CRC regardless of the declared
          // algorithm, so verify it UNCONDITIONALLY — otherwise corrupting
          // the (unauthenticated) alg byte would silently disable all CRC
          // verification for the rest of the file.
          if (crc32(file, pos, eventSize.toInt - 4) != u4le(file, end - 4))
            throw new IllegalArgumentException(s"FORMAT_DESCRIPTION CRC mismatch at $pos")
          if (alg != 0 && alg != ChecksumCrc32)
            throw new IllegalArgumentException(
              s"unknown binlog checksum algorithm $alg in FORMAT_DESCRIPTION at $pos")
          checksummed = alg == ChecksumCrc32
          algAt
        } else if (checksummed) {
          if (crc32(file, pos, eventSize.toInt - 4) != u4le(file, end - 4))
            throw new IllegalArgumentException(
              s"CRC32 mismatch in event type $tpe at offset $pos")
          end - 4
        } else end
      // +4 zero bytes: normalize to the tailed-body convention (see doc)
      val bodyLen = bodyEnd - (pos + HeaderLen)
      val body = new Array[Byte](bodyLen + 4)
      System.arraycopy(file, pos + HeaderLen, body, 0, bodyLen)
      out += InternalRow(ts, tpe, serverId, eventSize, logPos, flags, body)
      pos = end
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** ROTATE body (8-byte next position + file name + 4-byte tail, per the
    * tailed-body convention) → next file name. The tail is dropped — a
    * stream-path ROTATE carries its CRC there, a file-path one the
    * normalization zeros; either way those bytes are not name text.
    */
  def rotateNextName(body: Array[Byte]): UTF8String = {
    require(body.length >= 12, s"ROTATE body too short: ${body.length}")
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(body, 8, body.length - 4))
  }

  /** HEARTBEAT_LOG_EVENT (type 27): the master's idle keep-alive — the
    * body is just the current binlog file name (no NUL, no extra fields;
    * the header's log_pos carries the position). Never written to binlog
    * FILES, only to the dump stream; consumers use it to advance their
    * saved position past quiet periods without any row traffic. The
    * reference drops unknown types on the floor (`binlog.rs` has no
    * type-27 arm); here the name is surfaced so a checkpointer can
    * persist (file, log_pos) from heartbeats alone.
    */
  final val HeartbeatType = 27

  def heartbeatLogName(body: Array[Byte]): UTF8String = {
    require(body.length >= 4, s"HEARTBEAT body too short: ${body.length}")
    // tailed-body convention: the engine normalizes every body to carry a
    // 4-byte checksum/zero tail
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(body, 0, body.length - 4))
  }

  // ---- fixture/test encode side ---------------------------------------

  private def writeLE(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit =
    BinlogRowCodec.writeLE(out, v, n)

  /** FORMAT_DESCRIPTION body sans tail: binlog_version 4, padded server
    * version, create_ts, common header length, post-header-length table.
    */
  private def fdeBody(serverVersion: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeLE(out, 4L, 2)
    val sv = serverVersion.getBytes("UTF-8").take(50)
    out.write(sv, 0, sv.length)
    for (_ <- sv.length until 50) out.write(0)
    writeLE(out, 0L, 4) // create_timestamp
    out.write(HeaderLen)
    for (_ <- 0 until 39) out.write(0) // post-header lengths (unused here)
    out.toByteArray
  }

  def encodeRotateBody(nextName: String, position: Long = 4L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeLE(out, position, 8)
    val nm = nextName.getBytes("UTF-8")
    out.write(nm, 0, nm.length)
    out.write(Array[Byte](0, 0, 0, 0), 0, 4) // zero tail (engine convention)
    out.toByteArray
  }

  /** Assemble a whole binlog file: magic, FDE (declaring `checksum`), the
    * given (event_type, body) events, then a ROTATE to `nextFile` if set.
    * log_pos chains cumulatively exactly as the server writes it.
    *
    * Bodies must follow the engine-wide tailed convention (every fixture
    * encoder appends a 4-byte zero tail); on disk that tail is REPLACED by
    * the event's CRC32 when `checksum` is set and dropped when it is not —
    * header + payload [+ CRC], byte-for-byte the server's layout, never a
    * zero tail AND a CRC. [[decodeFile]] restores the zero tail on read,
    * so encode→decode round-trips to the exact fixture bodies.
    */
  def encodeFile(events: Seq[(Int, Array[Byte])], checksum: Boolean,
      nextFile: Option[String] = None, serverId: Long = 1L,
      timestamp: Long = 0L, serverVersion: String = "5.7.30-log"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    var logPos = 4L

    def emit(tpe: Int, tailedBody: Array[Byte], fdeTail: Boolean): Unit = {
      // The FDE body is built locally sans tail; every other body arrives
      // tailed and the tail is not part of the on-disk payload.
      val body =
        if (fdeTail) tailedBody
        else {
          require(tailedBody.length >= 4,
            s"tailed body shorter than its 4-byte tail: ${tailedBody.length}")
          java.util.Arrays.copyOfRange(tailedBody, 0, tailedBody.length - 4)
        }
      val crcLen = if (fdeTail || checksum) 4 else 0
      val tailLen = (if (fdeTail) 1 else 0) + crcLen
      val eventSize = HeaderLen + body.length + tailLen
      logPos += eventSize
      val ev = new java.io.ByteArrayOutputStream(eventSize)
      writeLE(ev, timestamp, 4)
      ev.write(tpe)
      writeLE(ev, serverId, 4)
      writeLE(ev, eventSize.toLong, 4)
      writeLE(ev, logPos, 4)
      writeLE(ev, 0L, 2)
      ev.write(body, 0, body.length)
      if (fdeTail) ev.write(if (checksum) ChecksumCrc32 else 0)
      if (crcLen == 4) {
        val soFar = ev.toByteArray
        writeLE(ev, crc32(soFar, 0, soFar.length), 4)
      }
      val bytes = ev.toByteArray
      out.write(bytes, 0, bytes.length)
    }

    emit(FdeType, fdeBody(serverVersion), fdeTail = true)
    events.foreach { case (tpe, body) => emit(tpe, body, fdeTail = false) }
    nextFile.foreach(n => emit(RotateType, encodeRotateBody(n), fdeTail = false))
    out.toByteArray
  }
}

/** Codegen'd whole-file split: binlog file bytes → array of event structs
  * (headerType), CRC-verified and stripped per the file's own FDE.
  */
case class BinlogFileSplit(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(BinlogRowCodec.headerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogFileSplit expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogFileCodec.decodeFile(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogFileCodec.decodeFile($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogFileSplit =
    copy(child = newChild)
}

object BinlogFileSplit {
  def apply(file: Column): Column =
    ColumnBridge.column(BinlogFileSplit(ColumnBridge.expression(file)))
}

/** Codegen'd ROTATE-body → next binlog file name. */
case class BinlogRotateName(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogRotateName expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogFileCodec.rotateNextName(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogFileCodec.rotateNextName($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogRotateName =
    copy(child = newChild)
}

object BinlogRotateName {
  def apply(body: Column): Column =
    ColumnBridge.column(BinlogRotateName(ColumnBridge.expression(body)))
}
