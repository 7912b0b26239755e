package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** TRANSACTION_PAYLOAD_EVENT (type 40) codec — MySQL 8.0.20+'s
  * binlog_transaction_compression wraps a whole transaction's events in
  * one zstd-compressed envelope; a replica consumer that cannot open it
  * sees only opaque type-40 blobs where the transaction used to be. The
  * reference predates the format entirely (`/root/reference/src/
  * binlog.rs` has no type-40 arm), so this is beyond-reference coverage
  * any MySQL 8 source needs.
  *
  * Wire layout (public: MySQL `libbinlogevents/src/control_events.cpp`,
  * `Transaction_payload_event`): the body is a TLV header — per field a
  * lenenc type, lenenc length, then the value (numeric values themselves
  * lenenc-coded) — terminated by the bare HEADER_END_MARK type, followed
  * by the payload bytes. Fields: payload size (1), compression type (2:
  * 0 = ZSTD, 255 = NONE), uncompressed size (3); unknown field types are
  * skipped by their length (the format's own forward-compat rule). The
  * decompressed payload is a back-to-back run of binlog events framed by
  * each 19-byte header's event_size, with NO per-event checksum — the
  * outer event's CRC already covers every byte. Extracted bodies are
  * re-tailed with 4 zero bytes per the engine-wide convention
  * ([[BinlogFileCodec.decodeFile]] does the same).
  *
  * Scale note: decode is per-EVENT (one compressed transaction per input
  * value), so task memory is bounded by the largest single transaction —
  * the same bound [[graft.streaming.TxnStream]] already carries — and
  * events parallelize across tasks untouched.
  */
object BinlogTxnPayloadCodec {

  final val TxnPayloadType = 40
  final val CompressionZstd = 0
  final val CompressionNone = 255

  // TLV field types (control_events.h OTW_PAYLOAD_*)
  private final val HeaderEndMark = 0
  private final val PayloadSizeField = 1
  private final val CompressionTypeField = 2
  private final val UncompressedSizeField = 3

  /** Refuse adversarial uncompressed-size claims before allocating: a
    * transaction cannot exceed MySQL's 1 GiB max_binlog_size anyway.
    */
  final val MaxUncompressed: Long = 1L << 30

  private final val HeaderLen = 19

  private def lenenc(bs: Array[Byte], pos: Int): (Long, Int) = {
    if (pos >= bs.length)
      throw new IllegalArgumentException(
        s"truncated TRANSACTION_PAYLOAD header at offset $pos")
    (bs(pos) & 0xff) match {
      case v if v < 0xfb => (v.toLong, pos + 1)
      case 0xfc => (BinlogRowCodec.uLE(bs, pos + 1, 2), pos + 3)
      case 0xfd => (BinlogRowCodec.uLE(bs, pos + 1, 3), pos + 4)
      case 0xfe => (BinlogRowCodec.uLE(bs, pos + 1, 8), pos + 9)
      case other => throw new IllegalArgumentException(
        s"invalid lenenc tag 0x${other.toHexString} in TRANSACTION_PAYLOAD header")
    }
  }

  /** TP event body (tailed, per the engine convention) → the embedded
    * events as headerType rows with re-tailed bodies. Malformed TLV
    * headers, size mismatches, and oversized claims throw — silently
    * skipping a payload would drop whole transactions.
    */
  def decodePayload(body: Array[Byte]): GenericArrayData = {
    require(body.length >= 4,
      s"TRANSACTION_PAYLOAD body shorter than its tail: ${body.length}")
    val end = body.length - 4 // engine-convention tail is not TLV data
    var pos = 0
    var compression = CompressionNone
    var payloadSize = -1L
    var uncompressedSize = -1L
    var done = false
    while (!done) {
      val (tpe, p1) = lenenc(body, pos)
      pos = p1
      if (tpe == HeaderEndMark) done = true
      else {
        val (len, p2) = lenenc(body, pos)
        pos = p2
        tpe match {
          case PayloadSizeField =>
            val (v, p3) = lenenc(body, pos); payloadSize = v; pos = p3
          case CompressionTypeField =>
            val (v, p3) = lenenc(body, pos); compression = v.toInt; pos = p3
          case UncompressedSizeField =>
            val (v, p3) = lenenc(body, pos); uncompressedSize = v; pos = p3
          case _ =>
            // unknown field: skip by length (format forward-compat rule)
            if (pos + len > end) throw new IllegalArgumentException(
              s"TRANSACTION_PAYLOAD field $tpe overruns the body")
            pos += len.toInt
        }
      }
    }
    if (payloadSize < 0) payloadSize = (end - pos).toLong
    if (pos + payloadSize > end)
      throw new IllegalArgumentException(
        s"TRANSACTION_PAYLOAD claims $payloadSize payload bytes; ${end - pos} left")
    val payload = java.util.Arrays.copyOfRange(body, pos, pos + payloadSize.toInt)
    val events = compression match {
      case CompressionNone => payload
      case CompressionZstd =>
        if (uncompressedSize < 0 || uncompressedSize > MaxUncompressed)
          throw new IllegalArgumentException(
            s"TRANSACTION_PAYLOAD claims $uncompressedSize uncompressed bytes")
        val out = com.github.luben.zstd.Zstd.decompress(payload, uncompressedSize.toInt)
        if (out.length != uncompressedSize)
          throw new IllegalArgumentException(
            s"TRANSACTION_PAYLOAD inflated to ${out.length}, claimed $uncompressedSize")
        out
      case other => throw new IllegalArgumentException(
        s"unknown TRANSACTION_PAYLOAD compression type $other")
    }
    // Split the embedded event run — event_size framing, no magic, no FDE,
    // no per-event CRC; bodies re-tailed to the engine convention.
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = 0
    while (p < events.length) {
      if (p + HeaderLen > events.length)
        throw new IllegalArgumentException(
          s"truncated embedded event header at payload offset $p of ${events.length}")
      val ts = BinlogRowCodec.uLE(events, p, 4)
      val tpe = events(p + 4) & 0xff
      val serverId = BinlogRowCodec.uLE(events, p + 5, 4)
      val eventSize = BinlogRowCodec.uLE(events, p + 9, 4)
      val logPos = BinlogRowCodec.uLE(events, p + 13, 4)
      val flags = BinlogRowCodec.uLE(events, p + 17, 2).toInt
      if (eventSize < HeaderLen || p + eventSize > events.length)
        throw new IllegalArgumentException(
          s"embedded event at payload offset $p claims $eventSize bytes; " +
            s"${events.length - p} left")
      val rawLen = eventSize.toInt - HeaderLen
      val evBody = new Array[Byte](rawLen + 4)
      System.arraycopy(events, p + HeaderLen, evBody, 0, rawLen)
      out += InternalRow(ts, tpe, serverId, eventSize, logPos, flags, evBody)
      p += eventSize.toInt
    }
    new GenericArrayData(out.toArray[Any])
  }

  // ---- fixture/test encode side ---------------------------------------

  private def writeLenenc(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v < 0xfb) out.write(v.toInt)
    else if (v <= 0xffff) { out.write(0xfc); BinlogRowCodec.writeLE(out, v, 2) }
    else if (v <= 0xffffff) { out.write(0xfd); BinlogRowCodec.writeLE(out, v, 3) }
    else { out.write(0xfe); BinlogRowCodec.writeLE(out, v, 8) }

  private def lenencBytes(v: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(9)
    writeLenenc(out, v)
    out.toByteArray
  }

  /** Assemble a TP event BODY (tailed) from (event_type, tailed-body)
    * events: embedded events are written in the real payload format
    * (header + raw body, event_size excluding the convention tail, no
    * per-event CRC), concatenated, optionally zstd-compressed, framed by
    * the TLV header.
    */
  def encodePayload(events: Seq[(Int, Array[Byte])], compress: Boolean,
      serverId: Long = 1L, timestamp: Long = 0L): Array[Byte] = {
    val raw = new java.io.ByteArrayOutputStream()
    events.foreach { case (tpe, tailedBody) =>
      require(tailedBody.length >= 4,
        s"tailed body shorter than its 4-byte tail: ${tailedBody.length}")
      val rawLen = tailedBody.length - 4
      BinlogRowCodec.writeLE(raw, timestamp, 4)
      raw.write(tpe)
      BinlogRowCodec.writeLE(raw, serverId, 4)
      BinlogRowCodec.writeLE(raw, (HeaderLen + rawLen).toLong, 4)
      BinlogRowCodec.writeLE(raw, 0L, 4) // log_pos: 0 inside payloads
      BinlogRowCodec.writeLE(raw, 0L, 2)
      raw.write(tailedBody, 0, rawLen)
    }
    val uncompressed = raw.toByteArray
    val payload =
      if (compress) com.github.luben.zstd.Zstd.compress(uncompressed, 3)
      else uncompressed
    val out = new java.io.ByteArrayOutputStream()
    def field(tpe: Int, value: Long): Unit = {
      writeLenenc(out, tpe.toLong)
      val vb = lenencBytes(value)
      writeLenenc(out, vb.length.toLong)
      out.write(vb, 0, vb.length)
    }
    field(CompressionTypeField, if (compress) CompressionZstd else CompressionNone)
    if (compress) field(UncompressedSizeField, uncompressed.length.toLong)
    field(PayloadSizeField, payload.length.toLong)
    writeLenenc(out, HeaderEndMark.toLong)
    out.write(payload, 0, payload.length)
    out.write(Array[Byte](0, 0, 0, 0), 0, 4) // engine-convention tail
    out.toByteArray
  }
}

/** Codegen'd TRANSACTION_PAYLOAD split: BINARY body → array of embedded
  * event structs (headerType, tailed bodies).
  */
case class BinlogTxnPayloadSplit(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(BinlogRowCodec.headerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogTxnPayloadSplit expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogTxnPayloadCodec.decodePayload(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogTxnPayloadCodec.decodePayload($c)")
  override protected def withNewChildInternal(
      newChild: Expression): BinlogTxnPayloadSplit =
    copy(child = newChild)
}

object BinlogTxnPayloadSplit {
  def apply(body: Column): Column =
    ColumnBridge.column(BinlogTxnPayloadSplit(ColumnBridge.expression(body)))
}
