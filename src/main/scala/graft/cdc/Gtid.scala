package graft.cdc

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GTID event codecs — the modern replication position the reference
  * lacks entirely (it resumes by file+pos only, `/root/reference/src/
  * main.rs:84-99`): GTID_LOG_EVENT (type 33) names the transaction that
  * follows it as `uuid:gno`, PREVIOUS_GTIDS_LOG_EVENT (type 35) opens
  * every binlog file with the set of transactions already applied. A
  * consumer tracking these can fail over between replicas, which
  * file+pos positions cannot do. Layouts are the public control-event
  * formats (MySQL `libbinlogevents/include/control_events.h`).
  *
  * GTID body: flags u1, sid 16 bytes, gno s8 LE, then (5.7.6+) logical
  * timestamp typecode u1 == 2 followed by last_committed s8 LE and
  * sequence_number s8 LE — the commit-parallelism intervals; later
  * servers append more fields, ignored here. PREVIOUS_GTIDS body: n_sids
  * u8 LE, then per sid 16 bytes + n_intervals u8 LE + (start s8, end s8
  * EXCLUSIVE) pairs. Bodies follow the engine-wide 4-byte trailing
  * checksum/zero-tail convention ([[BinlogRowCodec.encodeRows]]).
  */
object BinlogGtidCodec {

  final val GtidType = 33
  // Same body layout as GTID_LOG_EVENT but names no uuid:gno — it marks
  // the NEXT transaction as explicitly anonymous (gtid_mode OFF/
  // *_PERMISSIVE). Never body-decoded (its gno may be 0, which decodeGtid
  // rightly rejects for real GTIDs); the type byte alone carries the fact.
  final val AnonymousGtidType = 34
  final val PreviousGtidsType = 35

  val gtidOutputType: StructType = StructType(Seq(
    StructField("flags", IntegerType, nullable = false),
    StructField("sid", StringType, nullable = false),
    StructField("gno", LongType, nullable = false),
    StructField("gtid", StringType, nullable = false),
    // -1 when the event predates logical timestamps (pre-5.7.6 layout)
    StructField("last_committed", LongType, nullable = false),
    StructField("sequence_number", LongType, nullable = false)))

  private def uuidText(bs: Array[Byte], off: Int): String = {
    val hex = "0123456789abcdef"
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      val b = bs(off + i) & 0xff
      sb.append(hex.charAt(b >> 4)).append(hex.charAt(b & 0xf))
      i += 1
    }
    sb.toString
  }

  private def s8le(bs: Array[Byte], off: Int): Long = BinlogRowCodec.uLE(bs, off, 8)

  def decodeGtid(body: Array[Byte]): InternalRow = {
    if (body.length < 1 + 16 + 8)
      throw new IllegalArgumentException(s"GTID body too short: ${body.length} bytes")
    val flags = body(0) & 0xff
    val sid = uuidText(body, 1)
    val gno = s8le(body, 17)
    if (gno <= 0)
      throw new IllegalArgumentException(s"GTID gno must be positive, got $gno")
    // typecode at 25, last_committed 26-33, sequence_number 34-41
    val (lc, seq) =
      if (body.length >= 42 && (body(25) & 0xff) == 2)
        (s8le(body, 26), s8le(body, 34))
      else (-1L, -1L)
    InternalRow(flags, UTF8String.fromString(sid), gno,
      UTF8String.fromString(s"$sid:$gno"), lc, seq)
  }

  /** Canonical GTID-set text: `uuid:a[-b][:c[-d]],uuid2:…` with intervals
    * rendered INCLUSIVE (the wire carries exclusive ends).
    */
  def decodePreviousGtids(body: Array[Byte]): UTF8String = {
    if (body.length < 8)
      throw new IllegalArgumentException(
        s"PREVIOUS_GTIDS body too short: ${body.length} bytes")
    val nSids = s8le(body, 0)
    if (nSids < 0 || nSids > (body.length - 8) / 24)
      throw new IllegalArgumentException(s"PREVIOUS_GTIDS claims $nSids sids")
    val sb = new java.lang.StringBuilder
    var p = 8
    var s = 0L
    def need(n: Int): Unit =
      if (p + n > body.length)
        throw new IllegalArgumentException(
          s"PREVIOUS_GTIDS truncated at offset $p (need $n of ${body.length})")
    while (s < nSids) {
      need(16 + 8)
      if (s > 0) sb.append(',')
      sb.append(uuidText(body, p))
      p += 16
      val nIv = s8le(body, p)
      p += 8
      if (nIv <= 0 || nIv > (body.length - p) / 16)
        throw new IllegalArgumentException(s"GTID sid with $nIv intervals")
      var i = 0L
      while (i < nIv) {
        need(16)
        val start = s8le(body, p)
        val endEx = s8le(body, p + 8)
        p += 16
        if (start <= 0 || endEx <= start)
          throw new IllegalArgumentException(s"bad GTID interval $start..$endEx")
        sb.append(':').append(start)
        if (endEx - 1 > start) sb.append('-').append(endEx - 1)
        i += 1
      }
      s += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- fixture/test encoders ----

  private def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"not a uuid: $uuid")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  def encodeGtid(sid: String, gno: Long, flags: Int = 1,
      lastCommitted: Long = -1L, sequenceNumber: Long = -1L): Array[Byte] = {
    require(gno > 0, s"gno must be positive: $gno")
    val out = new java.io.ByteArrayOutputStream
    def le(v: Long): Unit = BinlogRowCodec.writeLE(out, v, 8)
    out.write(flags)
    out.write(uuidBytes(sid))
    le(gno)
    if (lastCommitted >= 0) {
      out.write(2) // logical timestamp typecode
      le(lastCommitted)
      le(sequenceNumber)
    }
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  /** `sets`: (uuid, inclusive intervals). */
  /** Parse canonical gtid_executed text — `uuid:a-b:c,uuid:d-e` —
    * into (sid, inclusive intervals) lists: the inverse of the
    * [[decodePreviousGtids]] rendering, for driver-side consumers like
    * the auto-position dump command.
    */
  def parseSetText(text: String): Seq[(String, Seq[(Long, Long)])] = {
    val t = text.trim
    if (t.isEmpty) Nil
    else t.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      val segs = part.split(":").toSeq
      require(segs.length >= 2, s"malformed GTID set component: $part")
      val sid = segs.head.trim.toLowerCase
      require(sid.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"),
        s"malformed server uuid: $sid")
      val ivs = segs.tail.map { seg =>
        seg.split("-").toSeq match {
          case Seq(a) => (a.trim.toLong, a.trim.toLong)
          case Seq(a, b) => (a.trim.toLong, b.trim.toLong)
          case _ => throw new IllegalArgumentException(s"malformed interval: $seg")
        }
      }
      ivs.foreach { case (a, b) => require(a > 0 && b >= a, s"bad interval $a-$b") }
      sid -> ivs
    }
  }

  def encodePreviousGtids(sets: Seq[(String, Seq[(Long, Long)])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def le(v: Long): Unit = BinlogRowCodec.writeLE(out, v, 8)
    le(sets.length.toLong)
    sets.foreach { case (uuid, ivs) =>
      require(ivs.nonEmpty, s"empty interval list for $uuid")
      out.write(uuidBytes(uuid))
      le(ivs.length.toLong)
      ivs.foreach { case (a, b) =>
        require(a > 0 && b >= a, s"bad interval $a-$b")
        le(a); le(b + 1) // wire end is exclusive
      }
    }
    out.write(Array[Byte](0, 0, 0, 0))
    out.toByteArray
  }
}

/** Codegen'd GTID event decode: BINARY → struct(flags, sid, gno, gtid,
  * last_committed, sequence_number).
  */
case class BinlogGtidDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinlogGtidCodec.gtidOutputType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BinlogGtidDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BinlogGtidCodec.decodeGtid(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogGtidCodec.decodeGtid($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogGtidDecode =
    copy(child = newChild)
}

/** Codegen'd PREVIOUS_GTIDS decode: BINARY → canonical GTID-set text. */
case class BinlogPreviousGtidsDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BinlogPreviousGtidsDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BinlogGtidCodec.decodePreviousGtids(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogGtidCodec.decodePreviousGtids($c)")
  override protected def withNewChildInternal(
      newChild: Expression): BinlogPreviousGtidsDecode =
    copy(child = newChild)
}
