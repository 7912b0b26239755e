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

/** MariaDB GTID codec — the other GTID dialect a CDC engine meets in the
  * wild (beyond-reference: the reference targets MySQL only and has no
  * arm for these types). MariaDB positions are `domain-server-seqno`
  * triples, not uuid:gno sets, and the events differ structurally:
  *
  *  - GTID_EVENT (type 162) *replaces* the `QUERY("BEGIN")` marker: body
  *    = seq_no u8 LE ++ domain_id u4 LE ++ flags2 u1 ++
  *    [commit_id u8 if flags2 & FL_GROUP_COMMIT_ID]. The server_id third
  *    of the GTID text comes from the event HEADER, not the body.
  *    FL_STANDALONE (bit 0) marks non-transactional events (DDL): no XID
  *    will follow. (MariaDB `sql/log_event.h`, public documentation of
  *    the replication format.)
  *  - GTID_LIST_EVENT (type 163) is the file prelude analog of
  *    PREVIOUS_GTIDS: count u4 LE (low 28 bits; high 4 bits flags) ++
  *    count × (domain u4 ++ server u4 ++ seq u8).
  */
object MariaGtidCodec {

  final val GtidType = 162
  final val GtidListType = 163

  final val FlStandalone = 1
  final val FlGroupCommitId = 2

  val gtidOutputType: StructType = StructType(Seq(
    StructField("seq_no", LongType, nullable = false),
    StructField("domain_id", LongType, nullable = false),
    StructField("flags2", IntegerType, nullable = false),
    StructField("standalone", BooleanType, nullable = false),
    StructField("commit_id", LongType, nullable = true)))

  def decodeGtid(body: Array[Byte]): InternalRow = {
    if (body.length < 13 + 4)
      throw new IllegalArgumentException(
        s"MariaDB GTID body too short: ${body.length} bytes")
    val seqNo = BinlogRowCodec.uLE(body, 0, 8)
    val domain = BinlogRowCodec.uLE(body, 8, 4)
    val flags2 = body(12) & 0xff
    val commitId =
      if ((flags2 & FlGroupCommitId) != 0) {
        if (body.length < 21 + 4)
          throw new IllegalArgumentException(
            "MariaDB GTID body too short for commit_id")
        java.lang.Long.valueOf(BinlogRowCodec.uLE(body, 13, 8))
      } else null
    InternalRow(seqNo, domain, flags2, (flags2 & FlStandalone) != 0, commitId)
  }

  /** GTID text: `domain-server-seqno` (server_id from the event header). */
  def gtidText(domain: Long, serverId: Long, seqNo: Long): UTF8String =
    UTF8String.fromString(s"$domain-$serverId-$seqNo")

  val listEntryType: StructType = StructType(Seq(
    StructField("domain_id", LongType, nullable = false),
    StructField("server_id", LongType, nullable = false),
    StructField("seq_no", LongType, nullable = false)))

  /** Decode GTID_LIST_EVENT → entries in stored order. */
  def decodeGtidList(body: Array[Byte]): GenericArrayData = {
    if (body.length < 4 + 4)
      throw new IllegalArgumentException(
        s"MariaDB GTID_LIST body too short: ${body.length} bytes")
    val head = BinlogRowCodec.uLE(body, 0, 4)
    val count = (head & 0x0fffffffL).toInt
    if (body.length < 4 + count * 16 + 4)
      throw new IllegalArgumentException(
        s"MariaDB GTID_LIST declares $count entries but body has only " +
          s"${body.length} bytes")
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val off = 4 + i * 16
      out(i) = InternalRow(
        BinlogRowCodec.uLE(body, off, 4),
        BinlogRowCodec.uLE(body, off + 4, 4),
        BinlogRowCodec.uLE(body, off + 8, 8))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- fixture/test encoders ----

  def encodeGtid(seqNo: Long, domainId: Long, flags2: Int = 0,
      commitId: Option[Long] = None): Array[Byte] = {
    require(((flags2 & FlGroupCommitId) != 0) == commitId.isDefined,
      "commit_id present iff FL_GROUP_COMMIT_ID set")
    val out = new java.io.ByteArrayOutputStream
    BinlogRowCodec.writeLE(out, seqNo, 8)
    BinlogRowCodec.writeLE(out, domainId, 4)
    out.write(flags2)
    commitId.foreach(BinlogRowCodec.writeLE(out, _, 8))
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  def encodeGtidList(entries: Seq[(Long, Long, Long)], flags: Int = 0): Array[Byte] = {
    require(entries.length < (1 << 28), "GTID_LIST count overflows 28 bits")
    val out = new java.io.ByteArrayOutputStream
    BinlogRowCodec.writeLE(out,
      (flags.toLong << 28) | entries.length.toLong, 4)
    entries.foreach { case (d, s, q) =>
      BinlogRowCodec.writeLE(out, d, 4)
      BinlogRowCodec.writeLE(out, s, 4)
      BinlogRowCodec.writeLE(out, q, 8)
    }
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }
}

/** Codegen'd MariaDB GTID_EVENT body decode. */
case class MariaGtidDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MariaGtidCodec.gtidOutputType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"MariaGtidDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    MariaGtidCodec.decodeGtid(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.MariaGtidCodec.decodeGtid($c)")
  override protected def withNewChildInternal(newChild: Expression): MariaGtidDecode =
    copy(child = newChild)
}

object MariaGtidDecode {
  def apply(body: Column): Column =
    ColumnBridge.column(MariaGtidDecode(ColumnBridge.expression(body)))
}

/** Codegen'd MariaDB GTID_LIST_EVENT body decode. */
case class MariaGtidListDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(MariaGtidCodec.listEntryType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"MariaGtidListDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    MariaGtidCodec.decodeGtidList(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.MariaGtidCodec.decodeGtidList($c)")
  override protected def withNewChildInternal(newChild: Expression): MariaGtidListDecode =
    copy(child = newChild)
}

object MariaGtidListDecode {
  def apply(body: Column): Column =
    ColumnBridge.column(MariaGtidListDecode(ColumnBridge.expression(body)))
}
