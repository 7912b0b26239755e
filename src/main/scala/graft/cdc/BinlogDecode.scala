package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}

/** Custom Catalyst expressions decoding raw MySQL binlog scalar bytes
  * (SURVEY.md §2A#12, reference decoders `/root/reference/src/binlog.rs:206-334`).
  *
  * Each expression is a thin codegen'd shim over a [[BinlogCodec]] static
  * kernel: `doGenCode` emits a direct static call, so the decode runs
  * inside whole-stage codegen with no UDF boxing, serialization, or
  * interpreted fallback. Null inputs propagate via the standard
  * null-safe scaffolding; the MySQL zero DATE, zero DATETIME, and zero
  * TIMESTAMP values each produce a new SQL NULL.
  */
private[cdc] abstract class BinlogDecodeExpression
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} expects BINARY input, got ${child.dataType.sql}")
}

case class MySqlPackedDecimal(child: Expression, precision: Int, scale: Int)
    extends BinlogDecodeExpression {
  require(precision >= 1 && scale >= 0 && scale <= precision,
    s"invalid DECIMAL($precision,$scale)")
  override protected def nullSafeEval(input: Any): Any =
    BinlogCodec.decodeDecimal(input.asInstanceOf[Array[Byte]], precision, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.cdc.BinlogCodec.decodeDecimal($c, $precision, $scale)")
  override protected def withNewChildInternal(newChild: Expression): MySqlPackedDecimal =
    copy(child = newChild)
}

case class MySqlPackedDate(child: Expression) extends BinlogDecodeExpression {
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BinlogCodec.decodeDate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.cdc.BinlogCodec.decodeDate($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MySqlPackedDate =
    copy(child = newChild)
}

case class MySqlPackedTime(child: Expression, fsp: Int) extends BinlogDecodeExpression {
  require(fsp >= 0 && fsp <= 6, s"invalid fsp $fsp")
  override protected def nullSafeEval(input: Any): Any =
    BinlogCodec.decodeTime(input.asInstanceOf[Array[Byte]], fsp)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogCodec.decodeTime($c, $fsp)")
  override protected def withNewChildInternal(newChild: Expression): MySqlPackedTime =
    copy(child = newChild)
}

case class MySqlPackedDatetime(child: Expression, fsp: Int) extends BinlogDecodeExpression {
  require(fsp >= 0 && fsp <= 6, s"invalid fsp $fsp")
  override def nullable: Boolean = true // MySQL zero-datetime → null
  override protected def nullSafeEval(input: Any): Any =
    BinlogCodec.decodeDatetime(input.asInstanceOf[Array[Byte]], fsp)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.cdc.BinlogCodec.decodeDatetime($c, $fsp);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MySqlPackedDatetime =
    copy(child = newChild)
}

case class MySqlPackedTimestamp(child: Expression, fsp: Int) extends BinlogDecodeExpression {
  require(fsp >= 0 && fsp <= 6, s"invalid fsp $fsp")
  override def nullable: Boolean = true // MySQL zero-timestamp → null
  override protected def nullSafeEval(input: Any): Any =
    BinlogCodec.decodeTimestamp(input.asInstanceOf[Array[Byte]], fsp)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.cdc.BinlogCodec.decodeTimestamp($c, $fsp);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MySqlPackedTimestamp =
    copy(child = newChild)
}

/** Column-level API over the decode expressions. */
object BinlogDecode {
  private def wrap(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def packedDecimal(bytes: Column, precision: Int, scale: Int): Column =
    wrap(MySqlPackedDecimal(expr(bytes), precision, scale))
  def packedDate(bytes: Column): Column = wrap(MySqlPackedDate(expr(bytes)))
  def packedTime(bytes: Column, fsp: Int = 0): Column =
    wrap(MySqlPackedTime(expr(bytes), fsp))
  def packedDatetime(bytes: Column, fsp: Int = 0): Column =
    wrap(MySqlPackedDatetime(expr(bytes), fsp))
  def packedTimestamp(bytes: Column, fsp: Int = 0): Column =
    wrap(MySqlPackedTimestamp(expr(bytes), fsp))

  /** Whole-row assembly from a raw WRITE/UPDATE/DELETE_ROWS event body —
    * see [[BinlogRowCodec.decodeRows]].
    */
  def rows(body: Column, eventType: Column, cols: Array[BinlogColumn]): Column =
    BinlogRowsDecode(body, eventType, cols)

  /** Common-event-header split (whole event bytes → header fields +
    * payload) — see [[BinlogRowCodec.decodeHeader]].
    */
  def eventSplit(event: Column, packetMarker: Boolean = false): Column =
    BinlogEventSplit(event, packetMarker)

  /** TABLE_MAP event decode (schema extraction from the wire) — see
    * [[BinlogRowCodec.decodeTableMap]].
    */
  def tableMap(body: Column): Column =
    ColumnBridge.column(BinlogTableMapDecode(expr(body)))

  /** FULL-metadata TABLE_MAP decode (`binlog-row-metadata=FULL`): base
    * schema plus wire-carried names / signedness / charsets / PK / ENUM-SET
    * members — see [[BinlogRowCodec.decodeTableMapFull]].
    */
  def tableMapFull(body: Column): Column =
    ColumnBridge.column(BinlogTableMapFullDecode(expr(body)))

  /** Whole-row decode driven entirely by a paired FULL-metadata TABLE_MAP
    * struct: named envelope-shaped images, zero external schema — see
    * [[BinlogRowCodec.decodeRowsFullMeta]].
    */
  def rowsFullMeta(body: Column, eventType: Column, meta: Column): Column =
    ColumnBridge.column(BinlogRowsDecodeFullMeta(
      expr(body), expr(eventType), expr(meta)))

  /** The table_id routing key leading every row-event body. */
  def rowTableId(body: Column): Column =
    ColumnBridge.column(BinlogRowTableId(expr(body)))

  /** QUERY event body decode → struct(db, sql) — see
    * [[BinlogTxnCodec.decodeQuery]].
    */
  def query(body: Column): Column =
    ColumnBridge.column(BinlogQueryDecode(expr(body)))

  /** ROWS_QUERY event body decode → the original statement text — see
    * [[BinlogTxnCodec.decodeRowsQuery]].
    */
  def rowsQuery(body: Column): Column =
    ColumnBridge.column(BinlogRowsQueryDecode(expr(body)))

  /** Whole-row decode with the schema supplied at runtime from a paired
    * TABLE_MAP's `cols` — see [[BinlogRowCodec.decodeRowsDynamic]].
    */
  def rowsDynamic(body: Column, eventType: Column, cols: Column): Column =
    ColumnBridge.column(BinlogRowsDecodeDynamic(
      expr(body), expr(eventType), expr(cols)))

  /** Typed projection over one decoded row-image map: one column per
    * `(name, mysqlType)` entry, cast through [[Catalog.sparkType]] — the
    * last step from raw bytes to a typed DataFrame. Renders that need more
    * than a plain cast are handled per family: TIMESTAMP2 decodes to
    * epoch-seconds(.frac) strings → exact decimal-seconds cast; BLOBs
    * decode to hex → `unhex`; absent keys and NULL columns become SQL
    * NULLs (ANSI-safe `try_element_at`).
    */
  def typedColumns(img: Column, cols: Seq[(String, String)]): Seq[Column] = {
    import org.apache.spark.sql.functions.{lit, try_element_at, unhex}
    import org.apache.spark.sql.types.{DecimalType, TimestampType}
    cols.map { case (n, t) =>
      val v = try_element_at(img, lit(n))
      val base = t.trim.toLowerCase
      val typed =
        if (base.startsWith("timestamp"))
          v.cast(DecimalType(26, 6)).cast(TimestampType)
        else if (base.endsWith("blob")) unhex(v)
        else v.cast(Catalog.sparkType(base)) // datetime strings cast directly
      typed.as(n)
    }
  }
}
