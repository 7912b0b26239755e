package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** QUERY / XID event codec — the transaction boundary markers of a binlog
  * stream. A transactional unit is `QUERY("BEGIN") … row events … XID(n)`;
  * the XID event's 8-byte LE payload is the InnoDB transaction id and its
  * header timestamp is the commit time. The reference decodes QUERY events
  * for DDL only (`/root/reference/src/binlog.rs:794-811`) and skips XID
  * entirely — it has no transaction grouping; this is beyond-reference
  * coverage a consistent-snapshot consumer needs.
  *
  * QUERY body layout (post-header): thread_id u4, exec_time u4,
  * schema_length u1, error_code u2, status_vars_length u2, status vars,
  * schema, 0x00, statement text to the body tail. Bodies follow the
  * engine-wide convention that the last 4 bytes are the checksum/zero
  * tail ([[BinlogRowCodec.encodeRows]] and the reference's row loop,
  * `binlog.rs:636-639`, treat row bodies the same way).
  */
object BinlogTxnCodec {

  final val QueryType = 2
  final val XidType = 16

  val queryOutputType: StructType = StructType(Seq(
    StructField("db", StringType, nullable = false),
    StructField("sql", StringType, nullable = false)))

  def decodeQuery(body: Array[Byte]): InternalRow = {
    if (body.length < 13 + 4)
      throw new IllegalArgumentException(
        s"QUERY body too short: ${body.length} bytes")
    val dbLen = body(8) & 0xff
    val statusLen = (body(11) & 0xff) | ((body(12) & 0xff) << 8)
    val dbStart = 13 + statusLen
    val sqlStart = dbStart + dbLen + 1 // NUL after the schema name
    if (sqlStart > body.length - 4)
      throw new IllegalArgumentException(
        s"QUERY body truncated: schema/status overrun ${body.length} bytes")
    if (body(dbStart + dbLen) != 0)
      throw new IllegalArgumentException("QUERY schema name missing NUL terminator")
    InternalRow(
      UTF8String.fromBytes(body, dbStart, dbLen),
      UTF8String.fromBytes(body, sqlStart, body.length - 4 - sqlStart))
  }

  /** ROWS_QUERY_LOG_EVENT (type 29, `binlog_rows_query_log_events=ON`):
    * the original statement text MySQL attaches ahead of the row events
    * it produced. Body = 1-byte declared length (capped at 255 and
    * ignored by every real consumer — the text runs to the event tail)
    * ++ statement bytes. Beyond-reference: no type-29 arm in
    * `/root/reference/src/binlog.rs`.
    */
  final val RowsQueryType = 29

  def decodeRowsQuery(body: Array[Byte]): UTF8String = {
    if (body.length < 1 + 4)
      throw new IllegalArgumentException(
        s"ROWS_QUERY body too short: ${body.length} bytes")
    UTF8String.fromBytes(body, 1, body.length - 4 - 1)
  }

  def encodeRowsQuery(sql: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val bs = sql.getBytes("UTF-8")
    out.write(math.min(bs.length, 255))
    out.write(bs)
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  def decodeXid(body: Array[Byte]): Long = {
    if (body.length < 8)
      throw new IllegalArgumentException(s"XID body too short: ${body.length} bytes")
    BinlogRowCodec.uLE(body, 0, 8)
  }

  /** XA_PREPARE_LOG_EVENT (type 38, MySQL 5.7.7+; beyond-reference — no
    * type-38 arm in `/root/reference/src/binlog.rs`): the binlog record of
    * a distributed transaction's PREPARE (or, with the one_phase flag, of
    * `XA COMMIT … ONE PHASE`). Body = one_phase u1, formatID u4 LE,
    * gtrid_length u4 LE, bqual_length u4 LE, gtrid bytes ++ bqual bytes
    * (mysql's XA_prepare_event serialization), + the engine-wide 4-byte
    * checksum tail. The canonical xid text mirrors the statement form the
    * outcome is issued with (`XA COMMIT X'<gtrid>',X'<bqual>',<formatID>`,
    * lowercase hex) so prepare and outcome join on one string.
    */
  final val XaPrepareType = 38

  val xaPrepareOutputType: StructType = StructType(Seq(
    StructField("one_phase", BooleanType, nullable = false),
    StructField("format_id", IntegerType, nullable = false),
    StructField("gtrid", StringType, nullable = false),
    StructField("bqual", StringType, nullable = false),
    StructField("xid_text", StringType, nullable = false)))

  private def hexLower(b: Array[Byte], off: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder(len * 2)
    var i = 0
    while (i < len) {
      sb.append(Character.forDigit((b(off + i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b(off + i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def xidText(gtridHex: String, bqualHex: String, formatId: Int): String =
    s"X'$gtridHex',X'$bqualHex',$formatId"

  def decodeXaPrepare(body: Array[Byte]): InternalRow = {
    if (body.length < 13 + 4)
      throw new IllegalArgumentException(
        s"XA_PREPARE body too short: ${body.length} bytes")
    val onePhase = body(0) != 0
    val formatId = BinlogRowCodec.uLE(body, 1, 4).toInt
    val glen = BinlogRowCodec.uLE(body, 5, 4).toInt
    val blen = BinlogRowCodec.uLE(body, 9, 4).toInt
    // MYXID caps both at 64 (MAXGTRIDSIZE/MAXBQUALSIZE); reject anything
    // larger BEFORE the bounds math so a hostile length can't wrap.
    if (glen < 0 || blen < 0 || glen > 64 || blen > 64)
      throw new IllegalArgumentException(
        s"XA_PREPARE xid lengths out of range: gtrid=$glen bqual=$blen")
    if (13 + glen + blen + 4 > body.length)
      throw new IllegalArgumentException(
        s"XA_PREPARE body truncated: need ${13 + glen + blen + 4}, have ${body.length}")
    val g = hexLower(body, 13, glen)
    val b = hexLower(body, 13 + glen, blen)
    InternalRow(onePhase, formatId,
      UTF8String.fromString(g), UTF8String.fromString(b),
      UTF8String.fromString(xidText(g, b, formatId)))
  }

  def encodeXaPrepare(onePhase: Boolean, formatId: Int,
      gtrid: Array[Byte], bqual: Array[Byte]): Array[Byte] = {
    require(gtrid.length <= 64 && bqual.length <= 64, "xid component too long")
    val out = new java.io.ByteArrayOutputStream
    out.write(if (onePhase) 1 else 0)
    BinlogRowCodec.writeLE(out, formatId.toLong, 4)
    BinlogRowCodec.writeLE(out, gtrid.length.toLong, 4)
    BinlogRowCodec.writeLE(out, bqual.length.toLong, 4)
    out.write(gtrid)
    out.write(bqual)
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  // ---- fixture/test encoders ----

  def encodeQuery(db: String, sql: String, threadId: Long = 7L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def le(v: Long, n: Int): Unit = BinlogRowCodec.writeLE(out, v, n)
    val dbBytes = db.getBytes("UTF-8")
    require(dbBytes.length < 256, s"schema name too long: $db")
    le(threadId, 4) // thread_id
    le(0L, 4) // exec_time
    out.write(dbBytes.length)
    le(0L, 2) // error_code
    le(0L, 2) // status_vars_length (none in fixtures)
    out.write(dbBytes)
    out.write(0)
    out.write(sql.getBytes("UTF-8"))
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  def encodeXid(xid: Long): Array[Byte] = {
    val out = new Array[Byte](12) // 8-byte LE xid + zero tail
    var i = 0
    while (i < 8) { out(i) = ((xid >> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }
}

/** Codegen'd QUERY-body decode: BINARY → struct(db, sql). */
case class BinlogQueryDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinlogTxnCodec.queryOutputType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BinlogQueryDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BinlogTxnCodec.decodeQuery(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogTxnCodec.decodeQuery($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogQueryDecode =
    copy(child = newChild)
}

/** Codegen'd ROWS_QUERY-body decode: BINARY → original statement text. */
case class BinlogRowsQueryDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BinlogRowsQueryDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BinlogTxnCodec.decodeRowsQuery(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogTxnCodec.decodeRowsQuery($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogRowsQueryDecode =
    copy(child = newChild)
}

/** Codegen'd XID-body decode: BINARY → the 8-byte LE transaction id. */
case class BinlogXidDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BinlogXidDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BinlogTxnCodec.decodeXid(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogTxnCodec.decodeXid($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogXidDecode =
    copy(child = newChild)
}

/** Codegen'd XA_PREPARE-body decode: BINARY →
  * struct(one_phase, format_id, gtrid, bqual, xid_text).
  */
case class BinlogXaPrepareDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinlogTxnCodec.xaPrepareOutputType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BinlogXaPrepareDecode expects BINARY input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BinlogTxnCodec.decodeXaPrepare(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogTxnCodec.decodeXaPrepare($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogXaPrepareDecode =
    copy(child = newChild)
}

/** Transaction assembly over a split event stream: group every event
  * between a `QUERY("BEGIN")` and the next XID into one transaction and
  * stamp it with that XID's id and commit timestamp.
  *
  * Spark-first shape: a running count of BEGIN markers per file
  * (`sum over (partition by file order by ord)`) gives each event its
  * transaction ordinal, and a forward-looking `first(…, ignoreNulls)`
  * over the SAME partitioning/sort finds the next XID event — stamped
  * only when its ordinal matches, so pre-BEGIN preludes and uncommitted
  * tails stay null instead of stealing a neighbor's commit. One shuffle,
  * one sort, no join, no recompute of the (possibly expensive) upstream
  * — the join formulation would re-evaluate it on both sides. Binlog
  * transactions never span files, so at cluster scale this parallelizes
  * per file (the natural ~1 GB unit a 100 TB binlog archive splits into)
  * with no global ordering anywhere.
  */
object Transactions {

  /** `events` must carry `fileCol`, `ordCol` (any per-file total order —
    * log_pos or a split ordinal), `typeCol`, `bodyCol`, `tsCol`. Returns
    * the events with `txn_seq` (0 = before any BEGIN), plus `xid` and
    * `commit_ts` (null = outside any committed transaction — pre-BEGIN
    * events and uncommitted tails stay unstamped rather than guessed),
    * plus `gtid` — the `uuid:gno` named by the GTID event framing the
    * transaction. A GTID names ONLY the transaction unit that immediately
    * follows it: the stamp requires the last GTID to sit one transaction
    * ordinal behind the event's span (an anonymous transaction after a
    * GTID'd one — mixed gtid_mode — stays null instead of inheriting its
    * predecessor's id) and to not have been consumed by an intervening
    * implicitly-committing statement (a GTID'd DDL between transactions
    * spends its GTID on the DDL, not on the next anonymous span). All
    * windows share one (file, ord) shuffle+sort.
    */
  def assemble(events: DataFrame, fileCol: String, ordCol: String,
      typeCol: String = "event_type", bodyCol: String = "body",
      tsCol: String = "timestamp", serverIdCol: String = null): DataFrame = {
    val wRun = Window.partitionBy(col(fileCol)).orderBy(col(ordCol))
    val wFwd = wRun.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // MariaDB (event type 162): a non-standalone GTID event *replaces*
    // QUERY("BEGIN") as the transaction opener, and the GTID text is
    // domain-server-seqno with server_id from the event HEADER (pass
    // `serverIdCol` for MariaDB streams; MySQL streams don't need it).
    val isMariaGtid = col(typeCol) === MariaGtidCodec.GtidType
    val mariaG = ColumnBridge.column(MariaGtidDecode(
      ColumnBridge.expression(col(bodyCol))))
    val isBegin = (col(typeCol) === BinlogTxnCodec.QueryType &&
      upper(trim(ColumnBridge.column(BinlogQueryDecode(
        ColumnBridge.expression(col(bodyCol)))).getField("sql"))) === "BEGIN") ||
      (isMariaGtid && !mariaG.getField("standalone"))
    val xidStruct = when(col(typeCol) === BinlogTxnCodec.XidType, struct(
      col("txn_seq").as("seq"),
      ColumnBridge.column(BinlogXidDecode(
        ColumnBridge.expression(col(bodyCol)))).as("xid"),
      col(tsCol).as("cts")))
    val serverId =
      if (serverIdCol == null) lit(0L) else col(serverIdCol).cast(LongType)
    val mariaText = concat(
      mariaG.getField("domain_id").cast(StringType), lit("-"),
      serverId.cast(StringType), lit("-"),
      mariaG.getField("seq_no").cast(StringType))
    // ANONYMOUS_GTID participates as a marker with a null name: it takes
    // the "latest GTID marker" slot, so the span it announces stamps null
    // even in a malformed GTID-then-ANONYMOUS mix. `ofs` is how far ahead
    // of the marker its named span sits: 1 for MySQL-style markers (GTID
    // precedes BEGIN) and MariaDB standalone markers (the DDL follows),
    // 0 for a MariaDB transaction GTID (the marker IS the begin, so it
    // already carries its own span's ordinal).
    val gtidStruct = when(col(typeCol) === BinlogGtidCodec.GtidType ||
      col(typeCol) === BinlogGtidCodec.AnonymousGtidType, struct(
      col("txn_seq").as("seq"),
      col(ordCol).cast(LongType).as("ord"),
      lit(1L).as("ofs"),
      when(col(typeCol) === BinlogGtidCodec.GtidType,
        ColumnBridge.column(BinlogGtidDecode(
          ColumnBridge.expression(col(bodyCol)))).getField("gtid")).as("g")))
      .when(isMariaGtid, struct(
        col("txn_seq").as("seq"),
        col(ordCol).cast(LongType).as("ord"),
        when(mariaG.getField("standalone"), 1L).otherwise(0L).as("ofs"),
        mariaText.as("g")))
    // A non-BEGIN QUERY outside any committed span commits implicitly
    // (DDL) and consumes the pending GTID; inside a committed span it is a
    // statement-format row change and consumes nothing.
    val consumerOrd = when(col(typeCol) === BinlogTxnCodec.QueryType &&
      !isBegin && col("xid").isNull, col(ordCol).cast(LongType))
    val wPrev = wRun.rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("txn_seq", sum(when(isBegin, 1L).otherwise(0L)).over(wRun))
      .withColumn("__x", first(xidStruct, ignoreNulls = true).over(wFwd))
      .withColumn("__g", last(gtidStruct, ignoreNulls = true).over(wRun))
      .withColumn("xid",
        when(col("__x.seq") === col("txn_seq"), col("__x.xid")))
      .withColumn("commit_ts",
        when(col("__x.seq") === col("txn_seq"), col("__x.cts")))
      .withColumn("__c", last(consumerOrd, ignoreNulls = true).over(wPrev))
      .withColumn("gtid", when(col("xid").isNotNull &&
        col("__g.seq") + col("__g.ofs") === col("txn_seq") &&
        (col("__c").isNull || col("__g.ord") > col("__c")), col("__g.g")))
      .drop("__x", "__g", "__c")
  }

  /** XA (distributed) transaction assembly — the spans [[assemble]]'s
    * BEGIN..XID grammar cannot see (beyond-reference, and beyond plain
    * transactional replay: MySQL logs an XA transaction as
    * `QUERY("XA START x") … rows … QUERY("XA END x")` + XA_PREPARE(x),
    * and its outcome arrives LATER — possibly much later, in another
    * file — as a standalone `QUERY("XA COMMIT x")` / `XA ROLLBACK x`
    * statement; `XA COMMIT … ONE PHASE` folds prepare+commit into one
    * XA_PREPARE event with the one_phase flag).
    *
    * Every event inside an XA span is stamped with `xa_xid` (the
    * canonical statement-form xid text) and `xa_state`:
    * `committed` (one-phase, or a matching XA COMMIT outcome exists after
    * the prepare), `rolled_back` (matching XA ROLLBACK), or `prepared`
    * (no outcome yet — the dangling distributed transaction a consistent
    * consumer must hold back). Events outside any XA span pass through
    * with null stamps.
    *
    * Shape: span stamping reuses the one (file, ord) window shuffle
    * (running XA-START count + forward-first XA_PREPARE); outcomes are
    * statement-scale metadata (two QUERY events per distributed txn at
    * most) aggregated to one row per xid and broadcast back — never a
    * row-scale join. Outcome ordering is honored: only an outcome at or
    * after the prepare position (by global (file, ord)) resolves it.
    */
  def xaAssemble(events: DataFrame, fileCol: String, ordCol: String,
      typeCol: String = "event_type", bodyCol: String = "body"): DataFrame = {
    import BinlogTxnCodec.{QueryType, XaPrepareType}
    val wRun = Window.partitionBy(col(fileCol)).orderBy(col(ordCol))
    val wFwd = wRun.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sqlCol = ColumnBridge.column(BinlogQueryDecode(
      ColumnBridge.expression(col(bodyCol)))).getField("sql")
    val sqlUp = upper(trim(sqlCol))
    val isQuery = col(typeCol) === QueryType
    val isXaStart = isQuery && sqlUp.startsWith("XA START")
    val prep = ColumnBridge.column(BinlogXaPrepareDecode(
      ColumnBridge.expression(col(bodyCol))))
    val prepStruct = when(col(typeCol) === XaPrepareType, struct(
      col("xa_seq").as("seq"),
      prep.getField("one_phase").as("one_phase"),
      prep.getField("xid_text").as("xid"),
      col(fileCol).cast(StringType).as("pfile"),
      col(ordCol).cast(LongType).as("pord")))
    val stamped = events
      .withColumn("xa_seq", sum(when(isXaStart, 1L).otherwise(0L)).over(wRun))
      .withColumn("__p", first(prepStruct, ignoreNulls = true).over(wFwd))
      .withColumn("xa_xid", when(col("__p.seq") === col("xa_seq"), col("__p.xid")))
      .withColumn("__one_phase",
        when(col("xa_xid").isNotNull, col("__p.one_phase")))
    // Global (file, ord) ordering key. Binlog file identifiers order by
    // their numeric suffix, not lexicographically: 'binlog.999999' <
    // 'binlog.1000000' (the documented rollover) and a fixture's bare
    // '8' < '40'. Split the name into (prefix, numeric suffix) so the
    // struct comparison is numeric where it must be; -1 keeps suffixless
    // names comparable (they order by prefix alone).
    def fileKey(f: Column, o: Column): Column = {
      val suffix = regexp_extract(f, "([0-9]+)$", 1)
      struct(
        regexp_replace(f, "[0-9]+$", "").as("base"),
        when(suffix === "", lit(-1L)).otherwise(suffix.cast(LongType)).as("num"),
        o.as("ord"))
    }
    def keyGeq(a: Column, b: Column): Column =
      (a.getField("base") > b.getField("base")) ||
        (a.getField("base") === b.getField("base") &&
          ((a.getField("num") > b.getField("num")) ||
            (a.getField("num") === b.getField("num") &&
              a.getField("ord") >= b.getField("ord"))))
    // Outcome statements: `XA COMMIT <xid>` / `XA ROLLBACK <xid>` (the
    // bare two-phase forms; ONE PHASE commits never reach here — they are
    // the one_phase prepare flag). MySQL permits xid REUSE once a
    // transaction completes, so ALL outcomes per xid are kept (sorted,
    // statement-scale — two QUERY events per distributed txn) and each
    // prepare resolves against the earliest outcome at-or-after its own
    // (file, ord); a single min-per-xid would hand a reused xid's first
    // outcome to the second span. One row per xid after the agg;
    // broadcast by construction.
    val outcomes = events
      .filter(col(typeCol) === lit(QueryType))
      .select(col(fileCol).cast(StringType).as("ofile"),
        col(ordCol).cast(LongType).as("oord"),
        upper(trim(ColumnBridge.column(BinlogQueryDecode(
          ColumnBridge.expression(col(bodyCol)))).getField("sql"))).as("osql"),
        trim(ColumnBridge.column(BinlogQueryDecode(
          ColumnBridge.expression(col(bodyCol)))).getField("sql")).as("osql_raw"))
      .filter(col("osql").startsWith("XA COMMIT") || col("osql").startsWith("XA ROLLBACK"))
      .filter(!col("osql").endsWith("ONE PHASE"))
      .select(
        when(col("osql").startsWith("XA COMMIT"), "committed")
          .otherwise("rolled_back").as("outcome"),
        trim(substring_index(col("osql_raw"), " ", -1)).as("xa_xid"),
        col("ofile"), col("oord"))
      .groupBy("xa_xid")
      .agg(sort_array(collect_list(struct(
        fileKey(col("ofile"), col("oord")).as("k"),
        col("outcome").as("outcome")))).as("__os"))
    val pk = fileKey(col("__p.pfile"), col("__p.pord"))
    val resolved = try_element_at(
      filter(col("__os"), o => keyGeq(o.getField("k"), pk)), lit(1))
    stamped
      .join(broadcast(outcomes), Seq("xa_xid"), "left")
      .withColumn("xa_state", when(col("xa_xid").isNull, lit(null).cast(StringType))
        .when(col("__one_phase"), "committed")
        .when(resolved.isNotNull, resolved.getField("outcome"))
        .otherwise("prepared"))
      .drop("__p", "__one_phase", "__os")
  }
}
