package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-column decode spec for raw ROW-event bytes — the engine-side stand-in
  * for the reference's TABLE_MAP-derived `ColMeta`
  * (`/root/reference/src/binlog.rs:336-388,404-470`): the caller supplies it
  * from its table catalog / config instead of pairing TABLE_MAP events
  * (transport exclusion, SURVEY.md §2C).
  *
  * Field use by type: `maxLength` (CHAR/VARCHAR max length in BYTES — the
  * TABLE_MAP metadata unit, which picks the 1- vs 2-byte length prefix;
  * NOT the DDL character count: a utf8mb4 varchar(100) stores up to 400
  * bytes and uses a 2-byte prefix), `fsp` (TIME2/DATETIME2/TIMESTAMP2
  * fraction digits), `lengthSize` (TEXT/BLOB length-prefix bytes),
  * `precision`/`scale` (DECIMAL), `unsigned` (integer types; the binlog
  * itself carries no signedness), `binary` (TEXT wire code 252 covers both
  * TEXT and BLOB: binary columns render as lowercase hex — lossless and
  * reversible via `unhex`, unlike the reference's lossy UTF-16 decode,
  * `executor.rs:231-236`; text columns render as UTF-8).
  *
  * ENUM/SET reuse `maxLength` as the wire pack length (ENUM: 1 or 2 bytes;
  * SET: 1-8 bytes) and carry the DDL member list in `members` — with
  * members known, ENUM renders the member name and SET the comma-joined
  * selected names (MySQL's textual forms); with `members` empty (the
  * TABLE_MAP path, which does not carry them) they render the raw 1-based
  * index / bitmask as digits. BIT reuses `precision` as the bit count and
  * renders the unsigned integer value. JSON reuses `lengthSize` like
  * TEXT/BLOB and renders the decoded [[JsonBinary]] document text.
  */
case class BinlogColumn(
    name: String,
    tpe: Int,
    maxLength: Int = 0,
    fsp: Int = 0,
    lengthSize: Int = 1,
    precision: Int = 0,
    scale: Int = 0,
    unsigned: Boolean = false,
    binary: Boolean = false,
    members: Seq[String] = Nil) extends Serializable

/** Raw MySQL binlog ROW-event decode: assembles whole typed rows from
  * WRITE/UPDATE/DELETE_ROWS event bodies — columns-present bitmap, per-image
  * null bitmap, value loop over the scalar codecs, row loop to the 4-byte
  * checksum tail (reference row loops `/root/reference/src/binlog.rs:630-644,
  * 703-722,728-740`, image decode `:831-862`).
  *
  * Two deliberate deviations from the reference, which has decode bugs we
  * must not inherit:
  *   - the 2-byte extra-data length (v2 events) INCLUDES itself, so
  *     `extra_len - 2` further bytes are skipped (the reference skips
  *     `extra_len`, over-consuming by 2 whenever extra data is present,
  *     `binlog.rs:650-655`);
  *   - the per-image null bitmap is indexed by PRESENT-column ordinal and
  *     sized from the present count, per the row-image format (the reference
  *     sizes and indexes it by absolute column index, `binlog.rs:837-846`,
  *     which only works when every column is present — minimal row images
  *     would garble it).
  *
  * All methods are static and Catalyst-internal-typed so [[BinlogRowsDecode]]
  * can call them from generated code — the decode is a per-row kernel inside
  * whole-stage codegen, embarrassingly parallel at any scale.
  */
object BinlogRowCodec {

  // MySQL column type codes (reference binlog.rs:160-204).
  final val TINYINT = 1
  final val SMALLINT = 2
  final val INT = 3
  final val FLOAT = 4
  final val DOUBLE = 5
  final val BIGINT = 8
  final val MEDIUMINT = 9
  final val DATE = 10
  final val YEAR = 13
  final val VARCHAR = 15
  final val BIT = 16
  final val TIMESTAMP2 = 17
  final val DATETIME2 = 18
  final val TIME2 = 19
  final val JSON = 245
  final val DECIMAL = 246
  final val ENUM = 247
  final val SET = 248
  final val TEXT = 252
  final val CHAR = 254

  // Row event type codes: v1 carries no extra-data area, v2 does.
  final val WriteV1 = 23
  final val UpdateV1 = 24
  final val DeleteV1 = 25
  final val WriteV2 = 30
  final val UpdateV2 = 31
  final val DeleteV2 = 32
  /** PARTIAL_UPDATE_ROWS_EVENT (MySQL 8.0.3+,
    * `binlog_row_value_options=PARTIAL_JSON`): UPDATE layout, but each
    * after image leads with a lenenc value_options (bit 0 = partial JSON)
    * + a partial-bits bitmap over the table's JSON columns, and flagged
    * JSON columns carry a [[JsonDiff]] sequence instead of a document.
    */
  final val PartialUpdateV2 = 39

  /** Decoded-rows output shape: envelope-aligned (`data` = after images,
    * `old` = before images; WRITE fills only `data`, DELETE only `old`,
    * UPDATE both pairwise).
    */
  val outputType: StructType = StructType(Seq(
    StructField("data", ArrayType(MapType(StringType, StringType)), nullable = false),
    StructField("old", ArrayType(MapType(StringType, StringType)), nullable = false)))

  /** [[decodeRowsPositional]]/[[decodeRowsDynamic]] output shape: images
    * as positional value arrays (index = schema ordinal), since TABLE_MAP
    * carries no column names.
    */
  val positionalType: StructType = StructType(Seq(
    StructField("data", ArrayType(ArrayType(StringType)), nullable = false),
    StructField("old", ArrayType(ArrayType(StringType)), nullable = false)))

  /** [[decodeHeader]] output: the 19-byte common event header's fields
    * plus the remaining payload bytes.
    */
  val headerType: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("event_type", IntegerType, nullable = false),
    StructField("server_id", LongType, nullable = false),
    StructField("event_size", LongType, nullable = false),
    StructField("log_pos", LongType, nullable = false),
    StructField("flags", IntegerType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** Split a whole binlog event into its common 19-byte header (timestamp
    * u4, type u1, server_id u4, event_size u4, log_pos u4, flags u2 — all
    * little-endian; reference `/root/reference/src/binlog.rs:517-544`) and
    * the payload bytes. `packetMarker` additionally skips the leading
    * status byte a replication-stream packet carries before the header
    * (the reference's `take_int1`, `binlog.rs:528`); events read from a
    * binlog FILE have no marker.
    */
  def decodeHeader(event: Array[Byte], packetMarker: Boolean): InternalRow = {
    val r = new Reader(event)
    if (packetMarker) r.skip(1)
    val ts = r.uLE(4)
    val tpe = r.u1()
    val serverId = r.uLE(4)
    val eventSize = r.uLE(4)
    val logPos = r.uLE(4)
    val flags = r.uLE(2).toInt
    // The header's own event_size frames the payload: one event per input
    // value, validated exactly. Without this, trailing bytes (a second
    // contiguous event, record padding) would silently fold into `body`
    // and decode as garbage rows downstream.
    val bodyLen = eventSize - 19
    if (bodyLen < 0 || r.pos + bodyLen != event.length)
      throw new IllegalArgumentException(
        s"event buffer (${event.length} bytes, marker=$packetMarker) does not " +
          s"frame one event of header event_size $eventSize")
    val body = java.util.Arrays.copyOfRange(event, r.pos, r.pos + bodyLen.toInt)
    InternalRow(ts, tpe, serverId, eventSize, logPos, flags, body)
  }

  /** Encode a full event (header ++ body) for fixtures/tests. */
  def encodeEvent(eventType: Int, body: Array[Byte], timestamp: Long = 0L,
      serverId: Long = 1L, logPos: Long = 4L, flags: Int = 0,
      packetMarker: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(20 + body.length)
    if (packetMarker) out.write(0)
    writeLE(out, timestamp, 4)
    out.write(eventType)
    writeLE(out, serverId, 4)
    writeLE(out, 19L + body.length, 4) // event_size includes the header
    writeLE(out, logPos, 4)
    writeLE(out, flags.toLong, 2)
    out.write(body)
    out.toByteArray
  }

  private final class Reader(bs: Array[Byte]) {
    var pos = 0
    def remaining: Int = bs.length - pos
    private def need(n: Int): Unit =
      if (remaining < n)
        throw new IllegalArgumentException(
          s"truncated binlog data: need $n bytes at offset $pos, have $remaining")
    def skip(n: Int): Unit = { need(n); pos += n }
    def u1(): Int = { need(1); pos += 1; bs(pos - 1) & 0xff }
    def uLE(n: Int): Long = {
      need(n)
      var v = 0L
      var i = n - 1
      while (i >= 0) { v = (v << 8) | (bs(pos + i) & 0xffL); i -= 1 }
      pos += n
      v
    }
    /** MySQL length-encoded integer (the reference's VLenInt). */
    def lenenc(): Long = u1() match {
      case v if v < 0xfb => v.toLong
      case 0xfc => uLE(2)
      case 0xfd => uLE(3)
      case 0xfe => uLE(8)
      case v => throw new IllegalArgumentException(s"invalid length-encoded int prefix $v")
    }
    def slice(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(bs, pos, pos + n)
      pos += n
      out
    }
  }

  private def bit(arr: Array[Byte], i: Int): Boolean =
    ((arr(i / 8) >> (i % 8)) & 1) != 0

  private val HexDigits = "0123456789abcdef".getBytes
  /** Allocation-light lowercase hex (this sits in the per-row decode path;
    * a per-byte format call would dominate large-BLOB decode cost).
    */
  private def toHex(bs: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bs.length * 2)
    var i = 0
    while (i < bs.length) {
      out(2 * i) = HexDigits((bs(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bs(i) & 0xf)
      i += 1
    }
    out
  }

  private def intString(v: Long, bytes: Int, unsigned: Boolean): String =
    if (unsigned)
      // 8-byte unsigned exceeds Long: render the raw bits unsigned
      if (bytes == 8) java.lang.Long.toUnsignedString(v) else v.toString
    else if (bytes == 8) v.toString
    else {
      val shift = 64 - 8 * bytes
      ((v << shift) >> shift).toString
    }

  private def decodeValue(r: Reader, c: BinlogColumn): UTF8String = c.tpe match {
    case TINYINT => UTF8String.fromString(intString(r.uLE(1), 1, c.unsigned))
    case SMALLINT => UTF8String.fromString(intString(r.uLE(2), 2, c.unsigned))
    case MEDIUMINT => UTF8String.fromString(intString(r.uLE(3), 3, c.unsigned))
    case INT => UTF8String.fromString(intString(r.uLE(4), 4, c.unsigned))
    case BIGINT => UTF8String.fromString(intString(r.uLE(8), 8, c.unsigned))
    case FLOAT =>
      UTF8String.fromString(java.lang.Float.intBitsToFloat(r.uLE(4).toInt).toString)
    case DOUBLE =>
      UTF8String.fromString(java.lang.Double.longBitsToDouble(r.uLE(8)).toString)
    case YEAR => UTF8String.fromString((1900 + r.u1()).toString)
    case DATE => BinlogCodec.decodeDate(r.slice(3)) // zero date → null
    case TIME2 => BinlogCodec.decodeTime(r.slice(3 + (c.fsp + 1) / 2), c.fsp)
    case DATETIME2 => BinlogCodec.decodeDatetime(r.slice(5 + (c.fsp + 1) / 2), c.fsp)
    case TIMESTAMP2 => BinlogCodec.decodeTimestamp(r.slice(4 + (c.fsp + 1) / 2), c.fsp)
    case DECIMAL =>
      BinlogCodec.decodeDecimal(
        r.slice(BinlogCodec.decimalBinarySize(c.precision, c.scale)), c.precision, c.scale)
    case VARCHAR | CHAR =>
      val len = if (c.maxLength > 255) r.uLE(2).toInt else r.u1()
      UTF8String.fromBytes(r.slice(len))
    case TEXT =>
      val len = r.uLE(c.lengthSize).toInt
      val bs = r.slice(len)
      if (c.binary) UTF8String.fromBytes(toHex(bs)) else UTF8String.fromBytes(bs)
    case ENUM =>
      val idx = r.uLE(c.maxLength).toInt
      if (c.members.isEmpty) UTF8String.fromString(idx.toString)
      else if (idx == 0) UTF8String.EMPTY_UTF8 // MySQL's '' for the invalid 0
      else if (idx <= c.members.length) UTF8String.fromString(c.members(idx - 1))
      else throw new IllegalArgumentException(
        s"ENUM index $idx exceeds ${c.members.length} members (${c.name})")
    case SET =>
      val mask = r.uLE(c.maxLength)
      if (c.members.isEmpty) UTF8String.fromString(java.lang.Long.toUnsignedString(mask))
      else {
        if (c.members.length < 64 && (mask >>> c.members.length) != 0)
          throw new IllegalArgumentException(
            s"SET mask $mask has bits beyond ${c.members.length} members (${c.name})")
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < c.members.length) {
          if (((mask >>> i) & 1L) != 0) {
            if (sb.length > 0) sb.append(',')
            sb.append(c.members(i))
          }
          i += 1
        }
        UTF8String.fromString(sb.toString)
      }
    case BIT =>
      // Stored big-endian in (bits+7)/8 bytes; BIT(64) is MySQL's max.
      val bs = r.slice((c.precision + 7) / 8)
      var v = 0L
      var i = 0
      while (i < bs.length) { v = (v << 8) | (bs(i) & 0xffL); i += 1 }
      UTF8String.fromString(java.lang.Long.toUnsignedString(v))
    case JSON =>
      val len = r.uLE(c.lengthSize).toInt
      // A zero-length value is how MySQL logs a JSON `null` document.
      if (len == 0) UTF8String.fromString("null")
      else UTF8String.fromString(JsonBinary.decodeToString(r.slice(len)))
    case other =>
      throw new IllegalArgumentException(s"unsupported column type code $other (${c.name})")
  }

  /** One row image decoded positionally: one slot per SCHEMA column, with
    * both wire-NULL and not-present columns as null (the map variant below
    * keeps the absent-vs-null distinction by omitting absent keys).
    */
  private def decodeImageFull(r: Reader, cols: Array[BinlogColumn],
      present: Array[Boolean]): Array[Any] = {
    var nPresent = 0
    var i = 0
    while (i < present.length) { if (present(i)) nPresent += 1; i += 1 }
    val nullMap = r.slice((nPresent + 7) / 8)
    val out = new Array[Any](cols.length)
    var j = 0
    i = 0
    while (i < cols.length) {
      if (present(i)) {
        out(i) = if (bit(nullMap, j)) null else decodeValue(r, cols(i))
        j += 1
      }
      i += 1
    }
    out
  }

  /** The decoded-full-array → output representation step shared by the
    * map and positional modes.
    */
  private def imageRepr(full: Array[Any], cols: Array[BinlogColumn],
      present: Array[Boolean], positional: Boolean): Any =
    if (positional) new GenericArrayData(full)
    else {
      var nPresent = 0
      var i = 0
      while (i < present.length) { if (present(i)) nPresent += 1; i += 1 }
      val keys = new Array[Any](nPresent)
      val values = new Array[Any](nPresent)
      var j = 0
      i = 0
      while (i < cols.length) {
        if (present(i)) {
          keys(j) = UTF8String.fromString(cols(i).name)
          values(j) = full(i)
          j += 1
        }
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
    }

  /** A PARTIAL_UPDATE after image: lenenc value_options, the partial-bits
    * bitmap over the table's JSON columns when bit 0 is set, then the
    * usual null bitmap + values — flagged JSON columns holding a diff
    * sequence applied against the before image's document.
    */
  private def decodePartialAfter(r: Reader, cols: Array[BinlogColumn],
      present: Array[Boolean], before: Array[Any]): Array[Any] = {
    val valueOptions = r.lenenc()
    val partial = new Array[Boolean](cols.length)
    if ((valueOptions & 1L) != 0) {
      val jsonIdx = cols.indices.filter(cols(_).tpe == JSON)
      if (jsonIdx.nonEmpty) {
        val bs = r.slice((jsonIdx.length + 7) / 8)
        jsonIdx.zipWithIndex.foreach { case (ci, j) => partial(ci) = bit(bs, j) }
      }
    }
    var nPresent = 0
    var i = 0
    while (i < present.length) { if (present(i)) nPresent += 1; i += 1 }
    val nullMap = r.slice((nPresent + 7) / 8)
    val out = new Array[Any](cols.length)
    var j = 0
    i = 0
    while (i < cols.length) {
      if (present(i)) {
        out(i) =
          if (bit(nullMap, j)) null
          else if (partial(i)) {
            val len = r.uLE(cols(i).lengthSize).toInt
            val diff = r.slice(len)
            val b = before(i)
            if (b == null) throw new IllegalArgumentException(
              s"partial JSON diff against a null/absent before image (${cols(i).name})")
            JsonDiff.applyToText(b.asInstanceOf[UTF8String].toString, diff)
          } else decodeValue(r, cols(i))
        j += 1
      }
      i += 1
    }
    out
  }

  private def decodeRowsImpl(body: Array[Byte], eventType: Int,
      cols: Array[BinlogColumn], positional: Boolean): InternalRow = {
    val isPartial = eventType == PartialUpdateV2
    val isUpdate = eventType == UpdateV1 || eventType == UpdateV2 || isPartial
    val isWrite = eventType == WriteV1 || eventType == WriteV2
    val isDelete = eventType == DeleteV1 || eventType == DeleteV2
    if (!isUpdate && !isWrite && !isDelete)
      throw new IllegalArgumentException(s"not a row event type: $eventType")
    val r = new Reader(body)
    r.skip(6 + 2) // table_id ++ flags (RowEventHeader, binlog.rs:580-585)
    if (eventType >= WriteV2) {
      val extraLen = r.uLE(2).toInt
      if (extraLen > 2) r.skip(extraLen - 2) // length includes itself
    }
    val n = r.lenenc().toInt
    if (n != cols.length)
      throw new IllegalArgumentException(
        s"event declares $n columns, schema has ${cols.length}")
    val mapLen = (n + 7) / 8
    def bitmap(): Array[Boolean] = {
      val bs = r.slice(mapLen)
      Array.tabulate(n)(i => bit(bs, i))
    }
    val present1 = bitmap()
    val present2 = if (isUpdate) bitmap() else null
    def image(present: Array[Boolean]): Any =
      imageRepr(decodeImageFull(r, cols, present), cols, present, positional)
    val data = scala.collection.mutable.ArrayBuffer.empty[Any]
    val old = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (r.remaining > 4) {
      val posBefore = r.pos
      if (isWrite) data += image(present1)
      else if (isDelete) old += image(present1)
      else {
        val fullBefore = decodeImageFull(r, cols, present1)
        old += imageRepr(fullBefore, cols, present1, positional)
        val fullAfter =
          if (isPartial) decodePartialAfter(r, cols, present2, fullBefore)
          else decodeImageFull(r, cols, present2)
        data += imageRepr(fullAfter, cols, present2, positional)
      }
      // A zero-byte image (all-zero present bitmap on a corrupt body) would
      // spin this loop forever; fail loudly like every other malformed case.
      if (r.pos == posBefore)
        throw new IllegalArgumentException(
          s"corrupt row event: image at offset $posBefore consumed no bytes")
    }
    InternalRow(new GenericArrayData(data.toArray),
      new GenericArrayData(old.toArray))
  }

  /** Decode a full row-event body (starting at the post-header payload:
    * table_id ++ flags ++ …). Rows loop until only the 4-byte checksum
    * tail remains (reference loop condition, `binlog.rs:636-639`).
    */
  def decodeRows(body: Array[Byte], eventType: Int, cols: Array[BinlogColumn]): InternalRow =
    decodeRowsImpl(body, eventType, cols, positional = false)

  /** [[decodeRows]] with positional images (`array<array<string>>`, one
    * slot per schema column) — the shape for TABLE_MAP-driven decoding,
    * where the wire carries NO column names: names attach later via
    * `map_from_arrays`/catalog join.
    */
  def decodeRowsPositional(body: Array[Byte], eventType: Int,
      cols: Array[BinlogColumn]): InternalRow =
    decodeRowsImpl(body, eventType, cols, positional = true)

  /** [[decodeRowsPositional]] with the schema supplied at RUNTIME as the
    * column-spec array a [[decodeTableMap]] struct carries — the engine
    * side of the reference's TABLE_MAP pairing (`executor.rs:33-48`):
    * every event decodes with the schema of the TABLE_MAP that preceded
    * it, not a build-time constant. Signedness and charset are not on the
    * wire (MySQL puts them in optional TLV metadata the reference also
    * ignores): columns decode as signed, TEXT as UTF-8; a catalog join
    * refines both downstream.
    */
  def decodeRowsDynamic(body: Array[Byte], eventType: Int,
      colSpecs: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow =
    decodeRowsImpl(body, eventType, colsFromSpecs(colSpecs), positional = true)

  private def colsFromSpecs(
      specs: org.apache.spark.sql.catalyst.util.ArrayData): Array[BinlogColumn] =
    Array.tabulate(specs.numElements()) { i =>
      val s = specs.getStruct(i, 7)
      BinlogColumn(name = "c" + i, tpe = s.getInt(0), maxLength = s.getInt(1),
        fsp = s.getInt(2), lengthSize = s.getInt(3), precision = s.getInt(4),
        scale = s.getInt(5))
    }

  /** The `table_id` (u6 LE) leading every row-event body — the routing key
    * that pairs a row event with its TABLE_MAP (reference RowEventHeader,
    * `binlog.rs:580-585`).
    */
  def rowEventTableId(body: Array[Byte]): Long = new Reader(body).uLE(6)

  /** Per-column spec layout inside [[tableMapType]]: the decoded TABLE_MAP
    * metadata (reference ColMeta, `binlog.rs:336-359`), positionally
    * aligned with [[colsFromSpecs]].
    */
  val colSpecType: StructType = StructType(Seq(
    StructField("tpe", IntegerType, nullable = false),
    StructField("max_length", IntegerType, nullable = false),
    StructField("fsp", IntegerType, nullable = false),
    StructField("length_size", IntegerType, nullable = false),
    StructField("precision", IntegerType, nullable = false),
    StructField("scale", IntegerType, nullable = false),
    StructField("nullable", BooleanType, nullable = false)))

  /** [[decodeTableMap]] output shape. */
  val tableMapType: StructType = StructType(Seq(
    StructField("table_id", LongType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("cols", ArrayType(colSpecType, containsNull = false), nullable = false)))

  // Optional-metadata TLV type codes carried after the nullability bitmap
  // when the server runs `binlog-row-metadata=FULL` (public format:
  // MySQL 8.0 WL#4618 / libbinlogevents rows_event.h
  // Optional_metadata_field_type; MINIMAL emits only SIGNEDNESS +
  // charset + PK). The reference ignores this block entirely — its
  // TABLE_MAP parse stops at the metadata block (`binlog.rs:589-622`).
  final val MetaSignedness = 1
  final val MetaDefaultCharset = 2
  final val MetaColumnCharset = 3
  final val MetaColumnName = 4
  final val MetaSetStrValue = 5
  final val MetaEnumStrValue = 6
  final val MetaGeometryType = 7
  final val MetaSimplePrimaryKey = 8
  final val MetaPrimaryKeyWithPrefix = 9

  /** Numeric types covered by the SIGNEDNESS bitmap, in MySQL's
    * is_numeric_type order (field order, one bit per numeric column,
    * MSB-first within each byte).
    */
  private def isNumericType(tpe: Int): Boolean = tpe match {
    case TINYINT | SMALLINT | MEDIUMINT | INT | BIGINT | FLOAT | DOUBLE | DECIMAL => true
    case _ => false
  }

  /** Character-typed columns covered by the DEFAULT_CHARSET /
    * COLUMN_CHARSET TLVs (ENUM/SET use their own TLV pair 10/11 which we
    * skip as unknown — they render from the member list, not a charset).
    */
  private def isCharType(tpe: Int): Boolean = tpe match {
    case VARCHAR | TEXT | CHAR => true
    case _ => false
  }

  /** [[decodeTableMapFull]] output shape: the base [[tableMapType]] fields
    * plus everything `binlog-row-metadata=FULL` puts on the wire that a
    * schema-free decode needs — column names, per-numeric-column
    * signedness, per-character-column charset ids, simple-PK ordinals and
    * ENUM/SET member lists (empty array for non-ENUM/SET columns).
    */
  val tableMapFullType: StructType = StructType(Seq(
    StructField("table_id", LongType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("cols", ArrayType(colSpecType, containsNull = false), nullable = false),
    StructField("col_names", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("unsigned", ArrayType(BooleanType, containsNull = false), nullable = false),
    StructField("charsets", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("pk", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("type_values",
      ArrayType(ArrayType(StringType, containsNull = false), containsNull = false),
      nullable = false)))

  /** [[decodeTableMap]] plus the optional-metadata TLV block
    * (`binlog-row-metadata=FULL`): parses SIGNEDNESS (bitmap over numeric
    * columns, MSB-first), DEFAULT_CHARSET (lenenc default + absolute
    * (column, charset) override pairs) / COLUMN_CHARSET (one lenenc per
    * character column), COLUMN_NAME (lenenc-prefixed string per column),
    * ENUM/SET_STR_VALUE (per ENUM/SET column: lenenc member count, then
    * lenenc-prefixed members), SIMPLE_PRIMARY_KEY (lenenc absolute column
    * ordinals). Unknown TLV types (GEOMETRY_TYPE, PK_WITH_PREFIX, the
    * ENUM/SET charset pair, vector types…) are skipped by their declared
    * length — the TLV framing exists exactly so readers stay
    * forward-compatible. Columns absent from COLUMN_NAME default to the
    * positional `c<i>` convention. The 4-byte body tail (checksum slot,
    * engine tailed-body convention) bounds the block.
    */
  def decodeTableMapFull(body: Array[Byte]): InternalRow = {
    val r = new Reader(body)
    val (tableId, database, table, specs, types) = parseTableMapBase(r)
    val n = types.length
    val tlvEnd = body.length - 4
    require(tlvEnd >= r.pos,
      s"TABLE_MAP body too short for the 4-byte tail: ${body.length} bytes, pos ${r.pos}")
    val names = Array.tabulate[UTF8String](n)(i => UTF8String.fromString("c" + i))
    val unsigned = new Array[Boolean](n)
    val charsets = new Array[Int](n)
    var pk = Array.emptyIntArray
    val typeValues = Array.fill[Array[Any]](n)(Array.empty[Any])
    while (r.pos < tlvEnd) {
      val t = r.u1()
      val len = r.lenenc().toInt
      val end = r.pos + len
      require(end <= tlvEnd,
        s"optional-metadata TLV type $t (len $len) overruns the event body")
      t match {
        case MetaSignedness =>
          val bits = r.slice(len)
          var k = 0
          var i = 0
          while (i < n) {
            if (isNumericType(types(i))) {
              require(k / 8 < bits.length, "SIGNEDNESS bitmap shorter than numeric column count")
              unsigned(i) = (bits(k / 8) & (0x80 >> (k % 8))) != 0
              k += 1
            }
            i += 1
          }
        case MetaColumnName =>
          var i = 0
          while (r.pos < end) {
            require(i < n, s"COLUMN_NAME carries more than $n names")
            names(i) = UTF8String.fromBytes(r.slice(r.lenenc().toInt))
            i += 1
          }
          require(i == n, s"COLUMN_NAME carries $i of $n names")
        case MetaEnumStrValue | MetaSetStrValue =>
          val want = if (t == MetaEnumStrValue) ENUM else SET
          var i = 0
          while (r.pos < end) {
            while (i < n && types(i) != want) i += 1
            require(i < n, s"TLV $t carries values beyond the last type-$want column")
            val count = r.lenenc().toInt
            typeValues(i) = Array.tabulate[Any](count)(_ =>
              UTF8String.fromBytes(r.slice(r.lenenc().toInt)))
            i += 1
          }
        case MetaSimplePrimaryKey =>
          val b = Array.newBuilder[Int]
          while (r.pos < end) b += r.lenenc().toInt
          pk = b.result()
          pk.foreach(i => require(i >= 0 && i < n, s"SIMPLE_PRIMARY_KEY ordinal $i out of range"))
        case MetaDefaultCharset =>
          val dflt = r.lenenc().toInt
          val overrides = scala.collection.mutable.Map.empty[Int, Int]
          while (r.pos < end) overrides(r.lenenc().toInt) = r.lenenc().toInt
          var i = 0
          while (i < n) {
            if (isCharType(types(i))) charsets(i) = overrides.getOrElse(i, dflt)
            i += 1
          }
        case MetaColumnCharset =>
          var i = 0
          while (r.pos < end) {
            while (i < n && !isCharType(types(i))) i += 1
            require(i < n, "COLUMN_CHARSET carries more entries than character columns")
            charsets(i) = r.lenenc().toInt
            i += 1
          }
        case _ => r.skip(end - r.pos) // forward-compatible: skip by declared length
      }
      require(r.pos == end,
        s"optional-metadata TLV type $t consumed ${r.pos - (end - len)} of $len bytes")
    }
    InternalRow(tableId, database, table,
      new GenericArrayData(specs.asInstanceOf[Array[Any]]),
      new GenericArrayData(names.asInstanceOf[Array[Any]]),
      new GenericArrayData(unsigned),
      new GenericArrayData(charsets),
      new GenericArrayData(pk),
      new GenericArrayData(typeValues.map(vs => new GenericArrayData(vs): Any)))
  }

  /** [[BinlogColumn]]s reconstructed from a [[decodeTableMapFull]] struct:
    * wire-carried names, signedness and ENUM/SET member lists drive the
    * decode — zero external schema, the `binlog-row-metadata=FULL`
    * promise delivered end to end.
    */
  private def colsFromFullMeta(m: InternalRow): Array[BinlogColumn] = {
    val specs = m.getArray(3)
    val names = m.getArray(4)
    val uns = m.getArray(5)
    val vals = m.getArray(8)
    Array.tabulate(specs.numElements()) { i =>
      val s = specs.getStruct(i, colSpecType.length)
      val memArr = vals.getArray(i)
      BinlogColumn(name = names.getUTF8String(i).toString, tpe = s.getInt(0),
        maxLength = s.getInt(1), fsp = s.getInt(2), lengthSize = s.getInt(3),
        precision = s.getInt(4), scale = s.getInt(5),
        unsigned = uns.getBoolean(i),
        members = (0 until memArr.numElements()).map(j => memArr.getUTF8String(j).toString))
    }
  }

  /** Whole-row decode driven ENTIRELY by a paired FULL-metadata TABLE_MAP:
    * images come back as NAMED maps (the [[outputType]] envelope shape) —
    * names, signedness and ENUM/SET labels all from the wire.
    */
  def decodeRowsFullMeta(body: Array[Byte], eventType: Int, meta: InternalRow): InternalRow =
    decodeRowsImpl(body, eventType, colsFromFullMeta(meta), positional = false)

  /** Decode a TABLE_MAP event body (event type 19): table_id u6 ++ flags
    * u2 ++ 1-byte-len + NUL-terminated schema and table names ++ lenenc
    * column count ++ type codes ++ lenenc-length metadata block ++
    * nullability bitmap (reference `binlog.rs:589-622`, metadata parse
    * `:404-470`). Per-type metadata:
    * VARCHAR u2 LE max byte length; CHAR 2 bytes big-endian with the
    * high length bits XOR-folded into the type byte (`binlog.rs:419-426`);
    * FLOAT/DOUBLE u1 size (implied by the type — skipped); TIME2/
    * DATETIME2/TIMESTAMP2 u1 fsp; TEXT/BLOB u1 length-prefix width;
    * DECIMAL u1 precision + u1 scale. Unlike the reference we also parse
    * the trailing nullability bitmap rather than dropping it.
    */
  def decodeTableMap(body: Array[Byte]): InternalRow = {
    val (tableId, database, table, specs, _) = parseTableMapBase(new Reader(body))
    InternalRow(tableId, database, table, new GenericArrayData(specs.asInstanceOf[Array[Any]]))
  }

  /** Shared TABLE_MAP base parse ([[decodeTableMap]] and
    * [[decodeTableMapFull]]): reads through the nullability bitmap and
    * leaves the reader positioned at the optional-metadata block.
    * Returns (table_id, database, table, col specs, revealed type codes).
    */
  private def parseTableMapBase(
      r: Reader): (Long, UTF8String, UTF8String, Array[InternalRow], Array[Int]) = {
    val tableId = r.uLE(6)
    r.skip(2) // flags
    def name(): UTF8String = {
      val len = r.u1()
      val bs = r.slice(len)
      require(r.u1() == 0, "TABLE_MAP name missing NUL terminator")
      UTF8String.fromBytes(bs)
    }
    val database = name()
    val table = name()
    val n = r.lenenc().toInt
    val types = Array.tabulate(n)(_ => r.u1())
    val metaLen = r.lenenc().toInt
    val metaEnd = r.pos + metaLen
    // (maxLength, fsp, lengthSize, precision, scale) per column.
    val meta = Array.tabulate(n) { i =>
      types(i) match {
        case VARCHAR => (r.uLE(2).toInt, 0, 1, 0, 0)
        case CHAR =>
          // ENUM and SET hide behind the STRING type byte on the wire:
          // metadata byte 0 carries the REAL type, byte 1 the pack length
          // (MySQL string meta). A genuine CHAR packs its high length bits
          // 8-9 XOR-folded into the type byte (reference binlog.rs:419-426).
          val b0 = r.u1()
          val b1 = r.u1()
          if (b0 == ENUM || b0 == SET) {
            types(i) = b0
            (b1, 0, 1, 0, 0)
          } else {
            val metadata = (b0 << 8) | b1
            ((((metadata >> 4) & 0x300) ^ 0x300) + (metadata & 0xff), 0, 1, 0, 0)
          }
        case FLOAT | DOUBLE => r.skip(1); (0, 0, 1, 0, 0) // size implied by type
        case TIME2 | DATETIME2 | TIMESTAMP2 => (0, r.u1(), 1, 0, 0)
        case TEXT | JSON => (0, 0, r.u1(), 0, 0)
        case DECIMAL => (0, 0, 1, r.u1(), r.u1())
        case BIT =>
          // byte 0 = bits % 8, byte 1 = whole bytes (field.cc
          // do_save_field_metadata); total bit count restores as b1*8+b0.
          val b0 = r.u1()
          val b1 = r.u1()
          (0, 0, 1, b1 * 8 + b0, 0)
        case _ => (0, 0, 1, 0, 0) // fixed-width ints / DATE / YEAR: no metadata
      }
    }
    require(r.pos == metaEnd,
      s"TABLE_MAP metadata block length mismatch: consumed ${r.pos}, declared end $metaEnd")
    val nullBits = r.slice((n + 7) / 8)
    val specs = Array.tabulate(n) { i =>
      val (maxLength, fsp, lengthSize, precision, scale) = meta(i)
      InternalRow(types(i), maxLength, fsp, lengthSize, precision, scale,
        bit(nullBits, i))
    }
    (tableId, database, table, specs, types)
  }

  // ---- fixture/test encoders (value synthesis; production never encodes) ----

  /** Shared little-endian write — the one implementation every cdc codec
    * ([[BinlogFileCodec]], [[BinlogGtidCodec]], [[BinlogTxnCodec]]) calls
    * instead of hand-rolling its own copy.
    */
  def writeLE(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Shared little-endian read at an absolute offset, bounds-checked. */
  def uLE(bs: Array[Byte], off: Int, n: Int): Long = {
    if (off < 0 || off + n > bs.length)
      throw new IllegalArgumentException(
        s"truncated binlog data: need $n bytes at offset $off, have ${bs.length - off}")
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (bs(off + i) & 0xffL); i -= 1 }
    v
  }

  private val TimeRe = """(-)?(\d+):(\d+):(\d+)(?:\.(\d+))?""".r
  private val DatetimeRe = """(\d+)-(\d+)-(\d+) (\d+):(\d+):(\d+)(?:\.(\d+))?""".r

  private def fracDigits(s: String, fsp: Int): Long =
    if (s == null || s.isEmpty) 0L else (s + "0" * (fsp - s.length)).toLong

  /** Encode one value to its wire bytes (inverse of [[decodeValue]]). */
  def encodeValue(c: BinlogColumn, v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    c.tpe match {
      case TINYINT => writeLE(out, v.asInstanceOf[Number].longValue, 1)
      case SMALLINT => writeLE(out, v.asInstanceOf[Number].longValue, 2)
      case MEDIUMINT => writeLE(out, v.asInstanceOf[Number].longValue, 3)
      case INT => writeLE(out, v.asInstanceOf[Number].longValue, 4)
      case BIGINT => writeLE(out, v.asInstanceOf[Number].longValue, 8)
      case FLOAT =>
        writeLE(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue) & 0xffffffffL, 4)
      case DOUBLE =>
        writeLE(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue), 8)
      case YEAR => writeLE(out, v.asInstanceOf[Number].longValue - 1900, 1)
      case DATE =>
        val Array(y, m, d) = v.toString.split("-").map(_.toInt)
        out.write(BinlogCodec.encodeDate(y, m, d))
      case TIME2 =>
        val TimeRe(neg, h, m, s, f) = v.toString
        out.write(BinlogCodec.encodeTime(neg != null, h.toInt, m.toInt, s.toInt,
          fracDigits(f, c.fsp), c.fsp))
      case DATETIME2 =>
        val DatetimeRe(y, mo, d, h, mi, s, f) = v.toString
        out.write(BinlogCodec.encodeDatetime(y.toInt, mo.toInt, d.toInt, h.toInt,
          mi.toInt, s.toInt, fracDigits(f, c.fsp), c.fsp))
      case TIMESTAMP2 =>
        out.write(BinlogCodec.encodeTimestamp(v.asInstanceOf[Number].longValue, 0L, c.fsp))
      case DECIMAL =>
        val unscaled = new java.math.BigDecimal(v.toString)
          .setScale(c.scale).unscaledValue.longValueExact
        out.write(BinlogCodec.encodeDecimalUnscaled(unscaled, c.precision, c.scale))
      case VARCHAR | CHAR =>
        val bs = v.toString.getBytes("UTF-8")
        writeLE(out, bs.length.toLong, if (c.maxLength > 255) 2 else 1)
        out.write(bs)
      case TEXT =>
        val bs =
          if (c.binary) v match {
            case raw: Array[Byte] => raw
            case hex =>
              val h = hex.toString
              require(h.length % 2 == 0, s"odd-length hex fixture value: $h")
              h.grouped(2).map(g => Integer.parseInt(g, 16).toByte).toArray
          }
          else v.toString.getBytes("UTF-8")
        writeLE(out, bs.length.toLong, c.lengthSize)
        out.write(bs)
      case ENUM =>
        val idx = v match {
          case n: Number => n.intValue
          case s =>
            val i = c.members.indexOf(s.toString)
            require(i >= 0, s"'$s' is not an ENUM member of ${c.name}")
            i + 1
        }
        writeLE(out, idx.toLong, c.maxLength)
      case SET =>
        val mask = v match {
          case n: Number => n.longValue
          case s =>
            s.toString.split(",").iterator.filter(_.nonEmpty).foldLeft(0L) { (m, nm) =>
              val i = c.members.indexOf(nm)
              require(i >= 0, s"'$nm' is not a SET member of ${c.name}")
              m | (1L << i)
            }
        }
        writeLE(out, mask, c.maxLength)
      case BIT =>
        val bits = v.asInstanceOf[Number].longValue
        var i = (c.precision + 7) / 8 - 1
        while (i >= 0) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i -= 1 }
      case JSON =>
        val doc = JsonBinary.encode(v.toString)
        writeLE(out, doc.length.toLong, c.lengthSize)
        out.write(doc)
      case other =>
        throw new IllegalArgumentException(s"unsupported column type code $other")
    }
    out.toByteArray
  }

  private def writeImage(out: java.io.ByteArrayOutputStream,
      cols: Array[BinlogColumn], present: Array[Boolean], vals: Seq[Any]): Unit = {
    val presentIdx = cols.indices.filter(present)
    val nullMap = new Array[Byte]((presentIdx.length + 7) / 8)
    presentIdx.zipWithIndex.foreach { case (ci, j) =>
      if (vals(ci) == null) nullMap(j / 8) = (nullMap(j / 8) | (1 << (j % 8))).toByte
    }
    out.write(nullMap)
    presentIdx.foreach { ci =>
      if (vals(ci) != null) out.write(encodeValue(cols(ci), vals(ci)))
    }
  }

  /** Encode a whole row-event body. For UPDATE, `images` alternates
    * old,new,old,new…; each image's values align with `cols` (positions
    * where `present` is false are ignored, nulls set the null bit).
    * The checksum tail is 4 zero bytes (neither the reference nor this
    * decoder validates it).
    */
  def encodeRows(eventType: Int, cols: Array[BinlogColumn], images: Seq[Seq[Any]],
      present: Array[Boolean] = null, presentNew: Array[Boolean] = null,
      tableId: Long = 1L): Array[Byte] = {
    val isUpdate = eventType == UpdateV1 || eventType == UpdateV2
    if (isUpdate) require(images.length % 2 == 0, "UPDATE images must be old/new pairs")
    val p1 = if (present != null) present else Array.fill(cols.length)(true)
    val p2 = if (presentNew != null) presentNew else p1
    val out = new java.io.ByteArrayOutputStream
    writeLE(out, tableId, 6)
    writeLE(out, 0L, 2) // flags
    if (eventType >= WriteV2) writeLE(out, 2L, 2) // extra area: just its own length
    require(cols.length < 0xfb, "lenenc 1-byte form only in fixtures")
    out.write(cols.length)
    def writeBitmap(p: Array[Boolean]): Unit = {
      val bs = new Array[Byte]((cols.length + 7) / 8)
      p.zipWithIndex.foreach { case (b, i) =>
        if (b) bs(i / 8) = (bs(i / 8) | (1 << (i % 8))).toByte
      }
      out.write(bs)
    }
    writeBitmap(p1)
    if (isUpdate) writeBitmap(p2)
    images.zipWithIndex.foreach { case (img, k) =>
      writeImage(out, cols, if (isUpdate && k % 2 == 1) p2 else p1, img)
    }
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  /** Fixture encoder for PARTIAL_UPDATE_ROWS_EVENT (inverse of the
    * [[decodePartialAfter]] path): `images` alternate old,new…;
    * `diffCols` names the JSON schema columns whose NEW-image value is a
    * raw [[JsonDiff]] byte sequence (`Array[Byte]`) instead of a
    * document. Every after image carries value_options = PARTIAL_JSON and
    * the partial-bits bitmap over the table's JSON columns.
    */
  def encodePartialRows(cols: Array[BinlogColumn], images: Seq[Seq[Any]],
      diffCols: Set[Int], tableId: Long = 1L): Array[Byte] = {
    require(images.length % 2 == 0, "PARTIAL_UPDATE images must be old/new pairs")
    require(diffCols.forall(ci => cols(ci).tpe == JSON),
      "diffCols must name JSON columns")
    val jsonIdx = cols.indices.filter(cols(_).tpe == JSON)
    val out = new java.io.ByteArrayOutputStream
    writeLE(out, tableId, 6)
    writeLE(out, 0L, 2) // flags
    writeLE(out, 2L, 2) // extra area: just its own length
    require(cols.length < 0xfb, "lenenc 1-byte form only in fixtures")
    out.write(cols.length)
    val fullBitmap = new Array[Byte]((cols.length + 7) / 8)
    cols.indices.foreach(i => fullBitmap(i / 8) = (fullBitmap(i / 8) | (1 << (i % 8))).toByte)
    out.write(fullBitmap)
    out.write(fullBitmap)
    images.zipWithIndex.foreach { case (img, k) =>
      if (k % 2 == 0) writeImage(out, cols, Array.fill(cols.length)(true), img)
      else {
        out.write(1) // value_options: bit 0 = PARTIAL_JSON
        val pbits = new Array[Byte]((jsonIdx.length + 7) / 8)
        jsonIdx.zipWithIndex.foreach { case (ci, j) =>
          if (diffCols(ci)) pbits(j / 8) = (pbits(j / 8) | (1 << (j % 8))).toByte
        }
        if (jsonIdx.nonEmpty) out.write(pbits)
        val nullMap = new Array[Byte]((cols.length + 7) / 8)
        cols.indices.foreach { ci =>
          if (img(ci) == null) nullMap(ci / 8) = (nullMap(ci / 8) | (1 << (ci % 8))).toByte
        }
        out.write(nullMap)
        cols.indices.foreach { ci =>
          img(ci) match {
            case null => ()
            case diff: Array[Byte] if diffCols(ci) =>
              writeLE(out, diff.length.toLong, cols(ci).lengthSize)
              out.write(diff)
            case v => out.write(encodeValue(cols(ci), v))
          }
        }
      }
    }
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail
    out.toByteArray
  }

  /** Encode a TABLE_MAP event body (inverse of [[decodeTableMap]];
    * fixture/test use only). Nullability defaults to all-nullable.
    */
  def encodeTableMap(tableId: Long, database: String, table: String,
      cols: Array[BinlogColumn], nullable: Array[Boolean] = null): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    encodeTableMapBase(out, tableId, database, table, cols, nullable)
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail (engine convention)
    out.toByteArray
  }

  /** MySQL length-encoded integer write (full range; inverse of
    * `Reader.lenenc`).
    */
  def writeLenenc(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0 && v < 0xfb) out.write(v.toInt)
    else if (v >= 0 && v <= 0xffffL) { out.write(0xfc); writeLE(out, v, 2) }
    else if (v >= 0 && v <= 0xffffffL) { out.write(0xfd); writeLE(out, v, 3) }
    else { out.write(0xfe); writeLE(out, v, 8) }

  /** [[encodeTableMap]] plus the `binlog-row-metadata=FULL` optional TLV
    * block (fixture/test use; inverse of [[decodeTableMapFull]]):
    * SIGNEDNESS over numeric columns (MSB-first), DEFAULT_CHARSET (no
    * overrides — one collation per fixture table), COLUMN_NAME,
    * ENUM/SET_STR_VALUE from each column's `members`, SIMPLE_PRIMARY_KEY
    * absolute ordinals.
    */
  def encodeTableMapFull(tableId: Long, database: String, table: String,
      cols: Array[BinlogColumn], nullable: Array[Boolean] = null,
      pk: Seq[Int] = Nil, defaultCharset: Int = 255): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    encodeTableMapBase(out, tableId, database, table, cols, nullable)
    def tlv(t: Int)(payload: java.io.ByteArrayOutputStream => Unit): Unit = {
      val p = new java.io.ByteArrayOutputStream
      payload(p)
      out.write(t)
      writeLenenc(out, p.size().toLong)
      p.writeTo(out)
    }
    val numeric = cols.filter(c => isNumericType(c.tpe))
    if (numeric.nonEmpty) tlv(MetaSignedness) { p =>
      val bits = new Array[Byte]((numeric.length + 7) / 8)
      numeric.zipWithIndex.foreach { case (c, k) =>
        if (c.unsigned) bits(k / 8) = (bits(k / 8) | (0x80 >> (k % 8))).toByte
      }
      p.write(bits)
    }
    if (cols.exists(c => isCharType(c.tpe)))
      tlv(MetaDefaultCharset)(p => writeLenenc(p, defaultCharset.toLong))
    tlv(MetaColumnName) { p =>
      cols.foreach { c =>
        val bs = c.name.getBytes("UTF-8")
        writeLenenc(p, bs.length.toLong)
        p.write(bs)
      }
    }
    def strValues(want: Int, t: Int): Unit =
      if (cols.exists(_.tpe == want)) tlv(t) { p =>
        cols.filter(_.tpe == want).foreach { c =>
          writeLenenc(p, c.members.length.toLong)
          c.members.foreach { m =>
            val bs = m.getBytes("UTF-8")
            writeLenenc(p, bs.length.toLong)
            p.write(bs)
          }
        }
      }
    strValues(ENUM, MetaEnumStrValue)
    strValues(SET, MetaSetStrValue)
    if (pk.nonEmpty) tlv(MetaSimplePrimaryKey)(p => pk.foreach(i => writeLenenc(p, i.toLong)))
    out.write(Array[Byte](0, 0, 0, 0)) // checksum tail (engine convention)
    out.toByteArray
  }

  private def encodeTableMapBase(out: java.io.ByteArrayOutputStream,
      tableId: Long, database: String, table: String,
      cols: Array[BinlogColumn], nullable: Array[Boolean]): Unit = {
    writeLE(out, tableId, 6)
    writeLE(out, 0L, 2) // flags
    def name(s: String): Unit = {
      val bs = s.getBytes("UTF-8")
      require(bs.length < 256, s"TABLE_MAP name too long: $s")
      out.write(bs.length)
      out.write(bs)
      out.write(0) // NUL terminator
    }
    name(database)
    name(table)
    require(cols.length < 0xfb, "lenenc 1-byte form only in fixtures")
    out.write(cols.length)
    // ENUM/SET go on the wire as the STRING type byte; the real type
    // travels in metadata byte 0 (mirrors decodeTableMap's CHAR branch).
    cols.foreach(c => out.write(if (c.tpe == ENUM || c.tpe == SET) CHAR else c.tpe))
    val meta = new java.io.ByteArrayOutputStream
    cols.foreach { c =>
      c.tpe match {
        case VARCHAR => writeLE(meta, c.maxLength.toLong, 2)
        case ENUM | SET =>
          meta.write(c.tpe)
          meta.write(c.maxLength) // pack length
        case CHAR =>
          require(c.maxLength <= 1023, s"CHAR maxLength ${c.maxLength} > 1023")
          meta.write(CHAR ^ ((c.maxLength & 0x300) >> 4))
          meta.write(c.maxLength & 0xff)
        case FLOAT => meta.write(4)
        case DOUBLE => meta.write(8)
        case TIME2 | DATETIME2 | TIMESTAMP2 => meta.write(c.fsp)
        case TEXT | JSON => meta.write(c.lengthSize)
        case DECIMAL => meta.write(c.precision); meta.write(c.scale)
        case BIT => meta.write(c.precision % 8); meta.write(c.precision / 8)
        case _ => ()
      }
    }
    val metaBytes = meta.toByteArray
    require(metaBytes.length < 0xfb, "lenenc 1-byte form only in fixtures")
    out.write(metaBytes.length)
    out.write(metaBytes)
    val nul = if (nullable != null) nullable else Array.fill(cols.length)(true)
    val bits = new Array[Byte]((cols.length + 7) / 8)
    nul.zipWithIndex.foreach { case (b, i) =>
      if (b) bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
    }
    out.write(bits)
  }
}

/** MySQL type string → [[BinlogColumn]] — ties the catalog's `mysqlType`
  * strings (the reference's `FieldMeta`) to the raw-row decoder, replacing
  * the excluded TABLE_MAP pairing as the schema source.
  *
  * `bytesPerChar` converts the DDL's CHARACTER count to the BYTE
  * `maxLength` the wire format keys its prefix width on: 1 for latin1
  * (the default here, matching the fixtures), 3 for utf8, 4 for utf8mb4.
  * Getting this wrong on a multi-byte-charset table mis-sizes the length
  * prefix for columns whose byte capacity crosses 255 and garbles the
  * rest of the row.
  */
object BinlogSchema {
  private val Paren = """(\w+)\((\d+)(?:\s*,\s*(\d+))?\)\s*(unsigned)?""".r
  // '...' member literals; MySQL escapes an embedded quote by doubling it.
  private val Member = """'((?:[^']|'')*)'""".r

  def column(name: String, mysqlType: String, bytesPerChar: Int = 1): BinlogColumn = {
    import BinlogRowCodec._
    // zerofill is display-only; MySQL renders it after `unsigned`
    val t = mysqlType.trim.toLowerCase.stripSuffix("zerofill").trim
    if (t.startsWith("enum(") || t.startsWith("set(")) {
      // member literals are case-SENSITIVE data — parse them from the
      // original string, not the lowercased copy used for type matching
      val members = Member.findAllMatchIn(mysqlType.trim)
        .map(_.group(1).replace("''", "'")).toSeq
      require(members.nonEmpty, s"no members in: $mysqlType")
      return if (t.startsWith("enum(")) {
        require(members.size <= 0xffff, s"ENUM with ${members.size} members")
        BinlogColumn(name, ENUM,
          maxLength = if (members.size > 255) 2 else 1, members = members)
      } else {
        require(members.size <= 64, s"SET with ${members.size} members")
        // MySQL packs a SET into 1, 2, 3, 4 or 8 bytes — never 5-7
        // (sql/field.h get_set_pack_length: (elements+7)/8, jumping to 8
        // past 4). Using the raw byte count for 33-56 members would
        // misalign every column after a real server's SET value.
        val packed = (members.size + 7) / 8
        BinlogColumn(name, SET,
          maxLength = if (packed > 4) 8 else packed, members = members)
      }
    }
    val unsigned = t.endsWith("unsigned")
    val (base, a, b) = t match {
      case Paren(bs, x, y, _) => (bs, x.toInt, if (y == null) 0 else y.toInt)
      case _ => (t.stripSuffix(" unsigned").trim, 0, 0)
    }
    base match {
      case "tinyint" => BinlogColumn(name, TINYINT, unsigned = unsigned)
      case "smallint" => BinlogColumn(name, SMALLINT, unsigned = unsigned)
      case "mediumint" => BinlogColumn(name, MEDIUMINT, unsigned = unsigned)
      case "int" | "integer" => BinlogColumn(name, INT, unsigned = unsigned)
      case "bigint" => BinlogColumn(name, BIGINT, unsigned = unsigned)
      case "float" => BinlogColumn(name, FLOAT)
      case "double" => BinlogColumn(name, DOUBLE)
      case "year" => BinlogColumn(name, YEAR)
      case "date" => BinlogColumn(name, DATE)
      case "time" => BinlogColumn(name, TIME2, fsp = a)
      case "datetime" => BinlogColumn(name, DATETIME2, fsp = a)
      case "timestamp" => BinlogColumn(name, TIMESTAMP2, fsp = a)
      case "decimal" | "numeric" => BinlogColumn(name, DECIMAL, precision = a, scale = b)
      case "char" => BinlogColumn(name, CHAR, maxLength = a * bytesPerChar)
      case "varchar" => BinlogColumn(name, VARCHAR, maxLength = a * bytesPerChar)
      case "tinytext" => BinlogColumn(name, TEXT, lengthSize = 1)
      case "tinyblob" => BinlogColumn(name, TEXT, lengthSize = 1, binary = true)
      case "text" => BinlogColumn(name, TEXT, lengthSize = 2)
      case "blob" => BinlogColumn(name, TEXT, lengthSize = 2, binary = true)
      case "mediumtext" => BinlogColumn(name, TEXT, lengthSize = 3)
      case "mediumblob" => BinlogColumn(name, TEXT, lengthSize = 3, binary = true)
      case "longtext" => BinlogColumn(name, TEXT, lengthSize = 4)
      case "longblob" => BinlogColumn(name, TEXT, lengthSize = 4, binary = true)
      case "bit" =>
        val bits = if (a == 0) 1 else a // DDL `bit` means bit(1)
        require(bits <= 64, s"bit($bits) exceeds MySQL's 64-bit max")
        BinlogColumn(name, BIT, precision = bits)
      case "json" => BinlogColumn(name, JSON, lengthSize = 4)
      case other => throw new IllegalArgumentException(s"unsupported mysql type: $other")
    }
  }

  def fromMysqlTypes(cols: Seq[(String, String)],
      bytesPerChar: Int = 1): Array[BinlogColumn] =
    cols.map { case (n, t) => column(n, t, bytesPerChar) }.toArray
}

/** Codegen'd whole-row decode: BINARY event body + INT event type →
  * struct(data: array&lt;map&lt;string,string&gt;&gt;, old: …). One static
  * kernel call per row inside whole-stage codegen. The schema is held as a
  * Seq (not Array) so case-class equality is structural — two expressions
  * built from equal column specs canonicalize/CSE like any other
  * expression; the kernel-facing Array is derived lazily.
  */
case class BinlogRowsDecode(left: Expression, right: Expression,
    cols: Seq[BinlogColumn]) extends BinaryExpression with Serializable {
  @transient private lazy val colsArr: Array[BinlogColumn] = cols.toArray
  override def dataType: DataType = BinlogRowCodec.outputType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"BinlogRowsDecode expects (BINARY, INT), got (${l.sql}, ${r.sql})")
  }
  override protected def nullSafeEval(body: Any, tpe: Any): Any =
    BinlogRowCodec.decodeRows(body.asInstanceOf[Array[Byte]],
      tpe.asInstanceOf[Int], colsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cols", colsArr, "graft.cdc.BinlogColumn[]")
    defineCodeGen(ctx, ev, (b, t) => s"graft.cdc.BinlogRowCodec.decodeRows($b, $t, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinlogRowsDecode =
    copy(left = newLeft, right = newRight)
}

object BinlogRowsDecode {
  def apply(body: Column, eventType: Column, cols: Array[BinlogColumn]): Column =
    ColumnBridge.column(BinlogRowsDecode(
      ColumnBridge.expression(body), ColumnBridge.expression(eventType),
      cols.toIndexedSeq))
}

/** Codegen'd event split: whole event bytes → header fields + payload
  * (see [[BinlogRowCodec.decodeHeader]]). With this, a raw event stream
  * needs no external metadata at all: split, dispatch on `event_type`,
  * decode rows.
  */
case class BinlogEventSplit(child: Expression, packetMarker: Boolean)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = BinlogRowCodec.headerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogEventSplit expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogRowCodec.decodeHeader(input.asInstanceOf[Array[Byte]], packetMarker)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.cdc.BinlogRowCodec.decodeHeader($c, $packetMarker)")
  override protected def withNewChildInternal(newChild: Expression): BinlogEventSplit =
    copy(child = newChild)
}

object BinlogEventSplit {
  def apply(event: Column, packetMarker: Boolean): Column =
    ColumnBridge.column(BinlogEventSplit(ColumnBridge.expression(event), packetMarker))
}

/** Codegen'd TABLE_MAP decode: event body bytes → (table_id, database,
  * table, per-column decode specs) — the wire-side schema source that
  * replaces build-time column specs (see [[BinlogRowCodec.decodeTableMap]]).
  */
case class BinlogTableMapDecode(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = BinlogRowCodec.tableMapType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogTableMapDecode expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogRowCodec.decodeTableMap(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogRowCodec.decodeTableMap($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogTableMapDecode =
    copy(child = newChild)
}

/** Codegen'd FULL-metadata TABLE_MAP decode (`binlog-row-metadata=FULL`):
  * event body bytes → base schema plus wire-carried column names,
  * signedness, charsets, simple-PK ordinals and ENUM/SET member lists —
  * see [[BinlogRowCodec.decodeTableMapFull]].
  */
case class BinlogTableMapFullDecode(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = BinlogRowCodec.tableMapFullType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogTableMapFullDecode expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogRowCodec.decodeTableMapFull(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogRowCodec.decodeTableMapFull($c)")
  override protected def withNewChildInternal(
      newChild: Expression): BinlogTableMapFullDecode =
    copy(child = newChild)
}

/** Codegen'd whole-row decode with a RUNTIME FULL-metadata schema: (body,
  * event type, [[BinlogRowCodec.tableMapFullType]] struct from the paired
  * TABLE_MAP) → NAMED envelope-shaped images ([[BinlogRowCodec.outputType]]).
  * Names, signedness and ENUM/SET labels all come off the wire — the
  * zero-external-schema decode `binlog-row-metadata=FULL` exists for.
  */
case class BinlogRowsDecodeFullMeta(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with Serializable {
  override def dataType: DataType = BinlogRowCodec.outputType
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, s: StructType)
          if s.length == BinlogRowCodec.tableMapFullType.length =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"BinlogRowsDecodeFullMeta expects (BINARY, INT, STRUCT(tablemap_full)), " +
          s"got (${f.sql}, ${s.sql}, ${t.sql})")
    }
  override protected def nullSafeEval(body: Any, tpe: Any, meta: Any): Any =
    BinlogRowCodec.decodeRowsFullMeta(body.asInstanceOf[Array[Byte]],
      tpe.asInstanceOf[Int], meta.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, t, m) =>
      s"graft.cdc.BinlogRowCodec.decodeRowsFullMeta($b, $t, $m)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BinlogRowsDecodeFullMeta =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd row-event table_id extraction (u6 LE body prefix) — the
  * pairing key between a row event and its TABLE_MAP.
  */
case class BinlogRowTableId(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BinlogRowTableId expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BinlogRowCodec.rowEventTableId(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.BinlogRowCodec.rowEventTableId($c)")
  override protected def withNewChildInternal(newChild: Expression): BinlogRowTableId =
    copy(child = newChild)
}

/** Codegen'd whole-row decode with a RUNTIME schema: (body, event type,
  * column-spec array from a paired TABLE_MAP) → positional images. The
  * dynamic sibling of [[BinlogRowsDecode]] — see
  * [[BinlogRowCodec.decodeRowsDynamic]].
  */
case class BinlogRowsDecodeDynamic(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with Serializable {
  override def dataType: DataType = BinlogRowCodec.positionalType
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, ArrayType(s: StructType, _))
          if s.length == BinlogRowCodec.colSpecType.length =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"BinlogRowsDecodeDynamic expects (BINARY, INT, ARRAY<STRUCT(colspec)>), " +
          s"got (${f.sql}, ${s.sql}, ${t.sql})")
    }
  override protected def nullSafeEval(body: Any, tpe: Any, specs: Any): Any =
    BinlogRowCodec.decodeRowsDynamic(body.asInstanceOf[Array[Byte]],
      tpe.asInstanceOf[Int],
      specs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, t, c) =>
      s"graft.cdc.BinlogRowCodec.decodeRowsDynamic($b, $t, $c)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BinlogRowsDecodeDynamic =
    copy(first = newFirst, second = newSecond, third = newThird)
}
