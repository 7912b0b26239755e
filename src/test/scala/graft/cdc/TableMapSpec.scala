package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** TABLE_MAP decode (reference binlog.rs:589-622, metadata parse :404-470)
  * and the dynamic (runtime-schema) row decode it feeds. Wire bytes are
  * PINNED in goldens — symmetric encode/decode round-trips alone cannot
  * catch a wire-format unit error.
  */
class TableMapSpec extends SparkSpec {

  import BinlogRowCodec._

  private val colsA = BinlogSchema.fromMysqlTypes(Seq(
    "pk" -> "bigint", "price" -> "decimal(12,2)", "name" -> "varchar(300)",
    "code" -> "char(4)", "created" -> "datetime(3)", "note" -> "text"))

  test("golden: TABLE_MAP wire bytes, field by field") {
    val body = encodeTableMap(5L, "db1", "ta", colsA,
      nullable = Array(false, true, true, true, true, true))
    // table_id u6 LE + flags u2
    assert(body.take(8).toSeq == Seq[Byte](5, 0, 0, 0, 0, 0, 0, 0))
    // schema name: len 3, "db1", NUL; table name: len 2, "ta", NUL
    assert(body.slice(8, 13).toSeq == Seq[Byte](3, 'd', 'b', '1', 0))
    assert(body.slice(13, 17).toSeq == Seq[Byte](2, 't', 'a', 0))
    // column count, then type codes: BIGINT DECIMAL VARCHAR CHAR DATETIME2 TEXT
    assert(body(17) == 6)
    assert(body.slice(18, 24).map(_ & 0xff).toSeq == Seq(8, 246, 15, 254, 18, 252))
    // meta block: len 8 = decimal(2) + varchar(2) + char(2) + dt fsp(1) + text(1)
    assert(body(24) == 8)
    assert(body.slice(25, 33).map(_ & 0xff).toSeq == Seq(
      12, 2, // DECIMAL precision, scale
      44, 1, // VARCHAR max_length 300, little-endian (0x012C)
      254, 4, // CHAR(4): len<256 leaves the type byte unfolded, then len
      3, // DATETIME2 fsp
      2)) // TEXT length_size
    // nullability bitmap: col 0 NOT NULL, cols 1-5 nullable -> 0b00111110
    assert((body(33) & 0xff) == 0x3e)
    // 4-byte zero tail (engine-wide tailed-body convention)
    assert(body.slice(34, 38).toSeq == Seq[Byte](0, 0, 0, 0))
    assert(body.length == 38)
  }

  test("TABLE_MAP round-trips through the decoder with exact metadata") {
    val body = encodeTableMap(77L, "shop", "orders", colsA,
      nullable = Array(false, true, false, true, true, true))
    val spark2 = spark
    import spark2.implicits._
    val row = Seq(body).toDF("b")
      .select(BinlogDecode.tableMap(col("b")).as("tm"))
      .select("tm.table_id", "tm.database", "tm.table", "tm.cols")
      .collect().head
    assert(row.getLong(0) == 77L)
    assert(row.getString(1) == "shop")
    assert(row.getString(2) == "orders")
    val specs = row.getSeq[Row](3)
    assert(specs.map(_.getInt(0)) == Seq(8, 246, 15, 254, 18, 252))
    assert(specs(1).getInt(4) == 12 && specs(1).getInt(5) == 2, "decimal p/s")
    assert(specs(2).getInt(1) == 300, "varchar max_length")
    assert(specs(3).getInt(1) == 4, "char max_length")
    assert(specs(4).getInt(2) == 3, "datetime fsp")
    assert(specs(5).getInt(3) == 2, "text length_size")
    assert(specs.map(_.getBoolean(6)) == Seq(false, true, false, true, true, true))
  }

  test("CHAR metadata survives the >255 XOR-fold (lengths 4, 255, 256, 1023)") {
    for (len <- Seq(4, 255, 256, 1023)) {
      val cols = Array(BinlogSchema.column("c", s"char(1)").copy(maxLength = len))
      val body = encodeTableMap(1L, "d", "t", cols)
      val got = decodeTableMap(body).getArray(3).getStruct(0, 7).getInt(1)
      assert(got == len, s"char($len) decoded as $got")
    }
  }

  test("ENUM/SET hide behind the STRING type byte; BIT/JSON carry their meta") {
    val cols = Array(
      BinlogSchema.column("e", "enum('x','y','z')"),
      BinlogSchema.column("s", "set('a','b','c','d','e','f','g','h','i')"),
      BinlogSchema.column("b", "bit(13)"),
      BinlogSchema.column("j", "json"))
    val body = encodeTableMap(3L, "d", "t", cols)
    // header(8) + "d"(3) + "t"(3) + count(1) = wire types start at 15
    // wire type codes: ENUM/SET as STRING(254), BIT 16, JSON 245
    assert(body(14) == 4)
    assert(body.slice(15, 19).map(_ & 0xff).toSeq == Seq(254, 254, 16, 245))
    // meta: (real_type, pack) ×2, (bits%8, bytes), (length_size)
    assert(body(19) == 7) // meta block length
    assert(body.slice(20, 27).map(_ & 0xff).toSeq == Seq(
      247, 1, // ENUM, 1-byte pack (3 members)
      248, 2, // SET, 2-byte pack (9 members)
      5, 1,   // bit(13): 13%8=5, 13/8=1
      4))     // JSON length-prefix width
    val specs = decodeTableMap(body).getArray(3)
    def spec(i: Int) = specs.getStruct(i, 7)
    assert(spec(0).getInt(0) == ENUM && spec(0).getInt(1) == 1)
    assert(spec(1).getInt(0) == SET && spec(1).getInt(1) == 2)
    assert(spec(2).getInt(0) == BIT && spec(2).getInt(4) == 13)
    assert(spec(3).getInt(0) == JSON && spec(3).getInt(3) == 4)
    // and the dynamic row decode renders index/mask/uint/json-text
    val spark2 = spark
    import spark2.implicits._
    val rows = encodeRows(WriteV2, cols, Seq(Seq("y", "a,i", 8191L, "[1,2]")))
    val got = Seq((body, rows)).toDF("tm", "rows")
      .select(BinlogDecode.tableMap(col("tm")).as("m"), col("rows"))
      .select(BinlogDecode.rowsDynamic(col("rows"), lit(WriteV2), col("m.cols")).as("r"))
      .select(explode(col("r.data")).as("vals"))
      .collect().head.getSeq[String](0)
    // members aren't on the wire: dynamic decode renders raw index/mask
    assert(got == Seq("2", "257", "8191", "[1,2]"))
  }

  test("dynamic row decode: TABLE_MAP schema drives the value decode") {
    val spark2 = spark
    import spark2.implicits._
    val tmBody = encodeTableMap(9L, "db1", "ta", colsA)
    val rowsBody = encodeRows(WriteV2, colsA, Seq(
      Seq[Any](42L, "123.45", "x" * 300, "ab", "2024-02-29 12:30:45.123", "note-1"),
      Seq[Any](7L, null, "y", null, null, "note-2")), tableId = 9L)
    val df = Seq((tmBody, rowsBody)).toDF("tm", "rows")
      .select(BinlogDecode.tableMap(col("tm")).as("m"), col("rows"))
      .select(BinlogDecode.rowsDynamic(col("rows"), lit(WriteV2), col("m.cols")).as("r"))
      .select(explode(col("r.data")).as("vals"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got.length == 2)
    assert(got(0) == Seq("42", "123.45", "x" * 300, "ab", "2024-02-29 12:30:45.123", "note-1"))
    assert(got(1) == Seq("7", null, "y", null, null, "note-2"))
    // The decode consumed the TABLE_MAP's table_id too.
    assert(rowEventTableId(rowsBody) == 9L)
  }

  // ---- binlog-row-metadata=FULL optional TLV block (WL#4618) ----

  private val colsFull = BinlogSchema.fromMysqlTypes(Seq(
    "pk" -> "bigint", "status" -> "enum('F','O','P')",
    "cust" -> "int unsigned", "price" -> "decimal(12,2)"))

  test("golden: FULL optional-metadata TLV wire bytes") {
    val body = encodeTableMapFull(7L, "db1", "ta", colsFull, pk = Seq(0))
    // base: id(6)+flags(2)+"db1"(5)+"ta"(4)+count(1)+types(4)+metaLen(1)
    //       +meta(4: enum(247,1) + decimal(12,2))+nullbits(1) = 28 bytes
    val tlv = body.slice(28, body.length - 4).map(_ & 0xff).toSeq
    def str(s: String): Seq[Int] = s.length +: s.map(_.toInt)
    assert(tlv ==
      Seq(1, 1, 0x40) ++ // SIGNEDNESS: pk/cust/price numeric bits, MSB-first
      (Seq(4, 21) ++ // COLUMN_NAME, 21 payload bytes
        str("pk") ++ str("status") ++ str("cust") ++ str("price")) ++
      (Seq(6, 7, 3) ++ // ENUM_STR_VALUE: 7 payload bytes, 3 members
        str("F") ++ str("O") ++ str("P")) ++
      Seq(8, 1, 0)) // SIMPLE_PRIMARY_KEY: ordinal 0
    // no DEFAULT_CHARSET TLV: no character-typed column in this schema
  }

  test("FULL decode: names, signedness, PK and ENUM members off the wire") {
    val body = encodeTableMapFull(7L, "testdb", "orders", colsFull, pk = Seq(0))
    val m = decodeTableMapFull(body)
    assert(m.getLong(0) == 7L)
    assert(m.getUTF8String(2).toString == "orders")
    val names = m.getArray(4)
    assert((0 until 4).map(names.getUTF8String(_).toString) ==
      Seq("pk", "status", "cust", "price"))
    val uns = m.getArray(5)
    assert((0 until 4).map(uns.getBoolean) == Seq(false, false, true, false))
    assert(m.getArray(7).toIntArray().toSeq == Seq(0))
    val vals = m.getArray(8)
    val statusMembers = vals.getArray(1)
    assert((0 until 3).map(statusMembers.getUTF8String(_).toString) == Seq("F", "O", "P"))
    assert(vals.getArray(0).numElements() == 0 && vals.getArray(2).numElements() == 0)
    // base decode of the same body still works and agrees on the specs
    val base = decodeTableMap(body)
    assert(base.getArray(3).getStruct(1, 7).getInt(0) == ENUM)
  }

  test("FULL decode: DEFAULT_CHARSET fills character columns; unknown TLVs skip") {
    val cols = BinlogSchema.fromMysqlTypes(Seq(
      "id" -> "int", "name" -> "varchar(40)", "note" -> "text"))
    val body = encodeTableMapFull(1L, "d", "t", cols, defaultCharset = 224)
    val m = decodeTableMapFull(body)
    assert(m.getArray(6).toIntArray().toSeq == Seq(0, 224, 224))
    // splice an unknown TLV (GEOMETRY_TYPE=7, 2 payload bytes) before the
    // tail: forward-compat skip must leave every parsed field intact
    val spliced = body.dropRight(4) ++ Array[Byte](7, 2, 9, 9) ++ body.takeRight(4)
    val m2 = decodeTableMapFull(spliced)
    assert(m2.getArray(6).toIntArray().toSeq == Seq(0, 224, 224))
    assert((0 until 3).map(m2.getArray(4).getUTF8String(_).toString) ==
      Seq("id", "name", "note"))
  }

  test("FULL decode: COLUMN_CHARSET variant maps one lenenc per char column") {
    val cols = BinlogSchema.fromMysqlTypes(Seq(
      "id" -> "int", "name" -> "varchar(40)", "note" -> "text"))
    // hand-build: base TABLE_MAP (no TLVs) + COLUMN_CHARSET(3) + tail
    val base = encodeTableMap(1L, "d", "t", cols).dropRight(4)
    val body = base ++ Array[Byte](3, 2, 33, (224 - 256).toByte, 0, 0, 0, 0)
    val m = decodeTableMapFull(body)
    assert(m.getArray(6).toIntArray().toSeq == Seq(0, 33, 224))
  }

  test("FULL-metadata row decode: named maps, unsigned ints, ENUM labels") {
    val spark2 = spark
    import spark2.implicits._
    val tmBody = encodeTableMapFull(7L, "testdb", "orders", colsFull, pk = Seq(0))
    val rowsBody = encodeRows(WriteV2, colsFull, Seq(
      Seq[Any](42L, "O", 3000000000L, "123.45"),
      Seq[Any](7L, "P", 5L, null)), tableId = 7L)
    val got = Seq((tmBody, rowsBody)).toDF("tm", "rows")
      .select(BinlogDecode.tableMapFull(col("tm")).as("m"), col("rows"))
      .select(BinlogDecode.rowsFullMeta(col("rows"), lit(WriteV2), col("m")).as("r"))
      .select(explode(col("r.data")).as("m"))
      .collect().map(_.getMap[String, String](0))
    assert(got.length == 2)
    assert(got(0) == Map("pk" -> "42", "status" -> "O",
      "cust" -> "3000000000", "price" -> "123.45"))
    // wire-NULL price keeps its key with a null value (absent keys are
    // reserved for not-present columns — the minimal-image distinction)
    assert(got(1) == Map("pk" -> "7", "status" -> "P", "cust" -> "5", "price" -> null))
  }

  test("q150 equals the direct fixture projection (oracle replay in-engine)") {
    import org.apache.spark.sql.types.{DecimalType, LongType, StringType}
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q150_binlog_full_metadata")(spark, dir)
    val want = graft.Tables(spark, dir, "orders").select(
      col("o_orderkey").cast(LongType).as("pk"),
      col("o_orderstatus").as("status"),
      (col("o_custkey").cast(LongType) + 2147490000L).as("cust"),
      col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType).as("price"),
      lit("orders").as("tbl"), lit("pk").as("pk_col"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("FULL decode: a TLV overrunning the body tail fails loudly") {
    val cols = BinlogSchema.fromMysqlTypes(Seq("id" -> "int"))
    val base = encodeTableMap(1L, "d", "t", cols).dropRight(4)
    // SIGNEDNESS declares 9 payload bytes but only the 4-byte tail remains
    val body = base ++ Array[Byte](1, 9) ++ Array[Byte](0, 0, 0, 0)
    intercept[IllegalArgumentException] { decodeTableMapFull(body) }
    // COLUMN_NAME with too many names fails too
    val tooMany = new java.io.ByteArrayOutputStream
    tooMany.write(1); tooMany.write('a')
    tooMany.write(1); tooMany.write('b')
    val p = tooMany.toByteArray
    val body2 = base ++ Array[Byte](4, p.length.toByte) ++ p ++ Array[Byte](0, 0, 0, 0)
    intercept[IllegalArgumentException] { decodeTableMapFull(body2) }
  }

  test("truncated TABLE_MAP and name-terminator corruption fail loudly") {
    val body = encodeTableMap(1L, "db1", "ta", colsA)
    intercept[IllegalArgumentException] {
      // -6: past the 4-byte tail and into the nullability bitmap
      decodeTableMap(body.take(body.length - 6))
    }
    val corrupt = body.clone()
    assert(corrupt(12) == 0)
    corrupt(12) = 1 // overwrite db1's NUL terminator
    intercept[IllegalArgumentException] { decodeTableMap(corrupt) }
  }
}
