package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw ROW-event decode goldens: whole-row assembly from synthetic
  * WRITE/UPDATE/DELETE bodies (reference `/root/reference/src/binlog.rs:
  * 624-765,831-862`), including NULL columns, multi-row events, UPDATE
  * before/after pairs, minimal (partial-present) images, and v1 bodies.
  */
class BinlogRowSpec extends SparkSpec {
  import BinlogRowCodec._

  val cols: Array[BinlogColumn] = BinlogSchema.fromMysqlTypes(Seq(
    "id" -> "bigint",
    "name" -> "varchar(32)",
    "bal" -> "decimal(10,2)",
    "created" -> "datetime(3)",
    "score" -> "double",
    "cnt" -> "int"))

  private def decode(body: Array[Byte], tpe: Int) = {
    import spark.implicits._
    Seq((body, tpe)).toDF("body", "tpe")
      .select(BinlogDecode.rows(col("body"), col("tpe"), cols).as("r"))
      .select(col("r.data").as("data"), col("r.old").as("old"))
      .collect().head
  }

  private def maps(row: org.apache.spark.sql.Row, field: String) =
    row.getAs[collection.Seq[collection.Map[String, String]]](field)

  test("WRITE: multi-row with NULL columns decodes to ordered images") {
    val body = encodeRows(WriteV2, cols, Seq(
      Seq(1L, "alice", "10.50", "2026-01-02 03:04:05.123", 1.5, 7),
      Seq(2L, null, "-0.25", "1999-12-31 23:59:59.999", -2.75, null),
      Seq(3L, "carol", "0.00", "2026-08-12 00:00:00", 0.0, 42)))
    val r = decode(body, WriteV2)
    val data = maps(r, "data")
    assert(maps(r, "old").isEmpty)
    assert(data.length == 3)
    assert(data(0) == Map("id" -> "1", "name" -> "alice", "bal" -> "10.50",
      "created" -> "2026-01-02 03:04:05.123", "score" -> "1.5", "cnt" -> "7"))
    assert(data(1)("id") == "2")
    assert(data(1)("name") == null && data(1)("cnt") == null) // null bitmap applied
    assert(data(1)("bal") == "-0.25")
    assert(data(1)("created") == "1999-12-31 23:59:59.999")
    assert(data(1)("score") == "-2.75")
    assert(data(2)("cnt") == "42")
  }

  test("UPDATE: before/after pairs align pairwise") {
    val body = encodeRows(UpdateV2, cols, Seq(
      Seq(1L, "alice", "10.50", "2026-01-02 03:04:05.000", 1.0, 1), // old
      Seq(1L, "alice", "99.90", "2026-01-02 03:04:05.000", 1.0, 2), // new
      Seq(5L, "eve", "7.00", "2026-02-02 00:00:00.000", 0.5, 3),    // old
      Seq(5L, "eva", "7.00", "2026-02-02 00:00:00.000", 0.5, 3)))   // new
    val r = decode(body, UpdateV2)
    val data = maps(r, "data")
    val old = maps(r, "old")
    assert(data.length == 2 && old.length == 2)
    assert(old(0)("bal") == "10.50" && data(0)("bal") == "99.90")
    assert(old(1)("name") == "eve" && data(1)("name") == "eva")
    // raw decode keeps FULL old images; the canal diff composes downstream
    assert(old(0).keySet == cols.map(_.name).toSet)
  }

  test("DELETE: images land in old, data stays empty") {
    val body = encodeRows(DeleteV2, cols, Seq(
      Seq(9L, "gone", "1.00", "2020-01-01 00:00:00.000", 0.0, 0)))
    val r = decode(body, DeleteV2)
    assert(maps(r, "data").isEmpty)
    assert(maps(r, "old").head("name") == "gone")
  }

  test("minimal row image: absent columns are absent keys, null bitmap indexes present ordinals") {
    // Only columns 0, 2, 5 present (pk + two fields); col 5 NULL in row 2.
    // The null bitmap must be sized by present count (1 byte for 3 cols)
    // and indexed by present ordinal — the spec-correct deviation from the
    // reference's absolute-index read (binlog.rs:837-846).
    val present = Array(true, false, true, false, false, true)
    val body = encodeRows(WriteV2, cols, Seq(
      Seq(1L, null, "3.33", null, null, 11),
      Seq(2L, null, "4.44", null, null, null)),
      present = present)
    val r = decode(body, WriteV2)
    val data = maps(r, "data")
    assert(data(0) == Map("id" -> "1", "bal" -> "3.33", "cnt" -> "11"))
    assert(data(1).keySet == Set("id", "bal", "cnt"))
    assert(data(1)("cnt") == null)
  }

  test("UPDATE with distinct before/after present bitmaps") {
    val pOld = Array(true, true, false, false, false, false)
    val pNew = Array(true, false, true, false, false, false)
    val body = encodeRows(UpdateV2, cols, Seq(
      Seq(3L, "old-name", null, null, null, null),
      Seq(3L, null, "8.88", null, null, null)),
      present = pOld, presentNew = pNew)
    val r = decode(body, UpdateV2)
    assert(maps(r, "old").head == Map("id" -> "3", "name" -> "old-name"))
    assert(maps(r, "data").head == Map("id" -> "3", "bal" -> "8.88"))
  }

  test("v1 body (no extra-data area) decodes") {
    val body = encodeRows(WriteV1, cols, Seq(
      Seq(4L, "v1", "0.01", "2021-06-15 10:20:30.500", 9.0, -5)))
    val r = decode(body, WriteV1)
    assert(maps(r, "data").head("name") == "v1")
    assert(maps(r, "data").head("cnt") == "-5")
  }

  test("type coverage: ints with sign, year, date, time, timestamp, text, char") {
    val wide = BinlogSchema.fromMysqlTypes(Seq(
      "t" -> "tinyint", "tu" -> "tinyint unsigned", "s" -> "smallint",
      "m" -> "mediumint", "y" -> "year", "d" -> "date", "tm" -> "time(2)",
      "ts" -> "timestamp", "txt" -> "text", "ch" -> "char(4)", "f" -> "float",
      "bu" -> "bigint unsigned"))
    val body = encodeRows(WriteV2, wide, Seq(
      Seq(-1L, 200L, -300L, -70000L, 2026L, "2026-08-12", "-01:02:03.45",
        1500000000L, "hello binlog", "ab", 1.25f,
        -1L))) // 0xFF..FF: the unsigned-bigint value 2^64-1 as raw bits
    import spark.implicits._
    val r = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), wide).as("r"))
      .select(col("r.data").getItem(0).as("m")).collect().head
      .getAs[collection.Map[String, String]]("m")
    assert(r("t") == "-1")       // signed tinyint
    assert(r("tu") == "200")     // unsigned tinyint
    assert(r("s") == "-300")
    assert(r("m") == "-70000")   // 3-byte sign extension
    assert(r("y") == "2026")
    assert(r("d") == "2026-08-12")
    assert(r("tm") == "-01:02:03.45")
    assert(r("ts") == "1500000000")
    assert(r("txt") == "hello binlog")
    assert(r("ch") == "ab")
    assert(r("f") == "1.25")
    assert(r("bu") == "18446744073709551615") // upper half of unsigned range
  }

  test("ENUM/SET/BIT/JSON decode: textual forms, edge indices, unsigned bits") {
    val schema = BinlogSchema.fromMysqlTypes(Seq(
      "e" -> "enum('red','green','blue')",
      "s" -> "set('a','b','c','d','e','f','g','h','i')", // 9 members: 2-byte mask
      "b" -> "bit(64)",
      "j" -> "json"))
    assert(schema(0).maxLength == 1 && schema(0).members == Seq("red", "green", "blue"))
    assert(schema(1).maxLength == 2) // (9+7)/8
    // MySQL never packs a SET into 5-7 bytes: 33+ members jump to 8
    // (get_set_pack_length), so a 40-member SET must round-trip at width 8
    val wideSet = BinlogSchema.column("w",
      "set(" + (1 to 40).map(i => s"'m$i'").mkString(",") + ")")
    assert(wideSet.maxLength == 8)
    // per row: 1 null-bitmap byte + 8 mask bytes; +4-byte tail
    val wideBody = encodeRows(WriteV2, Array(wideSet), Seq(Seq("m1,m40"), Seq("m33")))
    assert(wideBody.length == 10 + 1 + 1 + 2 * 9 + 4) // preamble+count+bitmap+rows+tail
    val wideOut = BinlogRowCodec.decodeRows(wideBody, WriteV2, Array(wideSet))
    assert(wideOut.getArray(0).numElements() == 2)
    val wm0 = wideOut.getArray(0).getMap(0)
    assert(wm0.valueArray.getUTF8String(0).toString == "m1,m40")
    assert(wideOut.getArray(0).getMap(1).valueArray.getUTF8String(0).toString == "m33")
    assert(schema(2).precision == 64)
    assert(schema(3).lengthSize == 4)
    val body = encodeRows(WriteV2, schema, Seq(
      Seq("green", "a,c,i", -1L, """{"k":1,"arr":[true,null]}"""),
      Seq(0, 0, 0L, "[]"), // ENUM invalid-0, empty SET
      Seq("blue", "i", 1L, "\"txt\"")))
    import spark.implicits._
    val out = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), schema).as("r"))
      .select(col("r.data").as("data")).collect().head
      .getAs[collection.Seq[collection.Map[String, String]]]("data")
    assert(out(0)("e") == "green")
    assert(out(0)("s") == "a,c,i")
    assert(out(0)("b") == "18446744073709551615") // bit(64) is unsigned
    assert(out(0)("j") == """{"k":1,"arr":[true,null]}""")
    assert(out(1)("e") == "") // MySQL renders the invalid 0 index as ''
    assert(out(1)("s") == "")
    assert(out(1)("b") == "0")
    assert(out(1)("j") == "[]")
    assert(out(2)("e") == "blue" && out(2)("s") == "i" && out(2)("j") == "\"txt\"")
    // 2-byte ENUM pack for >255 members
    val wide = BinlogSchema.column("w",
      (1 to 300).map(i => s"'m$i'").mkString("enum(", ",", ")"))
    assert(wide.maxLength == 2 && wide.members.length == 300)
    val body2 = encodeRows(WriteV2, Array(wide), Seq(Seq("m300")))
    val out2 = Seq(body2).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), Array(wide)).as("r"))
      .select(col("r.data").getItem(0).as("m")).collect().head
      .getAs[collection.Map[String, String]]("m")
    assert(out2("w") == "m300")
    // without members (the TABLE_MAP path) ENUM/SET render raw index/mask
    val bare = Array(
      BinlogColumn("e", BinlogRowCodec.ENUM, maxLength = 1),
      BinlogColumn("s", BinlogRowCodec.SET, maxLength = 1))
    val body3 = encodeRows(WriteV2, bare, Seq(Seq(2, 5)))
    val out3 = Seq(body3).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), bare).as("r"))
      .select(col("r.data").getItem(0).as("m")).collect().head
      .getAs[collection.Map[String, String]]("m")
    assert(out3("e") == "2" && out3("s") == "5")
  }

  test("multi-byte charsets size the varchar length prefix by BYTES") {
    // utf8mb4 varchar(100) can hold 400 bytes -> 2-byte prefix even though
    // the character count is under 255.
    val mb4 = BinlogSchema.fromMysqlTypes(Seq("v" -> "varchar(100)"), bytesPerChar = 4)
    assert(mb4.head.maxLength == 400)
    val s = "x" * 300 // 300 bytes: only decodable with a 2-byte prefix
    val body = encodeRows(WriteV2, mb4, Seq(Seq(s)))
    import spark.implicits._
    val out = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), mb4).as("r"))
      .select(col("r.data").getItem(0).as("m")).collect().head
      .getAs[collection.Map[String, String]]("m")
    assert(out("v") == s)
    // latin1 (default) keeps the 1-byte prefix for the same DDL
    assert(BinlogSchema.fromMysqlTypes(Seq("v" -> "varchar(100)")).head.maxLength == 100)
  }

  test("BLOB columns round-trip losslessly as hex (not lossy text decode)") {
    val schema = BinlogSchema.fromMysqlTypes(Seq("id" -> "int", "payload" -> "blob"))
    assert(schema(1).binary && schema(1).lengthSize == 2)
    // bytes that are NOT valid UTF-8 — a text decode would mangle them
    val raw = Array[Byte](0x00, 0xff.toByte, 0x80.toByte, 0x01, 0xfe.toByte)
    val body = encodeRows(WriteV2, schema, Seq(Seq(7, raw)))
    import spark.implicits._
    val out = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), schema).as("r"))
      .select(col("r.data").getItem(0).as("m")).collect().head
      .getAs[collection.Map[String, String]]("m")
    assert(out("payload") == "00ff8001fe")
    // and the typed projection restores the exact original bytes
    val typed = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(BinlogDecode.typedColumns(col("m"),
        Seq("id" -> "int", "payload" -> "blob")): _*)
      .collect().head
    assert(typed.getInt(0) == 7)
    assert(typed.getAs[Array[Byte]](1).toSeq == raw.toSeq)
  }

  test("typedColumns: decoded map -> typed DataFrame via mysql type strings") {
    val types = Seq("id" -> "bigint", "name" -> "varchar(32)",
      "bal" -> "decimal(10,2)", "created" -> "datetime(3)",
      "score" -> "double", "cnt" -> "int", "ts" -> "timestamp(2)",
      "d" -> "date")
    val schema = BinlogSchema.fromMysqlTypes(types)
    val body = encodeRows(WriteV2, schema, Seq(
      Seq(5L, "eve", "12.34", "2026-01-02 03:04:05.123", 2.5, null,
        1500000000L, "2026-08-12")))
    import spark.implicits._
    val df = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(BinlogDecode.typedColumns(col("m"), types): _*)
    import org.apache.spark.sql.types._
    assert(df.schema.map(f => (f.name, f.dataType)) == Seq(
      ("id", LongType), ("name", StringType), ("bal", DecimalType(10, 2)),
      ("created", TimestampType), ("score", DoubleType), ("cnt", IntegerType),
      ("ts", TimestampType), ("d", DateType)))
    val r = df.collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getDecimal(2).toPlainString == "12.34")
    assert(r.getTimestamp(3).toString == "2026-01-02 03:04:05.123")
    assert(r.isNullAt(5)) // NULL column survives the typed cast as SQL NULL
    assert(r.getTimestamp(6).toInstant.getEpochSecond == 1500000000L)
    assert(r.getDate(7).toString == "2026-08-12")
  }

  test("typedColumns widens unsigned ints so full-range values cast under ANSI") {
    val types = Seq("tu" -> "tinyint unsigned", "iu" -> "int unsigned",
      "bu" -> "bigint unsigned")
    val schema = BinlogSchema.fromMysqlTypes(types)
    val body = encodeRows(WriteV2, schema, Seq(
      Seq(255L, 4294967295L, -1L))) // each type's max (bigint as raw bits)
    import spark.implicits._
    val df = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(BinlogDecode.typedColumns(col("m"), types): _*)
    import org.apache.spark.sql.types._
    assert(df.schema.map(_.dataType) == Seq(ShortType, LongType, DecimalType(20, 0)))
    val r = df.collect().head
    assert(r.getShort(0) == 255)
    assert(r.getLong(1) == 4294967295L)
    assert(r.getDecimal(2).toPlainString == "18446744073709551615")
  }

  test("event split: header fields + body round-trip, marker byte, truncation") {
    val body = encodeRows(WriteV2, cols, Seq(
      Seq(1L, "x", "1.00", "2020-01-01 00:00:00.000", 0.0, 0)))
    val event = encodeEvent(WriteV2, body,
      timestamp = 1700000123L, serverId = 7L, logPos = 4096L, flags = 0x20)
    import spark.implicits._
    def split(bytes: Array[Byte], marker: Boolean) =
      Seq(bytes).toDF("ev")
        .select(BinlogDecode.eventSplit(col("ev"), packetMarker = marker).as("h"))
        .select("h.*").collect().head
    val h = split(event, marker = false)
    assert(h.getAs[Long]("timestamp") == 1700000123L)
    assert(h.getAs[Int]("event_type") == WriteV2)
    assert(h.getAs[Long]("server_id") == 7L)
    assert(h.getAs[Long]("event_size") == 19L + body.length)
    assert(h.getAs[Long]("log_pos") == 4096L)
    assert(h.getAs[Int]("flags") == 0x20)
    assert(h.getAs[Array[Byte]]("body").toSeq == body.toSeq)
    // replication-stream packets carry a leading marker byte
    val packet = encodeEvent(WriteV2, body, packetMarker = true)
    assert(split(packet, marker = true).getAs[Int]("event_type") == WriteV2)
    // header split composes with the row decode on the header's OWN type
    val decoded = Seq(event).toDF("ev")
      .select(BinlogDecode.eventSplit(col("ev")).as("h"))
      .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), cols).as("r"))
      .select(col("r.data").getItem(0).as("m")).collect().head
      .getAs[collection.Map[String, String]]("m")
    assert(decoded("name") == "x")
    intercept[IllegalArgumentException] {
      split(Array[Byte](1, 2, 3), marker = false)
    }
    // trailing bytes beyond the header's event_size (a second contiguous
    // event, padding) must fail framing, never fold into the body
    val e = intercept[Exception] {
      split(event ++ Array[Byte](1, 2, 3), marker = false)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + " | " + chain(t.getCause)
    assert(chain(e).contains("frame one event"), chain(e))
  }

  test("all-zero present bitmap fails loudly instead of spinning") {
    // An empty image consumes zero bytes; with residual bytes beyond the
    // checksum tail the row loop would spin forever without the progress
    // guard. (With nothing after the empty image, decode legitimately
    // yields an empty-map image and stops at the tail.)
    val body = encodeRows(WriteV2, cols,
      Seq(Seq(null, null, null, null, null, null)),
      present = Array.fill(cols.length)(false)) ++ Array[Byte](9, 9, 9)
    val e = intercept[IllegalArgumentException] {
      BinlogRowCodec.decodeRows(body, WriteV2, cols)
    }
    assert(e.getMessage.contains("consumed no bytes"))
  }

  test("corrupt bodies fail loudly") {
    intercept[IllegalArgumentException] {
      BinlogRowCodec.decodeRows(Array[Byte](1, 2, 3), WriteV2, cols)
    }
    val good = encodeRows(WriteV2, cols, Seq(
      Seq(1L, "x", "1.00", "2020-01-01 00:00:00.000", 0.0, 0)))
    // truncating mid-row must throw, not zero-pad
    intercept[IllegalArgumentException] {
      BinlogRowCodec.decodeRows(good.dropRight(12), WriteV2, cols)
    }
    // column-count mismatch vs schema
    intercept[IllegalArgumentException] {
      BinlogRowCodec.decodeRows(good, WriteV2, cols.take(3))
    }
    // non-row event type
    intercept[IllegalArgumentException] {
      BinlogRowCodec.decodeRows(good, 19, cols)
    }
  }

  test("decode runs as a codegen'd expression, not a UDF") {
    import spark.implicits._
    val body = encodeRows(WriteV2, cols, Seq(
      Seq(1L, "x", "1.00", "2020-01-01 00:00:00.000", 0.0, 0)))
    val df = Seq(body).toDF("body")
      .select(BinlogDecode.rows(col("body"), lit(WriteV2), cols).as("r"))
    // Spark 4.1 renders ScalaUDF nodes as "UDF(" in plan strings
    assert(!df.queryExecution.executedPlan.toString.contains("UDF("))
    assert(df.schema("r").dataType == BinlogRowCodec.outputType)
  }
}
