package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binlog FILE replay: magic + FORMAT_DESCRIPTION + CRC framing + ROTATE
  * chaining over synthesized files, composed with the existing row decode.
  */
class BinlogFileSpec extends SparkSpec {
  import spark.implicits._

  private val schema = BinlogSchema.fromMysqlTypes(Seq(
    "pk" -> "bigint", "name" -> "varchar(8)"))

  private def rowsEvent(pk: Long, name: String): (Int, Array[Byte]) =
    (BinlogRowCodec.WriteV2, BinlogRowCodec.encodeRows(
      BinlogRowCodec.WriteV2, schema, Seq(Seq[Any](pk, name)), tableId = 9L))

  private def file1(checksum: Boolean) = BinlogFileCodec.encodeFile(
    Seq((19, BinlogRowCodec.encodeTableMap(9L, "db", "t", schema)),
      rowsEvent(1L, "one"), rowsEvent(2L, "two")),
    checksum = checksum, nextFile = Some("bin.000002"))

  test("golden: FDE declares CRC32, events verify+strip, rotate names next file") {
    val f = file1(checksum = true)
    assert((f(0) & 0xff) == 0xfe && f(1) == 'b' && f(2) == 'i' && f(3) == 'n')
    val evs = spark.createDataset(Seq(f)).toDF("bytes")
      .select(explode(BinlogFileSplit(col("bytes"))).as("h"))
      .select(col("h.event_type").as("t"), col("h.body").as("body"),
        col("h.event_size").as("sz"), col("h.log_pos").as("lp"))
      .collect()
    assert(evs.map(_.getInt(0)).toSeq == Seq(15, 19, 30, 30, 4))
    // log_pos chains: each event's log_pos is the next event's start
    val sizes = evs.map(_.getLong(2))
    val lps = evs.map(_.getLong(3))
    assert(lps.toSeq == sizes.scanLeft(4L)(_ + _).tail.toSeq)
    // decoded rows come back intact through the CRC strip
    val rows = spark.createDataset(Seq(f)).toDF("bytes")
      .select(explode(BinlogFileSplit(col("bytes"))).as("h"))
      .filter(col("h.event_type") === BinlogRowCodec.WriteV2)
      .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(element_at(col("m"), "pk"), element_at(col("m"), "name"))
      .as[(String, String)].collect().toSet
    assert(rows == Set(("1", "one"), ("2", "two")))
    // rotate event names the next file in the chain
    val next = spark.createDataset(Seq(f)).toDF("bytes")
      .select(explode(BinlogFileSplit(col("bytes"))).as("h"))
      .filter(col("h.event_type") === 4)
      .select(BinlogRotateName(col("h.body"))).as[String].head()
    assert(next == "bin.000002")
  }

  test("a file whose FDE declares no checksum decodes without CRC bytes") {
    val f = file1(checksum = false)
    val rows = spark.createDataset(Seq(f)).toDF("bytes")
      .select(explode(BinlogFileSplit(col("bytes"))).as("h"))
      .filter(col("h.event_type") === BinlogRowCodec.WriteV2)
      .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(element_at(col("m"), "pk")).as[String].collect().toSet
    assert(rows == Set("1", "2"))
  }

  test("two-file chain replays in rotate order") {
    val f1 = file1(checksum = true)
    val f2 = BinlogFileCodec.encodeFile(
      Seq((19, BinlogRowCodec.encodeTableMap(9L, "db", "t", schema)),
        rowsEvent(3L, "three")),
      checksum = true, nextFile = Some("bin.000003"))
    val df = spark.createDataset(Seq(("bin.000001", f1), ("bin.000002", f2)))
      .toDF("name", "bytes")
    val chain = df
      .select(col("name"), explode(BinlogFileSplit(col("bytes"))).as("h"))
      .filter(col("h.event_type") === 4)
      .select(col("name"), BinlogRotateName(col("h.body")).as("next"))
      .as[(String, String)].collect().toMap
    assert(chain == Map("bin.000001" -> "bin.000002", "bin.000002" -> "bin.000003"))
    val pks = df.orderBy("name")
      .select(explode(BinlogFileSplit(col("bytes"))).as("h"))
      .filter(col("h.event_type") === BinlogRowCodec.WriteV2)
      .select(BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
      .select(explode(col("r.data")).as("m"))
      .select(element_at(col("m"), "pk")).as[String].collect().toSeq
    assert(pks == Seq("1", "2", "3"))
  }

  test("file-path bodies carry the normalized 4-byte tail end-anchored decoders assume") {
    // Regression (round-7 review): decodeFile used to emit tail-LESS bodies
    // while decodeQuery/the row loop measure from the end, so a file-replay
    // 'BEGIN' decoded as 'B' (killing txn assembly) and a <=4-byte final
    // row image was silently dropped. Both decode through encodeFile →
    // decodeFile here, in both checksum modes.
    for (checksum <- Seq(true, false)) {
      val tiny = BinlogSchema.fromMysqlTypes(Seq("flag" -> "tinyint"))
      val f = BinlogFileCodec.encodeFile(
        Seq((BinlogTxnCodec.QueryType, BinlogTxnCodec.encodeQuery("db", "BEGIN")),
          // 1 null-bitmap byte + 1 value byte = 2-byte row image, < tail size
          (BinlogRowCodec.WriteV2, BinlogRowCodec.encodeRows(
            BinlogRowCodec.WriteV2, tiny, Seq(Seq[Any](7)), tableId = 9L)),
          (BinlogTxnCodec.XidType, BinlogTxnCodec.encodeXid(42L))),
        checksum = checksum)
      val evs = BinlogFileCodec.decodeFile(f)
      val query = evs.getStruct(1, 7)
      assert(query.getInt(1) == BinlogTxnCodec.QueryType)
      val q = BinlogTxnCodec.decodeQuery(query.getBinary(6))
      assert(q.getUTF8String(1).toString == "BEGIN", "file-path QUERY lost its tail bytes")
      val rows = BinlogRowCodec.decodeRows(
        evs.getStruct(2, 7).getBinary(6), BinlogRowCodec.WriteV2, tiny)
      assert(rows.getArray(0).numElements() == 1, "<=4-byte final row image dropped")
      assert(BinlogTxnCodec.decodeXid(evs.getStruct(3, 7).getBinary(6)) == 42L)
    }
  }

  test("corruption fails loudly: bad magic, flipped byte, truncation") {
    val f = file1(checksum = true)
    intercept[Exception] { BinlogFileCodec.decodeFile(f.drop(1)) }
    val flipped = f.clone()
    flipped(f.length - 10) = (flipped(f.length - 10) ^ 0x55).toByte
    val e = intercept[Exception] { BinlogFileCodec.decodeFile(flipped) }
    assert(e.getMessage.toLowerCase.contains("crc") ||
      e.getMessage.contains("claims"), e.getMessage)
    intercept[Exception] { BinlogFileCodec.decodeFile(f.dropRight(3)) }
  }

  test("heartbeat events surface the current file name; stream folds skip them") {
    val body = "bin.000042".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 0)
    assert(BinlogFileCodec.heartbeatLogName(body).toString == "bin.000042")
    intercept[IllegalArgumentException](
      BinlogFileCodec.heartbeatLogName(Array[Byte](1, 2)))
    // a heartbeat inside a transaction stream is a prelude-class event:
    // it must pass through unstamped and never disturb an open span
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    val events = Seq(
      BinlogRowCodec.encodeEvent(BinlogTxnCodec.QueryType,
        BinlogTxnCodec.encodeQuery("d", "BEGIN")),
      BinlogRowCodec.encodeEvent(BinlogRowCodec.WriteV2,
        BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq(1L)))),
      BinlogRowCodec.encodeEvent(BinlogFileCodec.HeartbeatType, body),
      BinlogRowCodec.encodeEvent(BinlogTxnCodec.XidType,
        BinlogTxnCodec.encodeXid(9L), timestamp = 9009L))
    val df = events.zipWithIndex.map { case (e, i) => (1L, i.toLong, e) }
      .toDF("f", "ord", "ev")
      .select(col("f"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
      .select(col("f"), col("ord"), col("h.timestamp").as("timestamp"),
        col("h.event_type").as("event_type"), col("h.body").as("body"))
      .transform(Transactions.assemble(_, "f", "ord"))
    val rows = df.select("ord", "xid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // every event of the span, heartbeat included, stamps with the XID —
    // the heartbeat sits inside BEGIN..XID so it belongs to the unit
    assert(rows == Map(0L -> 9L, 1L -> 9L, 2L -> 9L, 3L -> 9L))
  }
}
