package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MariaDB GTID codec + dialect-aware transaction assembly: the
  * non-standalone GTID event opens its transaction (no BEGIN QUERY), the
  * standalone flag frames DDL like a MySQL-style marker, and GTID_LIST
  * decodes the prelude positions.
  */
class MariaGtidSpec extends SparkSpec {
  import MariaGtidCodec._

  test("GTID body codec: flags, optional commit_id, strict lengths") {
    val r = decodeGtid(encodeGtid(seqNo = 123456789L, domainId = 3L))
    assert(r.getLong(0) == 123456789L && r.getLong(1) == 3L)
    assert(r.getInt(2) == 0 && !r.getBoolean(3) && r.isNullAt(4))
    val st = decodeGtid(encodeGtid(7L, 0L, flags2 = FlStandalone))
    assert(st.getBoolean(3))
    val cc = decodeGtid(encodeGtid(7L, 1L, flags2 = FlGroupCommitId,
      commitId = Some(99L)))
    assert(cc.getLong(4) == 99L)
    assert(gtidText(0L, 5L, 77L).toString == "0-5-77")
    intercept[IllegalArgumentException](decodeGtid(Array.fill[Byte](10)(0)))
    intercept[IllegalArgumentException](
      decodeGtid(encodeGtid(1L, 1L).take(16))) // truncated tail
  }

  test("GTID_LIST codec: count in low 28 bits, entries in order") {
    val entries = Seq((0L, 5L, 100L), (1L, 5L, 50L), (0L, 6L, 7L))
    val arr = decodeGtidList(encodeGtidList(entries, flags = 2))
    assert(arr.numElements() == 3)
    val got = (0 until 3).map { i =>
      val e = arr.getStruct(i, 3)
      (e.getLong(0), e.getLong(1), e.getLong(2))
    }
    assert(got == entries)
    intercept[IllegalArgumentException](
      decodeGtidList(encodeGtidList(entries).take(20)))
  }

  test("assemble: Maria GTID opens the span, stamps domain-server-seq") {
    import spark.implicits._
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def ev(tpe: Int, body: Array[Byte], ts: Long = 0L) =
      BinlogRowCodec.encodeEvent(tpe, body, timestamp = ts, serverId = 5L)
    def write(pk: Long) = ev(BinlogRowCodec.WriteV2,
      BinlogRowCodec.encodeRows(BinlogRowCodec.WriteV2, schema, Seq(Seq(pk))))
    val events = Seq(
      ev(4, Array[Byte](9, 9, 9, 9, 0, 0, 0, 0)), // prelude (rotate-ish)
      ev(GtidType, encodeGtid(seqNo = 10L, domainId = 0L)), // txn 1 opener
      write(1L),
      write(2L),
      ev(BinlogTxnCodec.XidType, BinlogTxnCodec.encodeXid(10L), ts = 9010L),
      // standalone GTID frames a DDL: marker spent, nothing stamped
      ev(GtidType, encodeGtid(seqNo = 11L, domainId = 0L, flags2 = FlStandalone)),
      ev(BinlogTxnCodec.QueryType,
        BinlogTxnCodec.encodeQuery("d", "CREATE TABLE t (id INT)")),
      ev(GtidType, encodeGtid(seqNo = 12L, domainId = 2L)), // txn 2 opener
      write(3L),
      ev(BinlogTxnCodec.XidType, BinlogTxnCodec.encodeXid(12L), ts = 9012L),
      ev(GtidType, encodeGtid(seqNo = 13L, domainId = 0L)), // uncommitted tail
      write(4L))
    val df = events.zipWithIndex.map { case (e, i) => (1L, i.toLong, e) }
      .toDF("f", "ord", "ev")
      .select(col("f"), col("ord"), BinlogDecode.eventSplit(col("ev")).as("h"))
      .select(col("f"), col("ord"), col("h.timestamp").as("timestamp"),
        col("h.server_id").as("server_id"),
        col("h.event_type").as("event_type"), col("h.body").as("body"))
      .transform(Transactions.assemble(_, "f", "ord", serverIdCol = "server_id"))
    val rows = df.select("ord", "txn_seq", "xid", "commit_ts", "gtid").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) null else r.getString(4)))).toMap
    assert(rows(0L) == ((0L, -1L, null))) // prelude
    // txn 1: opener + 2 writes + xid all stamped 0-5-10
    for (o <- 1L to 4L) assert(rows(o) == ((1L, 10L, "0-5-10")), s"ord $o")
    // standalone GTID + DDL: outside any span, never stamped
    assert(rows(5L)._2 == -1L && rows(5L)._3 == null)
    assert(rows(6L)._2 == -1L && rows(6L)._3 == null)
    // txn 2 stamped with its own domain
    for (o <- 7L to 9L) assert(rows(o) == ((2L, 12L, "2-5-12")), s"ord $o")
    // uncommitted tail: open span, no xid, no gtid leak
    assert(rows(10L)._2 == -1L && rows(11L)._2 == -1L)
    assert(rows(10L)._3 == null && rows(11L)._3 == null)
  }
}
