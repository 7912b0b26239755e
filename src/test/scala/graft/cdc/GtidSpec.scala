package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GTID codecs and transaction-name stamping: GTID_LOG_EVENT decode (both
  * the pre-5.7.6 and logical-timestamp layouts), PREVIOUS_GTIDS set text,
  * and the batch assemble() `gtid` column semantics.
  */
class GtidSpec extends SparkSpec {
  import BinlogGtidCodec._

  val sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  test("GTID decode: uuid text, gno, logical timestamps, strictness") {
    val full = decodeGtid(encodeGtid(sid, 23L, flags = 1,
      lastCommitted = 7L, sequenceNumber = 9L))
    assert(full.getInt(0) == 1)
    assert(full.getUTF8String(1).toString == sid)
    assert(full.getLong(2) == 23L)
    assert(full.getUTF8String(3).toString == s"$sid:23")
    assert(full.getLong(4) == 7L && full.getLong(5) == 9L)
    // pre-5.7.6 layout: no typecode block → -1 sentinels
    val old = decodeGtid(encodeGtid(sid, 5L))
    assert(old.getUTF8String(3).toString == s"$sid:5")
    assert(old.getLong(4) == -1L && old.getLong(5) == -1L)
    intercept[IllegalArgumentException](decodeGtid(Array[Byte](1, 2, 3)))
    // gno must be positive
    val bad = encodeGtid(sid, 1L)
    java.util.Arrays.fill(bad, 17, 25, 0.toByte)
    intercept[IllegalArgumentException](decodeGtid(bad))
  }

  test("PREVIOUS_GTIDS renders the canonical inclusive set text") {
    val sid2 = "00000000-0000-0000-0000-0000000000aa"
    val body = encodePreviousGtids(Seq(
      sid -> Seq((1L, 5L), (7L, 7L)),
      sid2 -> Seq((3L, 3L))))
    assert(decodePreviousGtids(body).toString == s"$sid:1-5:7,$sid2:3")
    intercept[IllegalArgumentException](decodePreviousGtids(Array[Byte](9)))
    // truncated mid-interval
    intercept[IllegalArgumentException](
      decodePreviousGtids(body.take(8 + 16 + 8 + 3)))
  }

  test("batch assemble stamps gtid on committed spans only") {
    val spark2 = spark
    import spark2.implicits._
    import BinlogTxnCodec.{QueryType, XidType}
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def row(pk: Long) = BinlogRowCodec.encodeRows(
      BinlogRowCodec.WriteV2, schema, Seq(Seq(pk)))
    val events = Seq(
      ("A", 0, PreviousGtidsType,
        encodePreviousGtids(Seq(sid -> Seq((1L, 9L)))), 0L),
      ("A", 1, GtidType, encodeGtid(sid, 10L), 0L),
      ("A", 2, QueryType, BinlogTxnCodec.encodeQuery("d", "BEGIN"), 0L),
      ("A", 3, BinlogRowCodec.WriteV2, row(1), 0L),
      ("A", 4, XidType, BinlogTxnCodec.encodeXid(77L), 1000L),
      ("A", 5, GtidType, encodeGtid(sid, 11L), 0L),
      ("A", 6, QueryType, BinlogTxnCodec.encodeQuery("d", "BEGIN"), 0L),
      ("A", 7, BinlogRowCodec.WriteV2, row(2), 0L) // uncommitted tail
    ).toDF("file", "ord", "event_type", "body", "timestamp")
    val out = Transactions.assemble(events, "file", "ord")
      .select(col("ord"), col("xid"), col("gtid")).collect()
      .map(r => r.getInt(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))).toMap
    // committed span (BEGIN row XID) carries uuid:10
    assert(out(2) == (Some(77L), Some(s"$sid:10")))
    assert(out(3) == (Some(77L), Some(s"$sid:10")))
    assert(out(4) == (Some(77L), Some(s"$sid:10")))
    // the GTID events themselves, the PREVIOUS_GTIDS prelude, and the
    // uncommitted tail are unstamped
    assert(out(0) == (None, None) && out(1) == (None, None))
    assert(out(5) == (None, None) && out(6) == (None, None) && out(7) == (None, None))
  }

  test("a GTID names only its own transaction, not later anonymous spans") {
    val spark2 = spark
    import spark2.implicits._
    import BinlogTxnCodec.{QueryType, XidType}
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def row(pk: Long) = BinlogRowCodec.encodeRows(
      BinlogRowCodec.WriteV2, schema, Seq(Seq(pk)))
    def begin = BinlogTxnCodec.encodeQuery("d", "BEGIN")
    val events = Seq(
      // GTID'd transaction …
      ("A", 0, GtidType, encodeGtid(sid, 5L), 0L),
      ("A", 1, QueryType, begin, 0L),
      ("A", 2, BinlogRowCodec.WriteV2, row(1), 0L),
      ("A", 3, XidType, BinlogTxnCodec.encodeXid(1L), 1000L),
      // … then an ANONYMOUS transaction (gtid_mode=ON_PERMISSIVE): must
      // not inherit sid:5 even though it is the last GTID at-or-before
      ("A", 4, QueryType, begin, 0L),
      ("A", 5, BinlogRowCodec.WriteV2, row(2), 0L),
      ("A", 6, XidType, BinlogTxnCodec.encodeXid(2L), 2000L),
      // a GTID'd DDL (implicit commit, no BEGIN/XID) …
      ("A", 7, GtidType, encodeGtid(sid, 6L), 0L),
      ("A", 8, QueryType, BinlogTxnCodec.encodeQuery("d", "CREATE TABLE t (id INT)"), 0L),
      // … then another anonymous transaction: the DDL spent sid:6
      ("A", 9, QueryType, begin, 0L),
      ("A", 10, BinlogRowCodec.WriteV2, row(3), 0L),
      ("A", 11, XidType, BinlogTxnCodec.encodeXid(3L), 3000L),
      // a fresh GTID after all that still stamps ITS transaction
      ("A", 12, GtidType, encodeGtid(sid, 7L), 0L),
      ("A", 13, QueryType, begin, 0L),
      ("A", 14, BinlogRowCodec.WriteV2, row(4), 0L),
      ("A", 15, XidType, BinlogTxnCodec.encodeXid(4L), 4000L),
      // an ANONYMOUS_GTID marker displaces even a (malformed) pending GTID
      ("A", 16, GtidType, encodeGtid(sid, 8L), 0L),
      ("A", 17, AnonymousGtidType, encodeGtid(sid, 1L), 0L),
      ("A", 18, QueryType, begin, 0L),
      ("A", 19, BinlogRowCodec.WriteV2, row(5), 0L),
      ("A", 20, XidType, BinlogTxnCodec.encodeXid(5L), 5000L)
    ).toDF("file", "ord", "event_type", "body", "timestamp")
    val out = Transactions.assemble(events, "file", "ord")
      .select(col("ord"), col("xid"), col("gtid")).collect()
      .map(r => r.getInt(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))).toMap
    assert(out(2) == (Some(1L), Some(s"$sid:5")))
    // anonymous span: committed, but NO inherited gtid
    assert(out(5) == (Some(2L), None))
    // DDL and the anonymous span after it: sid:6 was spent on the DDL
    assert(out(8) == (None, None))
    assert(out(10) == (Some(3L), None))
    assert(out(14) == (Some(4L), Some(s"$sid:7")))
    // ANONYMOUS-marked span commits with gtid null, displacing sid:8
    assert(out(19) == (Some(5L), None))
  }
}
