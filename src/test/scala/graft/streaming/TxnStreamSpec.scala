package graft.streaming

import graft.SparkSpec
import graft.cdc.{BinlogGtidCodec, BinlogRowCodec, BinlogSchema, BinlogTxnCodec, Transactions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming transaction assembly: committed-transactions-only delivery,
  * atomicity across trigger boundaries, session independence, and
  * equivalence with the batch [[Transactions.assemble]] stamping on the
  * committed+prelude subset.
  */
class TxnStreamSpec extends SparkSpec {
  import BinlogRowCodec.{encodeEvent, encodeRows, WriteV2}
  import BinlogTxnCodec.{QueryType, XidType}

  private val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))

  private def begin = encodeEvent(QueryType, BinlogTxnCodec.encodeQuery("d", "BEGIN"))
  private def write(pk: Long) =
    encodeEvent(WriteV2, encodeRows(WriteV2, schema, Seq(Seq(pk))))
  private def xid(id: Long) =
    encodeEvent(XidType, BinlogTxnCodec.encodeXid(id), timestamp = 9000L + id)
  private def rotate = encodeEvent(4, Array[Byte](1, 2, 3, 4, 0, 0, 0, 0))

  test("commits emit atomically; uncommitted spans are withheld across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = TxnStream.assembleCommitted(in.toDS())
      .writeStream.format("memory").queryName("txn_out")
      .outputMode("append").start()
    try {
      // trigger 1: prelude + BEGIN + first row — only the prelude may emit
      in.addData(
        SessionEvent(1L, 0L, rotate),
        SessionEvent(1L, 1L, begin),
        SessionEvent(1L, 2L, write(10L)),
        SessionEvent(2L, 0L, begin), // session 2: opens, never commits
        SessionEvent(2L, 1L, write(99L)))
      q.processAllAvailable()
      val afterT1 = spark.table("txn_out").collect()
      assert(afterT1.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 0L)),
        "only the prelude emits before the commit")
      // trigger 2: rest of session 1's txn commits; session 2 stays open
      in.addData(
        SessionEvent(1L, 3L, write(11L)),
        SessionEvent(1L, 4L, xid(77L)))
      q.processAllAvailable()
      val rows = spark.table("txn_out")
        .select("session", "ordinal", "txnSeq", "xid", "commitTs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
      assert(rows == Set(
        (1L, 0L, 0L, None, None), // prelude, unstamped
        (1L, 1L, 1L, Some(77L), Some(9077L)), // BEGIN itself is in the txn
        (1L, 2L, 1L, Some(77L), Some(9077L)),
        (1L, 3L, 1L, Some(77L), Some(9077L)),
        (1L, 4L, 1L, Some(77L), Some(9077L)))) // the XID event too
      // session 2's open span never leaked
      assert(!rows.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("streaming stamps equal batch assemble on the committed+prelude subset") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    def gtid(gno: Long) =
      encodeEvent(BinlogGtidCodec.GtidType, BinlogGtidCodec.encodeGtid(sid, gno))
    def ddl = encodeEvent(QueryType,
      BinlogTxnCodec.encodeQuery("d", "CREATE TABLE t (id INT)"))
    // two sessions; session 1's second txn is GTID-framed; one prelude,
    // one uncommitted tail. Session 2 walks the mixed-gtid_mode minefield:
    // a GTID'd DDL (implicit commit — spends its GTID), an anonymous txn
    // right after it, a GTID'd txn, then another anonymous txn — none of
    // the anonymous spans may inherit a neighbor's uuid:gno.
    val events = Seq(
      SessionEvent(1L, 0L, rotate),
      SessionEvent(1L, 1L, begin), SessionEvent(1L, 2L, write(1L)),
      SessionEvent(1L, 3L, xid(11L)),
      SessionEvent(1L, 4L, gtid(42L)),
      SessionEvent(1L, 5L, begin), SessionEvent(1L, 6L, write(2L)),
      SessionEvent(1L, 7L, write(3L)), SessionEvent(1L, 8L, xid(12L)),
      SessionEvent(1L, 9L, begin), SessionEvent(1L, 10L, write(4L)), // tail
      SessionEvent(2L, 0L, gtid(43L)), SessionEvent(2L, 1L, ddl),
      SessionEvent(2L, 2L, begin), SessionEvent(2L, 3L, write(5L)),
      SessionEvent(2L, 4L, xid(21L)),
      SessionEvent(2L, 5L, gtid(44L)),
      SessionEvent(2L, 6L, begin), SessionEvent(2L, 7L, write(6L)),
      SessionEvent(2L, 8L, xid(22L)),
      SessionEvent(2L, 9L, begin), SessionEvent(2L, 10L, write(7L)),
      SessionEvent(2L, 11L, xid(23L)),
      // ANONYMOUS_GTID marker displaces the (malformed) pending gtid(45)
      SessionEvent(2L, 12L, gtid(45L)),
      SessionEvent(2L, 13L, encodeEvent(BinlogGtidCodec.AnonymousGtidType,
        BinlogGtidCodec.encodeGtid(sid, 1L))),
      SessionEvent(2L, 14L, begin), SessionEvent(2L, 15L, write(8L)),
      SessionEvent(2L, 16L, xid(24L)))
    val in = MemoryStream[SessionEvent]
    val q = TxnStream.assembleCommitted(in.toDS())
      .writeStream.format("memory").queryName("txn_eq")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getString(5)))
    val streamed = spark.table("txn_eq")
      .select("session", "ordinal", "txnSeq", "xid", "commitTs", "gtid")
      .collect().map(tup).toSet
    val batch = events.toDF()
      .select(col("session"), col("ordinal"),
        graft.cdc.BinlogDecode.eventSplit(col("event")).as("h"))
      .select(col("session"), col("ordinal"),
        col("h.timestamp").as("timestamp"), col("h.event_type").as("event_type"),
        col("h.body").as("body"))
      .transform(Transactions.assemble(_, "session", "ordinal"))
    // streaming withholds exactly the uncommitted span (session 1,
    // ordinals 9-10 here); everything else — committed spans, preludes,
    // and between-txn framing events like the GTID — is delivered
    val expected = batch
      .filter(!(col("session") === 1L && col("ordinal") >= 9L))
      .select("session", "ordinal", "txn_seq", "xid", "commit_ts", "gtid")
      .collect().map(tup).toSet
    assert(streamed == expected)
    assert(expected.count(_._4.isDefined) == 19, "six committed txns, 19 stamped events")
    assert(expected.count(_._6 == Some(s"$sid:42")) == 4,
      "the GTID-framed txn (BEGIN, 2 rows, XID) carries its uuid:gno")
    assert(expected.count(_._6 == Some(s"$sid:44")) == 3)
    // sid:43 was spent on the DDL (implicit commit, outside any BEGIN..XID
    // span) and sid:42/44 belong to their own spans — the two anonymous
    // txns and the DDL itself carry no gtid at all
    assert(expected.count(_._6.isDefined) == 7, "no anonymous span inherits a gtid")
  }

  test("compressed transactions expand and assemble like plain ones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cdc.{BinlogGtidCodec, BinlogTxnPayloadCodec}
    val sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    def gtid(gno: Long) =
      encodeEvent(BinlogGtidCodec.GtidType, BinlogGtidCodec.encodeGtid(sid, gno))
    def payload(pks: Seq[Long], xid: Long) = encodeEvent(
      BinlogTxnPayloadCodec.TxnPayloadType,
      BinlogTxnPayloadCodec.encodePayload(
        ((QueryType, BinlogTxnCodec.encodeQuery("d", "BEGIN")) +:
          pks.map(pk => (WriteV2, encodeRows(WriteV2, schema, Seq(Seq(pk)))))) :+
          ((XidType, BinlogTxnCodec.encodeXid(xid))),
        compress = true, timestamp = 9000L + xid))
    // a compressed GTID'd txn, a PLAIN txn, then a compressed anonymous one
    val events = Seq(
      SessionEvent(1L, 0L, rotate),
      SessionEvent(1L, 1L, gtid(50L)), SessionEvent(1L, 2L, payload(Seq(1L, 2L), 31L)),
      SessionEvent(1L, 3L, begin), SessionEvent(1L, 4L, write(3L)),
      SessionEvent(1L, 5L, xid(32L)),
      SessionEvent(1L, 6L, payload(Seq(4L), 33L)))
    val in = MemoryStream[SessionEvent]
    val q = TxnStream.assembleCommitted(TxnStream.expandPayloads(in.toDS()))
      .writeStream.format("memory").queryName("txn_tp")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("txn_tp")
      .select("ordinal", "txnSeq", "xid", "commitTs", "gtid").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toSet
    val S = 1L << 20
    assert(got == Set(
      (0L * S, 0L, None, None, None),            // rotate prelude
      (1L * S, 0L, None, None, None),            // the GTID event itself
      // compressed txn 1: BEGIN, 2 writes, XID — all stamped, gtid'd
      (2L * S + 0, 1L, Some(31L), Some(9031L), Some(s"$sid:50")),
      (2L * S + 1, 1L, Some(31L), Some(9031L), Some(s"$sid:50")),
      (2L * S + 2, 1L, Some(31L), Some(9031L), Some(s"$sid:50")),
      (2L * S + 3, 1L, Some(31L), Some(9031L), Some(s"$sid:50")),
      // plain txn: stamped, anonymous
      (3L * S, 2L, Some(32L), Some(9032L), None),
      (4L * S, 2L, Some(32L), Some(9032L), None),
      (5L * S, 2L, Some(32L), Some(9032L), None),
      // compressed txn 2: anonymous (gtid 50 was spent on txn 1)
      (6L * S + 0, 3L, Some(33L), Some(9033L), None),
      (6L * S + 1, 3L, Some(33L), Some(9033L), None),
      (6L * S + 2, 3L, Some(33L), Some(9033L), None)))
  }

  test("MariaDB dialect: GTID opener, standalone DDL framing, atomic emit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.cdc.MariaGtidCodec
    def mgtid(seq: Long, domain: Long, flags2: Int = 0) =
      BinlogRowCodec.encodeEvent(MariaGtidCodec.GtidType,
        MariaGtidCodec.encodeGtid(seq, domain, flags2), serverId = 5L)
    val in = MemoryStream[SessionEvent]
    val q = TxnStream.assembleCommitted(in.toDS())
      .writeStream.format("memory").queryName("maria_txn")
      .outputMode("append").start()
    try {
      // trigger 1: opener + one write — nothing emits (no BEGIN QUERY
      // exists in a MariaDB stream; the GTID event opens the span)
      in.addData(
        SessionEvent(1L, 0L, rotate),
        SessionEvent(1L, 1L, mgtid(10L, 0L)),
        SessionEvent(1L, 2L, write(1L)))
      q.processAllAvailable()
      assert(spark.table("maria_txn").count() == 1) // just the prelude
      // trigger 2: commit, then a standalone-GTID'd DDL, then another txn
      in.addData(
        SessionEvent(1L, 3L, xid(10L)),
        SessionEvent(1L, 4L, mgtid(11L, 0L, MariaGtidCodec.FlStandalone)),
        SessionEvent(1L, 5L, encodeEvent(QueryType,
          BinlogTxnCodec.encodeQuery("d", "CREATE TABLE t (id INT)"))),
        SessionEvent(1L, 6L, mgtid(12L, 2L)),
        SessionEvent(1L, 7L, write(2L)),
        SessionEvent(1L, 8L, xid(12L)))
      q.processAllAvailable()
      val got = spark.table("maria_txn")
        .select("ordinal", "txnSeq", "xid", "gtid").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet
      assert(got == Set(
        (0L, 0L, None, None), // prelude
        (1L, 1L, Some(10L), Some("0-5-10")), // the opener is in its txn
        (2L, 1L, Some(10L), Some("0-5-10")),
        (3L, 1L, Some(10L), Some("0-5-10")),
        (4L, 1L, None, None), // standalone marker
        (5L, 1L, None, None), // DDL: implicit commit, never stamped
        (6L, 2L, Some(12L), Some("2-5-12")),
        (7L, 2L, Some(12L), Some("2-5-12")),
        (8L, 2L, Some(12L), Some("2-5-12"))))
    } finally q.stop()
  }

  test("an over-maxBuffered open span fails loudly, never OOMs silently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // at the bound: BEGIN + 3 writes buffer exactly maxBuffered=4 events
    // (the XID never buffers) — delivers atomically
    val okIn = MemoryStream[SessionEvent]
    val ok = TxnStream.assembleCommitted(okIn.toDS(), maxBuffered = 4)
      .writeStream.format("memory").queryName("txn_bound_ok")
      .outputMode("append").start()
    try {
      okIn.addData(SessionEvent(1L, 0L, begin) +:
        (1L to 3L).map(i => SessionEvent(1L, i, write(i))) :+
        SessionEvent(1L, 4L, xid(7L)): _*)
      ok.processAllAvailable()
      assert(spark.table("txn_bound_ok").count() == 5)
    } finally ok.stop()
    // one past the bound: the fold fails with the session, ordinal, and
    // bound named (the reference's 3M-row bulk import is ONE transaction
    // — the default bound clears it; this is the oversized-span contract)
    val in = MemoryStream[SessionEvent]
    val q = TxnStream.assembleCommitted(in.toDS(), maxBuffered = 4)
      .writeStream.format("memory").queryName("txn_bound_fail")
      .outputMode("append").start()
    try {
      in.addData(SessionEvent(1L, 0L, begin) +:
        (1L to 4L).map(i => SessionEvent(1L, i, write(i))): _*)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
      val msg = messages(e).mkString(" | ")
      assert(msg.contains("maxBuffered=4") && msg.contains("session 1"),
        s"expected the bound and session in the failure, got: $msg")
    } finally q.stop()
  }
}
