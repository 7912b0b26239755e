package graft.streaming

import graft.SparkSpec
import graft.cdc.{BinlogRowCodec, BinlogSchema, BinlogTxnCodec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming XA assembly: resolved-only delivery — prepared spans held
  * across trigger boundaries until XA COMMIT, discarded on XA ROLLBACK,
  * one-phase spans emitted immediately, non-XA traffic passed through.
  */
class XaStreamSpec extends SparkSpec {
  import BinlogRowCodec.{encodeEvent, encodeRows, WriteV2}
  import BinlogTxnCodec.QueryType

  private val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))

  private def q(sql: String) = encodeEvent(QueryType, BinlogTxnCodec.encodeQuery("d", sql))
  private def write(pk: Long) =
    encodeEvent(WriteV2, encodeRows(WriteV2, schema, Seq(Seq(pk))))
  private def prep(tag: String, one: Boolean) = encodeEvent(
    BinlogTxnCodec.XaPrepareType,
    BinlogTxnCodec.encodeXaPrepare(one, 1, tag.getBytes("UTF-8"), Array.emptyByteArray))
  private def xidOf(tag: String) =
    BinlogTxnCodec.xidText(tag.getBytes("UTF-8").map(b => f"$b%02x").mkString, "", 1)

  test("prepared spans hold across triggers; commit releases, rollback discards") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (xa, xb, xc) = (xidOf("a"), xidOf("b"), xidOf("c"))
    val in = MemoryStream[SessionEvent]
    val query = XaStream.assembleResolved(in.toDS())
      .writeStream.format("memory").queryName("xa_out")
      .outputMode("append").start()
    try {
      // trigger 1: span a prepares (two-phase), span c commits one-phase,
      // a plain event passes through
      in.addData(
        SessionEvent(1L, 0L, write(100L)), // non-XA passthrough
        SessionEvent(1L, 1L, q(s"XA START $xa")),
        SessionEvent(1L, 2L, write(1L)),
        SessionEvent(1L, 3L, q(s"XA END $xa")),
        SessionEvent(1L, 4L, prep("a", one = false)),
        SessionEvent(1L, 5L, q(s"XA START $xc")),
        SessionEvent(1L, 6L, write(3L)),
        SessionEvent(1L, 7L, q(s"XA END $xc")),
        SessionEvent(1L, 8L, prep("c", one = true)))
      query.processAllAvailable()
      def rows() = spark.table("xa_out")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)), Option(r.get(3)))).toSet
      val t1 = rows()
      // span a (ordinals 1-4) is withheld; span c (5-8) emitted committed
      assert(t1 == Set(
        (1L, 0L, None, None),
        (1L, 5L, Some(xc), Some("committed")),
        (1L, 6L, Some(xc), Some("committed")),
        (1L, 7L, Some(xc), Some("committed")),
        (1L, 8L, Some(xc), Some("committed"))), t1)
      // trigger 2: span b prepares then rolls back — never delivered;
      // span a's commit arrives — delivered stamped
      in.addData(
        SessionEvent(1L, 9L, q(s"XA START $xb")),
        SessionEvent(1L, 10L, write(2L)),
        SessionEvent(1L, 11L, q(s"XA END $xb")),
        SessionEvent(1L, 12L, prep("b", one = false)),
        SessionEvent(1L, 13L, q(s"XA ROLLBACK $xb")),
        SessionEvent(1L, 14L, q(s"XA COMMIT $xa")))
      query.processAllAvailable()
      val t2 = rows()
      assert(t2 == t1 ++ Set(
        (1L, 1L, Some(xa), Some("committed")),
        (1L, 2L, Some(xa), Some("committed")),
        (1L, 3L, Some(xa), Some("committed")),
        (1L, 4L, Some(xa), Some("committed")),
        (1L, 13L, None, None), // the rollback statement passes through
        (1L, 14L, None, None)), t2) // the commit statement passes through
      // the rolled-back span's events (ordinals 9-12) were never delivered
      assert(!t2.exists(r => r._2 >= 9 && r._2 <= 12))
    } finally query.stop()
  }

  test("XA COMMIT for a pending xid resolves it even inside another open span") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (xa, xb) = (xidOf("a"), xidOf("b"))
    val in = MemoryStream[SessionEvent]
    val query = XaStream.assembleResolved(in.toDS())
      .writeStream.format("memory").queryName("xa_interleaved")
      .outputMode("append").start()
    try {
      in.addData(
        SessionEvent(1L, 0L, q(s"XA START $xa")),
        SessionEvent(1L, 1L, write(1L)),
        SessionEvent(1L, 2L, q(s"XA END $xa")),
        SessionEvent(1L, 3L, prep("a", one = false)),
        // span b opens; the transaction manager resolves a MID-SPAN —
        // the commit must release span a, not be buffered into span b
        SessionEvent(1L, 4L, q(s"XA START $xb")),
        SessionEvent(1L, 5L, write(2L)),
        SessionEvent(1L, 6L, q(s"XA COMMIT $xa")),
        SessionEvent(1L, 7L, q(s"XA END $xb")),
        SessionEvent(1L, 8L, prep("b", one = true)))
      query.processAllAvailable()
      val rows = spark.table("xa_interleaved")
        .collect().map(r => (r.getLong(1),
          Option(r.get(2)), Option(r.get(3)))).toSet
      assert(rows == Set(
        (0L, Some(xa), Some("committed")),
        (1L, Some(xa), Some("committed")),
        (2L, Some(xa), Some("committed")),
        (3L, Some(xa), Some("committed")),
        (6L, None, None), // the commit statement: immediate, unstamped
        (4L, Some(xb), Some("committed")),
        (5L, Some(xb), Some("committed")),
        (7L, Some(xb), Some("committed")),
        (8L, Some(xb), Some("committed"))), rows)
    } finally query.stop()
  }

  test("a stray XA COMMIT for an unknown xid passes through without effect") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val query = XaStream.assembleResolved(in.toDS())
      .writeStream.format("memory").queryName("xa_stray")
      .outputMode("append").start()
    try {
      in.addData(SessionEvent(7L, 0L, q(s"XA COMMIT ${xidOf("zz")}")))
      query.processAllAvailable()
      val rows = spark.table("xa_stray").collect()
      assert(rows.length == 1 && rows.head.isNullAt(2) && rows.head.isNullAt(3))
    } finally query.stop()
  }
}
