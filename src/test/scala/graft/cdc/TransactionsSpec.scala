package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transaction assembly: QUERY("BEGIN") … XID grouping, commit stamping,
  * pre-BEGIN events, uncommitted tails, multi-file independence, and the
  * QUERY/XID body codecs (including a status-vars block the fixture
  * encoder never writes).
  */
class TransactionsSpec extends SparkSpec {
  import BinlogTxnCodec._

  test("QUERY body codec round-trips db and statement") {
    val body = encodeQuery("shop", "BEGIN")
    val r = decodeQuery(body)
    assert(r.getUTF8String(0).toString == "shop")
    assert(r.getUTF8String(1).toString == "BEGIN")
    val ddl = decodeQuery(encodeQuery("", "CREATE TABLE t (id INT)"))
    assert(ddl.getUTF8String(0).toString == "")
    assert(ddl.getUTF8String(1).toString == "CREATE TABLE t (id INT)")
  }

  test("ROWS_QUERY body codec round-trips; length byte is ignored") {
    val r = decodeRowsQuery(encodeRowsQuery("INSERT INTO t VALUES (1)"))
    assert(r.toString == "INSERT INTO t VALUES (1)")
    // a statement longer than the 255 the length byte can declare still
    // decodes whole — the text runs to the event tail
    val long = "INSERT /* " + ("x" * 300) + " */"
    assert(decodeRowsQuery(encodeRowsQuery(long)).toString == long)
    intercept[IllegalArgumentException](decodeRowsQuery(Array[Byte](1, 0, 0)))
  }

  test("QUERY decode skips status vars and rejects corrupt layouts") {
    // hand-build a body WITH status vars (3 bytes), which the fixture
    // encoder never emits: thread_id(4) exec_time(4) db_len(1) err(2)
    // status_len(2) status(3) db(2) NUL sql tail(4)
    val sql = "COMMIT".getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream
    out.write(Array[Byte](7, 0, 0, 0, 0, 0, 0, 0)) // thread_id, exec_time
    out.write(2) // db_len
    out.write(Array[Byte](0, 0)) // error_code
    out.write(Array[Byte](3, 0)) // status_vars_length = 3
    out.write(Array[Byte](1, 2, 3)) // status vars (opaque)
    out.write("db".getBytes("UTF-8"))
    out.write(0)
    out.write(sql)
    out.write(Array[Byte](0, 0, 0, 0))
    val r = decodeQuery(out.toByteArray)
    assert(r.getUTF8String(0).toString == "db")
    assert(r.getUTF8String(1).toString == "COMMIT")
    intercept[IllegalArgumentException](decodeQuery(Array[Byte](1, 2, 3)))
    val noNul = encodeQuery("db", "BEGIN")
    noNul(15) = 1 // overwrite the schema NUL ("db" ends at offset 14)
    intercept[IllegalArgumentException](decodeQuery(noNul))
  }

  test("XID codec: 8-byte LE id, full unsigned range") {
    assert(decodeXid(encodeXid(1L)) == 1L)
    assert(decodeXid(encodeXid(-1L)) == -1L) // 2^64-1 as raw bits
    assert(decodeXid(encodeXid(0x0102030405060708L)) == 0x0102030405060708L)
    intercept[IllegalArgumentException](decodeXid(Array[Byte](1, 2, 3)))
  }

  test("assemble: BEGIN..XID grouping, commit stamps, tails and preludes") {
    val spark2 = spark
    import spark2.implicits._
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def row(pk: Long) = BinlogRowCodec.encodeRows(
      BinlogRowCodec.WriteV2, schema, Seq(Seq(pk)))
    // file A: prelude event, then txn(xid=11) 2 rows, txn(xid=12) 1 row,
    //         then an UNCOMMITTED begin + row (no XID)
    // file B: txn(xid=21) 1 row — independent numbering per file
    val events = Seq(
      ("A", 0, 4, Array[Byte](0, 0, 0, 0), 0L), // ROTATE-ish prelude
      ("A", 1, QueryType, encodeQuery("d", "BEGIN"), 0L),
      ("A", 2, BinlogRowCodec.WriteV2, row(1), 0L),
      ("A", 3, BinlogRowCodec.WriteV2, row(2), 0L),
      ("A", 4, XidType, encodeXid(11L), 1000L),
      ("A", 5, QueryType, encodeQuery("d", "begin "), 0L), // case/space robust
      ("A", 6, BinlogRowCodec.WriteV2, row(3), 0L),
      ("A", 7, XidType, encodeXid(12L), 2000L),
      ("A", 8, QueryType, encodeQuery("d", "BEGIN"), 0L),
      ("A", 9, BinlogRowCodec.WriteV2, row(4), 0L), // uncommitted tail
      ("B", 0, QueryType, encodeQuery("d", "BEGIN"), 0L),
      ("B", 1, BinlogRowCodec.WriteV2, row(5), 0L),
      ("B", 2, XidType, encodeXid(21L), 3000L)
    ).toDF("file", "ord", "event_type", "body", "timestamp")
    val out = Transactions.assemble(events, "file", "ord")
      .filter(col("event_type") === BinlogRowCodec.WriteV2)
      .select(col("file"), col("ord"), col("txn_seq"), col("xid"), col("commit_ts"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out == Set(
      ("A", 2, 1L, Some(11L), Some(1000L)),
      ("A", 3, 1L, Some(11L), Some(1000L)),
      ("A", 6, 2L, Some(12L), Some(2000L)),
      ("A", 9, 3L, None, None), // uncommitted: unstamped, not guessed
      ("B", 1, 1L, Some(21L), Some(3000L))))
    // the prelude event (before any BEGIN) is txn_seq 0, unstamped
    val prelude = Transactions.assemble(events, "file", "ord")
      .filter(col("ord") === 0 && col("file") === "A")
      .select(col("txn_seq"), col("xid")).collect().head
    assert(prelude.getLong(0) == 0L && prelude.isNullAt(1))
  }

  test("XA_PREPARE codec: round-trip, one_phase flag, hostile lengths") {
    val gtrid = "gt-1".getBytes("UTF-8")
    val bqual = Array[Byte](0x00, 0x7f, 0xff.toByte)
    val r = decodeXaPrepare(encodeXaPrepare(onePhase = false, 1, gtrid, bqual))
    assert(!r.getBoolean(0) && r.getInt(1) == 1)
    assert(r.getUTF8String(2).toString == "67742d31")
    assert(r.getUTF8String(3).toString == "007fff")
    assert(r.getUTF8String(4).toString == "X'67742d31',X'007fff',1")
    val one = decodeXaPrepare(encodeXaPrepare(onePhase = true, 77, gtrid, Array.emptyByteArray))
    assert(one.getBoolean(0) && one.getInt(1) == 77)
    assert(one.getUTF8String(4).toString == "X'67742d31',X'',77")
    intercept[IllegalArgumentException](decodeXaPrepare(Array[Byte](1, 2, 3)))
    // declared gtrid length beyond MAXGTRIDSIZE must be rejected, not read
    val hostile = encodeXaPrepare(onePhase = false, 1, gtrid, bqual)
    hostile(5) = 0x65 // gtrid_length = 101 > 64
    intercept[IllegalArgumentException](decodeXaPrepare(hostile))
    // truncated data section (lengths promise more bytes than present)
    val trunc = encodeXaPrepare(onePhase = false, 1, gtrid, bqual).dropRight(6)
    intercept[IllegalArgumentException](decodeXaPrepare(trunc))
  }

  test("XA_PREPARE decode is total on adversarial bytes") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { i =>
      val bs = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      try { decodeXaPrepare(bs); () }
      catch { case _: IllegalArgumentException => () } // the only allowed failure
    }
    // bit-flip sweep over a valid body: every corruption either decodes
    // (a flipped data byte just changes the hex) or fails loudly with IAE
    val valid = encodeXaPrepare(onePhase = false, 1,
      "gtrid-x".getBytes("UTF-8"), Array[Byte](1, 2))
    valid.indices.foreach { i =>
      (0 until 8).foreach { b =>
        val m = valid.clone(); m(i) = (m(i) ^ (1 << b)).toByte
        try { decodeXaPrepare(m); () }
        catch { case _: IllegalArgumentException => () }
      }
    }
  }

  test("xaAssemble: span stamping, outcome resolution, ordering and strays") {
    val spark2 = spark
    import spark2.implicits._
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def row(pk: Long) = BinlogRowCodec.encodeRows(
      BinlogRowCodec.WriteV2, schema, Seq(Seq(pk)))
    def xa(tag: String) = {
      val hex = tag.getBytes("UTF-8").map(b => f"$b%02x").mkString
      (tag.getBytes("UTF-8"), xidText(hex, "", 1))
    }
    val (g1, x1) = xa("a") // two-phase, committed after prepare
    val (g2, x2) = xa("b") // two-phase, rolled back
    val (g3, x3) = xa("c") // one-phase
    val (g4, x4) = xa("d") // no outcome: prepared
    val (_, x5) = xa("e")  // outcome BEFORE any prepare of x5 + unknown xid
    def start(x: String) = encodeQuery("d", s"XA START $x")
    def end(x: String) = encodeQuery("d", s"XA END $x")
    def prep(g: Array[Byte], one: Boolean) = encodeXaPrepare(one, 1, g, Array.emptyByteArray)
    val events = Seq(
      // stray outcome for an xid never prepared — must not crash or match
      ("A", 0, QueryType, encodeQuery("d", s"XA COMMIT $x5")),
      ("A", 1, QueryType, start(x1)),
      ("A", 2, BinlogRowCodec.WriteV2, row(1)),
      ("A", 3, QueryType, end(x1)),
      ("A", 4, XaPrepareType, prep(g1, one = false)),
      ("A", 5, QueryType, start(x2)),
      ("A", 6, BinlogRowCodec.WriteV2, row(2)),
      ("A", 7, QueryType, end(x2)),
      ("A", 8, XaPrepareType, prep(g2, one = false)),
      ("A", 9, QueryType, encodeQuery("d", s"XA COMMIT $x1")),
      ("A", 10, QueryType, encodeQuery("d", s"XA ROLLBACK $x2")),
      // a plain (non-XA) event between spans stays unstamped
      ("A", 11, BinlogRowCodec.WriteV2, row(9)),
      ("B", 0, QueryType, start(x3)),
      ("B", 1, BinlogRowCodec.WriteV2, row(3)),
      ("B", 2, QueryType, end(x3)),
      ("B", 3, XaPrepareType, prep(g3, one = true)),
      ("B", 4, QueryType, start(x4)),
      ("B", 5, BinlogRowCodec.WriteV2, row(4)),
      ("B", 6, QueryType, end(x4)),
      ("B", 7, XaPrepareType, prep(g4, one = false))
    ).toDF("file", "ord", "event_type", "body")
    val out = Transactions.xaAssemble(events, "file", "ord")
      .filter(col("event_type") === BinlogRowCodec.WriteV2)
      .select(col("file"), col("ord"), col("xa_xid"), col("xa_state"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(out == Set(
      ("A", 2, Some(x1), Some("committed")),
      ("A", 6, Some(x2), Some("rolled_back")),
      ("A", 11, None, None),
      ("B", 1, Some(x3), Some("committed")),
      ("B", 5, Some(x4), Some("prepared"))))
    // an outcome that precedes its prepare does NOT resolve it: move the
    // x1 commit to ord 0 (before the span) — x1 must stay 'prepared'
    val early = events.withColumn("ord",
      when(col("ord") === 9 && col("file") === "A", -1).otherwise(col("ord")))
    val earlyOut = Transactions.xaAssemble(early, "file", "ord")
      .filter(col("event_type") === BinlogRowCodec.WriteV2 && col("ord") === 2)
      .select("xa_state").collect().head.getString(0)
    assert(earlyOut == "prepared")
  }

  test("xaAssemble: xid reuse resolves per-span; files order by numeric suffix") {
    val spark2 = spark
    import spark2.implicits._
    val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint"))
    def row(pk: Long) = BinlogRowCodec.encodeRows(
      BinlogRowCodec.WriteV2, schema, Seq(Seq(pk)))
    val gid = "r".getBytes("UTF-8")
    val xr = xidText(gid.map(b => f"$b%02x").mkString, "", 1)
    def prep = encodeXaPrepare(false, 1, gid, Array.emptyByteArray)
    // MySQL allows an xid to be REUSED once its transaction completes.
    // Files '8' and '40' order numerically (8 < 40) though lexicographic
    // string order says '40' < '8' — both spans must resolve against the
    // outcome at-or-after THEIR OWN prepare, not a single global min.
    val events = Seq(
      ("8", 1, QueryType, encodeQuery("d", s"XA START $xr")),
      ("8", 2, BinlogRowCodec.WriteV2, row(1)),
      ("8", 3, QueryType, encodeQuery("d", s"XA END $xr")),
      ("8", 4, XaPrepareType, prep),
      ("8", 5, QueryType, encodeQuery("d", s"XA COMMIT $xr")),
      ("40", 1, QueryType, encodeQuery("d", s"XA START $xr")),
      ("40", 2, BinlogRowCodec.WriteV2, row(2)),
      ("40", 3, QueryType, encodeQuery("d", s"XA END $xr")),
      ("40", 4, XaPrepareType, prep),
      ("40", 5, QueryType, encodeQuery("d", s"XA ROLLBACK $xr"))
    ).toDF("file", "ord", "event_type", "body")
    val out = Transactions.xaAssemble(events, "file", "ord")
      .filter(col("event_type") === BinlogRowCodec.WriteV2)
      .select("file", "xa_state").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("8", "committed"), ("40", "rolled_back")), out)
  }
}
