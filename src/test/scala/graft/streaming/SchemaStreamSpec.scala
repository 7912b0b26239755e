package graft.streaming

import graft.SparkSpec
import graft.cdc.{BinlogRowCodec, BinlogSchema, BinlogTxnCodec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming schema-history tracking: DDL evolves per-table state, row
  * events emit with the era's names/types (decodable without any external
  * metadata), boundaries survive trigger splits, and unknown tables or
  * table_ids fail loudly.
  */
class SchemaStreamSpec extends SparkSpec {
  import BinlogRowCodec.{encodeEvent, encodeRows, encodeTableMap, WriteV2}

  private val v1 = Seq("pk" -> "bigint", "price" -> "decimal(12,2)")
  private val s1 = BinlogSchema.fromMysqlTypes(v1)
  private val v2 = v1 :+ ("status" -> "varchar(4)")
  private val s2 = BinlogSchema.fromMysqlTypes(v2)

  private def tm(tid: Long, sch: Array[graft.cdc.BinlogColumn]) =
    encodeEvent(19, encodeTableMap(tid, "db1", "t1", sch))
  private def write(sch: Array[graft.cdc.BinlogColumn], tid: Long, vals: Any*) =
    encodeEvent(WriteV2, encodeRows(WriteV2, sch, Seq(vals), tableId = tid))
  private def alter(sql: String) =
    encodeEvent(BinlogTxnCodec.QueryType, BinlogTxnCodec.encodeQuery("db1", sql))

  private val bootstrap = Map(("db1", "t1") -> v1)

  test("DDL between triggers evolves names; rows decode per era") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = SchemaStream.withSchema(in.toDS(), bootstrap)
      .writeStream.format("memory").queryName("schema_out")
      .outputMode("append").start()
    try {
      in.addData(
        SessionEvent(1L, 0L, tm(7L, s1)),
        SessionEvent(1L, 1L, write(s1, 7L, 10L, "5.00")))
      q.processAllAvailable()
      // the ALTER and the new-era row arrive in a LATER trigger: state
      // must carry the evolved list across the boundary
      in.addData(
        SessionEvent(1L, 2L, alter(
          "ALTER TABLE t1 ADD COLUMN status varchar(4) AFTER price")),
        SessionEvent(1L, 3L, tm(8L, s2)),
        SessionEvent(1L, 4L, write(s2, 8L, 11L, "6.00", "ok")))
      q.processAllAvailable()
      val rows = spark.table("schema_out")
        .select("ordinal", "db", "table", "names", "mysqlTypes", "event")
        .collect().sortBy(_.getLong(0))
      assert(rows.length == 2)
      assert(rows.forall(r => r.getString(1) == "db1" && r.getString(2) == "t1"))
      assert(rows(0).getSeq[String](3) == Seq("pk", "price"))
      assert(rows(1).getSeq[String](3) == Seq("pk", "price", "status"))
      // the stamped types alone are enough to decode the event bytes
      val decoded = rows.map { r =>
        val sch = BinlogSchema.fromMysqlTypes(
          r.getSeq[String](3).zip(r.getSeq[String](4)))
        val h = BinlogRowCodec.decodeHeader(r.getAs[Array[Byte]](5), packetMarker = false)
        val img = BinlogRowCodec.decodeRows(h.getBinary(6), h.getInt(1), sch)
          .getArray(0).getMap(0)
        (0 until img.numElements()).map(j =>
          img.keyArray.getUTF8String(j).toString ->
            img.valueArray.getUTF8String(j).toString).toMap
      }
      assert(decoded(0) == Map("pk" -> "10", "price" -> "5.00"))
      assert(decoded(1) == Map("pk" -> "11", "price" -> "6.00", "status" -> "ok"))
    } finally q.stop()
  }

  test("sessions evolve independently; metadata events never emit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = SchemaStream.withSchema(in.toDS(), bootstrap)
      .writeStream.format("memory").queryName("schema_out2")
      .outputMode("append").start()
    try {
      in.addData(
        // session 1 alters; session 2 does not
        SessionEvent(1L, 0L, tm(7L, s1)),
        SessionEvent(1L, 1L, alter("ALTER TABLE `t1` DROP COLUMN price")),
        SessionEvent(1L, 2L, write(BinlogSchema.fromMysqlTypes(
          Seq("pk" -> "bigint")), 7L, 1L)),
        SessionEvent(2L, 0L, tm(7L, s1)),
        SessionEvent(2L, 1L, write(s1, 7L, 2L, "9.00")))
      q.processAllAvailable()
      val rows = spark.table("schema_out2")
        .select("session", "names").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(rows == Map(1L -> Seq("pk"), 2L -> Seq("pk", "price")))
      // only the two row events emitted — TABLE_MAP/QUERY are state-only
      assert(spark.table("schema_out2").count() == 2)
    } finally q.stop()
  }

  test("a CREATE-led stream needs no bootstrap; DROP retires the table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = SchemaStream.withSchema(in.toDS(), bootstrap = Map.empty)
      .writeStream.format("memory").queryName("schema_out4")
      .outputMode("append").start()
    try {
      in.addData(
        SessionEvent(1L, 0L, alter(
          "CREATE TABLE t1 (pk bigint NOT NULL, price decimal(12,2), PRIMARY KEY (pk))")),
        SessionEvent(1L, 1L, tm(7L, s1)),
        SessionEvent(1L, 2L, write(s1, 7L, 5L, "1.00")),
        SessionEvent(1L, 3L, alter("DROP TABLE t1")))
      q.processAllAvailable()
      val rows = spark.table("schema_out4").select("names").collect()
      assert(rows.map(_.getSeq[String](0)).toSeq == Seq(Seq("pk", "price")))
      // after the DROP, a row event for the table fails loudly
      in.addData(SessionEvent(1L, 4L, write(s1, 7L, 6L, "2.00")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("no schema for") ||
        String.valueOf(e.getCause).contains("no schema for"))
    } finally q.stop()
  }

  test("row events for unmapped table_ids or unknown tables fail loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = SchemaStream.withSchema(in.toDS(), bootstrap)
      .writeStream.format("memory").queryName("schema_out3")
      .outputMode("append").start()
    try {
      in.addData(SessionEvent(1L, 0L, write(s1, 99L, 1L, "1.00")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("unmapped table_id") ||
        String.valueOf(e.getCause).contains("unmapped table_id"))
    } finally q.stop()
  }
}
