package graft.cdc

import graft.SparkSpec
import graft.streaming.CdcSnapshot
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY.md §7 minimum slice (b), full pipeline: Canal-JSON lines →
  * envelope parse → instance routing → pk extraction → streaming
  * latest-image snapshot. The input replays the golden users-table story
  * (insert alice → update bal → insert bob → delete alice) plus rows for a
  * non-routed table that must be filtered out before merging.
  */
case class RawEv(id: Long, event: Array[Byte])

class CdcEndToEndSpec extends SparkSpec {

  private def msg(id: Long, table: String, tpe: String,
      data: Map[String, String], old: Map[String, String]): String = {
    def m(kv: Map[String, String]) =
      kv.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val dataArr = if (data.isEmpty) "[]" else s"[${m(data)}]"
    s"""{"data":$dataArr,"database":"testdb","es":${1767322800000L + id * 1000},
       |"id":$id,"isDdl":false,"mysqlType":{"id":"bigint","name":"varchar(32)","bal":"decimal(10,2)"},
       |"old":[${m(old)}],"pkNames":["id"],"sql":"",
       |"sqlType":{"id":-5,"name":12,"bal":3},
       |"table":"$table","ts":${1767322800123L + id * 1000},"type":"$tpe"}""".stripMargin.replace("\n", "")
  }

  test("Canal-JSON stream → route → merge → snapshot equals expected state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val instances = Seq(Instance("q", "t_users", schemas = "test*", tables = "users"))
    val dir = Files.createTempDirectory("graft-e2e").toString
    val in = MemoryStream[String]

    val parsed = in.toDF().select(Envelope.parse(col("value")).as("e")).select("e.*")
    val routed = parsed
      .filter(size(Routing.routes(instances, col("database"), col("table"))) > 0)
    // pk value: first data row for upserts, first old row for deletes
    val keyed = routed.select(
      col("id").as("cid"),
      col("type"),
      try_element_at(
        when(col("type") === "DELETE", col("old")).otherwise(col("data")), lit(1))
        .getItem("id").cast("long").as("pk"),
      try_element_at(col("data"), lit(1)).getItem("name").as("name"),
      try_element_at(col("data"), lit(1)).getItem("bal").as("bal"))
    val q = CdcSnapshot.start(keyed, Seq("pk"), "cid", s"$dir/snap", s"$dir/ckpt")

    try {
      in.addData(
        msg(0, "users", "INSERT", Map("id" -> "1", "name" -> "alice", "bal" -> "10.50"), Map.empty),
        msg(1, "audit_log", "INSERT", Map("id" -> "9", "name" -> "x", "bal" -> "0"), Map.empty))
      q.processAllAvailable()
      in.addData(
        msg(2, "users", "UPDATE", Map("id" -> "1", "name" -> "alice", "bal" -> "99.90"), Map("bal" -> "10.50")),
        msg(3, "users", "INSERT", Map("id" -> "2", "name" -> "bob", "bal" -> "5.00"), Map.empty))
      q.processAllAvailable()
      in.addData(
        msg(4, "users", "DELETE", Map.empty, Map("id" -> "1", "name" -> "alice", "bal" -> "99.90")))
      q.processAllAvailable()

      val snap = CdcSnapshot.read(spark, s"$dir/snap")
        .select("pk", "name", "bal").orderBy("pk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      // alice deleted, bob present, audit_log rows never routed
      assert(snap == Seq((2L, "bob", "5.00")))
    } finally q.stop()
  }

  test("raw binlog event bytes → header split → row decode → merge → snapshot") {
    // The full raw-bytes story (§2A#9-12) with ZERO external metadata:
    // whole events (19-byte common header ++ row body) stream in as bytes,
    // BinlogEventSplit reads the type from the header itself,
    // BinlogRowsDecode assembles typed row images (multi-row, UPDATE
    // pairs), and the same streaming latest-image snapshot converges — no
    // Canal-JSON leg and no out-of-band type column at all.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import BinlogRowCodec._
    val schema = BinlogSchema.fromMysqlTypes(Seq(
      "id" -> "bigint", "name" -> "varchar(32)", "bal" -> "decimal(10,2)"))
    val dir = Files.createTempDirectory("graft-e2e-raw").toString
    val in = MemoryStream[RawEv]

    val split = in.toDF().select(col("id"),
      BinlogDecode.eventSplit(col("event")).as("h"))
    val decoded = split.select(col("id"), col("h.event_type").as("tpe"),
      BinlogDecode.rows(col("h.body"), col("h.event_type"), schema).as("r"))
    val images = decoded.select(col("id"), col("tpe"),
      posexplode(when(col("tpe") === DeleteV2, col("r.old"))
        .otherwise(col("r.data"))).as(Seq("pos", "m")))
    val keyed = images.select(
      (col("id") * 10 + col("pos")).as("cid"),
      when(col("tpe") === DeleteV2, "DELETE")
        .when(col("tpe") === UpdateV2, "UPDATE")
        .otherwise("INSERT").as("type"),
      element_at(col("m"), "id").cast("long").as("pk"),
      element_at(col("m"), "name").as("name"),
      element_at(col("m"), "bal").as("bal"))
    val q = CdcSnapshot.start(keyed, Seq("pk"), "cid", s"$dir/snap", s"$dir/ckpt")

    def ev(tpe: Int, images: Seq[Seq[Any]]): Array[Byte] =
      encodeEvent(tpe, encodeRows(tpe, schema, images))
    try {
      in.addData(RawEv(0, ev(WriteV2, Seq(
        Seq(1L, "alice", "10.50"), Seq(2L, "bob", "5.00"))))) // multi-row WRITE
      q.processAllAvailable()
      in.addData(RawEv(1, ev(UpdateV2, Seq(
        Seq(1L, "alice", "10.50"), Seq(1L, "alice", "99.90"))))) // old,new pair
      q.processAllAvailable()
      in.addData(RawEv(2, ev(DeleteV2, Seq(Seq(2L, "bob", "5.00")))))
      q.processAllAvailable()

      val snap = CdcSnapshot.read(spark, s"$dir/snap")
        .select("pk", "name", "bal").orderBy("pk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(snap == Seq((1L, "alice", "99.90")))
    } finally q.stop()
  }
}
