package graft.streaming

import graft.SparkSpec
import graft.cdc.{BinlogRowCodec, BinlogSchema, Envelope, Instance}
import org.apache.spark.sql.functions._

/** Wire events → Canal envelopes → routed MQ records: the last link that
  * closes the reference's whole dataflow as one chain. Checks the Canal
  * conventions exactly: DELETE images in data, UPDATE before-images in
  * old, sqlType/mysqlType from the stamped schema, key = db.table.
  */
class PipelineWireSpec extends SparkSpec {
  import BinlogRowCodec._

  private val cols = Seq("pk" -> "bigint", "name" -> "varchar(16)")
  private val sch = BinlogSchema.fromMysqlTypes(cols)

  private def ev(tpe: Int, images: Seq[Seq[Any]]) =
    encodeEvent(tpe, encodeRows(tpe, sch, images), timestamp = 1700000123L)

  private def named(ord: Long, tpe: Int, images: Seq[Seq[Any]]) =
    SchemaEvent(1L, ord, "shop", "users", cols.map(_._1), cols.map(_._2),
      tpe, ev(tpe, images))

  test("wire events render Canal envelopes with exact image placement") {
    import spark.implicits._
    val ds = Seq(
      named(1L, WriteV2, Seq(Seq[Any](1L, "ann"))),
      named(2L, UpdateV2, Seq(Seq[Any](1L, "ann"), Seq[Any](1L, "bea"))),
      named(3L, DeleteV2, Seq(Seq[Any](1L, "bea")))).toDS()
    val env = Pipeline.envelopesFromWire(ds)
    val rows = env.select("id", "database", "table", "type", "data", "old")
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getString(3)).toSeq == Seq("INSERT", "UPDATE", "DELETE"))
    def data(i: Int) = rows(i).getSeq[Map[String, String]](4)
    def old(i: Int) = rows(i).getSeq[Map[String, String]](5)
    assert(data(0) == Seq(Map("pk" -> "1", "name" -> "ann")) && old(0).isEmpty)
    assert(data(1) == Seq(Map("pk" -> "1", "name" -> "bea")))
    assert(old(1) == Seq(Map("pk" -> "1", "name" -> "ann")))
    assert(data(2) == Seq(Map("pk" -> "1", "name" -> "bea")) && old(2).isEmpty)
    assert(rows.forall(r => r.getString(1) == "shop" && r.getString(2) == "users"))
    // type maps derive from the stamped schema: bigint = JDBC -5
    val tm = env.select("sqlType", "mysqlType").collect().head
    assert(tm.getMap[String, Int](0)("pk") == -5)
    assert(tm.getMap[String, String](1)("name") == "varchar(16)")
  }

  test("the chain continues into routing with db.table ordering keys") {
    import spark.implicits._
    val ds = Seq(named(1L, WriteV2, Seq(Seq[Any](7L, "zoe")))).toDS()
    val routed = Pipeline.routedRecords(Pipeline.envelopesFromWire(ds),
      Seq(Instance(mq = "mq1", topic = "t-users", schemas = "sh*", tables = "users")))
    val r = routed.collect().head
    assert(r.getString(0) == "mq1" && r.getString(1) == "t-users")
    assert(r.getString(2) == "shop.users")
    val parsed = Seq(r.getString(3)).toDF("value")
      .select(Envelope.parse(col("value")).as("e")).select("e.*").collect().head
    assert(parsed.getAs[String]("type") == "INSERT")
  }
}
