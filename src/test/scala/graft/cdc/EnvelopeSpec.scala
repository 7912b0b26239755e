package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden Canal-JSON messages (FIXTURES.md §2, mirroring the reference's
  * output format `/root/reference/src/executor.rs:90-105,120-222`):
  * INSERT/UPDATE/DELETE parse field-by-field, plus changed-columns diff
  * semantics and round-trip stability.
  */
class EnvelopeSpec extends SparkSpec {

  val insertMsg =
    """{"data":[{"id":"1","name":"alice","bal":"10.50","created":"2026-01-02 03:04:05.000"}],
      |"database":"testdb","es":1767322800000,"id":0,"isDdl":false,
      |"mysqlType":{"id":"bigint","name":"varchar(32)","bal":"decimal(10,2)","created":"datetime(3)"},
      |"old":[{}],"pkNames":["id"],"sql":"",
      |"sqlType":{"id":-5,"name":12,"bal":3,"created":93},
      |"table":"users","ts":1767322800123,"type":"INSERT"}""".stripMargin.replace("\n", "")

  val updateMsg =
    """{"data":[{"id":"1","name":"alice","bal":"99.90","created":"2026-01-02 03:04:05.000"}],
      |"database":"testdb","es":1767322801000,"id":1,"isDdl":false,
      |"mysqlType":{"id":"bigint","name":"varchar(32)","bal":"decimal(10,2)","created":"datetime(3)"},
      |"old":[{"bal":"10.50"}],"pkNames":["id"],"sql":"",
      |"sqlType":{"id":-5,"name":12,"bal":3,"created":93},
      |"table":"users","ts":1767322801123,"type":"UPDATE"}""".stripMargin.replace("\n", "")

  val deleteMsg =
    """{"data":[],"database":"testdb","es":1767322802000,"id":2,"isDdl":false,
      |"mysqlType":{"id":"bigint","name":"varchar(32)","bal":"decimal(10,2)","created":"datetime(3)"},
      |"old":[{"id":"1","name":"alice","bal":"99.90","created":"2026-01-02 03:04:05.000"}],
      |"pkNames":["id"],"sql":"",
      |"sqlType":{"id":-5,"name":12,"bal":3,"created":93},
      |"table":"users","ts":1767322802123,"type":"DELETE"}""".stripMargin.replace("\n", "")

  private def parsed(msgs: String*): Seq[Row] = {
    import spark.implicits._
    msgs.toDF("raw").select(Envelope.parse(col("raw")).as("e"))
      .select("e.*").collect().toSeq
  }

  test("golden INSERT parses field-by-field") {
    val r = parsed(insertMsg).head
    assert(r.getAs[Long]("id") == 0L)
    assert(r.getAs[String]("database") == "testdb")
    assert(r.getAs[String]("table") == "users")
    assert(r.getAs[collection.Seq[String]]("pkNames") == Seq("id"))
    assert(!r.getAs[Boolean]("isDdl"))
    assert(r.getAs[String]("type") == "INSERT")
    assert(r.getAs[Long]("es") == 1767322800000L)
    val data = r.getAs[collection.Seq[Map[String, String]]]("data")
    assert(data == Seq(Map("id" -> "1", "name" -> "alice", "bal" -> "10.50",
      "created" -> "2026-01-02 03:04:05.000")))
    assert(r.getAs[collection.Seq[Map[String, String]]]("old") == Seq(Map.empty[String, String]))
    assert(r.getAs[collection.Map[String, Int]]("sqlType") ==
      Map("id" -> -5, "name" -> 12, "bal" -> 3, "created" -> 93))
    assert(r.getAs[collection.Map[String, String]]("mysqlType")("bal") == "decimal(10,2)")
  }

  test("golden UPDATE carries only changed columns in old") {
    val r = parsed(updateMsg).head
    assert(r.getAs[String]("type") == "UPDATE")
    assert(r.getAs[collection.Seq[Map[String, String]]]("old") == Seq(Map("bal" -> "10.50")))
    assert(r.getAs[collection.Seq[Map[String, String]]]("data").head("bal") == "99.90")
  }

  test("golden DELETE carries images in old, empty data") {
    val r = parsed(deleteMsg).head
    assert(r.getAs[String]("type") == "DELETE")
    assert(r.getAs[collection.Seq[Map[String, String]]]("data").isEmpty)
    assert(r.getAs[collection.Seq[Map[String, String]]]("old").head("name") == "alice")
  }

  val ddlMsg =
    """{"data":[],"database":"testdb","es":1767322803000,"id":3,"isDdl":true,
      |"mysqlType":{},"old":[],"pkNames":[],
      |"sql":"ALTER TABLE users ADD COLUMN email varchar(64)",
      |"sqlType":{},"table":"users","ts":1767322803123,"type":"ALTER"}""".stripMargin.replace("\n", "")

  val multiRowMsg =
    """{"data":[{"id":"7","name":"gail"},{"id":"8","name":"hank"},{"id":"9","name":"ivy"}],
      |"database":"testdb","es":1767322804000,"id":4,"isDdl":false,
      |"mysqlType":{"id":"bigint","name":"varchar(32)"},
      |"old":[],"pkNames":["id"],"sql":"",
      |"sqlType":{"id":-5,"name":12},
      |"table":"users","ts":1767322804123,"type":"INSERT"}""".stripMargin.replace("\n", "")

  test("golden DDL: isDdl + statement text parse; verb/table extract; routes") {
    import spark.implicits._
    val r = parsed(ddlMsg).head
    assert(r.getAs[Boolean]("isDdl"))
    assert(r.getAs[String]("sql") == "ALTER TABLE users ADD COLUMN email varchar(64)")
    assert(r.getAs[String]("type") == "ALTER")
    assert(r.getAs[collection.Seq[Map[String, String]]]("data").isEmpty)
    val ext = Seq(ddlMsg).toDF("raw").select(Envelope.parse(col("raw")).as("e"))
      .select(Envelope.ddlOp(col("e")).as("op"), Envelope.ddlTable(col("e")).as("tbl"))
      .collect().head
    assert(ext.getString(0) == "ALTER")
    assert(ext.getString(1) == "users")
    // DDL envelopes route by (database, table) exactly like DML ones
    val inst = Seq(Instance("q", "t_users", schemas = "test*", tables = "users"))
    val routed = Seq(ddlMsg).toDF("raw").select(Envelope.parse(col("raw")).as("e"))
      .select(explode(Routing.routes(inst, col("e.database"), col("e.table"))).as("r"))
      .collect()
    assert(routed.length == 1)
  }

  test("applyDdl invalidates touched catalog rows, keeps the rest") {
    import spark.implicits._
    val catalog = Seq(
      ("testdb", "users", "bigint"),
      ("testdb", "orders", "bigint"),
      ("testdb", "audit", "bigint"),
      ("otherdb", "users", "int")
    ).toDF("database", "table", "pk_type")
    val ddl = Seq(
      ("testdb", "ALTER TABLE users ADD COLUMN email varchar(64)"),
      ("testdb", "DROP TABLE IF EXISTS audit"),          // IF EXISTS skipped
      ("ignoredb", "ALTER TABLE `otherdb`.`users` DROP COLUMN x") // qualifier wins
    ).toDF("database", "sql")
    val left = Catalog.applyDdl(catalog, ddl)
      .select("database", "table").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // testdb.users, testdb.audit, otherdb.users invalidated; orders survives
    assert(left == Set(("testdb", "orders")))
  }

  test("golden multi-row INSERT: data carries all row images in order") {
    import spark.implicits._
    val r = parsed(multiRowMsg).head
    val data = r.getAs[collection.Seq[Map[String, String]]]("data")
    assert(data.map(_("id")) == Seq("7", "8", "9"))
    val rows = Seq(multiRowMsg).toDF("raw").select(Envelope.parse(col("raw")).as("e"))
      .select(col("e.id").as("gid"), posexplode(col("e.data")).as(Seq("pos", "img")))
      .select(col("gid"), col("pos"), col("img.id"), col("img.name"))
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((4L, 0, "7", "gail"), (4L, 1, "8", "hank"), (4L, 2, "9", "ivy")))
  }

  test("render → parse round-trips") {
    import spark.implicits._
    val back = Seq(insertMsg).toDF("raw")
      .select(Envelope.render(Envelope.parse(col("raw"))).as("again"))
      .select(Envelope.parse(col("again")).as("e")).select("e.*")
      .collect().head
    assert(back.getAs[String]("type") == "INSERT")
    assert(back.getAs[collection.Seq[Map[String, String]]]("data").head("bal") == "10.50")
  }

  test("malformed lines: corrupt JSON yields null envelope, routing drops it") {
    import spark.implicits._
    val inst = Seq(Instance("q", "t", schemas = "*", tables = "*"))
    val lines = Seq(
      insertMsg,                       // valid
      """{"database": "testdb", "ta""", // truncated JSON
      "not json at all",               // garbage
      """{"id":"NaN-ish","database":7}""" // type-mismatched fields
    ).toDF("raw")
    val parsed = lines.select(Envelope.parse(col("raw")).as("e"))
    // corrupt rows parse to an all-null struct / null fields, never throw
    assert(parsed.count() == 4)
    val routed = parsed
      .filter(size(Routing.routes(inst, col("e.database"), col("e.table"))) > 0)
    // only the valid line survives the routing filter (null db/table match nothing)
    assert(routed.count() == 1)
  }

  test("changedColumns: diff subset + null-safety") {
    import spark.implicits._
    val df = Seq(
      (Map("a" -> "1", "b" -> "2", "c" -> null.asInstanceOf[String]),
        Map("a" -> "1", "b" -> "3", "c" -> null.asInstanceOf[String])),
      (Map("x" -> "1"), Map("x" -> "1")),
      (Map("n" -> null.asInstanceOf[String]), Map("n" -> "now"))
    ).toDF("o", "n")
    val out = df.select(Envelope.changedColumns(col("o"), col("n")).as("d"))
      .collect().map(_.getAs[collection.Map[String, String]]("d")).toSeq
    assert(out(0) == Map("b" -> "2"))            // only the changed key, old value
    assert(out(1) == Map.empty)                  // identical rows → empty diff
    assert(out(2) == Map("n" -> null))           // null → value counts as change
  }

  test("changedColumns: asymmetric images (dropped-column UPDATE) are ANSI-safe") {
    import spark.implicits._
    // A post-DDL UPDATE: the old image still carries `gone`, the new image
    // no longer has the key at all. Under ANSI mode a plain element_at
    // would throw here; try_element_at reports the dropped column as changed.
    val df = Seq(
      (Map("id" -> "1", "gone" -> "x"), Map("id" -> "1")),
      (Map("id" -> "2"), Map("id" -> "2", "added" -> "y")),
      (Map("id" -> "3", "gone" -> null.asInstanceOf[String]), Map("id" -> "3"))
    ).toDF("o", "n")
    val out = df.select(Envelope.changedColumns(col("o"), col("n")).as("d"))
      .collect().map(_.getAs[collection.Map[String, String]]("d")).toSeq
    assert(out(0) == Map("gone" -> "x")) // dropped column surfaces with old value
    assert(out(1) == Map.empty)          // keys only in the NEW image are not "changed"
    assert(out(2) == Map("gone" -> null)) // dropped column with NULL old value still surfaces
  }

  test("applyDdl: RENAME targets, bare TRUNCATE, and unparseable DDL") {
    import spark.implicits._
    val catalog = Seq(
      ("testdb", "a"), ("testdb", "b"), ("testdb", "c"), ("testdb", "d"),
      ("testdb", "keep"), ("logdb", "x"), ("logdb", "y")
    ).toDF("database", "table")
    val ddl = Seq(
      ("testdb", "RENAME TABLE a TO b"),        // both old and new invalidated
      ("testdb", "TRUNCATE c"),                 // no TABLE keyword
      ("testdb", "TRUNCATE TABLE d"),           // with TABLE keyword
      ("logdb", "FLUSH PRIVILEGES")             // unparseable → whole logdb
    ).toDF("database", "sql")
    val left = Catalog.applyDdl(catalog, ddl)
      .select("database", "table").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(left == Set(("testdb", "keep")))
  }

  test("applyDdl: multi-rename invalidates every old AND new name; RENAME AS too") {
    import spark.implicits._
    val catalog = Seq(
      ("testdb", "a"), ("testdb", "b"), ("testdb", "c"), ("testdb", "d"),
      ("testdb", "t"), ("testdb", "u"), ("testdb", "keep")
    ).toDF("database", "table")
    val ddl = Seq(
      ("testdb", "RENAME TABLE a TO b, c TO d"), // one TABLE keyword, two renames
      ("testdb", "ALTER TABLE t RENAME AS u")    // AS-form target
    ).toDF("database", "sql")
    val left = Catalog.applyDdl(catalog, ddl)
      .select("database", "table").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(left == Set(("testdb", "keep")))
  }

  test("parsePartial agrees with the full parse on every merge-path field") {
    import spark.implicits._
    val lines = Seq(
      """{"id":7,"database":"db","table":"t","pkNames":["pk"],"isDdl":false,
        |"type":"UPDATE","es":1,"ts":2,"sql":"","sqlType":{"pk":-5},
        |"mysqlType":{"pk":"bigint"},
        |"data":[{"pk":"7","price":"1.50","noise":"x"}],
        |"old":[{"price":"1.00"}]}""".stripMargin.replaceAll("\n", ""),
      """{"id":8,"database":"db","table":"t","type":"INSERT",
        |"data":[{"pk":"8","price":"2.25"}]}""".stripMargin.replaceAll("\n", ""),
      "not json at all")
    val df = lines.toDF("raw")
    val full = df.select(Envelope.parse(col("raw")).as("e"))
      .select(col("e.id"), col("e.database"), col("e.table"), col("e.type"),
        try_element_at(col("e.data"), lit(1)).getItem("pk").as("pk"),
        try_element_at(col("e.data"), lit(1)).getItem("price").as("price"))
      .collect().toSeq
    val partial = df.select(Envelope.parsePartial(col("raw"), Seq("pk", "price")).as("e"))
      .select(col("e.id"), col("e.database"), col("e.table"), col("e.type"),
        try_element_at(col("e.data"), lit(1)).getField("pk").as("pk"),
        try_element_at(col("e.data"), lit(1)).getField("price").as("price"))
      .collect().toSeq
    assert(partial == full)
  }

  test("UPDATE old reconstruction: diff(data_old, data_new) matches golden") {
    import spark.implicits._
    val oldRow = Map("id" -> "1", "name" -> "alice", "bal" -> "10.50",
      "created" -> "2026-01-02 03:04:05.000")
    val newRow = Map("id" -> "1", "name" -> "alice", "bal" -> "99.90",
      "created" -> "2026-01-02 03:04:05.000")
    val d = Seq((oldRow, newRow)).toDF("o", "n")
      .select(Envelope.changedColumns(col("o"), col("n")).as("d"))
      .collect().head.getAs[collection.Map[String, String]]("d")
    assert(d == Map("bal" -> "10.50")) // exactly the golden UPDATE's old
  }
}
