package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DDL schema-history fold: ALTER TABLE parsing, positional column-list
  * evolution, and the SchemaVersions expression over Spark columns.
  */
class SchemaHistorySpec extends SparkSpec {
  import SchemaHistory.{alterTable, applyAlter}

  private val base = Seq("pk" -> "bigint", "price" -> "decimal(12,2)")

  test("alterTable extracts the unqualified, unquoted target") {
    assert(alterTable("ALTER TABLE t1 ADD COLUMN c int") == Some("t1"))
    assert(alterTable("alter table `t 1` drop column c") == Some("t 1"))
    assert(alterTable("ALTER TABLE db1.t1 ADD c int") == Some("t1"))
    assert(alterTable("ALTER TABLE `db1`.`t1` ADD c int") == Some("t1"))
    assert(alterTable("CREATE TABLE t1 (id int)") == None)
    assert(alterTable("BEGIN") == None)
  }

  test("ADD COLUMN: append, FIRST, AFTER, optional COLUMN keyword") {
    assert(applyAlter(base, "ALTER TABLE t1 ADD COLUMN status varchar(4)") ==
      base :+ ("status" -> "varchar(4)"))
    assert(applyAlter(base, "ALTER TABLE t1 ADD status varchar(4) FIRST") ==
      ("status" -> "varchar(4)") +: base)
    assert(applyAlter(base, "ALTER TABLE t1 ADD COLUMN status varchar(4) AFTER pk") ==
      Seq("pk" -> "bigint", "status" -> "varchar(4)", "price" -> "decimal(12,2)"))
    // type args with an interior space stay one type string
    assert(applyAlter(base, "ALTER TABLE t1 ADD c decimal(10, 3) NOT NULL") ==
      base :+ ("c" -> "decimal(10, 3)"))
  }

  test("DROP / MODIFY / CHANGE / RENAME COLUMN") {
    assert(applyAlter(base, "ALTER TABLE t1 DROP COLUMN price") ==
      Seq("pk" -> "bigint"))
    assert(applyAlter(base, "ALTER TABLE `t1` MODIFY price decimal(14,4)") ==
      Seq("pk" -> "bigint", "price" -> "decimal(14,4)"))
    assert(applyAlter(base, "ALTER TABLE t1 MODIFY COLUMN price decimal(14,4) FIRST") ==
      Seq("price" -> "decimal(14,4)", "pk" -> "bigint"))
    assert(applyAlter(base, "ALTER TABLE t1 CHANGE COLUMN price amount decimal(14,4)") ==
      Seq("pk" -> "bigint", "amount" -> "decimal(14,4)"))
    assert(applyAlter(base, "ALTER TABLE t1 RENAME COLUMN price TO amount") ==
      Seq("pk" -> "bigint", "amount" -> "decimal(12,2)"))
  }

  test("multiple comma-separated clauses apply left to right") {
    val out = applyAlter(base,
      "ALTER TABLE t1 ADD COLUMN s varchar(4) AFTER pk, DROP COLUMN price, " +
        "ADD n decimal(10,2)")
    assert(out == Seq("pk" -> "bigint", "s" -> "varchar(4)", "n" -> "decimal(10,2)"))
  }

  test("unsigned trailer belongs to the type; decorations do not") {
    assert(applyAlter(base, "ALTER TABLE t1 ADD c bigint unsigned DEFAULT 0") ==
      base :+ ("c" -> "bigint unsigned"))
    assert(applyAlter(base,
      "ALTER TABLE t1 ADD c int NOT NULL DEFAULT 7 COMMENT 'x y'") ==
      base :+ ("c" -> "int"))
  }

  test("column-neutral clauses are no-ops") {
    for (sql <- Seq(
      "ALTER TABLE t1 ADD INDEX idx_p (price)",
      "ALTER TABLE t1 DROP INDEX idx_p",
      "ALTER TABLE t1 ADD PRIMARY KEY (pk)",
      "ALTER TABLE t1 ALTER COLUMN price SET DEFAULT 0",
      "ALTER TABLE t1 ENGINE=InnoDB",
      "ALTER TABLE t1 RENAME TO t2",
      "ALTER TABLE t1 AUTO_INCREMENT=100"))
      assert(applyAlter(base, sql) == base, sql)
  }

  test("corrupt DDL fails loudly, never silently") {
    intercept[IllegalArgumentException](
      applyAlter(base, "ALTER TABLE t1 DROP COLUMN nope"))
    intercept[IllegalArgumentException](
      applyAlter(base, "ALTER TABLE t1 ADD c int AFTER nope"))
    intercept[IllegalArgumentException](
      applyAlter(base, "ALTER TABLE t1 ADD price int")) // duplicate
    intercept[IllegalArgumentException](
      applyAlter(base, "ALTER TABLE t1 FROBNICATE price"))
    intercept[IllegalArgumentException](
      applyAlter(base, "TRUNCATE TABLE t1"))
  }

  test("CREATE TABLE parses columns, skips key/constraint defs") {
    val sql = """CREATE TABLE IF NOT EXISTS `db1`.`t1` (
      |  pk bigint NOT NULL AUTO_INCREMENT,
      |  price decimal(12,2) DEFAULT 0,
      |  `note` varchar(40) COMMENT 'free text',
      |  PRIMARY KEY (pk),
      |  KEY idx_p (price),
      |  CONSTRAINT c1 CHECK (price >= 0)
      |) ENGINE=InnoDB""".stripMargin
    assert(SchemaHistory.createTable(sql) == Some(("t1", Seq(
      "pk" -> "bigint", "price" -> "decimal(12,2)", "note" -> "varchar(40)"))))
    assert(SchemaHistory.createTable("BEGIN") == None)
    assert(SchemaHistory.dropTable("DROP TABLE IF EXISTS `db1`.`t1`") == Some("t1"))
    assert(SchemaHistory.dropTable("DROP TABLE t2;") == Some("t2"))
    assert(SchemaHistory.dropTable("CREATE TABLE t (id int)") == None)
  }

  test("SchemaVersions folds eras over Spark columns") {
    val df = spark.range(1).select(
      array(
        struct(lit("pk"), lit("bigint")),
        struct(lit("price"), lit("decimal(12,2)"))).as("bootstrap"),
      array(
        struct(lit(10L), lit("ALTER TABLE t1 ADD COLUMN status varchar(4) AFTER price")),
        struct(lit(20L), lit("ALTER TABLE `t1` DROP COLUMN price"))).as("ddls"))
    val versions = df.select(explode(SchemaVersions(col("bootstrap"), col("ddls"))).as("v"))
      .select(col("v.from_ord"), expr("transform(v.cols, c -> c.name)").as("names"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(versions == List(
      (Long.MinValue, List("pk", "price")),
      (10L, List("pk", "price", "status")),
      (20L, List("pk", "status"))))
  }
}
