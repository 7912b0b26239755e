package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC code + Spark type matrix (FIXTURES.md §3; reference behavior at
  * `/root/reference/src/executor.rs:352-400`).
  */
class CatalogSpec extends AnyFunSuite {

  val matrix: Seq[(String, Int, DataType)] = Seq(
    ("tinyint", -6, ByteType),
    ("tinyint(1)", -6, ByteType),
    ("smallint", 5, ShortType),
    ("mediumint", 4, IntegerType),
    ("int", 4, IntegerType),
    ("int(11)", 4, IntegerType),
    ("bigint", -5, LongType),
    ("bigint(20)", -5, LongType),
    ("float", 7, FloatType),
    ("double", 8, DoubleType),
    ("decimal(20,6)", 3, DecimalType(20, 6)),
    ("date", 91, DateType),
    ("time", 92, StringType),
    ("datetime(6)", 93, TimestampType),
    ("timestamp", 93, TimestampType),
    ("year", 12, IntegerType),
    ("char(10)", 1, StringType),
    ("varchar(300)", 12, StringType),
    ("text", 2005, StringType),
    ("longtext", 2005, StringType),   // suffix match
    ("blob", 2004, BinaryType),
    ("mediumblob", 2004, BinaryType), // suffix match
    ("geometry", -999, StringType))   // unsupported sentinel

  test("jdbc code mapping matches the reference matrix") {
    matrix.foreach { case (t, code, _) =>
      assert(Catalog.jdbcCode(t) == code, s"type=$t")
    }
  }

  test("spark type mapping") {
    matrix.foreach { case (t, _, dt) =>
      assert(Catalog.sparkType(t) == dt, s"type=$t")
    }
  }

  test("quirk: time requires exact match, datetime prefix-matches") {
    assert(Catalog.jdbcCode("time(3)") == -999) // reference uses eq for time
    assert(Catalog.jdbcCode("datetime") == 93)
  }

  test("unsigned integers widen one tier (ANSI overflow safety); numeric = decimal") {
    assert(Catalog.sparkType("tinyint unsigned") == ShortType)
    assert(Catalog.sparkType("tinyint(1) unsigned") == ShortType)
    assert(Catalog.sparkType("smallint unsigned") == IntegerType)
    assert(Catalog.sparkType("mediumint unsigned") == IntegerType)
    assert(Catalog.sparkType("int unsigned") == LongType)
    assert(Catalog.sparkType("int(10) unsigned") == LongType)
    assert(Catalog.sparkType("bigint unsigned") == DecimalType(20, 0))
    assert(Catalog.sparkType("numeric(10,2)") == DecimalType(10, 2))
    assert(Catalog.sparkType("numeric") == DecimalType(38, 18))
    // MySQL renders display types as `... unsigned zerofill`
    assert(Catalog.sparkType("int(10) unsigned zerofill") == LongType)
    assert(Catalog.sparkType("tinyint unsigned zerofill") == ShortType)
  }
}
