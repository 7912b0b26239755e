package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Raw-binlog scalar decoders: golden vectors from the MySQL packed formats
  * and a DataFrame-level test proving the expressions run (and codegen)
  * inside a real plan. Round-trip properties live in [[BinlogCodecProps]].
  */
class BinlogCodecSpec extends SparkSpec {

  private def s(u: org.apache.spark.unsafe.types.UTF8String): String = u.toString

  test("golden: MySQL docs example 1234567890.1234 as DECIMAL(14,4)") {
    // The canonical worked example of the packed format: 0x810DFB38D204D2.
    val bytes = Array(0x81, 0x0d, 0xfb, 0x38, 0xd2, 0x04, 0xd2).map(_.toByte)
    assert(s(BinlogCodec.decodeDecimal(bytes, 14, 4)) == "1234567890.1234")
    // Negative variant: every byte one's-complemented.
    val neg = bytes.map(b => (~b).toByte)
    assert(s(BinlogCodec.decodeDecimal(neg, 14, 4)) == "-1234567890.1234")
    // Encoder reproduces the documented bytes exactly.
    assert(BinlogCodec.encodeDecimalUnscaled(12345678901234L, 14, 4).toSeq == bytes.toSeq)
    assert(BinlogCodec.encodeDecimalUnscaled(-12345678901234L, 14, 4).toSeq == neg.toSeq)
  }

  test("decimal edge renders: zero, sub-one, negative sub-one, scale 0") {
    assert(s(BinlogCodec.decodeDecimal(BinlogCodec.encodeDecimalUnscaled(0, 10, 2), 10, 2)) == "0.00")
    assert(s(BinlogCodec.decodeDecimal(BinlogCodec.encodeDecimalUnscaled(500, 10, 4), 10, 4)) == "0.0500")
    assert(s(BinlogCodec.decodeDecimal(BinlogCodec.encodeDecimalUnscaled(-500, 10, 4), 10, 4)) == "-0.0500")
    assert(s(BinlogCodec.decodeDecimal(BinlogCodec.encodeDecimalUnscaled(42, 5, 0), 5, 0)) == "42")
  }

  test("date zero-value decodes to null") {
    assert(BinlogCodec.decodeDate(Array[Byte](0, 0, 0)) == null)
  }

  test("time goldens: negative, fractional") {
    assert(s(BinlogCodec.decodeTime(BinlogCodec.encodeTime(false, 13, 5, 9, 0, 0), 0)) == "13:05:09")
    assert(s(BinlogCodec.decodeTime(BinlogCodec.encodeTime(true, 2, 30, 1, 0, 0), 0)) == "-02:30:01")
    assert(s(BinlogCodec.decodeTime(BinlogCodec.encodeTime(false, 8, 0, 0, 123456, 6), 6)) == "08:00:00.123456")
    assert(s(BinlogCodec.decodeTime(BinlogCodec.encodeTime(true, 0, 0, 1, 5, 1), 1)) == "-00:00:01.5")
  }

  test("odd fsp stores even-digit-padded fractions on the wire (.042 -> 420)") {
    // MySQL stores 2*ceil(fsp/2) fraction digits; fsp=3 value .042 is the
    // 4-digit 0420 in two big-endian bytes, and decode divides by 10.
    val b = BinlogCodec.encodeDatetime(2023, 1, 2, 3, 4, 5, 42, 3)
    assert((((b(5) & 0xff) << 8) | (b(6) & 0xff)) == 420)
    assert(s(BinlogCodec.decodeDatetime(b, 3)) == "2023-01-02 03:04:05.042")
    val t = BinlogCodec.encodeTime(false, 0, 0, 1, 5, 1)
    assert((t(3) & 0xff) == 50, "fsp=1 fraction 5 stores as 50")
    assert(s(BinlogCodec.decodeTime(t, 1)) == "00:00:01.5")
  }

  test("datetime + timestamp goldens") {
    assert(s(BinlogCodec.decodeDatetime(
      BinlogCodec.encodeDatetime(2024, 12, 31, 23, 59, 58, 0, 0), 0)) == "2024-12-31 23:59:58")
    assert(s(BinlogCodec.decodeDatetime(
      BinlogCodec.encodeDatetime(1970, 1, 1, 0, 0, 0, 42, 3), 3)) == "1970-01-01 00:00:00.042")
    assert(s(BinlogCodec.decodeTimestamp(
      BinlogCodec.encodeTimestamp(1700000000L, 0, 0), 0)) == "1700000000")
    assert(s(BinlogCodec.decodeTimestamp(
      BinlogCodec.encodeTimestamp(1700000000L, 250, 3), 3)) == "1700000000.250")
  }

  test("null binary inputs propagate to null outputs (no throw)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "b")
    val out = df.select(
      BinlogDecode.packedDecimal(col("b"), 10, 2).as("a"),
      BinlogDecode.packedDate(col("b")).as("c"),
      BinlogDecode.packedTime(col("b"), 0).as("d"),
      BinlogDecode.packedDatetime(col("b"), 0).as("e"),
      BinlogDecode.packedTimestamp(col("b")).as("f")).collect().head
    (0 until 5).foreach(i => assert(out.isNullAt(i), s"col $i"))
  }

  test("zero datetime/timestamp decode to null like zero date (ANSI-cast safe)") {
    // MySQL zero-datetime stores exactly the 0x8000000000 offset
    assert(BinlogCodec.decodeDatetime(
      Array[Byte](0x80.toByte, 0, 0, 0, 0), 0) == null)
    assert(BinlogCodec.decodeTimestamp(Array[Byte](0, 0, 0, 0), 0) == null)
    // nonzero fraction means NOT the zero value
    assert(BinlogCodec.decodeTimestamp(
      BinlogCodec.encodeTimestamp(0L, 5L, 2), 2) != null)
    // epoch 1 is a real value, not zero
    assert(BinlogCodec.decodeTimestamp(
      BinlogCodec.encodeTimestamp(1L, 0L, 0), 0).toString == "1")
  }

  test("truncated wire bytes fail loudly instead of zero-padding") {
    val cases = Seq[(String, () => Any)](
      ("decimal", () => BinlogCodec.decodeDecimal(Array[Byte](0x80.toByte), 14, 4)),
      ("date", () => BinlogCodec.decodeDate(Array[Byte](1, 2))),
      ("time", () => BinlogCodec.decodeTime(Array[Byte](0x80.toByte, 0), 0)),
      ("time-fsp", () => BinlogCodec.decodeTime(Array[Byte](0x80.toByte, 0, 0), 2)),
      ("datetime", () => BinlogCodec.decodeDatetime(Array[Byte](0x80.toByte, 0, 0, 0), 0)),
      ("timestamp", () => BinlogCodec.decodeTimestamp(Array[Byte](0, 0, 0), 0)))
    cases.foreach { case (name, f) =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("truncated"), name)
    }
  }

  test("expressions decode inside a DataFrame plan (codegen path)") {
    import spark.implicits._
    val df = Seq(
      (1L, BinlogCodec.encodeDecimalUnscaled(-98765, 12, 3),
        BinlogCodec.encodeDate(2023, 6, 15),
        BinlogCodec.encodeTime(true, 1, 2, 3, 0, 0),
        BinlogCodec.encodeTime(false, 8, 30, 0, 42, 2),
        BinlogCodec.encodeDatetime(2023, 6, 15, 10, 20, 30, 500, 3),
        BinlogCodec.encodeTimestamp(1686824430L, 0, 0)),
      (2L, BinlogCodec.encodeDecimalUnscaled(120000, 12, 3),
        Array[Byte](0, 0, 0),
        BinlogCodec.encodeTime(false, 23, 0, 0, 0, 0),
        BinlogCodec.encodeTime(false, 23, 0, 0, 99, 2),
        BinlogCodec.encodeDatetime(1999, 12, 31, 23, 59, 59, 0, 3),
        BinlogCodec.encodeTimestamp(946684799L, 0, 0))
    ).toDF("id", "dec", "date", "time0", "time2", "dt3", "ts")
    val out = df.select(col("id"),
        BinlogDecode.packedDecimal(col("dec"), 12, 3).as("dec_s"),
        BinlogDecode.packedDate(col("date")).as("date_s"),
        BinlogDecode.packedTime(col("time0"), 0).as("t0_s"),
        BinlogDecode.packedTime(col("time2"), 2).as("t2_s"),
        BinlogDecode.packedDatetime(col("dt3"), 3).as("dt3_s"),
        BinlogDecode.packedTimestamp(col("ts")).as("ts_s"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "-98.765")
    assert(out(0).getString(2) == "2023-06-15")
    assert(out(0).getString(3) == "-01:02:03")
    assert(out(0).getString(4) == "08:30:00.42")
    assert(out(0).getString(5) == "2023-06-15 10:20:30.500")
    assert(out(0).getString(6) == "1686824430")
    assert(out(1).getString(1) == "120.000")
    assert(out(1).isNullAt(2), "zero date must decode to null")
    assert(out(1).getString(4) == "23:00:00.99")
    assert(out(1).getString(5) == "1999-12-31 23:59:59.000")
    // decode is an expression, not a UDF — Spark 4.1 renders ScalaUDF as
    // "UDF(" in plan strings, which must be absent here
    val plan = df.select(BinlogDecode.packedDecimal(col("dec"), 12, 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), plan)
  }
}
