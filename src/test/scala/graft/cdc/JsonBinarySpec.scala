package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** MySQL binary JSON (JSONB) codec goldens: scalar wire layouts, container
  * header geometry, inlining rules, the canonical (length, bytes) object
  * key order, the small→large format fallback, and strict rejection of
  * malformed bytes. Format per the public layout documented in MySQL's
  * `sql/json_binary.h` header comment.
  */
class JsonBinarySpec extends AnyFunSuite {
  import JsonBinary._

  private val mapper = new ObjectMapper()

  private def roundTrip(json: String): String =
    decodeToString(encode(json))

  test("scalars: literals, ints by width, double, string") {
    assert(roundTrip("null") == "null")
    assert(roundTrip("true") == "true")
    assert(roundTrip("false") == "false")
    assert(roundTrip("0") == "0")
    assert(roundTrip("-1") == "-1")
    assert(roundTrip("32767") == "32767")   // int16 boundary
    assert(roundTrip("32768") == "32768")   // spills to int32
    assert(roundTrip("-2147483648") == "-2147483648")
    assert(roundTrip("2147483648") == "2147483648") // spills to int64
    assert(roundTrip("9223372036854775807") == "9223372036854775807")
    assert(roundTrip("18446744073709551615") == "18446744073709551615") // uint64
    assert(roundTrip("1.5") == "1.5")
    assert(roundTrip("\"\"") == "\"\"")
    assert(roundTrip("\"héllo \\\"q\\\"\"") == "\"héllo \\\"q\\\"\"")
  }

  test("scalar wire layout: int16 is 3 bytes, string has varlen prefix") {
    assert(encode("7").toSeq == Seq[Byte](Int16.toByte, 7, 0))
    val s = encode("\"ab\"")
    assert(s.toSeq == Seq[Byte](Str.toByte, 2, 'a'.toByte, 'b'.toByte))
    // 200-char string: varlen length 200 = 0xC8,0x01 (7-bit LE groups)
    val long = encode("\"" + "x" * 200 + "\"")
    assert(long(0) == Str.toByte)
    assert((long(1) & 0xff) == 0xc8 && (long(2) & 0xff) == 0x01)
    assert(long.length == 3 + 200)
  }

  test("object keys store and render in MySQL's (length, bytes) order") {
    // insertion order deliberately scrambled; "z" sorts before "ab"
    assert(roundTrip("""{"ab":2,"z":1}""") == """{"z":1,"ab":2}""")
    assert(roundTrip("""{"bb":2,"ba":1,"c":3}""") == """{"c":3,"ba":1,"bb":2}""")
    // an EMPTY key with an inlined value sits exactly at the container
    // end (ko == size, kl == 0) — legal in MySQL (JSON_OBJECT('',1)) and
    // must not trip the key-bound check
    assert(roundTrip("""{"":1}""") == """{"":1}""")
  }

  test("nested containers and inlined literals round-trip") {
    val doc = """{"a":[1,[2,null],{"x":true}],"b":"s","cc":{"k":[false]}}"""
    assert(roundTrip(doc) == doc)
    assert(roundTrip("[]") == "[]")
    assert(roundTrip("{}") == "{}")
    assert(roundTrip("[[],[[]]]") == "[[],[[]]]")
  }

  test("small array layout: literals and int16 inline in the value entry") {
    // [null, 5]: count=2, size=2*2+2*(1+2)+0 spilled = 10 bytes payload
    val bytes = encode("[null,5]")
    assert(bytes(0) == SmallArray.toByte)
    assert((bytes(1) & 0xff) == 2 && (bytes(2) & 0xff) == 0) // count u16
    assert((bytes(3) & 0xff) == 10 && (bytes(4) & 0xff) == 0) // size u16
    assert(bytes.length == 1 + 10)
    assert(bytes(5) == Literal.toByte && bytes(6) == LitNull.toByte)
    assert(bytes(8) == Int16.toByte && bytes(9) == 5.toByte)
  }

  test("int32 spills in SMALL containers but inlines in LARGE") {
    val small = encode("[100000]")
    assert(small(0) == SmallArray.toByte)
    // count(2) + size(2) + entry(3) + spilled int32(4) = 11-byte payload
    assert(small.length == 1 + 11)
    assert(roundTrip("[100000]") == "[100000]")
  }

  test("large-format fallback when the document exceeds u16 offsets") {
    val big = (0 until 9000).map(i => s""""k$i"""").mkString("[", ",", "]")
    val bytes = encode(big)
    assert(bytes(0) == LargeArray.toByte)
    assert(decodeToString(bytes) == big)
    // object variant: enough entries to overflow the small size field
    val bigObj = (0 until 10000).map(i => s""""k$i":$i""").mkString("{", ",", "}")
    val objBytes = encode(bigObj)
    assert(objBytes(0) == LargeObject.toByte)
    assert(mapper.readTree(decodeToString(objBytes)) == mapper.readTree(bigObj))
  }

  test("malformed bytes fail loudly") {
    intercept[IllegalArgumentException](decodeToString(Array.emptyByteArray))
    intercept[IllegalArgumentException](decodeToString(Array[Byte](0x7f, 0)))
    // truncated: string claims 5 bytes, has 1
    intercept[IllegalArgumentException](
      decodeToString(Array[Byte](Str.toByte, 5, 'a'.toByte)))
    // value offset beyond the container size
    val ok = encode("""["spilled string"]""")
    val bad = ok.clone()
    bad(6) = 0x7f // first value entry's offset low byte → past size
    intercept[IllegalArgumentException](decodeToString(bad))
    // truncated container: size field larger than the buffer
    intercept[IllegalArgumentException](
      decodeToString(Array[Byte](SmallArray.toByte, 1, 0, 60, 0, Int16.toByte, 1, 0)))
  }

  test("adversarial container headers throw, never crash or read astray") {
    // LARGE array, count=0x7fffffff, size=12: need() passes on the
    // 13-byte buffer, so an unchecked count preallocates an
    // Int.MaxValue-capacity list → OutOfMemoryError instead of the
    // decode-totality contract's IllegalArgumentException
    val hugeCount = Array[Byte](LargeArray.toByte,
      -1, -1, -1, 0x7f, // count u32 = 0x7fffffff
      12, 0, 0, 0,      // size u32 = 12
      0, 0, 0, 0)
    intercept[IllegalArgumentException](decodeToString(hugeCount))
    // SMALL object whose count*(entry widths) exceeds its declared size
    val overCount = Array[Byte](SmallObject.toByte, 9, 0, 8, 0, 0, 0, 0, 0, 0)
    intercept[IllegalArgumentException](decodeToString(overCount))
    // object KEY offset pointing past the container size but inside the
    // buffer: must get the same rejection value offsets get, not read a
    // key from unrelated bytes
    val ok = encode("""{"k":"spilled string value"}""")
    val bad = ok.clone()
    bad(5) = 0x7f // key entry's offset low byte → beyond size
    val e = intercept[IllegalArgumentException](decodeToString(bad))
    assert(e.getMessage.contains("outside container"), e.getMessage)
  }

  test("duplicate keys are rejected by MySQL upstream; last-write-wins here") {
    // Jackson's readTree keeps the last duplicate — document the behavior.
    assert(roundTrip("""{"a":1,"a":2}""") == """{"a":2}""")
  }
}
