package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** JSONB encode→decode round-trip over random JSON trees. Tree equality is
  * via Jackson's `JsonNode.equals` — order-insensitive for objects (decode
  * renders MySQL's canonical (length, bytes) key order, not insertion
  * order), order- and value-exact for arrays and scalars.
  */
object JsonBinaryProps extends Properties("JsonBinary") {

  private val mapper = new ObjectMapper()

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.const("null"),
    Gen.oneOf("true", "false"),
    Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
    Gen.choose(-32768, 32767).map(_.toString),
    // dyadic rationals round-trip double-exactly in decimal text
    Gen.choose(-(1L << 40), 1L << 40).map(n => s"${n / 16.0}"),
    Gen.alphaNumStr.map(s => "\"" + s.take(30) + "\""),
    Gen.const("\"ünïcødé \\\"esc\\\"\""))

  private def jsonGen(depth: Int): Gen[String] =
    if (depth == 0) scalarGen
    else Gen.frequency(
      3 -> scalarGen,
      1 -> Gen.choose(0, 5).flatMap(n =>
        Gen.listOfN(n, jsonGen(depth - 1)).map(_.mkString("[", ",", "]"))),
      1 -> Gen.choose(0, 5).flatMap(n =>
        Gen.listOfN(n, for {
          k <- Gen.alphaNumStr.map(_.take(12))
          v <- jsonGen(depth - 1)
        } yield s""""$k":$v""").map(_.distinctBy(_.takeWhile(_ != ':'))
          .mkString("{", ",", "}"))))

  property("encode/decode round-trips arbitrary JSON trees") =
    forAll(jsonGen(3)) { json =>
      val decoded = JsonBinary.decodeToString(JsonBinary.encode(json))
      mapper.readTree(decoded) == mapper.readTree(json)
    }

  property("decode is strict: random bytes never loop or return garbage silently") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { bs =>
      try { JsonBinary.decodeToString(JsonBinary.encode(JsonBinary.decodeToString(bs))); true }
      catch { case _: IllegalArgumentException => true }
    }
}
