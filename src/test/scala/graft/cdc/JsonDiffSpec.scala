package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** JSON diff codec + apply semantics, and the PARTIAL_UPDATE_ROWS_EVENT
  * decode path that materializes after images from before + diffs.
  */
class JsonDiffSpec extends AnyFunSuite {
  import JsonDiff._

  private def applyText(before: String, diffs: Seq[(Int, String, Option[String])]): String =
    applyToText(before, encode(diffs)).toString

  test("path parser: members, quoted members, indexes, nesting") {
    assert(parsePath("$") == Seq())
    assert(parsePath("$.a") == Seq(Member("a")))
    assert(parsePath("$.a.b[2]") == Seq(Member("a"), Member("b"), Elem(2)))
    assert(parsePath("$[0][1]") == Seq(Elem(0), Elem(1)))
    assert(parsePath("""$."weird key".x""") == Seq(Member("weird key"), Member("x")))
    assert(parsePath("""$."dotted\"q"""") == Seq(Member("dotted\"q")))
    intercept[IllegalArgumentException](parsePath(".a"))
    intercept[IllegalArgumentException](parsePath("$.*"))
    intercept[IllegalArgumentException](parsePath("$[last]"))
    intercept[IllegalArgumentException](parsePath("$.a["))
  }

  test("diff codec round-trips op/path/value triples") {
    val diffs = Seq(
      (Replace, "$.a", Some("42")),
      (Insert, "$.list[3]", Some("""{"k":"v"}""")),
      (Remove, "$.gone", None))
    assert(decode(encode(diffs)) == diffs)
    intercept[IllegalArgumentException](encode(Seq((Remove, "$.x", Some("1")))))
    intercept[IllegalArgumentException](encode(Seq((Replace, "$.x", None))))
    intercept[IllegalArgumentException](decode(Array[Byte](9)))
  }

  test("REPLACE: members, array slots, whole document") {
    assert(applyText("""{"a":1,"b":2}""", Seq((Replace, "$.a", Some("9")))) ==
      """{"a":9,"b":2}""")
    assert(applyText("""{"a":[1,2,3]}""", Seq((Replace, "$.a[1]", Some("null")))) ==
      """{"a":[1,null,3]}""")
    assert(applyText("""{"a":1}""", Seq((Replace, "$", Some("""["fresh"]""")))) ==
      """["fresh"]""")
    intercept[IllegalArgumentException](
      applyText("""{"a":1}""", Seq((Replace, "$.nope", Some("1")))))
    intercept[IllegalArgumentException](
      applyText("""{"a":[1]}""", Seq((Replace, "$.a[5]", Some("1")))))
  }

  test("INSERT: new members, array insert, append beyond end") {
    assert(applyText("""{"a":1}""", Seq((Insert, "$.b", Some("\"x\"")))) ==
      """{"a":1,"b":"x"}""")
    assert(applyText("""{"a":[1,3]}""", Seq((Insert, "$.a[1]", Some("2")))) ==
      """{"a":[1,2,3]}""")
    assert(applyText("""{"a":[1]}""", Seq((Insert, "$.a[99]", Some("2")))) ==
      """{"a":[1,2]}""")
    intercept[IllegalArgumentException](
      applyText("""{"a":1}""", Seq((Insert, "$.a", Some("2")))))
  }

  test("REMOVE: members and array slots; diffs compose in order") {
    assert(applyText("""{"a":1,"b":2}""", Seq((Remove, "$.b", None))) == """{"a":1}""")
    assert(applyText("""{"a":[1,2,3]}""", Seq((Remove, "$.a[0]", None))) ==
      """{"a":[2,3]}""")
    // order matters: replace a member, then remove a sibling, then insert
    val out = applyText("""{"keep":1,"drop":2,"arr":[10]}""", Seq(
      (Replace, "$.arr[0]", Some("11")),
      (Remove, "$.drop", None),
      (Insert, "$.new", Some("""{"deep":[true,false]}"""))))
    assert(out == """{"keep":1,"arr":[11],"new":{"deep":[true,false]}}""")
    intercept[IllegalArgumentException](
      applyText("""{"a":1}""", Seq((Remove, "$.b", None))))
  }

  test("PARTIAL_UPDATE_ROWS_EVENT decodes with materialized after images") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val cols = BinlogSchema.fromMysqlTypes(Seq(
      "pk" -> "bigint", "doc" -> "json", "note" -> "varchar(8)"))
    val beforeDoc = """{"tags":["a","b"],"meta":{"v":1}}"""
    val diff = JsonDiff.encode(Seq(
      (Replace, "$.meta.v", Some("2")),
      (Insert, "$.tags[2]", Some("\"c\""))))
    val body = BinlogRowCodec.encodePartialRows(cols,
      images = Seq(
        Seq[Any](7L, beforeDoc, "old"),
        Seq[Any](7L, diff, "new")),
      diffCols = Set(1))
    val row = BinlogRowCodec.decodeRows(body, BinlogRowCodec.PartialUpdateV2, cols)
    val data = row.getArray(0)
    val old = row.getArray(1)
    assert(data.numElements() == 1 && old.numElements() == 1)
    def m(a: ArrayData, i: Int): Map[String, String] = {
      val mp = a.getMap(i)
      (0 until mp.numElements()).map(j =>
        mp.keyArray.getUTF8String(j).toString ->
          (if (mp.valueArray.isNullAt(j)) null
           else mp.valueArray.getUTF8String(j).toString)).toMap
    }
    // the JSONB encoder stores object keys in MySQL's canonical
    // (length, bytes) order, so "meta" renders before "tags"
    assert(m(old, 0) == Map("pk" -> "7",
      "doc" -> """{"meta":{"v":1},"tags":["a","b"]}""", "note" -> "old"))
    assert(m(data, 0) == Map("pk" -> "7",
      "doc" -> """{"meta":{"v":2},"tags":["a","b","c"]}""", "note" -> "new"))
  }

  test("partial decode is strict: null before image and non-diff fallback") {
    val cols = BinlogSchema.fromMysqlTypes(Seq("pk" -> "bigint", "doc" -> "json"))
    val diff = JsonDiff.encode(Seq((Replace, "$", Some("1"))))
    val bodyNullBefore = BinlogRowCodec.encodePartialRows(cols,
      images = Seq(Seq[Any](1L, null), Seq[Any](1L, diff)), diffCols = Set(1))
    intercept[IllegalArgumentException](
      BinlogRowCodec.decodeRows(bodyNullBefore, BinlogRowCodec.PartialUpdateV2, cols))
    // a full (non-partial) JSON value in a type-39 event still decodes
    val bodyFull = BinlogRowCodec.encodePartialRows(cols,
      images = Seq(Seq[Any](1L, """{"x":1}"""), Seq[Any](1L, """{"x":2}""")),
      diffCols = Set())
    val row = BinlogRowCodec.decodeRows(bodyFull, BinlogRowCodec.PartialUpdateV2, cols)
    val mp = row.getArray(0).getMap(0)
    assert(mp.valueArray.getUTF8String(1).toString == """{"x":2}""")
  }
}
