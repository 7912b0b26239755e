package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Encode→decode round-trip properties for whole ROW-event bodies: random
  * schemas, random multi-row images with random NULLs and present bitmaps
  * — pure byte math via [[BinlogRowCodec]], no Spark session.
  */
object BinlogRowProps extends Properties("BinlogRowCodec") {
  import BinlogRowCodec._

  private def mapOf(m: org.apache.spark.sql.catalyst.util.MapData): Map[String, String] = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    (0 until m.numElements()).map { i =>
      keys.getUTF8String(i).toString ->
        (if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString)
    }.toMap
  }

  private def images(row: org.apache.spark.sql.catalyst.InternalRow, ord: Int) = {
    val arr = row.getArray(ord)
    (0 until arr.numElements()).map(i => mapOf(arr.getMap(i)))
  }

  private val colGen: Gen[(String, Gen[Any])] = Gen.oneOf[(String, Gen[Any])](
    ("bigint", Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(x => x: Any)),
    ("int", Gen.choose(Int.MinValue, Int.MaxValue).map(x => x: Any)),
    ("smallint", Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(x => x: Any)),
    ("tinyint", Gen.choose(-128, 127).map(x => x: Any)),
    ("mediumint", Gen.choose(-(1 << 23), (1 << 23) - 1).map(x => x: Any)),
    ("double", Gen.choose(-1e12, 1e12).map(x => x: Any)),
    ("varchar(40)", Gen.alphaNumStr.map(s => s.take(40): Any)),
    ("varchar(300)", Gen.alphaNumStr.map(s => (s * 3).take(290): Any)),
    ("char(8)", Gen.alphaNumStr.map(s => s.take(8): Any)),
    ("text", Gen.alphaNumStr.map(s => s.take(60): Any)),
    ("decimal(12,3)", Gen.choose(-999999999L, 999999999L)
      .map(u => new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 3).toPlainString: Any)),
    ("date", for { y <- Gen.choose(1000, 9999); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28) }
      yield f"$y%04d-$m%02d-$d%02d": Any),
    ("datetime(3)", for {
      y <- Gen.choose(1, 9999); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
      f <- Gen.choose(0, 999)
    } yield f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d.$f%03d": Any),
    // epoch 0 is MySQL's zero-timestamp (decodes to NULL) — start at 1
    ("timestamp", Gen.choose(1L, 4000000000L).map(x => x: Any)),
    ("blob", Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(bs => bs.take(64).toArray: Any)))

  /** Expected decoded rendering of a fixture value for a given type. */
  private def rendered(mysqlType: String, v: Any): String = mysqlType match {
    case "double" => v.asInstanceOf[Double].toString
    case "blob" => v.asInstanceOf[Array[Byte]].map(b => f"${b & 0xff}%02x").mkString
    case t if t.startsWith("timestamp") => v.toString
    case _ => v.toString
  }

  private val eventGen: Gen[(Array[BinlogColumn], List[List[Any]], List[List[Boolean]], Array[Boolean], Int)] =
    for {
      nCols <- Gen.choose(1, 10)
      colSpecs <- Gen.listOfN(nCols, colGen)
      schema = BinlogSchema.fromMysqlTypes(
        colSpecs.zipWithIndex.map { case ((t, _), i) => s"c$i" -> t })
      nRows <- Gen.choose(1, 5)
      rows <- Gen.listOfN(nRows, Gen.sequence[List[Any], Any](colSpecs.map(_._2)))
      nulls <- Gen.listOfN(nRows, Gen.listOfN(nCols, Gen.prob(0.25)))
      present <- Gen.listOfN(nCols, Gen.prob(0.8))
        .map(ps => if (ps.exists(identity)) ps.toArray else Array.fill(nCols)(true))
      v2 <- Gen.oneOf(true, false)
    } yield (schema, rows, nulls, present, if (v2) WriteV2 else WriteV1)

  property("WRITE round-trip: values, NULLs, present subset, v1+v2") =
    forAll(eventGen) { case (schema, rows, nulls, present, tpe) =>
      val vals = rows.zip(nulls).map { case (r, nu) =>
        r.zip(nu).map { case (v, isNull) => if (isNull) null else v }
      }
      val body = encodeRows(tpe, schema, vals, present = present)
      val out = images(decodeRows(body, tpe, schema), 0)
      out.length == rows.length && out.zip(vals).forall { case (m, row) =>
        schema.zipWithIndex.forall { case (c, i) =>
          if (!present(i)) !m.contains(c.name)
          else if (row(i) == null) m.contains(c.name) && m(c.name) == null
          else m(c.name) == rendered(schemaTypeOf(c), row(i))
        }
      }
    }

  private def schemaTypeOf(c: BinlogColumn): String = c.tpe match {
    case DOUBLE => "double"
    case TIMESTAMP2 => "timestamp"
    case TEXT if c.binary => "blob"
    case _ => "other"
  }

  property("UPDATE round-trip: old/new pairs preserved in order") =
    forAll(Gen.choose(1, 4), Gen.choose(0L, 1000000L)) { (nRows, seed) =>
      val schema = BinlogSchema.fromMysqlTypes(Seq(
        "pk" -> "bigint", "v" -> "varchar(20)", "amt" -> "decimal(8,2)"))
      val pairs = (0 until nRows).flatMap { i =>
        Seq(
          Seq[Any](seed + i, s"old$i", s"$i.25"),
          Seq[Any](seed + i, s"new$i", s"$i.75"))
      }
      val body = encodeRows(UpdateV2, schema, pairs)
      val decoded = decodeRows(body, UpdateV2, schema)
      val news = images(decoded, 0)
      val olds = images(decoded, 1)
      news.length == nRows && olds.length == nRows &&
        (0 until nRows).forall { i =>
          olds(i)("v") == s"old$i" && news(i)("v") == s"new$i" &&
            olds(i)("pk") == (seed + i).toString &&
            olds(i)("amt") == s"$i.25" && news(i)("amt") == s"$i.75"
        }
    }

  property("DELETE round-trip fills old only") =
    forAll(Gen.choose(1, 5)) { nRows =>
      val schema = BinlogSchema.fromMysqlTypes(Seq("pk" -> "int", "s" -> "varchar(10)"))
      val vals = (0 until nRows).map(i => Seq[Any](i, s"r$i"))
      val decoded = decodeRows(encodeRows(DeleteV2, schema, vals), DeleteV2, schema)
      images(decoded, 0).isEmpty && images(decoded, 1).map(_("pk")) == vals.map(_.head.toString)
    }
}
