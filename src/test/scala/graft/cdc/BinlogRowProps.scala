package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

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
      .map(bs => bs.take(64).toArray: Any)),
    ("enum('red','green','blue','yellow','pink')",
      Gen.oneOf("red", "green", "blue", "yellow", "pink").map(x => x: Any)),
    // member-order comma join = exactly what SET decode renders
    ("set('a','b','c','d')", Gen.choose(0, 15).map(mask =>
      Seq("a", "b", "c", "d").zipWithIndex
        .collect { case (m, i) if ((mask >> i) & 1) != 0 => m }
        .mkString(","): Any)),
    ("bit(13)", Gen.choose(0L, 8191L).map(x => x: Any)),
    ("bit(40)", Gen.choose(0L, (1L << 40) - 1).map(x => x: Any)),
    // canonical compact texts (ints/bools/null/arrays) render byte-identically
    ("json", {
      val leaf = Gen.oneOf(
        Gen.choose(-1000000, 1000000).map(_.toString),
        Gen.oneOf("true", "false", "null"))
      val arr = Gen.listOf(leaf).map(_.take(4).mkString("[", ",", "]"))
      Gen.oneOf(leaf, arr,
        Gen.listOfN(2, arr).map(_.mkString("[", ",", "]"))).map(x => x: Any)
    }))

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

  // ---- composed raw path: encodeRows → BinlogRowsDecode (the Catalyst
  // expression) → typedColumns, at random (p,s)/fsp — VERDICT r6 #7. The
  // scalar codecs round-trip above; this drives the SAME bytes through the
  // full Spark expression pipeline and compares the TYPED values (Decimal /
  // Timestamp / String) against ones computed independently from the
  // generated components.

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One generated column: mysql type string, fixture value for encodeRows,
    * and the TYPED value typedColumns must produce.
    */
  private final case class TypedCol(mysqlType: String, value: Any, expected: Any)

  private val decimalGen: Gen[TypedCol] = for {
    p <- Gen.choose(1, 18) // fixture encoder packs the unscaled via long
    s <- Gen.choose(0, p)
    bound = math.BigInt(10).pow(p) - 1
    u <- Gen.choose(-bound.toLong, bound.toLong)
  } yield {
    val bd = new java.math.BigDecimal(java.math.BigInteger.valueOf(u), s)
    TypedCol(s"decimal($p,$s)", bd.toPlainString, bd)
  }

  private val datetimeGen: Gen[TypedCol] = for {
    fsp <- Gen.choose(0, 6)
    // 1900+: pre-1582 dates collect through Spark's Gregorian→Julian
    // rebase of java.sql.Timestamp, which shifts the Instant — a JVM
    // representation detail, not a codec property (BinlogCodecProps
    // covers the full 1..9999 range on the string side)
    y <- Gen.choose(1900, 9999); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    f <- Gen.choose(0L, math.BigInt(10).pow(fsp).toLong - 1 max 0L)
  } yield {
    val frac = if (fsp == 0) "" else "." + s"%0${fsp}d".format(f)
    val micros = f * math.BigInt(10).pow(6 - fsp).toLong
    val inst = java.time.LocalDateTime.of(y, mo, d, h, mi, s, (micros * 1000).toInt)
      .toInstant(java.time.ZoneOffset.UTC)
    TypedCol(s"datetime($fsp)", f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d$frac",
      java.sql.Timestamp.from(inst))
  }

  private val timestampGen: Gen[TypedCol] = for {
    fsp <- Gen.choose(0, 6)
    sec <- Gen.choose(1L, 4000000000L) // 0 is MySQL's zero-timestamp → NULL
  } yield TypedCol(s"timestamp($fsp)", sec,
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)))

  private val timeGen: Gen[TypedCol] = for {
    fsp <- Gen.choose(0, 6)
    neg <- Gen.oneOf(true, false)
    h <- Gen.choose(1, 800) // MySQL TIME spans ±838h — deliberately > 24h
    mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    f <- Gen.choose(0L, math.BigInt(10).pow(fsp).toLong - 1 max 0L)
  } yield {
    val frac = if (fsp == 0) "" else "." + s"%0${fsp}d".format(f)
    val str = (if (neg) "-" else "") + f"$h%02d:$mi%02d:$s%02d" + frac
    TypedCol(s"time($fsp)", str, str) // Catalog.sparkType(time) = StringType
  }

  private val typedEventGen: Gen[List[TypedCol]] = for {
    nCols <- Gen.choose(1, 6)
    cols <- Gen.listOfN(nCols, Gen.oneOf(decimalGen, datetimeGen, timestampGen, timeGen))
  } yield cols

  property("composed path: (p,s) decimals + fsp temporals through " +
    "encodeRows → BinlogRowsDecode → typedColumns") =
    forAllNoShrink(typedEventGen, Gen.choose(1, 3)) { (cols, nRows) =>
      import org.apache.spark.sql.functions.{col, explode, lit}
      val types = cols.zipWithIndex.map { case (c, i) => s"c$i" -> c.mysqlType }
      val schema = BinlogSchema.fromMysqlTypes(types)
      val body = encodeRows(WriteV2, schema,
        (0 until nRows).map(_ => cols.map(_.value)))
      val got = spark.range(1)
        .select(BinlogRowsDecode(lit(body), lit(WriteV2), schema).as("r"))
        .select(explode(col("r.data")).as("m"))
        .select(graft.cdc.BinlogDecode.typedColumns(col("m"), types): _*)
        .collect()
      got.length == nRows && got.forall { row =>
        cols.zipWithIndex.forall { case (c, i) =>
          (c.expected, row.get(i)) match {
            case (e: java.math.BigDecimal, g: java.math.BigDecimal) =>
              e.compareTo(g) == 0
            case (e: java.sql.Timestamp, g: java.sql.Timestamp) =>
              e.toInstant == g.toInstant
            case (e, g) => e == g
          }
        }
      }
    }

  // ---- PARTIAL_UPDATE (type 39): diffs materialize during decode ------

  private val partialGen: Gen[(Array[BinlogColumn], List[Any], String, Int, String)] =
    for {
      nCols <- Gen.choose(1, 5)
      colSpecs <- Gen.listOfN(nCols, colGen)
      schema = BinlogSchema.fromMysqlTypes(
        colSpecs.zipWithIndex.map { case ((t, _), i) => s"c$i" -> t } :+
          ("j" -> "json"))
      vals <- Gen.sequence[List[Any], Any](colSpecs.map(_._2))
      leaf <- Gen.oneOf(Gen.choose(-100000, 100000).map(_.toString),
        Gen.oneOf("true", "false", "null"))
      flavor <- Gen.choose(0, 2)
      doc <- Gen.oneOf("[1,2,3]", "{\"x\":7}", "\"s\"", "42")
    } yield (schema, vals, leaf, flavor, doc)

  property("PARTIAL_UPDATE round-trip: diffs apply against the before image") =
    forAllNoShrink(partialGen) { case (schema, vals, leaf, flavor, doc) =>
      val beforeJson = s"""{"a":$leaf}"""
      val (diff, expectedAfter) = flavor match {
        case 0 => (JsonDiff.encode(Seq((JsonDiff.Replace, "$", Some(doc)))), doc)
        case 1 => (JsonDiff.encode(Seq((JsonDiff.Insert, "$.fresh", Some(doc)))),
          s"""{"a":$leaf,"fresh":$doc}""")
        case 2 => (JsonDiff.encode(Seq((JsonDiff.Remove, "$.a", None))), "{}")
      }
      val before = vals :+ (beforeJson: Any)
      val after = vals :+ (diff: Any)
      val body = BinlogRowCodec.encodePartialRows(schema,
        images = Seq(before, after), diffCols = Set(schema.length - 1))
      val decoded = decodeRows(body, BinlogRowCodec.PartialUpdateV2, schema)
      val afterImg = images(decoded, 0).head
      val beforeImg = images(decoded, 1).head
      afterImg("j") == expectedAfter && beforeImg("j") == beforeJson &&
        schema.dropRight(1).zipWithIndex.forall { case (c, i) =>
          afterImg(c.name) == rendered(schemaTypeOf(c), vals(i)) &&
            beforeImg(c.name) == rendered(schemaTypeOf(c), vals(i))
        }
    }
}
