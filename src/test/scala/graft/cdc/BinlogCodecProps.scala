package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Encode→decode round-trip properties for the raw-binlog scalar codecs
  * (SURVEY.md §5.3) — pure byte math, scalacheck drives it directly.
  */
object BinlogCodecProps extends Properties("BinlogCodec") {

  private def str(u: org.apache.spark.unsafe.types.UTF8String): String = u.toString

  private val decimalGen = for {
    precision <- Gen.choose(1, 18)
    scale <- Gen.choose(0, precision)
    bound = math.pow(10, precision.toDouble).toLong - 1
    unscaled <- Gen.choose(-bound, bound)
  } yield (precision, scale, unscaled)

  property("decimal round-trip == BigDecimal plain string") =
    forAll(decimalGen) { case (p, sc, u) =>
      val expected = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(u), sc).toPlainString
      str(BinlogCodec.decodeDecimal(
        BinlogCodec.encodeDecimalUnscaled(u, p, sc), p, sc)) == expected
    }

  property("date round-trip") =
    forAll(Gen.choose(1000, 9999), Gen.choose(1, 12), Gen.choose(1, 28)) { (y, m, d) =>
      str(BinlogCodec.decodeDate(BinlogCodec.encodeDate(y, m, d))) ==
        f"$y%04d-$m%02d-$d%02d"
    }

  private val timeGen = for {
    neg <- Gen.oneOf(true, false)
    h <- Gen.choose(0, 838); m <- Gen.choose(0, 59); sec <- Gen.choose(0, 59)
    fsp <- Gen.choose(0, 6)
    frac <- Gen.choose(0L, if (fsp == 0) 0L else math.pow(10, fsp.toDouble).toLong - 1)
  } yield (neg, h, m, sec, fsp, frac)

  property("time round-trip incl. negative + fsp") =
    forAll(timeGen) { case (neg, h, m, sec, fsp, frac) =>
      val out = str(BinlogCodec.decodeTime(
        BinlogCodec.encodeTime(neg, h, m, sec, frac, fsp), fsp))
      // a stored "-00:00:00.0" is bit-identical to +0 → decodes unsigned
      val sign = if (neg && (h != 0 || m != 0 || sec != 0 || frac != 0)) "-" else ""
      val base = f"$sign$h%02d:$m%02d:$sec%02d"
      out == (if (fsp > 0) base + "." + ("%0" + fsp + "d").format(frac) else base)
    }

  property("datetime round-trip (fsp=0)") =
    forAll(Gen.choose(1, 9999), Gen.choose(1, 12), Gen.choose(1, 28),
      Gen.choose(0, 23), Gen.choose(0, 59), Gen.choose(0, 59)) { (y, mo, d, h, mi, sec) =>
      str(BinlogCodec.decodeDatetime(
        BinlogCodec.encodeDatetime(y, mo, d, h, mi, sec, 0, 0), 0)) ==
        f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$sec%02d"
    }
}
