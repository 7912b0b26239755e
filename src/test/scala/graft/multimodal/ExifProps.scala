package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** EXIF orientation kernel: synthesize→parse round-trip over both byte
  * orders and varying IFD layouts, plus totality fuzz — arbitrary bytes
  * and adversarial truncations must yield null, never a throw.
  */
object ExifProps extends Properties("ExifSniff") {

  private val orient: Gen[Int] = Gen.choose(1, 8)
  private val extra: Gen[Int] = Gen.choose(0, 6)
  private val endian: Gen[Boolean] = Gen.oneOf(true, false)

  property("synthesize→parse round-trip (both byte orders, IFD walk)") =
    forAll(orient, endian, extra) { (o, little, k) =>
      ExifKernels.orientationTuple(ExifKernels.jpegWithExif(o, little, k)) ==
        ((o, if (little) "II" else "MM"))
    }

  property("out-of-range orientation values are rejected, not passed through") =
    forAll(Gen.oneOf(0, 9, 99, 0xffff), endian) { (o, little) =>
      ExifKernels.orientationTuple(ExifKernels.jpegWithExif(o, little, 0)) == null
    }

  property("arbitrary bytes never throw; non-JPEG prefixes are null") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val b = bs.toArray
      val r = ExifKernels.orientationTuple(b) // must not throw
      // anything not starting FF D8 must be null
      (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) || r == null
    }

  property("every truncation of a valid JPEG is null or the full answer, never a throw") =
    forAll(orient, endian, extra) { (o, little, k) =>
      val full = ExifKernels.jpegWithExif(o, little, k)
      (0 until full.length).forall { n =>
        val r = ExifKernels.orientationTuple(full.take(n))
        r == null || r == ((o, if (little) "II" else "MM"))
      }
    }

  property("bit-flips never throw (parse totality under corruption)") =
    forAll(orient, endian, extra, Gen.choose(0, 1000)) { (o, little, k, seed) =>
      val b = ExifKernels.jpegWithExif(o, little, k)
      val r = new scala.util.Random(seed)
      val m = b.clone()
      for (_ <- 0 until 3) m(r.nextInt(m.length)) = r.nextInt(256).toByte
      ExifKernels.orientationTuple(m) // must not throw; any result is fine
      true
    }
}
