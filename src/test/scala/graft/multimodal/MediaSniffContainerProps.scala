package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Totality fuzz for the container sniffer: arbitrary bytes, adversarial
  * declared sizes, and truncations of valid headers must return null or a
  * value — never throw, hang, or walk out of bounds (a corrupt payload at
  * corpus position 10^12 must not kill the job).
  */
object MediaSniffContainerProps extends Properties("SniffContainer") {

  private def total(bs: Array[Byte]): Boolean = {
    AudioKernels.sniffContainerTuple(bs)
    true
  }

  property("random bytes never throw") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))(total)

  // random bytes behind each magic prefix: exercises every parser arm
  private val magics = Seq(
    "fLaC".getBytes, "OggS".getBytes, "ID3".getBytes,
    Array(0xff.toByte, 0xfb.toByte),
    Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes)

  property("magic prefix + garbage never throws") =
    forAll(Gen.oneOf(magics),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) {
      (magic, tail) => total(magic ++ tail)
    }

  // a VALID mp4 box tree with adversarial declared sizes spliced in:
  // oversized/negative u32 sizes must not loop or escape the buffer
  property("mp4 walk is total under corrupted box sizes") =
    forAll(Gen.choose(0, 3), Gen.choose(0L, 0xffffffffL)) { (slot, evil) =>
      val mp4 = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
        Array[Byte](0, 0, 2, 0) ++
        Array[Byte](0, 0, 0, 108) ++ "moov".getBytes ++
        Array[Byte](0, 0, 0, 100) ++ "trak".getBytes ++
        Array[Byte](0, 0, 0, 92) ++ "tkhd".getBytes ++
        Array.fill[Byte](76)(0) ++
        Array[Byte](0, 10, 0, 0) ++ Array[Byte](0, 20, 0, 0)
      val at = Seq(0, 16, 24, 32)(slot) // each box's size field
      var i = 0
      while (i < 4) {
        mp4(at + i) = ((evil >> (8 * (3 - i))) & 0xff).toByte
        i += 1
      }
      total(mp4)
    }

  property("truncations of valid headers never throw") = {
    val flac = "fLaC".getBytes ++ Array[Byte](0, 0, 0, 0x22) ++
      Array.fill[Byte](10)(0) ++ Array[Byte](0x0a, 0xc4.toByte, 0x42) ++
      Array.fill[Byte](16)(0)
    val ogg = "OggS".getBytes ++ Array[Byte](0, 2) ++ Array.fill[Byte](20)(0) ++
      Array[Byte](1, 0x1e, 1) ++ "vorbis".getBytes ++ Array.fill[Byte](4)(0) ++
      Array[Byte](1) ++ Array[Byte](0x80.toByte, 0xbb.toByte, 0, 0)
    val mp3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 5) ++
      Array.fill[Byte](5)(0) ++ Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0)
    val mp4 = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
      Array[Byte](0, 0, 2, 0) ++ Array[Byte](0, 0, 0, 108) ++ "moov".getBytes ++
      Array[Byte](0, 0, 0, 100) ++ "trak".getBytes ++
      Array[Byte](0, 0, 0, 92) ++ "tkhd".getBytes ++ Array.fill[Byte](84)(0)
    forAll(Gen.oneOf(Seq(flac, ogg, mp3, mp4)), Gen.choose(0, 130)) { (full, n) =>
      total(full.take(math.min(n, full.length)))
    }
  }
}
