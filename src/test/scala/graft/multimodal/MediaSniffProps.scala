package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Synthesize→sniff round-trip properties: for random dimensions/params,
  * a header built per the container spec must sniff back exactly. Pure
  * byte math, no Spark session.
  */
object MediaSniffProps extends Properties("MediaSniff") {

  private def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def be32(v: Int) = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int) = be32(v).reverse
  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def hx(s: String) =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val dim32: Gen[Int] = Gen.choose(1, Int.MaxValue)
  private val dim16: Gen[Int] = Gen.choose(1, 0xffff)

  property("png round-trip") = forAll(dim32, dim32) { (w, h) =>
    val b = hx("89504E470D0A1A0A 0000000D 49484452") ++ be32(w) ++ be32(h) ++ hx("08 06 00 00 00")
    MediaKernels.sniffTuple(b) == ("png", w, h)
  }

  property("gif round-trip (little-endian)") = forAll(dim16, dim16) { (w, h) =>
    val b = ascii("GIF89a") ++ le16(w) ++ le16(h) ++ hx("F7 00 00")
    MediaKernels.sniffTuple(b) == ("gif", w, h)
  }

  property("bmp round-trip incl. negative (top-down) heights") =
    forAll(dim32, dim32, Gen.oneOf(true, false)) { (w, h, topDown) =>
      val hv = if (topDown) -h else h
      val b = ascii("BM") ++ Array.fill(16)(0.toByte) ++ le32(w) ++ le32(hv) ++ hx("0100")
      // -Int.MinValue overflows; the kernel's math.abs mirrors that edge.
      MediaKernels.sniffTuple(b) == ("bmp", w, math.abs(hv))
    }

  property("jpeg round-trip through APPn segments of random length") =
    forAll(dim16, dim16, Gen.choose(0, 40), Gen.choose(0, 3)) { (w, h, pad, fill) =>
      val app = hx("FFE0") ++ be16(pad + 2) ++ Array.fill(pad)(0x41.toByte)
      val sof = hx("FFC0 000B 08") ++ be16(h) ++ be16(w) ++ hx("01 011100")
      // spec-allowed 0xFF fill bytes before the SOF marker
      val fills = Array.fill(fill)(0xff.toByte)
      MediaKernels.sniffTuple(hx("FFD8") ++ app ++ fills ++ sof) == ("jpeg", w, h)
    }

  property("wav round-trip, fmt after a random-size LIST chunk") =
    forAll(Gen.choose(1, 8), Gen.choose(1, 192000), Gen.oneOf(8, 16, 24, 32),
        Gen.choose(0, 9)) { (ch, rate, bits, listLen) =>
      val list = ascii("LIST") ++ le32(listLen) ++
        Array.fill(listLen + (listLen & 1))(0x42.toByte)
      val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(0) ++ le16(4) ++ le16(bits)
      val b = ascii("RIFF") ++ le32(0) ++ ascii("WAVE") ++ list ++ fmt
      AudioKernels.sniffWavTuple(b) == (ch, rate, bits)
    }

  property("avi round-trip") = forAll(dim32, dim32) { (w, h) =>
    val b = ascii("RIFF") ++ le32(0) ++ ascii("AVI LIST") ++ le32(0x38) ++
      ascii("hdrlavih") ++ le32(0x38) ++ Array.fill(32)(0.toByte) ++ le32(w) ++ le32(h)
    MediaKernels.sniffTuple(b) == ("avi", w, h)
  }

  property("random bytes never throw") = forAll(Gen.listOf(Gen.choose(-128, 127))) { xs =>
    val b = xs.map(_.toByte).toArray
    MediaKernels.sniffTuple(b); AudioKernels.sniffWavTuple(b)
    AudioKernels.pcmStats(b); AudioKernels.videoDibStats(b); true
  }

  property("pcm stats round-trip on random signals") =
    forAll(Gen.listOf(Gen.choose(-32768, 32767))) { sig =>
      val data = sig.flatMap(s => le16(s & 0xffff)).toArray
      val b = ascii("RIFF") ++ le32(36 + data.length) ++ ascii("WAVEfmt ") ++
        le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(16) ++ ascii("data") ++ le32(data.length) ++ data
      val r = AudioKernels.pcmStats(b)
      r != null && r.getLong(0) == sig.length.toLong &&
        r.getLong(1) == sig.map(_.toLong).sum &&
        r.getLong(2) == sig.map(s => math.abs(s.toLong)).sum &&
        r.getInt(3) == (if (sig.isEmpty) 0 else sig.map(s => math.abs(s.toLong)).max.toInt) &&
        r.getLong(4) == sig.zip(sig.drop(1)).count { case (a, c) => (a < 0) != (c < 0) }.toLong &&
        r.getLong(5) == sig.count(s => s == 32767 || s == -32768).toLong
    }

  property("pcm/video fuzz: every prefix truncation of a valid file is total") =
    forAll(Gen.choose(0L, 5000L), Gen.choose(0, 400)) { (id, cut) =>
      val wav = PcmFixtures.formulaWav(id)
      val avi = VideoFixtures.formulaAvi(id)
      AudioKernels.pcmStats(wav.take(math.min(cut, wav.length)))
      AudioKernels.videoDibStats(avi.take(math.min(cut, avi.length)))
      true // totality: null or a row, never a throw
    }

  property("video fuzz: random bit flips in a valid AVI never throw") =
    forAll(Gen.choose(0L, 5000L), Gen.choose(0, 10000), Gen.choose(0, 7)) {
      (id, pos, bit) =>
        val avi = VideoFixtures.formulaAvi(id)
        avi(pos % avi.length) = (avi(pos % avi.length) ^ (1 << bit)).toByte
        AudioKernels.videoDibStats(avi); true
    }
}
