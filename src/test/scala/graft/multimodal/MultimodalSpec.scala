package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeFeatures: schema, per-row features, stubbed codec boundary") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "abcdef".getBytes("UTF-8")),
      (2L, "audio", Array.empty[Byte])
    ).toDF("media_id", "modality", "content")
    val out = MediaDecode.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Seq("media_id", "modality", "byte_len", "width", "height", "checksum"))
    assert(out(0).getAs[Int]("byte_len") == 6)
    assert(out(0).getAs[Long]("checksum") == "abcdef".getBytes.map(_.toLong).sum)
    assert(out(1).getAs[Int]("byte_len") == 0 && out(1).getAs[Long]("checksum") == 0L)
    // the real codec boundary: images decode (junk → sentinel row, never a
    // throw); audio/video bitstreams still have no JDK codec
    assertThrows[NotImplementedError](MediaDecode.decodeReal(1L, "audio", Array(1)))
    val junk = MediaDecode.decodeReal(7L, "image", "not a png".getBytes("UTF-8"))
    assert(junk.getInt(3) == -1 && junk.getLong(6) == -1L)
  }

  test("ImageCodec: hand-built PNG decodes to exact golden pixel stats") {
    // Build a 2x1 PNG byte-by-byte (signature, IHDR, IDAT via raw
    // java.util.zip — independent of ImageIO's writer): pixels
    // (255,0,0) and (0,128,64).
    import java.util.zip.{CRC32, Deflater}
    def be(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new CRC32
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      be(body.length) ++ tag.getBytes("US-ASCII") ++ body ++ be(crc.getValue.toInt)
    }
    val ihdr = be(2) ++ be(1) ++ Array[Byte](8, 2, 0, 0, 0) // 2x1 8-bit RGB
    val scanline = Array[Byte](0, // filter None
      0xff.toByte, 0, 0, 0, 0x80.toByte, 0x40)
    val defl = new Deflater()
    defl.setInput(scanline); defl.finish()
    val buf = new Array[Byte](64)
    val n = defl.deflate(buf)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.empty[Byte])
    val f = ImageCodec.featuresOf(png).get
    assert(f == ImageCodec.ImageFeatures(2, 1, 3, 255L, 128L, 64L), f)
    // hostile bytes: junk, truncation mid-IDAT, empty — None, never a throw
    assert(ImageCodec.featuresOf("garbage not an image".getBytes).isEmpty)
    assert(ImageCodec.featuresOf(png.take(30)).isEmpty)
    assert(ImageCodec.featuresOf(Array.empty[Byte]).isEmpty)
  }

  test("ImageCodec: decoded dims agree with the SniffMedia header sniffer") {
    // Every fixture PNG: javax.imageio's decoded geometry must equal what
    // the no-codec header sniffer (q102's kernel) reads from IHDR, and
    // both must equal the formula. Exercises all 48 (w,h) combinations.
    (0L until 48L).foreach { id =>
      val bytes = ImageCodec.formulaPng(id)
      val (w, h) = ((id % 16 + 4).toInt, (id % 12 + 4).toInt)
      assert(MediaKernels.sniffTuple(bytes) == ("png", w, h), id)
      val f = ImageCodec.featuresOf(bytes).get
      assert((f.width, f.height, f.channels) == (w, h, 3), id)
    }
    // and for the other ImageIO formats, write→read round-trips geometry
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    val img = ImageCodec.decode(ImageCodec.formulaPng(5L)).get
    Seq("gif", "bmp", "jpg").foreach { fmt =>
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), fmt)
      val back = ImageCodec.featuresOf(bos.toByteArray).get
      assert((back.width, back.height) == (img.getWidth, img.getHeight), fmt)
    }
  }

  test("ImageCodec: area-average resize and thumbSums pooling math") {
    // 4x2 image, known pixels; resize to 2x1 → each target pixel is the
    // floor-average of its 2x2 cell.
    val px = Array(
      Array((10, 20, 30), (20, 40, 60), (100, 0, 0), (200, 0, 0)),
      Array((30, 60, 90), (40, 80, 120), (0, 50, 0), (0, 150, 8)))
    val bytes = ImageCodec.encodePng(4, 2, (x, y) => px(y)(x))
    val img = ImageCodec.decode(bytes).get
    val small = ImageCodec.resize(img, 2, 1)
    def rgb(p: Int) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    assert(rgb(small.getRGB(0, 0)) == ((10 + 20 + 30 + 40) / 4,
      (20 + 40 + 60 + 80) / 4, (30 + 60 + 90 + 120) / 4))
    assert(rgb(small.getRGB(1, 0)) == ((100 + 200 + 0 + 0) / 4,
      (0 + 0 + 50 + 150) / 4, (0 + 0 + 0 + 8) / 4))
    // thumbSums on a 4x4 grid over a 4x4 image = per-pixel (r+g+b),
    // row-major — and it must equal resize's numerators on equal cells
    val b16 = ImageCodec.encodePng(4, 4, (x, y) => (x, y, x * y))
    val sums = ImageCodec.thumbSums(ImageCodec.decode(b16).get)
    val want = for (y <- 0 until 4; x <- 0 until 4) yield (x + y + x * y).toLong
    assert(sums.toSeq == want)
    assertThrows[IllegalArgumentException](
      ImageCodec.resize(img, 8, 1)) // upscale would make empty cells
  }

  test("decodeImages batch path equals the per-row UDF features") {
    import spark.implicits._
    val media = (0L until 24L).map(id => (id, ImageCodec.formulaPng(id)))
      .toDF("media_id", "content")
    val batch = MediaDecode.decodeImages(media).orderBy("media_id")
      .select("media_id", "width", "height", "channels", "sum_r", "sum_g", "sum_b")
      .collect().map(_.toSeq).toSeq
    val direct = (0L until 24L).map { id =>
      val f = ImageCodec.featuresOf(ImageCodec.formulaPng(id)).get
      Seq[Any](id, f.width, f.height, f.channels, f.sum_r, f.sum_g, f.sum_b)
    }
    assert(batch == direct)
  }

  test("columnar decode equals the RDD-path decode, with no RDD scan in plan") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "abcdef".getBytes("UTF-8")),
      (2L, "audio", Array.empty[Byte]),
      (3L, "video", Array.tabulate(200)(i => (i * 7 % 256).toByte))
    ).toDF("media_id", "modality", "content")
    val viaRdd = MediaDecode.decodeFeatures(media).orderBy("media_id")
      .collect().map(_.toSeq).toSeq
    val columnar = MediaDecode.decodeFeaturesColumnar(media).orderBy("media_id")
      .collect().map(_.toSeq).toSeq
    assert(columnar == viaRdd)
    val plan = MediaDecode.decodeFeaturesColumnar(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan ExistingRDD"), plan)
  }

  test("resizeStub: stride downsample, length math, determinism") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val r = MediaDecode.resizeStub(bytes, 4)
    assert(r.length == 25)
    assert(r(0) == 0.toByte && r(1) == 4.toByte && r(24) == 96.toByte)
    assert(MediaDecode.resizeStub(bytes, 4).toSeq == r.toSeq)
    assert(MediaDecode.resizeStub(Array.empty[Byte], 3).isEmpty)
  }

  test("SniffMedia goldens: real container headers parse to exact dims") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // Genuine headers per format spec: 1x1 PNG IHDR, 3x2 GIF89a (LE),
    // 4x6 BMP BITMAPINFOHEADER (LE, and a negative-height top-down one),
    // 5x7 JPEG (APP0 then SOF0; height precedes width, BE).
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 00 00 00")
    val gif = "GIF89a".getBytes("US-ASCII") ++ hx("0300 0200 F7 00 00")
    val bmp = "BM".getBytes("US-ASCII") ++ hx("00" * 16) ++ hx("04000000 06000000 0100")
    val bmpTopDown = "BM".getBytes("US-ASCII") ++ hx("00" * 16) ++
      hx("04000000 FAFFFFFF 0100") // height -6 -> abs
    val jpeg = hx("FFD8 FFE0 0010 4A46494600 0101 00 0048 0048 00 00") ++
      hx("FFC0 000B 08 0007 0005 01 011100")
    val junk = "not an image at all......".getBytes("US-ASCII")
    val pngTrunc = png.take(20)
    val rows = Seq(1L -> png, 2L -> gif, 3L -> bmp, 4L -> bmpTopDown,
      5L -> jpeg, 6L -> junk, 7L -> pngTrunc)
    val got = rows.map { case (id, b) => id -> MediaKernels.sniffTuple(b) }.toMap
    assert(got(1L) == ("png", 1, 1))
    assert(got(2L) == ("gif", 3, 2))
    assert(got(3L) == ("bmp", 4, 6))
    assert(got(4L) == ("bmp", 4, 6))
    assert(got(5L) == ("jpeg", 5, 7))
    assert(got(6L) == null && got(7L) == null)
    // Same answers through the codegen'd expression path.
    import spark.implicits._
    val df = rows.toDF("id", "content")
      .select($"id", SniffMedia($"content").as("m"))
      .select($"id", $"m.format", $"m.width", $"m.height")
    val viaExpr = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(viaExpr == got)
  }

  test("SniffWav/AVI goldens: fmt-chunk walk, non-canonical layouts") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // Canonical 44.1kHz stereo 16-bit WAV header.
    val wav = ascii("RIFF") ++ hx("24000000") ++ ascii("WAVEfmt ") ++
      hx("10000000 0100 0200 44AC0000 10B10200 0400 1000")
    assert(AudioKernels.sniffWavTuple(wav) == (2, 44100, 16))
    // fmt preceded by a LIST chunk (odd size — word-alignment skip).
    val wavList = ascii("RIFF") ++ hx("30000000") ++ ascii("WAVE") ++
      ascii("LIST") ++ hx("03000000") ++ hx("414243 00") ++ // 3 bytes + pad
      ascii("fmt ") ++ hx("10000000 0100 0100 803E0000 00000000 0200 0800")
    assert(AudioKernels.sniffWavTuple(wavList) == (1, 16000, 8))
    // AVI with 320x240 in the MainAVIHeader.
    val avi = ascii("RIFF") ++ hx("44000000") ++ ascii("AVI LIST") ++
      hx("38000000") ++ ascii("hdrlavih") ++ hx("38000000") ++
      hx("00" * 32) ++ hx("40010000 F0000000")
    assert(MediaKernels.sniffTuple(avi) == ("avi", 320, 240))
    // RIFF but neither WAVE nor AVI; truncated WAV.
    assert(AudioKernels.sniffWavTuple(ascii("RIFF") ++ hx("04000000") ++ ascii("JUNK")) == null)
    assert(AudioKernels.sniffWavTuple(wav.take(20)) == null)
    assert(MediaKernels.sniffTuple(avi.take(40)) == null)
  }

  test("SniffContainer goldens: FLAC/OGG/MP3/MP4 headers, strict negatives") {
    def sniff(bs: Array[Byte]): (String, Int, Int) =
      AudioKernels.sniffContainerTuple(bs)
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(g => Integer.parseInt(g, 16).toByte).toArray
    // FLAC 44100 Hz stereo: STREAMINFO bit-packing per the spec
    val flac = "fLaC".getBytes ++ hex("00000022") ++ Array.fill[Byte](10)(0) ++
      hex("0AC442") ++ Array.fill[Byte](16)(0)
    assert(sniff(flac) == ("flac", 2, 44100))
    // OGG/Vorbis id header, 1 channel, 48000 Hz
    val ogg = "OggS".getBytes ++ hex("0002") ++ Array.fill[Byte](20)(0) ++
      hex("011E01") ++ "vorbis".getBytes ++ hex("00000000") ++
      hex("01") ++ hex("80BB0000") ++ Array.fill[Byte](8)(0)
    assert(sniff(ogg) == ("ogg", 1, 48000))
    // MP3: bare MPEG1 Layer III frame, 32000 Hz, joint stereo
    assert(sniff(hex("FFFB9840")) == ("mp3", 2, 32000))
    // MP3 behind an ID3v2 tag with a 5-byte body; MPEG2 halves the rate
    val id3 = "ID3".getBytes ++ hex("0300" + "00" + "00000005") ++
      Array.fill[Byte](5)(0) ++ hex("FFF390C0")
    assert(sniff(id3) == ("mp3", 1, 22050))
    // MP4: 10x20 track dims via the tkhd walk
    val mp4 = hex("00000010") ++ "ftypisom".getBytes ++ hex("00000200") ++
      hex("0000006C") ++ "moov".getBytes ++ hex("00000064") ++ "trak".getBytes ++
      hex("0000005C") ++ "tkhd".getBytes ++ Array.fill[Byte](76)(0) ++
      hex("000A0000") ++ hex("00140000")
    assert(sniff(mp4) == ("mp4", 10, 20))
    // negatives: truncation and corruption yield null, never garbage
    assert(sniff(flac.take(20)) == null)
    assert(sniff(hex("FFFBFC40")) == null) // reserved sample-rate index
    assert(sniff(mp4.take(40)) == null)    // walk runs out before tkhd
    assert(sniff("OggX1234".getBytes) == null)
  }

  test("q50/q51 run over fixture-backed media at sf0.001") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    assert(docs.count() > 0)
    val q50 = graft.SparkEntry.queries("q50_media_decode")(spark, "/root/testdata/sf0.001")
    // every fixture PNG must decode for real: no -1 sentinel anywhere
    assert(q50.filter(col("width") <= 0 || col("channels") =!= 3 ||
      col("sum_r") < 0).count() == 0)
    val q51 = graft.SparkEntry.queries("q51_media_frame_sample")(spark, "/root/testdata/sf0.001")
    assert(q51.filter(col("thumb") === "").count() == 0)
  }

  test("duration: formula fixtures, Ogg granulepos, hostile negatives") {
    def dur(b: Array[Byte]): Option[Long] =
      Option(AudioKernels.durationMsOpt(b)).map(_.longValue())
    // formula fixtures agree with the oracle arithmetic
    assert(dur(DurationFixtures.bytesFor(4)) == // WAV: sr 16000, data 4104
      Some((4 % 5000 + 100) * 1000L / (16000L * 2)))
    assert(dur(DurationFixtures.bytesFor(1)) == // FLAC: sr 16000, ts 1001
      Some((1 % 100000 + 1000) * 1000L / 16000L))
    assert(dur(DurationFixtures.bytesFor(2)) == // MP3: 6 audio bytes @128k
      Some((4 + 2) * 8 * 1000L / 128000L))
    assert(dur(DurationFixtures.bytesFor(3)) == Some(3 * 1000L / 600L)) // MP4
    assert(dur(DurationFixtures.bytesFor(0)).isEmpty) // PNG: no duration
    // Ogg: id header (rate 8000) + a last page with granulepos 12345
    val idPage = "OggS".getBytes ++ Array[Byte](0, 2) ++ new Array[Byte](20) ++
      Array[Byte](1, 30, 1) ++ "vorbis".getBytes ++ new Array[Byte](4) ++
      Array[Byte](1) ++ Array[Byte](0x40, 0x1f, 0, 0) ++ new Array[Byte](8)
    val lastPage = "OggS".getBytes ++ Array[Byte](0, 4) ++
      Array[Byte](0x39, 0x30, 0, 0, 0, 0, 0, 0) ++ // granulepos 12345 LE
      new Array[Byte](13)
    assert(dur(idPage ++ lastPage) == Some(12345L * 1000 / 8000))
    // a stream whose only page has granulepos -1 (no finished packet)
    val noGranule = idPage.clone()
    (0 until 8).foreach(k => noGranule(6 + k) = 0xff.toByte)
    assert(dur(noGranule).isEmpty)
    // negatives: zero byte_rate WAV, free-format MP3, Layer I MP3,
    // truncated FLAC, mvhd v1 64-bit path, arbitrary junk
    val wav0 = DurationFixtures.bytesFor(4).clone()
    (0 until 4).foreach(k => wav0(28 + k) = 0) // byte_rate = 0
    assert(dur(wav0).isEmpty)
    val mp3free = DurationFixtures.bytesFor(2).clone()
    mp3free(12) = 0x00 // bitrate index 0 = free-format
    assert(dur(mp3free).isEmpty)
    val mp3l1 = DurationFixtures.bytesFor(2).clone()
    mp3l1(11) = 0xff.toByte // layer bits 11 = Layer I
    assert(dur(mp3l1).isEmpty)
    assert(dur(DurationFixtures.bytesFor(1).take(30)).isEmpty)
    assert(dur("garbage-bytes-here".getBytes).isEmpty)
    // mvhd version 1: 64-bit ctime/mtime shift timescale to +28
    def be(v: Long, n: Int) =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    val v1 = be(16, 4) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0x200, 4) ++
      be(8 + 48, 4) ++ "moov".getBytes ++
      be(48, 4) ++ "mvhd".getBytes ++ Array[Byte](1, 0, 0, 0) ++
      be(0, 8) ++ be(0, 8) ++ be(1000, 4) ++ be(0, 4) ++ be(98765, 4) ++ be(0, 8)
    assert(dur(v1) == Some(98765L))
  }

  test("duration: MP3 VBR via Xing/Info and VBRI frame counts") {
    def dur(b: Array[Byte]): Option[Long] =
      Option(AudioKernels.durationMsOpt(b)).map(_.longValue())
    def be(v: Long, n: Int) =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 0)
    // MPEG1 Layer III stereo 44.1 kHz: side info 32 → Xing at frame+36
    val hdr1 = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte)
    def xing(tag: String, flags: Long, frames: Long) =
      id3 ++ hdr1 ++ new Array[Byte](32) ++ tag.getBytes ++ be(flags, 4) ++
        be(frames, 4) ++ new Array[Byte](16)
    assert(dur(xing("Xing", 1, 1000)) == Some(1000L * 1152 * 1000 / 44100))
    // LAME's "Info" spelling carries the same exact frame count
    assert(dur(xing("Info", 7, 2500)) == Some(2500L * 1152 * 1000 / 44100))
    // declared VBR with no frame count: null, never a wrong CBR guess
    assert(dur(xing("Xing", 6, 1000)).isEmpty)
    assert(dur(xing("Xing", 1, 0)).isEmpty)
    // truncated right after the tag
    assert(dur(xing("Xing", 1, 1000).take(10 + 4 + 32 + 4)).isEmpty)
    // VBRI: MPEG2.5 Layer III mono 8 kHz; fixed offset frame+36, 576 spf
    val hdr25 = Array(0xff.toByte, 0xe3.toByte, 0x28.toByte, 0xc0.toByte)
    val vbri = id3 ++ hdr25 ++ new Array[Byte](32) ++ "VBRI".getBytes ++
      be(1, 2) ++ be(0, 2) ++ be(0, 2) ++ be(99999, 4) ++ be(500, 4)
    assert(dur(vbri) == Some(500L * 576 * 1000 / 8000))
    assert(dur(vbri.take(vbri.length - 1)).isEmpty) // truncated frame count
    // the CBR fixture (no Xing/VBRI in its zero payload) is untouched
    assert(dur(DurationFixtures.bytesFor(2)) == Some((4 + 2) * 8 * 1000L / 128000L))
  }

  test("PCM stats: hand-computed golden, stereo interleave, strict negatives") {
    def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    def wav(channels: Int, bits: Int, fmtTag: Int, samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(s => le(s.toLong & 0xffff, 2)).toArray
      ascii("RIFF") ++ le(36L + data.length, 4) ++ ascii("WAVE") ++
        ascii("fmt ") ++ le(16, 4) ++ le(fmtTag, 2) ++ le(channels, 2) ++
        le(8000, 4) ++ le(8000L * channels * bits / 8, 4) ++
        le(channels * bits / 8, 2) ++ le(bits, 2) ++
        ascii("data") ++ le(data.length, 4) ++ data
    }
    def stats(b: Array[Byte]): Option[(Long, Long, Long, Int, Long, Long)] =
      Option(AudioKernels.pcmStats(b)).map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getInt(3), r.getLong(4), r.getLong(5)))

    // golden: [0, 100, -100, 32767, -32768] — sum -1, abs-sum 65735,
    // peak 32768 (|min|), 3 sign changes (0 counts as non-negative),
    // both clip rails counted
    assert(stats(wav(1, 16, 1, Seq(0, 100, -100, 32767, -32768)))
      == Some((5L, -1L, 65735L, 32768, 3L, 2L)))
    // stereo: stats fold the interleaved stream (documented semantics) —
    // L=[1000,-1000] R=[-2000,2000] interleaved gives 4 crossings? no:
    // 1000,-2000,-1000,2000 → signs +,-,-,+ → 2 crossings
    assert(stats(wav(2, 16, 1, Seq(1000, -2000, -1000, 2000)))
      == Some((4L, 0L, 6000L, 2000, 2L, 0L)))
    // empty data chunk is a valid zero-length signal, not an error
    assert(stats(wav(1, 16, 1, Seq.empty)) == Some((0L, 0L, 0L, 0, 0L, 0L)))
    // negatives: IEEE-float fmt tag, 8-bit PCM, odd-sized data chunk,
    // declared size past the buffer, non-WAVE, arbitrary junk
    assert(stats(wav(1, 16, 3, Seq(1, 2))).isEmpty)
    assert(stats(wav(1, 8, 1, Seq(1, 2))).isEmpty)
    val odd = wav(1, 16, 1, Seq(7))
    odd(40) = 1 // data size 2 -> 1 (odd)
    assert(stats(odd).isEmpty)
    val overrun = wav(1, 16, 1, Seq(7))
    overrun(40) = 44 // data size 2 -> 44 (past the buffer): truncation
    assert(stats(overrun).isEmpty)
    assert(stats(ascii("RIFF") ++ le(4, 4) ++ ascii("JUNK")).isEmpty)
    assert(stats(Array.fill[Byte](64)(0x5a)).isEmpty)
    // the q209 fixture round-trips: formula samples == kernel fold
    val d = 123L
    val n = (d % 200 + 50).toInt
    val expect = (0 until n).map(i => (i * 37 + d * 11) % 65536 - 32768)
    val got = stats(PcmFixtures.formulaWav(d)).get
    assert(got._1 == n.toLong && got._2 == expect.sum
      && got._3 == expect.map(math.abs).sum
      && got._4 == expect.map(math.abs).max.toInt)
  }

  test("DIB video stats: reference fold, stride isolation, motion zero, negatives") {
    def stats(b: Array[Byte]): Option[(Int, Int, Int, Long, Long, Long, Long)] =
      Option(AudioKernels.videoDibStats(b)).map(r => (r.getInt(0), r.getInt(1),
        r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    // kernel ≡ an independent per-pixel reference fold on a formula AVI
    val d = 77L
    val (f, w, h) = ((d % 4 + 2).toInt, (d % 8 + 4).toInt, (d % 6 + 4).toInt)
    def px(fr: Int, y: Int, x: Int): (Long, Long, Long) = (
      (x * 3 + y * 7 + fr * 11 + d) % 256,
      (x * 5 + y * 11 + fr * 3 + d * 2) % 256,
      (x * 7 + y * 13 + fr * 5 + d * 3) % 256)
    val all = for (fr <- 0 until f; y <- 0 until h; x <- 0 until w) yield px(fr, y, x)
    val motion = (for (fr <- 1 until f; y <- 0 until h; x <- 0 until w) yield {
      val (b1, g1, r1) = px(fr, y, x); val (b0, g0, r0) = px(fr - 1, y, x)
      math.abs(b1 - b0) + math.abs(g1 - g0) + math.abs(r1 - r0)
    }).sum
    val avi = VideoFixtures.formulaAvi(d)
    assert(stats(avi) == Some((f, w, h,
      all.map(_._3).sum, all.map(_._2).sum, all.map(_._1).sum, motion)))

    // stride isolation: garbage in the DIB row padding changes NOTHING
    // (w=5 -> stride 16, 1 pad byte per row)
    val d5 = 1L // w = 5
    val padded = VideoFixtures.formulaAvi(d5)
    val clean = stats(padded)
    val wd = (d5 % 8 + 4).toInt
    val strd = ((3 * wd + 3) / 4) * 4
    assert(strd > 3 * wd, "fixture must actually have pad bytes")
    // poison every pad byte of every frame in place
    val hd = (d5 % 6 + 4).toInt
    var off = padded.length
    // frames sit at the tail: walk from the first '00db'
    var j = 0
    while (j + 4 <= padded.length) {
      if (padded(j) == '0' && padded(j + 1) == '0' &&
          padded(j + 2) == 'd' && padded(j + 3) == 'b') {
        val base = j + 8
        for (y <- 0 until hd; p <- 3 * wd until strd)
          padded(base + y * strd + p) = 0xee.toByte
        j += 8 + strd * hd
      } else j += 1
    }
    assert(stats(padded) == clean, "pad bytes must be invisible to every stat")

    // two identical frames -> motion exactly 0
    val one = VideoFixtures.formulaAvi(3L)
    // build a 2-frame AVI with frame 0 duplicated: reuse builder internals
    // by zeroing the frame-varying term via a direct little fixture
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val w2 = 4; val h2 = 2; val stride2 = 12; val fs = stride2 * h2
    val frame = Array.tabulate(fs)(i => (i * 7 % 251).toByte)
    val avih = ascii("avih") ++ le(56, 4) ++ new Array[Byte](32) ++
      le(w2, 4) ++ le(h2, 4) ++ new Array[Byte](16)
    val hdrl = ascii("LIST") ++ le(4L + avih.length, 4) ++ ascii("hdrl") ++ avih
    val frames2 = ascii("00db") ++ le(fs.toLong, 4) ++ frame ++
      ascii("00db") ++ le(fs.toLong, 4) ++ frame
    val movi = ascii("LIST") ++ le(4L + frames2.length, 4) ++ ascii("movi") ++ frames2
    val still = ascii("RIFF") ++ le(4L + hdrl.length + movi.length, 4) ++
      ascii("AVI ") ++ hdrl ++ movi
    val st = stats(still).get
    assert(st._1 == 2 && st._7 == 0L, s"identical frames must read as still: $st")

    // negatives: frame-size mismatch, no movi, truncation, junk
    val bad = still.clone()
    bad(bad.length - fs - 4) = (fs - 1).toByte // shrink 2nd frame's declared size
    assert(stats(bad).isEmpty)
    assert(stats(still.take(still.length - 3)).isEmpty) // truncated last frame
    assert(stats(ascii("RIFF") ++ le(4L + hdrl.length, 4) ++ ascii("AVI ") ++
      hdrl).isEmpty) // header only, no movi list
    assert(stats(Array.fill[Byte](100)(0x11)).isEmpty)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: deterministic, grid-bounded, brightness-shift invariant") {
    val h1 = ImageCodec.dHashOf(ImageCodec.formulaPng2(7))
    val h2 = ImageCodec.dHashOf(ImageCodec.formulaPng2(7))
    assert(h1.isDefined && h1 == h2)
    // Below the 9×8 grid → None (the old small fixture family).
    assert(ImageCodec.dHashOf(ImageCodec.formulaPng(1)).isEmpty ||
      ImageCodec.featuresOf(ImageCodec.formulaPng(1)).exists(f =>
        f.width >= 9 && f.height >= 8))
    // Uniform brightness shift cancels in the adjacent-cell comparison.
    val px = (x: Int, y: Int) => ((x * 5 + y * 3) % 200,
      (x * 7 + y * 2) % 200, (x * 3 + y * 11) % 200)
    val shifted = (x: Int, y: Int) => { val (r, g, b) = px(x, y)
      (r + 40, g + 40, b + 40) }
    val a = ImageCodec.dHashOf(ImageCodec.encodePng(20, 14, px)).get
    val b = ImageCodec.dHashOf(ImageCodec.encodePng(20, 14, shifted)).get
    assert(a == b)
  }

  test("dHash near-dup: planted patches close, distinct gradients far, banding lossless") {
    val ids = 0L until 80L
    val hs = ids.map(i => i -> ImageCodec.dHashOf(ImageCodec.formulaPng2(i)).get).toMap
    // Every planted patch stays within the query's hamming threshold.
    ids.filter(_ % 5 == 0).foreach { i =>
      val hp = ImageCodec.dHashOf(ImageCodec.formulaPng2(i, patch = true)).get
      assert(hamming(hs(i), hp) <= 7, s"id $i planted dup drifted: ${hamming(hs(i), hp)}")
    }
    // Distinct gradient images are overwhelmingly far apart.
    val pairs = for (a <- ids; b <- ids if a < b) yield hamming(hs(a), hs(b))
    val close = pairs.count(_ <= 7)
    assert(close.toDouble / pairs.size < 0.05,
      s"$close of ${pairs.size} distinct-id pairs within threshold")
    // The q222 banded path provably finds every hamming≤7 pair
    // (8 bands, ≤7 flips → ≥1 exact band): banded ≡ brute on the fixture.
    val q = graft.SparkEntry.queries("q222_image_neardup")
    val got = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val all = docs.map(i => i -> ImageCodec.dHashOf(ImageCodec.formulaPng2(i)).get) ++
      docs.filter(_ % 5 == 0).map(i =>
        (i + graft.multimodal.MultimodalQueries.DupOffset) -> ImageCodec.dHashOf(ImageCodec.formulaPng2(i, patch = true)).get)
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && hamming(ha, hb) <= 7
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}")
    // And the planted pairs are all in it.
    docs.filter(_ % 5 == 0).foreach { i =>
      assert(got.contains((i, i + graft.multimodal.MultimodalQueries.DupOffset)), s"planted pair $i missing") }
  }

  test("image dedup clusters: planted dup loses to its base, one keeper per cluster") {
    val out = graft.SparkEntry.queries("q226_image_dedup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(r => r._1 -> r).toMap
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0))
    docs.filter(_ % 5 == 0).foreach { i =>
      val dup = byId(i + graft.multimodal.MultimodalQueries.DupOffset)
      assert(dup._2 == byId(i)._2, s"planted dup $i not clustered with its base")
      assert(!dup._3, s"planted dup $i must not be the keeper")
    }
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.count(_._3) == 1, s"cluster $c keeper count")
      assert(rows.filter(_._3).head._1 == rows.map(_._1).min, s"cluster $c keeper not min id")
    }
  }

  /** The q226 cluster gate parameterized over the modality (r11 verdict
    * item 4: audio and video gain the same pairs→clusters parity).
    */
  private def checkDedupClusters(query: String, dupMod: Int): Unit = {
    val out = graft.SparkEntry.queries(query)(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(r => r._1 -> r).toMap
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0))
    docs.filter(_ % dupMod == 0).foreach { i =>
      val dup = byId(i + graft.multimodal.MultimodalQueries.DupOffset)
      assert(dup._2 == byId(i)._2, s"planted dup $i not clustered with its base")
      assert(!dup._3, s"planted dup $i must not be the keeper")
    }
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.count(_._3) == 1, s"cluster $c keeper count")
      assert(rows.filter(_._3).head._1 == rows.map(_._1).min,
        s"cluster $c keeper not min id")
    }
  }

  test("audio dedup clusters (q239): planted dup loses to its base, one keeper per cluster") {
    checkDedupClusters("q239_audio_dedup", dupMod = 7)
  }

  test("video dedup clusters (q240): planted dup loses to its base, one keeper per cluster") {
    checkDedupClusters("q240_video_dedup", dupMod = 6)
  }

  test("pcmHash: deterministic, gain-invariant, bounds honored") {
    val h1 = AudioKernels.pcmHash(PcmFixtures.formulaWav2(9))
    assert(h1.isDefined && h1 == AudioKernels.pcmHash(PcmFixtures.formulaWav2(9)))
    // Short fixture family (< 65 samples possible) → may be None, never a throw.
    AudioKernels.pcmHash(PcmFixtures.formulaWav(3))
    assert(AudioKernels.pcmHash(Array.fill[Byte](100)(0x22)).isEmpty)
    // ×2 gain (headroom guaranteed by the fixture's ≤16384 peak) cancels
    // in the cross-multiplied window comparison.
    val orig = PcmFixtures.formulaWav2(9)
    val gained = orig.clone()
    val dataOff = orig.length - (200 + 9 % 100).toInt * 2
    var j = dataOff
    while (j + 1 < gained.length) {
      val s = ((gained(j) & 0xff) | ((gained(j + 1) & 0xff) << 8)).toShort.toInt * 2
      gained(j) = (s & 0xff).toByte; gained(j + 1) = ((s >> 8) & 0xff).toByte
      j += 2
    }
    assert(AudioKernels.pcmHash(gained) == h1)
  }

  test("audio near-dup: planted silences close, distinct envelopes far, banded ≡ brute") {
    val ids = 0L until 80L
    val hs = ids.map(i => i -> AudioKernels.pcmHash(PcmFixtures.formulaWav2(i)).get).toMap
    ids.filter(_ % 7 == 0).foreach { i =>
      val hp = AudioKernels.pcmHash(PcmFixtures.formulaWav2(i, perturb = true)).get
      assert(hamming(hs(i), hp) <= 7, s"id $i planted dup drifted: ${hamming(hs(i), hp)}")
    }
    val pairs = for (a <- ids; b <- ids if a < b) yield hamming(hs(a), hs(b))
    val close = pairs.count(_ <= 7)
    assert(close.toDouble / pairs.size < 0.05,
      s"$close of ${pairs.size} distinct-id pairs within threshold")
    val q = graft.SparkEntry.queries("q223_audio_neardup")
    val got = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val all = docs.map(i => i -> AudioKernels.pcmHash(PcmFixtures.formulaWav2(i)).get) ++
      docs.filter(_ % 7 == 0).map(i =>
        (i + graft.multimodal.MultimodalQueries.DupOffset) -> AudioKernels.pcmHash(PcmFixtures.formulaWav2(i, perturb = true)).get)
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && hamming(ha, hb) <= 7
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}")
    docs.filter(_ % 7 == 0).foreach { i =>
      assert(got.contains((i, i + graft.multimodal.MultimodalQueries.DupOffset)), s"planted pair $i missing") }
  }

  test("MJPG stats: golden vs direct ImageIO decode, pixel realness, negatives") {
    // Independent extraction: walk the movi chunks ourselves, decode each
    // '00dc' payload directly through ImageIO, fold sums + motion. Same
    // codec both sides → the kernel's AVI walk and stats fold are gated
    // bit-exactly even though JPEG itself is lossy.
    def goldenOf(avi: Array[Byte]): MjpgCodec.MjpgStats = {
      def le32(i: Int): Int = (avi(i) & 0xff) | ((avi(i + 1) & 0xff) << 8) |
        ((avi(i + 2) & 0xff) << 16) | ((avi(i + 3) & 0xff) << 24)
      val moviAt = avi.indices.find(i => i + 4 <= avi.length &&
        avi(i) == 'm' && avi(i + 1) == 'o' && avi(i + 2) == 'v' && avi(i + 3) == 'i').get
      var j = moviAt + 4
      val frames = Seq.newBuilder[java.awt.image.BufferedImage]
      while (j + 8 <= avi.length) {
        val sz = le32(j + 4)
        if (avi(j) == '0' && avi(j + 1) == '0' && avi(j + 2) == 'd' && avi(j + 3) == 'c')
          frames += javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(avi, j + 8, j + 8 + sz)))
        j += 8 + sz + (sz & 1)
      }
      val fs = frames.result()
      val (w, h) = (fs.head.getWidth, fs.head.getHeight)
      var (sr, sg, sb, mo) = (0L, 0L, 0L, 0L)
      for (fi <- fs.indices; y <- 0 until h; x <- 0 until w) {
        val p = fs(fi).getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        if (fi > 0) {
          val q = fs(fi - 1).getRGB(x, y)
          mo += math.abs(((p >> 16) & 0xff) - ((q >> 16) & 0xff)) +
            math.abs(((p >> 8) & 0xff) - ((q >> 8) & 0xff)) +
            math.abs((p & 0xff) - (q & 0xff))
        }
      }
      MjpgCodec.MjpgStats(fs.size, w, h, sr, sg, sb, mo)
    }

    for (d <- Seq(0L, 5L, 12L, 77L)) {
      val avi = VideoFixtures.formulaMjpgAvi(d)
      val (f, w, h) = ((d % 3 + 2).toInt, (d % 8 + 8).toInt, (d % 6 + 8).toInt)
      val got = MjpgCodec.mjpgStats(avi)
      val gold = goldenOf(avi)
      assert(got.contains(gold), s"d=$d kernel $got vs golden $gold")
      assert(gold.n_frames == f && gold.width == w && gold.height == h)
      // pixel REALNESS: the decoded sums track the encoded formula within
      // JPEG loss — mean per-pixel-channel deviation bounded, so the
      // decode is reading actual picture content, not noise
      val n = f.toLong * w * h
      var (fr0, fg0, fb0) = (0L, 0L, 0L)
      for (fr <- 0 until f; y <- 0 until h; x <- 0 until w) {
        fr0 += (x * 7 + y * 13 + fr * 5 + d * 3) % 256
        fg0 += (x * 5 + y * 11 + fr * 3 + d * 2) % 256
        fb0 += (x * 3 + y * 7 + fr * 11 + d) % 256
      }
      assert(math.abs(gold.sum_r - fr0) < 24 * n, s"d=$d sum_r drift")
      assert(math.abs(gold.sum_g - fg0) < 24 * n, s"d=$d sum_g drift")
      assert(math.abs(gold.sum_b - fb0) < 24 * n, s"d=$d sum_b drift")
    }

    // negatives: junk, truncation, a DIB-only AVI (no '00dc' frames), and
    // a frame whose JPEG is corrupted — each rejects, never throws
    assert(MjpgCodec.mjpgStats(null).isEmpty)
    assert(MjpgCodec.mjpgStats("not an avi at all, just text bytes padded to length 72!!!!!!!!!!!!!!!!!!"
      .getBytes("US-ASCII")).isEmpty)
    val ok = VideoFixtures.formulaMjpgAvi(9L)
    assert(MjpgCodec.mjpgStats(ok.take(50)).isEmpty, "short truncation")
    assert(MjpgCodec.mjpgStats(ok.dropRight(7)).isEmpty, "mid-movi truncation")
    assert(MjpgCodec.mjpgStats(VideoFixtures.formulaAvi(9L)).isEmpty, "no 00dc frames")
    val corrupt = ok.clone()
    val pj = corrupt.indices.find(i => i + 4 <= corrupt.length &&
      corrupt(i) == '0' && corrupt(i + 1) == '0' &&
      corrupt(i + 2) == 'd' && corrupt(i + 3) == 'c').get
    corrupt(pj + 8) = 0x00; corrupt(pj + 9) = 0x00 // destroy the SOI marker
    assert(MjpgCodec.mjpgStats(corrupt).isEmpty, "undecodable frame rejects payload")

    // end-to-end: the query emits no sentinel rows on the fixture and
    // matches the kernel per id
    val out = graft.SparkEntry.queries("q229_video_mjpg_motion")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(1) > 0, s"sentinel row for media_id ${r.getLong(0)}")
      val exp = MjpgCodec.mjpgStats(VideoFixtures.formulaMjpgAvi(r.getLong(0))).get
      assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)) ==
        (exp.n_frames, exp.width, exp.height, exp.sum_r, exp.sum_g, exp.sum_b, exp.motion))
    }
  }

  test("video keyframes: motions golden vs independent decode, exactly the planted cut flags") {
    // independent per-gap motion from a direct ImageIO decode of the
    // extracted frames (same codec both sides → bit-exact golden)
    def goldenMotions(avi: Array[Byte]): Seq[Long] = {
      def le32(i: Int): Int = (avi(i) & 0xff) | ((avi(i + 1) & 0xff) << 8) |
        ((avi(i + 2) & 0xff) << 16) | ((avi(i + 3) & 0xff) << 24)
      val moviAt = avi.indices.find(i => i + 4 <= avi.length &&
        avi(i) == 'm' && avi(i + 1) == 'o' && avi(i + 2) == 'v' && avi(i + 3) == 'i').get
      var j = moviAt + 4
      val fs = Seq.newBuilder[java.awt.image.BufferedImage]
      while (j + 8 <= avi.length) {
        val sz = le32(j + 4)
        if (avi(j) == '0' && avi(j + 1) == '0' && avi(j + 2) == 'd' && avi(j + 3) == 'c')
          fs += javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(avi, j + 8, j + 8 + sz)))
        j += 8 + sz + (sz & 1)
      }
      val frames = fs.result()
      (1 until frames.size).map { fi =>
        var m = 0L
        for (y <- 0 until frames(fi).getHeight; x <- 0 until frames(fi).getWidth) {
          val p = frames(fi).getRGB(x, y); val q = frames(fi - 1).getRGB(x, y)
          m += math.abs(((p >> 16) & 0xff) - ((q >> 16) & 0xff)) +
            math.abs(((p >> 8) & 0xff) - ((q >> 8) & 0xff)) +
            math.abs((p & 0xff) - (q & 0xff))
        }
        m
      }
    }
    for (d <- Seq(0L, 7L, 23L, 101L)) {
      val avi = VideoFixtures.sceneMjpgAvi(d)
      val got = MjpgCodec.frameMotions(avi)
      assert(got.contains(goldenMotions(avi)), s"d=$d motions diverge")
    }
    // negatives
    assert(MjpgCodec.frameMotions(null).isEmpty)
    assert(MjpgCodec.frameMotions("junk junk junk".getBytes("US-ASCII")).isEmpty)

    // end-to-end: exactly the planted scene change flags per video —
    // the cut sits at gap index f/2 (motion from frame f/2−1 to f/2,
    // i.e. frame_idx = f/2)
    val out = graft.SparkEntry.queries("q237_video_keyframes")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, rows) =>
      val f = (id % 3 + 4).toInt
      val cuts = rows.filter(_._3).map(_._2).toSeq
      assert(cuts == Seq(f / 2), s"video $id: cuts at $cuts, expected ${Seq(f / 2)}")
      assert(rows.length == f - 1, s"video $id gap count")
    }
  }

  test("video near-dup: planted frame patches close, distinct videos far, banded ≡ brute") {
    // kernel invariants on a synthetic id range first
    val ids = 0L until 80L
    val hs = ids.map(i => i -> MjpgCodec.videoHash(VideoFixtures.neardupMjpgAvi(i)).get).toMap
    ids.filter(_ % 6 == 0).foreach { i =>
      val hp = MjpgCodec.videoHash(VideoFixtures.neardupMjpgAvi(i, perturb = true)).get
      assert(hamming(hs(i), hp) <= 7, s"id $i planted dup drifted: ${hamming(hs(i), hp)}")
    }
    val pairs = for (a <- ids; b <- ids if a < b) yield hamming(hs(a), hs(b))
    val close = pairs.count(_ <= 7)
    assert(close.toDouble / pairs.size < 0.05,
      s"$close of ${pairs.size} distinct-video pairs within threshold")
    // junk and truncation reject, never throw
    assert(MjpgCodec.videoHash(null).isEmpty)
    assert(MjpgCodec.videoHash("junk".getBytes("US-ASCII")).isEmpty)
    assert(MjpgCodec.videoHash(VideoFixtures.neardupMjpgAvi(5L).take(60)).isEmpty)

    // banded ≡ brute through the registered query on the driver fixture
    val q = graft.SparkEntry.queries("q233_video_neardup")
    val got = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val off = graft.multimodal.MultimodalQueries.DupOffset
    val all = docs.map(i => i -> MjpgCodec.videoHash(VideoFixtures.neardupMjpgAvi(i)).get) ++
      docs.filter(_ % 6 == 0).map(i =>
        (i + off) -> MjpgCodec.videoHash(VideoFixtures.neardupMjpgAvi(i, perturb = true)).get)
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && hamming(ha, hb) <= 7
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}")
    docs.filter(_ % 6 == 0).foreach { i =>
      assert(got.contains((i, i + off)), s"planted pair $i missing") }
  }
}
