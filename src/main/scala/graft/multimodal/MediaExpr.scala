package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-header parsing — format sniffing + pixel dimensions from the
  * container's magic bytes, the metadata step a multimodal pipeline runs
  * over billions of binary payloads WITHOUT full decode (what lazy image
  * readers do before deciding to decode at all). Pure byte math over the
  * leading bytes, no codec libraries: PNG (IHDR, big-endian), GIF
  * (logical screen, little-endian), BMP (BITMAPINFOHEADER, little-endian,
  * height may be negative for top-down rows), JPEG (walk the marker
  * segments to the first SOF frame header, big-endian). Unknown or
  * truncated payloads yield null — malformed bytes at position 10^12 of a
  * corpus must not kill the job.
  */
object MediaKernels {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** (format, width, height) as an InternalRow, or null if unrecognized. */
  def sniff(bytes: Array[Byte]): InternalRow = {
    val r = sniffTuple(bytes)
    if (r == null) null
    else new GenericInternalRow(Array[Any](UTF8String.fromString(r._1), r._2, r._3))
  }

  def sniffTuple(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    // AVI (RIFF container): LIST/hdrl/avih at fixed offsets; dwWidth and
    // dwHeight sit at 64/68 in the MainAVIHeader (little-endian).
    if (b.length >= 72 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ' &&
        b(12) == 'L' && b(13) == 'I' && b(14) == 'S' && b(15) == 'T' &&
        b(24) == 'a' && b(25) == 'v' && b(26) == 'i' && b(27) == 'h')
      return ("avi", le32(b, 64).toInt, le32(b, 68).toInt)
    // PNG: 8-byte signature, IHDR chunk data starts at 16.
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      return ("png", be32(b, 16).toInt, be32(b, 20).toInt)
    // GIF87a / GIF89a: logical screen descriptor at 6, little-endian.
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return ("gif", le16(b, 6), le16(b, 8))
    // BMP: BITMAPINFOHEADER width at 18, height at 22 (negative = top-down).
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return ("bmp", le32(b, 18).toInt, math.abs(le32(b, 22).toInt))
    // JPEG: walk FF-marker segments to the first SOF (C0-CF minus C4/C8/CC).
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return null // desync — not a marker stream
        val m = u8(b, i + 1)
        if (m == 0xff) {
          i += 1 // spec-allowed fill byte before a marker
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone marker, no length field
        } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (i + 8 >= b.length) return null
          return ("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return null
          i += 2 + len
        }
      }
      return null
    }
    null
  }
}

object AudioKernels {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** WAV "fmt " chunk: (channels, sample_rate, bits_per_sample), walking
    * the RIFF chunk list (the fmt chunk is USUALLY at offset 12 but the
    * spec allows e.g. LIST/INFO before it). Null if not a WAVE or no fmt.
    */
  def sniffWavTuple(b: Array[Byte]): (Int, Int, Int) = {
    if (b == null || b.length < 36) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (i + 8 + 16 > b.length || size < 16) return null
        return (le16(b, i + 10), le32(b, i + 12).toInt, le16(b, i + 22))
      }
      if (size < 0 || size > Int.MaxValue - 9) return null
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    null
  }

  def sniffWav(bytes: Array[Byte]): InternalRow = {
    val r = sniffWavTuple(bytes)
    if (r == null) null else new GenericInternalRow(Array[Any](r._1, r._2, r._3))
  }

  /** SIGNAL-level PCM decode (the audio counterpart of the q50 pixel
    * sums): walk RIFF to the fmt + data chunks, require uncompressed
    * 16-bit PCM (format tag 1), and fold every interleaved LE int16
    * sample into exact integer stats — count, sum, abs-sum, peak |s|,
    * zero crossings ((prev < 0) != (cur < 0) over the interleaved
    * stream), and clipped samples (±full scale). Null for non-WAVE,
    * non-PCM16, a missing/odd-sized data chunk, or a data chunk whose
    * declared size overruns the buffer (truncation is data, not an
    * error). One O(n) pass, all-integer — bit-exact on any platform.
    */
  def pcmStats(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var fmtTag = -1; var bits = -1
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 9) return null
      val sz = size.toInt
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (i + 8 + 16 > b.length || sz < 16) return null
        fmtTag = le16(b, i + 8)
        bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        if (fmtTag != 1 || bits != 16) return null // only uncompressed PCM16
        if ((sz & 1) == 1 || i + 8 + sz > b.length) return null
        val base = i + 8
        val n = sz / 2
        var sum = 0L; var sumAbs = 0L; var peak = 0
        var cross = 0L; var clipped = 0L
        var prevNeg = false
        var j = 0
        while (j < n) {
          val s = (u8(b, base + 2 * j) | (u8(b, base + 2 * j + 1) << 8)).toShort.toInt
          val a = if (s < 0) -s else s // 32768 for -32768: exact in Int
          sum += s; sumAbs += a
          if (a > peak) peak = a
          if (s == 32767 || s == -32768) clipped += 1
          val neg = s < 0
          if (j > 0 && neg != prevNeg) cross += 1
          prevNeg = neg
          j += 1
        }
        return new GenericInternalRow(
          Array[Any](n.toLong, sum, sumAbs, peak, cross, clipped))
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    null
  }

  /** 64-bit PCM energy-envelope fingerprint (the audio dHash, q223):
    * split the sample stream into 65 windows, energy = exact Σ|s| per
    * window, bit w = 1 iff window w+1 carries more MEAN energy than
    * window w — compared CROSS-MULTIPLIED on the integer sums and
    * counts, no doubles. A uniform gain change scales every window
    * equally and cancels in the comparison (the loudness-normalization
    * invariance that raw sample hashes lack). Same WAV validation as
    * [[pcmStats]]; None for anything malformed or shorter than 65
    * samples (every window must be non-empty).
    */
  def pcmHash(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var fmtTag = -1; var bits = -1
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 9) return None
      val sz = size.toInt
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (i + 8 + 16 > b.length || sz < 16) return None
        fmtTag = le16(b, i + 8)
        bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        if (fmtTag != 1 || bits != 16) return None
        if ((sz & 1) == 1 || i + 8 + sz > b.length) return None
        val base = i + 8
        val n = sz / 2
        // Lower bound: every window non-empty. Upper bound (2^28 samples
        // ≈ 9 h at 8 kHz): keeps the cross-multiplied comparison
        // (sum ≤ 2^15·n/65) · (count ≤ n/65) clear of signed-64 overflow.
        if (n < 65 || n > (1 << 28)) return None
        val sums = new Array[Long](65)
        val counts = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val j0 = w * n / 65; val j1 = (w + 1) * n / 65
          var s = 0L
          var j = j0
          while (j < j1) {
            val v = (u8(b, base + 2 * j) | (u8(b, base + 2 * j + 1) << 8)).toShort.toInt
            s += (if (v < 0) -v else v)
            j += 1
          }
          sums(w) = s; counts(w) = j1 - j0
          w += 1
        }
        var hash = 0L
        var k = 0
        while (k < 64) {
          if (sums(k + 1) * counts(k) > sums(k) * counts(k + 1))
            hash |= 1L << k
          k += 1
        }
        return Some(hash)
      }
      i += 8 + sz + (sz & 1)
    }
    None
  }

  /** SIGNAL-level decode of UNCOMPRESSED video — BI_RGB DIB frames in an
    * AVI 'movi' list ('00db' chunks, the format's raw-frame case; the
    * video counterpart of [[pcmStats]]): per-channel exact pixel sums
    * over all frames plus the inter-frame MOTION energy (Σ |byte − same
    * byte of the previous frame| over payload bytes) — the static-video /
    * slideshow detector a curation pipeline runs. Rows are stride-padded
    * to 4 bytes per the DIB spec; pad bytes are skipped, so garbage in
    * the padding cannot leak into any stat. Aggregate sums are
    * orientation-invariant, so the DIB bottom-up row order does not
    * matter here. Null for non-AVI, missing 'movi', any '00db' chunk
    * whose size differs from stride×height, or truncation. Compressed
    * streams ('00dc') are not decoded HERE: MJPG '00dc' decodes for real
    * via ImageIO in [[graft.multimodal.MjpgCodec]] (q229); only codecs
    * the JDK genuinely lacks (H.264/H.265/VP9/AV1) remain stubbed.
    */
  def videoDibStats(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 72) return null
    val sn = MediaKernels.sniffTuple(b)
    if (sn == null || sn._1 != "avi") return null
    val w = sn._2; val h = sn._3
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return null
    val stride = ((3 * w + 3) / 4) * 4
    val frameSize = stride * h
    var i = 12
    var moviStart = -1; var moviEnd = -1
    while (i + 8 <= b.length && moviStart < 0) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 9 || i + 8 + size > b.length) return null
      if (b(i) == 'L' && b(i + 1) == 'I' && b(i + 2) == 'S' && b(i + 3) == 'T' &&
          size >= 4 &&
          b(i + 8) == 'm' && b(i + 9) == 'o' && b(i + 10) == 'v' && b(i + 11) == 'i') {
        moviStart = i + 12; moviEnd = i + 8 + size.toInt
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (moviStart < 0) return null
    var nFrames = 0; var sumR = 0L; var sumG = 0L; var sumB = 0L; var motion = 0L
    var prev = -1
    var j = moviStart
    while (j + 8 <= moviEnd) {
      val sz = le32(b, j + 4)
      if (sz < 0 || j + 8 + sz > moviEnd) return null
      if (b(j) == '0' && b(j + 1) == '0' && b(j + 2) == 'd' && b(j + 3) == 'b') {
        if (sz.toInt != frameSize) return null
        val base = j + 8
        var y = 0
        while (y < h) {
          var o = base + y * stride
          val end = o + 3 * w
          while (o < end) {
            sumB += u8(b, o); sumG += u8(b, o + 1); sumR += u8(b, o + 2)
            o += 3
          }
          if (prev >= 0) {
            var c = base + y * stride
            var p = prev + y * stride
            val cend = c + 3 * w
            while (c < cend) {
              val d = u8(b, c) - u8(b, p)
              motion += (if (d < 0) -d else d)
              c += 1; p += 1
            }
          }
          y += 1
        }
        prev = base; nFrames += 1
      }
      j += 8 + sz.toInt + (sz.toInt & 1)
    }
    new GenericInternalRow(Array[Any](nFrames, w, h, sumR, sumG, sumB, motion))
  }

  private def be32s(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be16s(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** Compressed-container sniff — the formats a multimodal corpus
    * actually ships in, from magic bytes only (no codec): FLAC STREAMINFO
    * and Ogg/Vorbis identification headers → (format, channels,
    * sample_rate); MP3 first frame header (ID3v2 tag skipped, all three
    * MPEG versions) → (format, channels, sample_rate); MP4 box walk
    * ftyp→moov→trak→tkhd → (format, width, height). All layouts from the
    * published specs; null for anything unrecognized or truncated.
    */
  def sniffContainerTuple(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    // FLAC: "fLaC" ++ metadata block header ++ 34-byte STREAMINFO —
    // 20-bit sample rate then 3-bit channels-1 (bit-packed)
    if (b.length >= 8 + 21 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
        (u8(b, 4) & 0x7f) == 0) {
      val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
      val ch = ((u8(b, 20) >> 1) & 0x07) + 1
      return if (sr == 0) null else ("flac", ch, sr)
    }
    // Ogg page 0 holding a Vorbis identification header: 27-byte page
    // header + 1 segment entry, then 0x01 "vorbis" version(4) ch(1) rate(4)
    if (b.length >= 44 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S' &&
        u8(b, 26) == 1 && u8(b, 28) == 0x01 && b(29) == 'v' && b(30) == 'o' &&
        b(31) == 'r' && b(32) == 'b' && b(33) == 'i' && b(34) == 's')
      return ("ogg", u8(b, 39), le32(b, 40).toInt)
    // MP3: optional ID3v2 tag (syncsafe size), then an MPEG audio frame
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val tagLen = 10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
      return sniffMpegFrame(b, tagLen)
    }
    if (b.length >= 4 && u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0)
      return sniffMpegFrame(b, 0)
    // MP4: top-level ftyp box, then walk moov → trak → tkhd for the
    // 16.16-fixed presentation width/height. All box sizes are UNSIGNED
    // u32 longs and every advance is bounds-guarded — a corrupt declared
    // size must yield null, never a negative index or an infinite loop.
    if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      def tag(at: Long, t: String): Boolean =
        b(at.toInt + 4) == t(0) && b(at.toInt + 5) == t(1) &&
          b(at.toInt + 6) == t(2) && b(at.toInt + 7) == t(3)
      var i = 0L
      while (i + 8 <= b.length) {
        val size = be32s(b, i.toInt)
        if (size < 8 || i + size > b.length) return null
        if (tag(i, "moov")) {
          val end = i + size
          var j = i + 8
          while (j + 8 <= end) {
            val s2 = be32s(b, j.toInt)
            if (s2 < 8 || j + s2 > end) return null
            if (tag(j, "trak")) {
              val end2 = j + s2
              var k = j + 8
              while (k + 8 <= end2) {
                val s3 = be32s(b, k.toInt)
                if (s3 < 8 || k + s3 > end2) return null
                if (tag(k, "tkhd") && s3 >= 92 && u8(b, k.toInt + 8) == 0)
                  return ("mp4", (be32s(b, k.toInt + 84) >> 16).toInt,
                    (be32s(b, k.toInt + 88) >> 16).toInt)
                k += s3
              }
            }
            j += s2
          }
          return null
        }
        i += size
      }
      return null
    }
    null
  }

  /** One MPEG audio frame header at `at`: channels + sample rate across
    * MPEG1/2/2.5 (rate table halves/quarters by version).
    */
  private def sniffMpegFrame(b: Array[Byte], at: Int): (String, Int, Int) = {
    if (at + 4 > b.length) return null
    if (u8(b, at) != 0xff || (u8(b, at + 1) & 0xe0) != 0xe0) return null
    val version = (u8(b, at + 1) >> 3) & 0x03 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val srIdx = (u8(b, at + 2) >> 2) & 0x03
    if (srIdx == 3 || version == 1) return null // reserved
    val base = srIdx match {
      case 0 => 44100
      case 1 => 48000
      case 2 => 32000
    }
    val rate = version match {
      case 3 => base
      case 2 => base / 2
      case 0 => base / 4
    }
    val channels = if (((u8(b, at + 3) >> 6) & 0x03) == 3) 1 else 2
    ("mp3", channels, rate)
  }

  def sniffContainer(bytes: Array[Byte]): InternalRow = {
    val r = sniffContainerTuple(bytes)
    if (r == null) null
    else new GenericInternalRow(Array[Any](UTF8String.fromString(r._1), r._2, r._3))
  }

  /** Container play-length in milliseconds from header metadata only (no
    * codec, no frame walk beyond the first):
    *
    * - WAV: `data` chunk byte count over the fmt chunk's byte_rate.
    * - FLAC: STREAMINFO's 36-bit total_samples over its sample rate
    *   (0 total samples = "unknown" per spec → null).
    * - MP3 (Layer III only, the corpus format): a Xing/Info header (after
    *   the first frame's side info) or a VBRI header (at frame start +
    *   36) with a frame count gives the exact duration frames·spf/rate —
    *   the VBR path, where the byte estimate would be wrong (both public
    *   layouts; "Info" is LAME's CBR spelling of the same struct, equally
    *   exact). A Xing header WITHOUT the frames flag is a declared-VBR
    *   stream with no count → null, never a wrong CBR guess. Otherwise
    *   the CBR estimate: audio byte count (file minus ID3v2 tag) over the
    *   first frame's bitrate; free-format (index 0) and bad (15)
    *   bitrates → null.
    * - MP4: mvhd timescale/duration (version 0; version 1 uses 64-bit
    *   fields at the same offsets + 8).
    * - Ogg: the standard granulepos recipe — last page's granule position
    *   (PCM sample count, scanned backward for the final `OggS` capture)
    *   over the Vorbis id header's rate.
    *
    * All integer arithmetic (`n * 1000 / rate`, floor) so the DuckDB
    * oracle reproduces it with `//`. Null on anything unrecognized,
    * truncated, or with a zero rate — never a crash, never a guess.
    */
  def durationMsOpt(b: Array[Byte]): java.lang.Long = {
    if (b == null) return null
    // WAV: find fmt (byte_rate) and data (size) chunks in one walk
    if (b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var byteRate = 0L
      var dataSize = -1L
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4)
        if (size < 0 || size > Int.MaxValue - 9) return null
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
          if (i + 8 + 16 > b.length || size < 16) return null
          byteRate = le32(b, i + 16)
        } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
          dataSize = size
        }
        i += 8 + size.toInt + (size.toInt & 1)
      }
      return if (byteRate <= 0 || dataSize < 0) null
      else java.lang.Long.valueOf(dataSize * 1000L / byteRate)
    }
    // FLAC STREAMINFO: rate at bit offset 144 for 20 bits, total samples
    // 36 bits at offset 173 (bytes 18-25 of the file as laid out below)
    if (b.length >= 8 + 26 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
        (u8(b, 4) & 0x7f) == 0) {
      val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
      val totalSamples = ((u8(b, 21) & 0x0fL) << 32) | be32s(b, 22)
      return if (sr <= 0 || totalSamples == 0) null
      else java.lang.Long.valueOf(totalSamples * 1000L / sr)
    }
    // MP3 (CBR, Layer III): audio length / first-frame bitrate
    val mp3At: Int =
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
      else if (b.length >= 4 && u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0) 0
      else -1
    if (mp3At >= 0) {
      if (mp3At + 4 > b.length) return null
      if (u8(b, mp3At) != 0xff || (u8(b, mp3At + 1) & 0xe0) != 0xe0) return null
      val version = (u8(b, mp3At + 1) >> 3) & 0x03
      val layer = (u8(b, mp3At + 1) >> 1) & 0x03
      if (layer != 1 || version == 1) return null // Layer III only, no reserved
      // VBR first: an exact frame count beats any byte estimate. Xing /
      // Info sits after the side info (MPEG1: 17 mono / 32 else; MPEG2 &
      // 2.5: 9 / 17); VBRI always at frame start + 36. Layer III frames
      // carry 1152 samples (MPEG1) / 576 (MPEG2, 2.5).
      val srIdx = (u8(b, mp3At + 2) >> 2) & 0x03
      val mono = ((u8(b, mp3At + 3) >> 6) & 0x03) == 3
      val sideInfo =
        if (version == 3) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
      val spf = if (version == 3) 1152L else 576L
      def tag4(at: Int, t: String): Boolean =
        at >= 0 && at + 4 <= b.length && b(at) == t(0) && b(at + 1) == t(1) &&
          b(at + 2) == t(2) && b(at + 3) == t(3)
      def rate: Long =
        if (srIdx == 3) 0L // reserved index
        else {
          val base = Array(44100L, 48000L, 32000L)(srIdx)
          version match {
            case 3 => base      // MPEG1
            case 2 => base / 2  // MPEG2
            case _ => base / 4  // MPEG2.5
          }
        }
      val xAt = mp3At + 4 + sideInfo
      if (tag4(xAt, "Xing") || tag4(xAt, "Info")) {
        if (xAt + 12 > b.length) return null
        if ((be32s(b, xAt + 4) & 1L) == 0) return null // no FRAMES field
        val frames = be32s(b, xAt + 8)
        val r = rate
        return if (frames <= 0 || r <= 0) null
        else java.lang.Long.valueOf(frames * spf * 1000L / r)
      }
      val vAt = mp3At + 4 + 32
      if (tag4(vAt, "VBRI")) {
        if (vAt + 18 > b.length) return null
        val frames = be32s(b, vAt + 14)
        val r = rate
        return if (frames <= 0 || r <= 0) null
        else java.lang.Long.valueOf(frames * spf * 1000L / r)
      }
      val brIdx = (u8(b, mp3At + 2) >> 4) & 0x0f
      if (brIdx == 0 || brIdx == 15) return null // free-format / bad
      val kbps =
        if (version == 3) // MPEG1 Layer III
          Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
        else // MPEG2 / 2.5 Layer III share one table
          Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
      val audioBytes = (b.length - mp3At).toLong
      return java.lang.Long.valueOf(audioBytes * 8L * 1000L / (kbps * 1000L))
    }
    // MP4: moov → mvhd timescale + duration
    if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      def tag(at: Long, t: String): Boolean =
        b(at.toInt + 4) == t(0) && b(at.toInt + 5) == t(1) &&
          b(at.toInt + 6) == t(2) && b(at.toInt + 7) == t(3)
      var i = 0L
      while (i + 8 <= b.length) {
        val size = be32s(b, i.toInt)
        if (size < 8 || i + size > b.length) return null
        if (tag(i, "moov")) {
          val end = i + size
          var j = i + 8
          while (j + 8 <= end) {
            val s2 = be32s(b, j.toInt)
            if (s2 < 8 || j + s2 > end) return null
            if (tag(j, "mvhd")) {
              val v = u8(b, j.toInt + 8)
              if (v == 0 && s2 >= 32) {
                val timescale = be32s(b, j.toInt + 20)
                val dur = be32s(b, j.toInt + 24)
                return if (timescale <= 0) null
                else java.lang.Long.valueOf(dur * 1000L / timescale)
              } else if (v == 1 && s2 >= 44) {
                val timescale = be32s(b, j.toInt + 28)
                val dur = (be32s(b, j.toInt + 32) << 32) | be32s(b, j.toInt + 36)
                return if (timescale <= 0 || dur < 0) null
                else java.lang.Long.valueOf(dur * 1000L / timescale)
              } else return null
            }
            j += s2
          }
          return null
        }
        i += size
      }
      return null
    }
    // Ogg/Vorbis: rate from page 0's id header, samples from the LAST
    // page's granule position (scan backward for the final capture)
    if (b.length >= 44 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S' &&
        u8(b, 26) == 1 && u8(b, 28) == 0x01 && b(29) == 'v' && b(30) == 'o' &&
        b(31) == 'r' && b(32) == 'b' && b(33) == 'i' && b(34) == 's') {
      val rate = le32(b, 40)
      if (rate <= 0) return null
      var i = b.length - 27 // a page needs 27 header bytes
      while (i >= 0) {
        if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' && b(i + 3) == 'S') {
          var g = 0L
          var k = 0
          while (k < 8) { g |= u8(b, i + 6 + k).toLong << (8 * k); k += 1 }
          // -1 granulepos = page holds no completed packet; unusable
          return if (g < 0) null else java.lang.Long.valueOf(g * 1000L / rate)
        }
        i -= 1
      }
      return null
    }
    null
  }
}

/** Codegen'd media-header sniff over a `binary` column:
  * struct<format string, width int, height int>, null when unrecognized.
  */
case class SniffMedia(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SniffMedia expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.sniff(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.MediaKernels.sniff($c);
      ${ev.isNull} = ${ev.value} == null;""")
    f
  }
  override protected def withNewChildInternal(newChild: Expression): SniffMedia =
    copy(child = newChild)
}

object SniffMedia {
  def apply(content: Column): Column =
    ColumnBridge.column(SniffMedia(ColumnBridge.expression(content)))
}

/** Codegen'd WAV audio-header sniff over a `binary` column:
  * struct<channels int, sample_rate int, bits int>, null when not a WAVE.
  */
case class SniffWav(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SniffWav expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    AudioKernels.sniffWav(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.AudioKernels.sniffWav($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): SniffWav =
    copy(child = newChild)
}

object SniffWav {
  def apply(content: Column): Column =
    ColumnBridge.column(SniffWav(ColumnBridge.expression(content)))
}

/** Codegen'd signal-level PCM16 stats over a `binary` WAV column —
  * struct<n_samples long, sum_amp long, sum_abs long, peak int,
  * zero_cross long, clipped long>; null for anything that is not
  * well-formed uncompressed 16-bit PCM (see [[AudioKernels.pcmStats]]).
  */
case class AudioPcmStats(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_amp", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("zero_cross", LongType, nullable = false),
    StructField("clipped", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"AudioPcmStats expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    AudioKernels.pcmStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.AudioKernels.pcmStats($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): AudioPcmStats =
    copy(child = newChild)
}

object AudioPcmStats {
  def apply(content: Column): Column =
    ColumnBridge.column(AudioPcmStats(ColumnBridge.expression(content)))
}

/** Codegen'd signal-level DIB-frame video stats over a `binary` AVI
  * column — struct<n_frames int, width int, height int, sum_r long,
  * sum_g long, sum_b long, motion long>; null for anything that is not
  * an AVI with well-formed uncompressed '00db' frames (see
  * [[AudioKernels.videoDibStats]]).
  */
case class VideoDibStats(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("motion", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"VideoDibStats expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    AudioKernels.videoDibStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.AudioKernels.videoDibStats($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): VideoDibStats =
    copy(child = newChild)
}

object VideoDibStats {
  def apply(content: Column): Column =
    ColumnBridge.column(VideoDibStats(ColumnBridge.expression(content)))
}

/** Codegen'd compressed-container sniff over a `binary` column:
  * struct<format string, p1 int, p2 int> — (channels, sample_rate) for
  * flac/ogg/mp3, (width, height) for mp4; null when unrecognized.
  */
case class SniffContainer(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("p1", IntegerType, nullable = false),
    StructField("p2", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SniffContainer expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    AudioKernels.sniffContainer(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.AudioKernels.sniffContainer($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): SniffContainer =
    copy(child = newChild)
}

/** Codegen'd container play-length over a `binary` column: milliseconds
  * as BIGINT, null when the container is unrecognized, truncated, or
  * carries no usable rate — see [[AudioKernels.durationMsOpt]].
  */
case class MediaDurationMs(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MediaDurationMs expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    AudioKernels.durationMsOpt(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("durBoxed")
      s"""
      java.lang.Long $boxed = graft.multimodal.AudioKernels.durationMsOpt($c);
      ${ev.isNull} = $boxed == null;
      ${ev.value} = $boxed == null ? -1L : $boxed.longValue();"""
    })
  override protected def withNewChildInternal(newChild: Expression): MediaDurationMs =
    copy(child = newChild)
}

object SniffContainer {
  def apply(content: Column): Column =
    ColumnBridge.column(SniffContainer(ColumnBridge.expression(content)))
}

object MediaDurationMs {
  def apply(content: Column): Column =
    ColumnBridge.column(MediaDurationMs(ColumnBridge.expression(content)))
}

/** EXIF orientation parsing — the one piece of JPEG metadata every image
  * pipeline must read before geometry matters (resize, crop, aspect
  * filters): tag 0x0112 in TIFF IFD0 inside the APP1 "Exif" segment,
  * with the TIFF header choosing byte order per file. Same policy as the
  * sniffers: pure byte math, every offset bounds-checked, anything
  * malformed or absent yields null, never a throw.
  */
object ExifKernels {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** (orientation 1-8, "II" | "MM") or null when not a JPEG carrying a
    * well-formed EXIF orientation.
    */
  def orientationTuple(b: Array[Byte]): (Int, String) = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return null // marker desync
      val m = u8(b, i + 1)
      if (m == 0xff) { i += 1 }
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else if (m == 0xda) return null // SOS: entropy data follows, no EXIF seen
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        if (m == 0xe1 && len >= 16 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
          val base = i + 10 // TIFF header start
          val end = i + 2 + len
          if (base + 8 > end) return null
          val little =
            if (b(base) == 'I' && b(base + 1) == 'I') true
            else if (b(base) == 'M' && b(base + 1) == 'M') false
            else return null
          def r16(at: Int): Int = if (little) le16(b, at) else be16(b, at)
          def r32(at: Int): Long = if (little) le32(b, at) else be32(b, at)
          if (r16(base + 2) != 42) return null
          val ifd0 = r32(base + 4)
          if (ifd0 < 8 || base + ifd0 + 2 > end) return null
          val entries = r16(base + ifd0.toInt)
          var e = 0
          while (e < entries) {
            val at = base + ifd0.toInt + 2 + 12 * e
            if (at + 12 > end) return null
            if (r16(at) == 0x0112) {
              // SHORT count 1: value lives in the first 2 bytes of the
              // 4-byte value field
              if (r16(at + 2) != 3 || r32(at + 4) != 1L) return null
              val v = r16(at + 8)
              return if (v >= 1 && v <= 8) (v, if (little) "II" else "MM") else null
            }
            e += 1
          }
          return null // APP1 Exif present but no orientation tag
        }
        i += 2 + len
      }
    }
    null
  }

  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  def orientation(bytes: Array[Byte]): InternalRow = {
    val r = orientationTuple(bytes)
    if (r == null) null
    else new GenericInternalRow(Array[Any](r._1, UTF8String.fromString(r._2)))
  }

  /** Fixture-side encoder (test/bench setup only, like the cdc fixture
    * builders): a minimal JPEG with an APP1 Exif segment carrying IFD0
    * with `extraTags` dummy entries before the orientation tag.
    */
  def jpegWithExif(orientation: Int, little: Boolean, extraTags: Int): Array[Byte] = {
    val tiff = {
      val t = new java.io.ByteArrayOutputStream()
      def t8(v: Int): Unit = t.write(v & 0xff)
      def t16(v: Int): Unit = if (little) { t8(v); t8(v >> 8) } else { t8(v >> 8); t8(v) }
      def t32(v: Long): Unit =
        if (little) { t8(v.toInt); t8((v >> 8).toInt); t8((v >> 16).toInt); t8((v >> 24).toInt) }
        else { t8((v >> 24).toInt); t8((v >> 16).toInt); t8((v >> 8).toInt); t8(v.toInt) }
      t.write(if (little) "II".getBytes else "MM".getBytes)
      t16(42); t32(8L) // IFD0 at offset 8
      t16(extraTags + 1)
      for (k <- 0 until extraTags) { // dummy tags below 0x0112, sorted
        t16(0x0100 + k); t16(3); t32(1L); t16(77); t16(0)
      }
      t16(0x0112); t16(3); t32(1L); t16(orientation); t16(0)
      t32(0L) // no next IFD
      t.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
    out.write(Array[Byte](0xff.toByte, 0xe1.toByte)) // APP1
    out.write(((payload.length + 2) >> 8) & 0xff); out.write((payload.length + 2) & 0xff)
    out.write(payload)
    // SOS + EOI so the stream looks like a real (if empty) image
    out.write(Array[Byte](0xff.toByte, 0xda.toByte))
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte))
    out.toByteArray
  }
}

/** Codegen'd EXIF orientation over a `binary` column:
  * struct<orientation int, byte_order string>, null when absent/malformed.
  */
case class SniffExif(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("orientation", IntegerType, nullable = false),
    StructField("byte_order", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SniffExif expects BINARY input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    ExifKernels.orientation(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.ExifKernels.orientation($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): SniffExif =
    copy(child = newChild)
}

object SniffExif {
  def apply(content: Column): Column =
    ColumnBridge.column(SniffExif(ColumnBridge.expression(content)))
}
