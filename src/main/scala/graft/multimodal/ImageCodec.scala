package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import scala.util.control.NonFatal

/** REAL image decode on the JDK's own codecs (`javax.imageio`): JPEG, PNG,
  * GIF, BMP and WBMP decode headlessly with zero new dependencies. This
  * replaces the former `decodeStub` byte math for the image modality — the
  * pixel-touching half of the multimodal surface (reference treats media as
  * opaque payloads; `ru-cdc` has no media path at all, so the whole family
  * is beyond-reference).
  *
  * Everything here is deterministic: decode is exact for the lossless
  * formats (PNG/GIF/BMP), the pooled resize is integer floor arithmetic
  * (no platform-dependent interpolation), and failures map to `None`,
  * never a partial row — a 100 TB corpus always contains hostile bytes.
  */
object ImageCodec {

  // Headless AWT + in-memory ImageIO streams: no X11 lookup, no /tmp
  // cache files under 32 concurrent executor threads.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Thumbnail grid edge (the pooled "resize" target is GRID×GRID). */
  val Grid = 4

  /** Typed feature row for the decode stage (UDF-returnable struct). */
  final case class ImageFeatures(
      width: Int, height: Int, channels: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode any ImageIO-supported payload; `None` on junk, truncation,
    * or unsupported formats — never throws (hostile bytes are data).
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.length < 8) None
    else try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case NonFatal(_) => None }

  /** Exact per-channel pixel sums + dims. `getRGB` normalizes every
    * raster layout to packed sRGB, so the sums are layout-independent;
    * channels comes from the raster band count (3 for RGB PNG, 4 RGBA,
    * 1 gray/palette-gray).
    */
  def features(img: BufferedImage): ImageFeatures = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    ImageFeatures(w, h, img.getRaster.getNumBands, sr, sg, sb)
  }

  /** Decode → features in one call (the q50 kernel). */
  def featuresOf(bytes: Array[Byte]): Option[ImageFeatures] =
    decode(bytes).map(features)

  /** Deterministic area-average resize: target pixel (cx, cy) is the
    * floor-average of its source cell [cx·w/tw, (cx+1)·w/tw) ×
    * [cy·h/th, (cy+1)·h/th). Pure integer math — bit-identical on any
    * JVM, unlike Graphics2D interpolation. Requires w ≥ tw and h ≥ th
    * so every cell is non-empty.
    */
  def resize(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
    require(tw > 0 && th > 0 && img.getWidth >= tw && img.getHeight >= th,
      s"resize ${img.getWidth}x${img.getHeight} -> ${tw}x$th: empty cell")
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val (w, h) = (img.getWidth, img.getHeight)
    var cy = 0
    while (cy < th) {
      val y0 = cy * h / th; val y1 = (cy + 1) * h / th
      var cx = 0
      while (cx < tw) {
        val x0 = cx * w / tw; val x1 = (cx + 1) * w / tw
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        out.setRGB(cx, cy, (((sr / n) << 16) | ((sg / n) << 8) | (sb / n)).toInt)
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Pooled-thumbnail fingerprint (the q51 kernel): row-major
    * GRID×GRID cell sums of (r+g+b) — the un-divided numerators of
    * [[resize]]'s averages, kept as exact integers so the DuckDB oracle
    * replays them with no division-rounding concerns.
    */
  def thumbSums(img: BufferedImage, grid: Int = Grid): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= grid && h >= grid, s"thumb ${w}x$h < ${grid}x$grid")
    val out = new Array[Long](grid * grid)
    var cy = 0
    while (cy < grid) {
      val y0 = cy * h / grid; val y1 = (cy + 1) * h / grid
      var cx = 0
      while (cx < grid) {
        val x0 = cx * w / grid; val x1 = (cx + 1) * w / grid
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        out(cy * grid + cx) = s
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash, the classic perceptual near-dup
    * fingerprint): area-average the image to a 9×8 luminance grid and
    * set bit (row·8 + col) iff cell (row, col+1) is brighter than
    * (row, col). Cell means are compared CROSS-MULTIPLIED on the exact
    * integer (r+g+b) sums — no division, no doubles, so the hash is
    * bit-identical on any JVM. Uniform brightness shifts cancel in the
    * comparison, which is the point of dHash. None when the image is
    * smaller than the grid (every cell must be non-empty).
    */
  def dHash(img: BufferedImage): Option[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < 9 || h < 8) return None
    val sums = new Array[Long](8 * 9)
    val counts = new Array[Long](8 * 9)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        sums(cy * 9 + cx) = s
        counts(cy * 9 + cx) = (x1 - x0).toLong * (y1 - y0)
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var row = 0
    while (row < 8) {
      var col = 0
      while (col < 8) {
        val i = row * 9 + col
        // mean(i+1) > mean(i)  ⟺  s(i+1)·n(i) > s(i)·n(i+1), exactly.
        if (sums(i + 1) * counts(i) > sums(i) * counts(i + 1))
          hash |= 1L << (row * 8 + col)
        col += 1
      }
      row += 1
    }
    Some(hash)
  }

  /** Decode → dHash in one call (the q222 kernel). */
  def dHashOf(bytes: Array[Byte]): Option[Long] =
    decode(bytes).flatMap(dHash)

  /** A second PNG family for the near-dup fixture: per-id gradient
    * DIRECTIONS (not just a per-id offset like [[formulaPng]], whose
    * uniform mod-256 shift would leave adjacent-cell comparisons — and so
    * dHashes — near-identical across ids). Sized ≥ the 9×8 dHash grid.
    * `patch = true` re-renders the same image with a small corner patch
    * inverted — the planted near-duplicate (few dHash cells touched).
    */
  def formulaPng2(id: Long, patch: Boolean = false): Array[Byte] = {
    val w = 18 + (id % 7).toInt
    val h = 12 + (id % 5).toInt
    val (mx, my) = ((3 + id % 13).toInt, (5 + id % 11).toInt)
    val base = (id * id % 97).toInt
    // The x·y texture term varies per id: a pure linear ramp (the first
    // draft) made adjacent-cell comparisons mostly "rising", so dHashes
    // clustered toward all-ones rows and the band buckets went hot at
    // 100× docs (28× measured; the hot-bucket cap now also guards this
    // engine-side). Cross-term texture keeps the hash space spread.
    val tx = (3 + id % 29).toInt
    encodePng(w, h, { (x, y) =>
      val inPatch = patch && x < 3 && y < 3
      val v = (x * mx + y * my + (x * y * tx) % 101 + base) % 256
      val p = if (inPatch) 255 - v else v
      (p, (p * 2) % 256, (p * 3) % 256)
    })
  }

  /** Encode an RGB pixel function to real PNG bytes (ImageIO writer —
    * lossless, so decode(encode(px)) ≡ px exactly).
    */
  def encodePng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Fixture image for doc `id`: a real PNG whose pixels are the formula
    * r=(7x+13y+id)%256, g=(3x+5y+2id)%256, b=(11x+y+3id)%256 over a
    * (id%16+4) × (id%12+4) canvas — known to the DuckDB oracle in closed
    * form, so q50/q51 verify the ImageIO round-trip bit-exactly.
    */
  def formulaPng(id: Long): Array[Byte] = {
    val w = (id % 16 + 4).toInt
    val h = (id % 12 + 4).toInt
    encodePng(w, h, (x, y) => (
      ((x * 7 + y * 13 + id) % 256).toInt,
      ((x * 3 + y * 5 + id * 2) % 256).toInt,
      ((x * 11 + y + id * 3) % 256).toInt))
  }
}
