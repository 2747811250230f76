package graft.operators

/** Real, dependency-free image codec for the multimodal path: 24-bit
  * uncompressed BMP (BITMAPINFOHEADER) decode / encode / nearest-
  * neighbor resize, pure JVM. This de-stubs the image leg of the
  * multimodal pipeline (the reference environment ships no codec
  * libraries); audio/video feature extraction stays on the declared
  * [[Multimodal.StubCodec]].
  *
  * Executor-local by construction — byte array in, byte array out, no
  * driver involvement, so it runs unchanged inside `mapPartitions` at
  * any scale.
  */
object ImageCodec {

  /** Decoded raster: BGR byte triples, row-major, top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"raster size ${pixels.length} != $width x $height x 3")
    /** (blue, green, red) at (x, y), each 0-255. */
    def bgr(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * width + x) * 3
      (pixels(i) & 0xff, pixels(i + 1) & 0xff, pixels(i + 2) & 0xff)
    }
  }

  /** Cheap sniff: BMP magic + room for the 54-byte header pair. */
  def isBmp(b: Array[Byte]): Boolean =
    b.length > 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  private def readI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readI16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def writeI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  private def writeI16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }

  private def rowStride(width: Int): Int = ((width * 3) + 3) / 4 * 4

  /** Decodes a 24bpp uncompressed BMP (positive height = bottom-up rows,
    * negative = top-down; both normalized to top-down).
    */
  def decode(b: Array[Byte]): Image = {
    require(isBmp(b), "not a BMP payload (missing 'BM' magic)")
    val pixelOffset = readI32(b, 10)
    val headerSize = readI32(b, 14)
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val width = readI32(b, 18)
    val rawHeight = readI32(b, 22)
    val bpp = readI16(b, 28)
    val compression = readI32(b, 30)
    require(bpp == 24, s"only 24bpp BMP supported, got $bpp")
    require(compression == 0, s"only uncompressed BMP supported, got $compression")
    require(width > 0 && rawHeight != 0, s"bad dimensions ${width}x$rawHeight")
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val stride = rowStride(width)
    require(b.length >= pixelOffset + stride * height,
      s"truncated BMP: need ${pixelOffset + stride * height} bytes, have ${b.length}")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      System.arraycopy(b, pixelOffset + srcRow * stride, out, y * width * 3, width * 3)
      y += 1
    }
    Image(width, height, out)
  }

  /** Encodes to a bottom-up 24bpp uncompressed BMP. */
  def encode(img: Image): Array[Byte] = {
    val stride = rowStride(img.width)
    val dataSize = stride * img.height
    val b = new Array[Byte](54 + dataSize)
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    writeI32(b, 2, b.length)     // file size
    writeI32(b, 10, 54)          // pixel data offset
    writeI32(b, 14, 40)          // BITMAPINFOHEADER size
    writeI32(b, 18, img.width)
    writeI32(b, 22, img.height)  // positive: bottom-up
    writeI16(b, 26, 1)           // planes
    writeI16(b, 28, 24)          // bpp
    writeI32(b, 30, 0)           // BI_RGB
    writeI32(b, 34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = img.height - 1 - y
      System.arraycopy(img.pixels, y * img.width * 3, b, 54 + dstRow * stride, img.width * 3)
      y += 1
    }
    b
  }

  /** Nearest-neighbor resample (the thumbnailing kernel — deterministic,
    * O(outputPixels), no intermediate allocation beyond the raster).
    */
  def resize(img: Image, targetW: Int, targetH: Int): Image = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val out = new Array[Byte](targetW * targetH * 3)
    var y = 0
    while (y < targetH) {
      val srcY = (y.toLong * img.height / targetH).toInt
      var x = 0
      while (x < targetW) {
        val srcX = (x.toLong * img.width / targetW).toInt
        val si = (srcY * img.width + srcX) * 3
        val di = (y * targetW + x) * 3
        out(di) = img.pixels(si); out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Image(targetW, targetH, out)
  }

  /** decode → resize → encode, the bytes-to-bytes kernel the Spark
    * stage calls.
    */
  def resizeBmp(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    encode(resize(decode(bytes), targetW, targetH))

  /** Average-hash (aHash) perceptual fingerprint: decode, nearest-
    * neighbor resample to 8×8, integer grayscale (b+g+r per pixel —
    * no float weights), then bit i set iff pixel i is strictly
    * brighter than the mean. INTEGER-ONLY end to end: the mean compare
    * is `gray * 64 > total` (exact — no division rounding), so two
    * JVMs, or a reimplementation in any language, produce identical
    * hashes. Near-identical images differ in few bits; hamming
    * distance over these 64 bits is the image twin of q49's SimHash
    * distance, and the same banded index dedups them at scale
    * ([[Dedup.bandedHammingPairs]]).
    */
  def aHash(bytes: Array[Byte]): Long = {
    val img = resize(decode(bytes), 8, 8)
    val gray = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      val p = i * 3
      gray(i) = (img.pixels(p) & 0xff).toLong + (img.pixels(p + 1) & 0xff) +
        (img.pixels(p + 2) & 0xff)
      total += gray(i)
      i += 1
    }
    var h = 0L
    i = 0
    while (i < 64) {
      if (gray(i) * 64L > total) h |= (1L << i)
      i += 1
    }
    h
  }
}
