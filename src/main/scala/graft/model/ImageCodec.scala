package graft.model

/** Deterministic image payload codec (SURVEY.md O-57). Pixels are seeded
  * from phash via splitmix64, encoders are lossless (raw RGB or PNG via the
  * from-scratch lock-free [[PngCodec]] — see there for why not imageio), so
  * the per-row decoded-pixel invariant of BASELINE.json (`PSNR ≥ 40 dB`,
  * exact for lossless) holds trivially and is asserted, not assumed, in
  * tests and in the tiling operator.
  */
object ImageCodec {

  /** Seeded RGB pixel buffer, row-major, 3 bytes/pixel. */
  def seededPixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var s = seed
    while (i < out.length) {
      s = Synth.mix64(s)
      out(i) = (s & 0xFF).toByte
      if (i + 1 < out.length) out(i + 1) = ((s >>> 8) & 0xFF).toByte
      if (i + 2 < out.length) out(i + 2) = ((s >>> 16) & 0xFF).toByte
      i += 3
    }
    out
  }

  /** raw fmt: the RGB buffer verbatim. */
  def encodeRaw(px: Array[Byte]): Array[Byte] = px

  def decodeRaw(bytes: Array[Byte]): Array[Byte] = bytes

  /** png fmt: lossless PNG of the RGB buffer (from-scratch codec). */
  def encodePng(px: Array[Byte], w: Int, h: Int): Array[Byte] =
    PngCodec.encode(px, w, h)

  def decodePng(bytes: Array[Byte]): (Array[Byte], Int, Int) =
    PngCodec.decode(bytes)

  /** Decode either fmt to RGB pixels (fresh buffer). */
  def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] =
    fmt match {
      case "png" => decodePng(bytes)._1
      case _     => decodeRaw(bytes)
    }

  /** Transient decode for hot paths: png → the PngCodec thread scratch
    * (may be LONGER than w·h·3 — consume before the next codec call), raw →
    * the input array itself. Zero allocations.
    */
  def decodeScratch(bytes: Array[Byte], fmt: String): Array[Byte] =
    fmt match {
      case "png" => PngCodec.decodeScratch(bytes)._1
      case _     => bytes
    }

  // per-thread crop output for the tiling hot path (transient; the encoded
  // tile is the only escaping allocation)
  private val cropBufs = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](4096))

  /** PSNR between two equal-length RGB buffers; Double.PositiveInfinity for
    * identical buffers (lossless path).
    */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"pixel buffers differ: ${a.length} vs ${b.length}")
    psnr(a, b, a.length)
  }

  /** PSNR over the first n bytes — for scratch buffers that may be longer
    * than their content.
    */
  def psnr(a: Array[Byte], b: Array[Byte], n: Int): Double = {
    // r7 fast path: the lossless pipelines compare byte-identical buffers
    // (often the SAME buffer for raw tiles) — identity and the vectorized
    // Arrays.equals range intrinsic decide se == 0 without the scalar
    // double loop. Semantically unchanged: equal prefix ⟺ se == 0 ⟺ +∞.
    if ((a eq b) || java.util.Arrays.equals(a, 0, n, b, 0, n))
      return Double.PositiveInfinity
    var se = 0.0
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      se += d.toDouble * d.toDouble
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else {
      val mse = se / n
      10.0 * math.log10(255.0 * 255.0 / mse)
    }
  }

  /** Box-average resize of a w×h RGB buffer to tw×th (training-pipeline
    * thumbnail op). Integer accumulation over the source box per target
    * pixel — deterministic, no float rounding drift across platforms.
    */
  def resize(px: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var r = 0L; var g = 0L; var b = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * 3
            r += px(i) & 0xFF; g += px(i + 1) & 0xFF; b += px(i + 2) & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val o = (ty * tw + tx) * 3
        out(o) = (r / n).toByte; out(o + 1) = (g / n).toByte; out(o + 2) = (b / n).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Crop a w×h RGB buffer. Used by raster-tile materialization (O-57). */
  def crop(px: Array[Byte], w: Int, h: Int,
           x0: Int, y0: Int, cw: Int, ch: Int): Array[Byte] = {
    val out = new Array[Byte](cw * ch * 3)
    cropInto(px, w, x0, y0, cw, ch, out)
    out
  }

  /** Crop into the per-thread scratch (transient — valid until this
    * thread's next cropScratch call; may be longer than cw·ch·3).
    */
  def cropScratch(px: Array[Byte], w: Int, h: Int,
                  x0: Int, y0: Int, cw: Int, ch: Int): Array[Byte] = {
    var buf = cropBufs.get()
    if (buf.length < cw * ch * 3) {
      buf = new Array[Byte](math.max(cw * ch * 3, buf.length * 2))
      cropBufs.set(buf)
    }
    cropInto(px, w, x0, y0, cw, ch, buf)
    buf
  }

  private def cropInto(px: Array[Byte], w: Int, x0: Int, y0: Int,
                       cw: Int, ch: Int, out: Array[Byte]): Unit = {
    var y = 0
    while (y < ch) {
      System.arraycopy(px, ((y0 + y) * w + x0) * 3, out, y * cw * 3, cw * 3)
      y += 1
    }
  }

  /** 64-bit difference hash (dHash — the standard public perceptual-hash
    * algorithm): box-average resize to a 9×8 grid with [[resize]]'s exact
    * integer-truncation semantics, integer luma 299r + 587g + 114b (×1000
    * scale, no divide — exact), bit (y·8 + x) set iff lum(x+1, y) >
    * lum(x, y). Returned as a 64-char '0'/'1' string (MSB first) so the
    * DuckDB oracle can recompute and compare it without 64-bit sign
    * gymnastics; [[dhashPack]] gives the Long for hamming blocking.
    */
  def dhashBits(px: Array[Byte], w: Int, h: Int): String = {
    val g = resize(px, w, h, 9, 8)
    val sb = new java.lang.StringBuilder(64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val o1 = (y * 9 + x) * 3
        val o2 = o1 + 3
        val l1 = 299 * (g(o1) & 0xFF) + 587 * (g(o1 + 1) & 0xFF) + 114 * (g(o1 + 2) & 0xFF)
        val l2 = 299 * (g(o2) & 0xFF) + 587 * (g(o2 + 1) & 0xFF) + 114 * (g(o2 + 2) & 0xFF)
        sb.append(if (l2 > l1) '1' else '0')
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  /** Pack a [[dhashBits]] string into a Long (first char = MSB). */
  def dhashPack(bits: String): Long = {
    var v = 0L
    var i = 0
    while (i < bits.length) { v = (v << 1) | (bits.charAt(i) - '0').toLong; i += 1 }
    v
  }
}
