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
}
