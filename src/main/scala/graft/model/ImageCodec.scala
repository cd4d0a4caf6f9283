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

  /** Decode either fmt to RGB pixels. */
  def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] =
    fmt match {
      case "png" => decodePng(bytes)._1
      case _     => decodeRaw(bytes)
    }

  /** PSNR between two equal-length RGB buffers; Double.PositiveInfinity for
    * identical buffers (lossless path).
    */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"pixel buffers differ: ${a.length} vs ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      se += d.toDouble * d.toDouble
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else {
      val mse = se / a.length
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
    var y = 0
    while (y < ch) {
      System.arraycopy(px, ((y0 + y) * w + x0) * 3, out, y * cw * 3, cw * 3)
      y += 1
    }
    out
  }
}
