package graft.model

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal from-scratch PNG codec (RGB8, non-interlaced, filter 0 rows,
  * single IDAT). Spec: RFC 2083 / W3C PNG. Replaces javax.imageio in the hot
  * tiling path: ImageIO's service-registry lookups and default disk cache
  * serialize under many threads, which capped tiling scaling at ~1× from 8→32
  * cores. This codec is lock-free and allocation-local, so per-partition
  * decode/encode scales with cores. Lossless ⇒ the input_hint PSNR gate is
  * exact.
  */
object PngCodec {
  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')

  // zlib codec construction does native-buffer setup — at millions of tiny
  // images per task that's the dominant cost. Reuse per thread via reset().
  private val deflaters = ThreadLocal.withInitial[Deflater](
    () => new Deflater(Deflater.BEST_SPEED))
  private val inflaters = ThreadLocal.withInitial[Inflater](() => new Inflater())

  /** Below this raw size, emit zlib STORED blocks instead of calling
    * Deflater: per-call JNI setup dominates zlib on tiny rasters (measured
    * ~26 µs/tile vs ~2 µs stored), and this engine's synthetic payloads are
    * seeded-random pixels that deflate cannot shrink anyway. Still a fully
    * valid, lossless PNG (RFC 1951 §3.2.4 stored blocks + Adler-32).
    */
  private final val StoredThreshold = 8192

  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val nBlocks = math.max(1, (raw.length + 65534) / 65535)
    val out = new Array[Byte](2 + nBlocks * 5 + raw.length + 4)
    out(0) = 0x78; out(1) = 0x01 // CMF/FLG, (0x7801 % 31 == 0)
    var off = 2
    var pos = 0
    if (raw.isEmpty) {
      // zero-dimension raster: the loop below never runs, but a valid zlib
      // stream still needs one final (empty) stored block — BFINAL=1, LEN=0
      out(off) = 1; out(off + 1) = 0; out(off + 2) = 0
      out(off + 3) = 0xFF.toByte; out(off + 4) = 0xFF.toByte
      off += 5
    }
    while (pos < raw.length) {
      val len = math.min(65535, raw.length - pos)
      out(off) = (if (pos + len >= raw.length) 1 else 0).toByte // BFINAL
      out(off + 1) = (len & 0xFF).toByte
      out(off + 2) = ((len >> 8) & 0xFF).toByte
      out(off + 3) = (~len & 0xFF).toByte
      out(off + 4) = ((~len >> 8) & 0xFF).toByte
      System.arraycopy(raw, pos, out, off + 5, len)
      off += 5 + len
      pos += len
    }
    val ad = new java.util.zip.Adler32()
    ad.update(raw)
    val a = ad.getValue
    out(off) = ((a >>> 24) & 0xFF).toByte
    out(off + 1) = ((a >>> 16) & 0xFF).toByte
    out(off + 2) = ((a >>> 8) & 0xFF).toByte
    out(off + 3) = (a & 0xFF).toByte
    out
  }

  def encode(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${px.length}")
    // raw scanlines with filter byte 0
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      raw(y * (1 + w * 3)) = 0
      System.arraycopy(px, y * w * 3, raw, y * (1 + w * 3) + 1, w * 3)
      y += 1
    }
    val idat = if (raw.length <= StoredThreshold) zlibStored(raw) else {
      val deflater = deflaters.get()
      deflater.reset()
      deflater.setInput(raw)
      deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new ByteArrayOutputStream(raw.length / 2 + 128)
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    }

    val bos = new ByteArrayOutputStream(idat.length + 128)
    bos.write(SIG)
    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, w); putInt(ihdr, 4, h)
    ihdr(8) = 8          // bit depth
    ihdr(9) = 2          // color type: truecolor RGB
    chunk(bos, "IHDR", ihdr)
    chunk(bos, "IDAT", idat)
    chunk(bos, "IEND", Array.empty)
    bos.toByteArray
  }

  /** Decode a PNG produced by [[encode]] (RGB8, filter 0). Returns
    * (rgbBytes, w, h). Filters 1–4 are not needed for our own output and are
    * rejected explicitly.
    */
  def decode(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    require(bytes.length > 8 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G',
      "not a PNG")
    var pos = 8
    var w = 0; var h = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = getInt(bytes, pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          w = getInt(bytes, pos + 8); h = getInt(bytes, pos + 12)
          require(bytes(pos + 16) == 8 && bytes(pos + 17) == 2,
            "only RGB8 supported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    val inflater = inflaters.get()
    inflater.reset()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w * 3))
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // inflate() returns 0 with finished()==false when it needs more input —
      // a truncated/corrupt IDAT would otherwise spin this loop forever
      if (n == 0) throw new IllegalArgumentException("truncated IDAT stream")
      off += n
    }
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      require(raw(y * (1 + w * 3)) == 0, "only filter 0 supported")
      System.arraycopy(raw, y * (1 + w * 3) + 1, px, y * w * 3, w * 3)
      y += 1
    }
    (px, w, h)
  }

  private def chunk(bos: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val lenB = new Array[Byte](4); putInt(lenB, 0, data.length)
    bos.write(lenB)
    val typB = typ.getBytes("US-ASCII")
    bos.write(typB)
    bos.write(data)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    val crcB = new Array[Byte](4); putInt(crcB, 0, crc.getValue.toInt)
    bos.write(crcB)
  }

  private def putInt(a: Array[Byte], o: Int, v: Int): Unit = {
    a(o) = (v >>> 24).toByte; a(o + 1) = (v >>> 16).toByte
    a(o + 2) = (v >>> 8).toByte; a(o + 3) = v.toByte
  }
  private def getInt(a: Array[Byte], o: Int): Int =
    ((a(o) & 0xFF) << 24) | ((a(o + 1) & 0xFF) << 16) |
      ((a(o + 2) & 0xFF) << 8) | (a(o + 3) & 0xFF)
}
