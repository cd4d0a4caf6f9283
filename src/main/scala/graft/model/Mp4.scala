package graft.model

import scala.collection.mutable.ArrayBuffer

/** Minimal ISO-BMFF (MP4) muxer/demuxer (round-5 stretch, closing the
  * "engine-defined container" gap for video): the CONTAINER structure is
  * the real published ISO/IEC 14496-12 box grammar — ftyp/mdat/moov with a
  * full sample table (stsd/stts/stsc/stsz/stco) — while the sample CODEC
  * is the engine's from-scratch PNG (sample entry fourcc `png `, the
  * QuickTime-registered PNG video sample description; no H.264 decoder
  * ships in this container and none is written here).
  *
  * The demuxer is a general box-walker, not a reader of this muxer's
  * output: 64-bit `co64` chunk offsets, `size == 1` largesize and
  * `size == 0` to-end boxes, multi-run sample-to-chunk (`stsc`) maps,
  * fixed-`sample_size` stsz, and multiple traks (first one with a
  * complete sample table wins) all parse. Never-fail contract: structural
  * violations (truncated boxes, counts past sane caps, offsets outside
  * the buffer) yield the valid sample prefix or nothing — never an
  * exception.
  */
object Mp4 {

  // ---- big-endian primitives ----
  private def be32(b: ArrayBuffer[Byte], v: Long): Unit = {
    b += ((v >> 24) & 0xFF).toByte; b += ((v >> 16) & 0xFF).toByte
    b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
  }
  private def be16(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
  }
  private def tag(b: ArrayBuffer[Byte], t: String): Unit =
    t.foreach(c => b += c.toByte)
  private def box(t: String, payload: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
    val out = new ArrayBuffer[Byte](payload.length + 8)
    be32(out, payload.length + 8L); tag(out, t); out ++= payload
    out
  }
  private def buf(): ArrayBuffer[Byte] = new ArrayBuffer[Byte]()

  /** Pack `frames` (each one PNG-encoded sample) as [ftyp][mdat][moov],
    * 25 fps video track of `w`×`h`, single chunk. mdat precedes moov so
    * stco's absolute offset is known when the sample table is written.
    */
  def mux(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val ftyp = {
      val p = buf()
      tag(p, "isom"); be32(p, 0x200); tag(p, "isom"); tag(p, "iso2")
      box("ftyp", p)
    }
    val mdat = {
      val p = buf()
      frames.foreach(p ++= _)
      box("mdat", p)
    }
    val mdatPayloadOff = ftyp.length + 8L
    val unityMatrix = Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
    val mvhd = {
      val p = buf()
      be32(p, 0) // version+flags
      be32(p, 0); be32(p, 0) // created, modified
      be32(p, 25); be32(p, frames.length.toLong) // timescale, duration
      be32(p, 0x00010000L); be16(p, 0x0100); be16(p, 0) // rate, volume, rsvd
      be32(p, 0); be32(p, 0) // reserved
      unityMatrix.foreach(be32(p, _))
      (0 until 6).foreach(_ => be32(p, 0)) // pre_defined
      be32(p, 2) // next_track_ID
      box("mvhd", p)
    }
    val tkhd = {
      val p = buf()
      be32(p, 7) // version 0, flags: enabled | in-movie | in-preview
      be32(p, 0); be32(p, 0) // created, modified
      be32(p, 1); be32(p, 0) // track_ID, reserved
      be32(p, frames.length.toLong) // duration
      be32(p, 0); be32(p, 0) // reserved
      be16(p, 0); be16(p, 0); be16(p, 0); be16(p, 0) // layer, group, volume, rsvd
      unityMatrix.foreach(be32(p, _))
      be32(p, w.toLong << 16); be32(p, h.toLong << 16) // 16.16 fixed
      box("tkhd", p)
    }
    val mdhd = {
      val p = buf()
      be32(p, 0); be32(p, 0); be32(p, 0)
      be32(p, 25); be32(p, frames.length.toLong) // timescale, duration
      be16(p, 0x55C4); be16(p, 0) // language 'und', pre_defined
      box("mdhd", p)
    }
    val hdlr = {
      val p = buf()
      be32(p, 0); be32(p, 0); tag(p, "vide")
      be32(p, 0); be32(p, 0); be32(p, 0) // reserved
      p += 0 // empty null-terminated name
      box("hdlr", p)
    }
    val vmhd = {
      val p = buf()
      be32(p, 1) // version 0, flags 1
      be16(p, 0); be16(p, 0); be16(p, 0); be16(p, 0) // graphicsmode, opcolor
      box("vmhd", p)
    }
    val dinf = {
      val url = { val p = buf(); be32(p, 1); box("url ", p) } // self-contained
      val dref = { val p = buf(); be32(p, 0); be32(p, 1); p ++= url; box("dref", p) }
      box("dinf", dref)
    }
    val stsd = {
      val entry = {
        val p = buf()
        (0 until 6).foreach(_ => p += 0) // reserved
        be16(p, 1) // data_reference_index
        be16(p, 0); be16(p, 0) // pre_defined, reserved
        (0 until 3).foreach(_ => be32(p, 0)) // pre_defined
        be16(p, w); be16(p, h)
        be32(p, 0x00480000L); be32(p, 0x00480000L) // 72 dpi
        be32(p, 0) // reserved
        be16(p, 1) // frame_count
        (0 until 32).foreach(_ => p += 0) // compressorname
        be16(p, 24); be16(p, 0xFFFF) // depth, pre_defined (-1)
        box("png ", p)
      }
      val p = buf()
      be32(p, 0); be32(p, 1); p ++= entry
      box("stsd", p)
    }
    val stts = {
      val p = buf()
      be32(p, 0); be32(p, 1); be32(p, frames.length.toLong); be32(p, 1)
      box("stts", p)
    }
    val stsc = {
      val p = buf()
      be32(p, 0); be32(p, 1)
      be32(p, 1); be32(p, frames.length.toLong); be32(p, 1)
      box("stsc", p)
    }
    val stsz = {
      val p = buf()
      be32(p, 0); be32(p, 0); be32(p, frames.length.toLong)
      frames.foreach(f => be32(p, f.length.toLong))
      box("stsz", p)
    }
    val stco = {
      val p = buf()
      be32(p, 0); be32(p, 1); be32(p, mdatPayloadOff)
      box("stco", p)
    }
    val stbl = {
      val p = buf(); p ++= stsd; p ++= stts; p ++= stsc; p ++= stsz; p ++= stco
      box("stbl", p)
    }
    val minf = { val p = buf(); p ++= vmhd; p ++= dinf; p ++= stbl; box("minf", p) }
    val mdia = { val p = buf(); p ++= mdhd; p ++= hdlr; p ++= minf; box("mdia", p) }
    val trak = { val p = buf(); p ++= tkhd; p ++= mdia; box("trak", p) }
    val moov = { val p = buf(); p ++= mvhd; p ++= trak; box("moov", p) }
    val out = new ArrayBuffer[Byte](ftyp.length + mdat.length + moov.length)
    out ++= ftyp; out ++= mdat; out ++= moov
    out.toArray
  }

  // ---- demuxer ----

  private val MaxEntries = 1 << 22 // hostile-count cap

  private def rd32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def rd64(b: Array[Byte], o: Int): Long =
    (rd32(b, o) << 32) | rd32(b, o + 4)
  private def typ(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Child boxes of [from, until): (type, payloadStart, payloadEnd). */
  private def children(b: Array[Byte], from: Int,
                       until: Int): Seq[(String, Int, Int)] = {
    val out = ArrayBuffer.empty[(String, Int, Int)]
    var o = from.toLong
    while (o + 8 <= until) {
      val size = rd32(b, o.toInt)
      val t = typ(b, o.toInt)
      val (hdr, end) =
        if (size == 1L) {
          if (o + 16 > until) return out.toSeq
          (16L, o + rd64(b, o.toInt + 8))
        } else if (size == 0L) (8L, until.toLong) // box extends to end
        else (8L, o + size)
      if (end > until || end <= o + hdr) return out.toSeq // malformed: stop
      out += ((t, (o + hdr).toInt, end.toInt))
      o = end
    }
    out.toSeq
  }

  private def child(b: Array[Byte], from: Int, until: Int,
                    t: String): Option[(Int, Int)] =
    children(b, from, until).collectFirst { case (`t`, s, e) => (s, e) }

  /** Extract the sample byte ranges of the first trak with a complete
    * sample table, in sample order, and slice them from the buffer.
    */
  def demux(bytes: Array[Byte]): Seq[Array[Byte]] = try {
    val (moovS, moovE) = child(bytes, 0, bytes.length, "moov")
      .getOrElse(return Nil)
    val tables = children(bytes, moovS, moovE).collect {
      case ("trak", ts, te) =>
        for {
          (mdS, mdE) <- child(bytes, ts, te, "mdia")
          (mfS, mfE) <- child(bytes, mdS, mdE, "minf")
          (sbS, sbE) <- child(bytes, mfS, mfE, "stbl")
          (szS, szE) <- child(bytes, sbS, sbE, "stsz")
          (scS, scE) <- child(bytes, sbS, sbE, "stsc")
          co <- child(bytes, sbS, sbE, "stco")
            .map((_, false)).orElse(child(bytes, sbS, sbE, "co64").map((_, true)))
        } yield (szS, szE, scS, scE, co._1._1, co._1._2, co._2)
    }.flatten.headOption.getOrElse(return Nil)
    val (szS, szE, scS, scE, coS, coE, co64) = tables
    // stsz: fixed sample_size or per-sample table
    val fixedSize = rd32(bytes, szS + 4)
    val nSamples = rd32(bytes, szS + 8)
    if (nSamples < 0 || nSamples > MaxEntries) return Nil
    if (fixedSize == 0 && szS + 12 + nSamples * 4 > szE) return Nil
    def sampleSize(i: Int): Long =
      if (fixedSize != 0) fixedSize else rd32(bytes, szS + 12 + i * 4)
    // stco / co64: chunk offsets
    val nChunks = rd32(bytes, coS + 4)
    val coW = if (co64) 8 else 4
    if (nChunks < 0 || nChunks > MaxEntries ||
      coS + 8 + nChunks * coW > coE) return Nil
    def chunkOff(c: Int): Long =
      if (co64) rd64(bytes, coS + 8 + c * 8) else rd32(bytes, coS + 8 + c * 4)
    // stsc: (first_chunk, samples_per_chunk) runs
    val nRuns = rd32(bytes, scS + 4)
    if (nRuns < 0 || nRuns > MaxEntries || scS + 8 + nRuns * 12 > scE) return Nil
    val runs = (0 until nRuns.toInt).map { r =>
      (rd32(bytes, scS + 8 + r * 12), rd32(bytes, scS + 8 + r * 12 + 4))
    }
    // walk chunks in order; each chunk holds its run's samples consecutively
    val out = ArrayBuffer.empty[Array[Byte]]
    var sample = 0
    var run = 0
    var c = 0
    while (c < nChunks && sample < nSamples) {
      while (run + 1 < runs.length && runs(run + 1)._1 <= c + 1) run += 1
      val perChunk = if (runs.isEmpty) return out.toSeq else runs(run)._2
      var off = chunkOff(c)
      var k = 0L
      while (k < perChunk && sample < nSamples) {
        val sz = sampleSize(sample)
        if (sz < 0 || off < 0 || off + sz > bytes.length) return out.toSeq
        out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
        off += sz
        sample += 1
        k += 1
      }
      c += 1
    }
    out.toSeq
  } catch { case scala.util.control.NonFatal(_) => Nil }

  /** True when the buffer leads with a plausible top-level ISO-BMFF box. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      Set("ftyp", "moov", "mdat", "free", "styp", "wide")(typ(bytes, 0))
}
