package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Frame sampling over opaque video containers: pack/unpack round trip,
  * never-fail on malformed containers, sampling correctness against the
  * source-pixel truth table.
  */
class VideoOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pack/unpack round-trips frames byte-exactly") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array.fill[Byte](1000)(7))
    val got = VideoOps.unpack(VideoOps.pack(frames))
    assert(got.length === 3)
    frames.zip(got).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("malformed containers never throw; partial extraction survives") {
    assert(VideoOps.unpack(Array.empty[Byte]) === Nil)
    assert(VideoOps.unpack("not a video".getBytes) === Nil)
    // right magic, implausible frame count
    val bad = java.nio.ByteBuffer.allocate(8)
      .putInt(VideoOps.Magic).putInt(Int.MaxValue).array()
    assert(VideoOps.unpack(bad) === Nil)
    // truncated mid-frame: first frame survives, second is dropped
    val two = VideoOps.pack(Seq(Array[Byte](1, 2), Array[Byte](3, 4, 5)))
    val truncated = java.util.Arrays.copyOf(two, two.length - 2)
    val got = VideoOps.unpack(truncated)
    assert(got.length === 1 && got.head.toSeq === Seq[Byte](1, 2))
  }

  test("sampleFrames: every 3rd frame, checksums match the source truth") {
    val (videos, truth) = VideoOps.synthVideos(spark, 8L, nFrames = 12)
    val got = VideoOps.sampleFrames(spark, videos, every = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(got.size === 8 * 4) // frames 0, 3, 6, 9
    assert(got.keys.forall(_._2 % 3 == 0))
    val expect = truth.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (k, (w, h, s)) =>
      assert(w === 8 && h === 8)
      assert(s === expect(k), s"frame $k decoded to a different pixel sum")
    }
    // every = 1 returns all frames
    assert(VideoOps.sampleFrames(spark, videos, every = 1).count() === 8L * 12)
  }

  test("legacy GVID containers still sample identically (sniffed)") {
    val (mp4v, truth) = VideoOps.synthVideos(spark, 4L, nFrames = 6)
    val (gvid, _) = VideoOps.synthVideos(spark, 4L, nFrames = 6,
      container = "gvid")
    val a = VideoOps.sampleFrames(spark, mp4v, every = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSet
    val b = VideoOps.sampleFrames(spark, gvid, every = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSet
    assert(a === b && a.nonEmpty)
    val expect = truth.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a.subsetOf(expect))
  }

  test("Mp4: mux/demux round-trips samples byte-exactly; box grammar edges") {
    import graft.model.Mp4
    val frames = Seq(Array[Byte](9), Array[Byte](1, 2, 3),
      Array.fill[Byte](500)(42))
    val mp4 = Mp4.mux(frames, 8, 8)
    assert(Mp4.sniff(mp4))
    val got = Mp4.demux(mp4)
    assert(got.length === 3)
    frames.zip(got).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    // size = 0 (box extends to end of file) on the trailing moov
    val zeroSized = mp4.clone()
    val moovOff = {
      // moov is the last top-level box: scan for it
      var o = 0
      var found = -1
      while (o + 8 <= zeroSized.length) {
        val sz = java.nio.ByteBuffer.wrap(zeroSized, o, 4).getInt
        if (new String(zeroSized, o + 4, 4, "ISO-8859-1") == "moov") found = o
        o += sz
      }
      found
    }
    assert(moovOff > 0)
    java.util.Arrays.fill(zeroSized, moovOff, moovOff + 4, 0.toByte)
    assert(Mp4.demux(zeroSized).length === 3)
    // truncated moov: never throws, yields nothing (table incomplete)
    assert(Mp4.demux(java.util.Arrays.copyOf(mp4, mp4.length - 12)).isEmpty ||
      Mp4.demux(java.util.Arrays.copyOf(mp4, mp4.length - 12)).length < 3)
    assert(Mp4.demux("ftypnonsense".getBytes("ISO-8859-1")) === Nil)
  }

  test("Mp4 demux: multi-chunk stco + multi-run stsc + co64 (general " +
    "parser, not just this muxer's layout)") {
    import scala.collection.mutable.ArrayBuffer
    def be32(b: ArrayBuffer[Byte], v: Long): Unit = {
      b += ((v >> 24) & 0xFF).toByte; b += ((v >> 16) & 0xFF).toByte
      b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
    }
    def be64(b: ArrayBuffer[Byte], v: Long): Unit = { be32(b, v >> 32); be32(b, v & 0xFFFFFFFFL) }
    def box(t: String, p: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val o = new ArrayBuffer[Byte](); be32(o, p.length + 8L)
      t.foreach(c => o += c.toByte); o ++= p; o
    }
    // samples: s0 = [1,2,3] and s1 = [4,5] in chunk 1; s2 = [6,7,8,9] in
    // chunk 2 — chunks deliberately out of order in the file
    val s = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5), Array[Byte](6, 7, 8, 9))
    val mdatP = new ArrayBuffer[Byte]()
    mdatP ++= s(2) // chunk 2 payload FIRST in mdat
    mdatP ++= s(0); mdatP ++= s(1) // chunk 1 payload after
    val mdat = box("mdat", mdatP)
    val chunk2Off = 8L // inside mdat payload (absolute: computed below)
    val chunk1Off = 8L + 4L
    val stsz = { val p = new ArrayBuffer[Byte]()
      be32(p, 0); be32(p, 0); be32(p, 3); s.foreach(x => be32(p, x.length.toLong)); box("stsz", p) }
    val stsc = { val p = new ArrayBuffer[Byte]()
      be32(p, 0); be32(p, 2)
      be32(p, 1); be32(p, 2); be32(p, 1) // chunk 1: 2 samples
      be32(p, 2); be32(p, 1); be32(p, 1) // chunk 2+: 1 sample
      box("stsc", p) }
    val co64 = { val p = new ArrayBuffer[Byte]()
      be32(p, 0); be32(p, 2); be64(p, chunk1Off); be64(p, chunk2Off); box("co64", p) }
    val stbl = { val p = new ArrayBuffer[Byte](); p ++= stsz; p ++= stsc; p ++= co64; box("stbl", p) }
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    val file = (mdat ++ moov).toArray
    val got = graft.model.Mp4.demux(file)
    assert(got.length === 3)
    s.zip(got).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), s"${a.toSeq} vs ${b.toSeq}")
    }
    // hostile chunk offset past the buffer: valid prefix only, no throw
    val evil = file.clone()
    // co64's second entry (chunk2Off) — find co64 payload: patch last 8 bytes
    // of the co64 box (chunk 2 offset) to a huge value... chunk 2 holds s2,
    // which is demuxed FIRST in chunk order? No: chunk order 1 then 2 —
    // s0, s1 from chunk 1 survive, s2 dropped
    val co64Off = {
      var i = -1
      for (o <- 0 until evil.length - 4)
        if (new String(evil, o, 4, "ISO-8859-1") == "co64") i = o
      i
    }
    java.util.Arrays.fill(evil, co64Off + 12 + 8, co64Off + 12 + 16, 0x7F.toByte)
    val prefix = graft.model.Mp4.demux(evil)
    assert(prefix.length === 2 &&
      java.util.Arrays.equals(prefix(0), s(0)) &&
      java.util.Arrays.equals(prefix(1), s(1)))
  }
}
