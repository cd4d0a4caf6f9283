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
}
