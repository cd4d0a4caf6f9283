package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Windowed PCM energy: decode correctness (sign, endianness), tail-window
  * handling, truth-table agreement, malformed-payload tolerance.
  */
class AudioOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodePcm16: little-endian, signed, odd tail ignored") {
    // 0x0102 = 258; 0xFFFF = -1; 0x8000 = -32768
    val bytes = Array[Byte](0x02, 0x01, 0xFF.toByte, 0xFF.toByte,
      0x00, 0x80.toByte, 0x7F /* odd tail */ )
    assert(AudioOps.decodePcm16(bytes).toSeq === Seq[Short](258, -1, -32768))
    assert(AudioOps.decodePcm16(Array.empty[Byte]).isEmpty)
  }

  test("windowEnergy matches the source-sample truth, tail window kept") {
    import spark.implicits._
    val (clips, truth) = AudioOps.synthClips(spark, 6L, nSamples = 1000,
      window = 300)
    val got = AudioOps.windowEnergy(spark, clips, window = 300)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    // 1000 samples / 300 per window → 3 full + 1 tail of 100
    assert(got.size === 6 * 4)
    got.foreach { case ((_, wi), (n, _)) =>
      assert(n === (if (wi == 3) 100 else 300))
    }
    val expect = truth.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (k, (_, s)) =>
      assert(s === expect(k), s"window $k decoded to a different energy")
    }
    // malformed payloads: empty and odd-length blobs flow through
    val junk = Seq(("j0", Array.empty[Byte]), ("j1", Array[Byte](1)))
      .toDF("clip_id", "bytes")
    assert(AudioOps.windowEnergy(spark, junk, window = 10).count() === 0L)
  }
}
