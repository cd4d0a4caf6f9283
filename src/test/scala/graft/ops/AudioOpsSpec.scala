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

  test("WAV round trip: RIFF header exact, chunk walk, never-fail demux " +
    "(round-5 item #8)") {
    val samples = Array[Short](258, -1, -32768, 0, 12345)
    val wav = AudioOps.encodeWav(samples, sampleRate = 8000)
    // canonical header fields
    assert(new String(wav.slice(0, 4), "ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "ASCII") === "WAVE")
    assert(new String(wav.slice(36, 40), "ASCII") === "data")
    assert(wav.length === 44 + samples.length * 2)
    assert(AudioOps.decodePcmAuto(wav).toSeq === samples.toSeq)
    // an extra chunk before data (odd size → even padding) still demuxes
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val shifted = wav.slice(0, 12) ++ extra ++ wav.slice(12, wav.length)
    assert(AudioOps.decodePcmAuto(shifted).toSeq === samples.toSeq)
    // malformed RIFFs → empty, never header bytes misread as audio
    assert(AudioOps.decodePcmAuto("RIFF".getBytes("ASCII")).isEmpty)
    assert(AudioOps.decodePcmAuto("RIFFxxxxJUNK".getBytes("ASCII")).isEmpty)
    val truncated = wav.slice(0, 40) // data tag cut mid-header
    assert(AudioOps.decodePcmAuto(truncated).isEmpty)
    val negSize = wav.clone()
    negSize(43) = 0x80.toByte // data size < 0
    assert(AudioOps.decodePcmAuto(negSize).isEmpty)
    // a data chunk CLAIMING more than the file has clamps to what's there
    val lying = wav.clone()
    lying(40) = 0x7F // huge declared size
    assert(AudioOps.decodePcmAuto(lying).toSeq === samples.toSeq)
    // non-RIFF bytes keep the raw-PCM16 back-compat path
    assert(AudioOps.decodePcmAuto(Array[Byte](0x02, 0x01)).toSeq ===
      Seq[Short](258))
  }

  test("windowEnergy over WAV-containered clips equals the source truth") {
    val (clips, truth) = AudioOps.synthClips(spark, 4L, nSamples = 900,
      window = 300, container = "wav")
    val got = AudioOps.windowEnergy(spark, clips, window = 300)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val expect = truth.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    // raw container still agrees (same samples, same truth)
    val (rawClips, _) = AudioOps.synthClips(spark, 4L, nSamples = 900,
      window = 300, container = "raw")
    val gotRaw = AudioOps.windowEnergy(spark, rawClips, window = 300)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(gotRaw === expect)
  }
}
