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

  test("resamplePcm matches a source-sample brute force (WAV and raw)") {
    import spark.implicits._
    for (container <- Seq("wav", "raw")) {
      val (clips, _) = AudioOps.synthClips(spark, 5L, nSamples = 400,
        window = 100, container = container)
      val got = AudioOps.resamplePcm(spark, clips, outN = 300, stepQ = 341)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      val expect = (0 until 5).map { c =>
        val s = Array.tabulate(400)(i =>
          (graft.model.Synth.mix64(c.toLong * 7919L + i) & 0xFFFFL).toShort)
        var vs = 0L; var ws = 0L
        for (k <- 0 until 300) {
          val xq = k * 341; val x0 = math.min(xq >> 8, 398)
          val f = xq - (x0 << 8)
          val v = (((s(x0) + 32768L) * (256L - f)
            + (s(x0 + 1) + 32768L) * f + 128L) >> 8) - 32768L
          vs += v; ws += v * (k + 1)
        }
        f"clip$c%08d" -> ((vs, ws))
      }.toMap
      assert(got === expect, s"container=$container")
    }
  }

  test("resamplePcm identity step reproduces the source sum") {
    import spark.implicits._
    val (clips, _) = AudioOps.synthClips(spark, 3L, nSamples = 400,
      window = 100)
    val got = AudioOps.resamplePcm(spark, clips, outN = 400, stepQ = 256)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    (0 until 3).foreach { c =>
      val s = Array.tabulate(400)(i =>
        (graft.model.Synth.mix64(c.toLong * 7919L + i) & 0xFFFFL).toShort)
      assert(got(f"clip$c%08d") === s.map(_.toLong).sum)
    }
  }

  test("audioFeatures: zcr strictness, peak, abs sum on a hand signal") {
    import spark.implicits._
    // 5, -3, 0, -2, 7: crossings at (5,-3) and (-2,7) ONLY — the 0 sample
    // produces products 0 and 0, neither < 0 (strict contract)
    val pcm = Array[Short](5, -3, 0, -2, 7)
    val raw = new Array[Byte](10)
    pcm.zipWithIndex.foreach { case (v, i) =>
      raw(2 * i) = (v & 0xFF).toByte; raw(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val got = AudioOps.audioFeatures(spark,
      Seq(("h", raw)).toDF("clip_id", "bytes")).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      === ((5L, 2L, 7L, 17L)))
  }

  test("resample/features partition invariance") {
    import spark.implicits._
    val (clips, _) = AudioOps.synthClips(spark, 6L, nSamples = 400,
      window = 100)
    val a = AudioOps.audioFeatures(spark, clips).orderBy("clip_id")
      .collect().toSeq
    val b = AudioOps.audioFeatures(spark, clips.repartition(5))
      .orderBy("clip_id").collect().toSeq
    assert(a === b)
  }
}
