package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Audio feature extraction over opaque PCM blobs — the audio leg of the
  * multimodal list (image: codec + dHash, video: frame sampling, audio:
  * windowed energy).
  *
  * No audio codecs ship in this container, so the payload is raw 16-bit
  * little-endian PCM (the decode a real pipeline would get from its
  * demuxer); the Spark-side plumbing is the production shape: opaque
  * binary column + typed metadata, one decode pass per clip executed where
  * the payload lives, slim feature rows onward. Energy is summed in exact
  * integer math (Σ|sample| per window), so the oracle replays it without
  * float drift.
  */
object AudioOps {

  /** Decode 16-bit LE PCM; odd trailing byte ignored (never-fail). */
  def decodePcm16(bytes: Array[Byte]): Array[Short] = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  private def le32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    o + 4 <= b.length && (0 until 4).forall(i => b(o + i) == t.charAt(i).toByte)

  /** Minimal RIFF/WAVE container (round-5 item #8, public spec): mono
    * 16-bit LE PCM, canonical 44-byte header + data chunk.
    */
  def encodeWav(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tagW(o: Int, t: String): Unit =
      (0 until 4).foreach(i => out(o + i) = t.charAt(i).toByte)
    tagW(0, "RIFF"); le32(out, 4, 36 + dataLen); tagW(8, "WAVE")
    tagW(12, "fmt "); le32(out, 16, 16)
    out(20) = 1; out(21) = 0 // PCM
    out(22) = 1; out(23) = 0 // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    out(32) = 2; out(33) = 0 // block align
    out(34) = 16; out(35) = 0 // bits/sample
    tagW(36, "data"); le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xFF).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Container-sniffing decode (never-fail): a RIFF/WAVE payload walks the
    * chunk list (even-padded, per the spec) to the first `data` chunk and
    * decodes its PCM16 (clamped to the available bytes); a malformed RIFF
    * (truncated header, no data chunk, insane sizes) yields an EMPTY clip,
    * never an exception and never header bytes misread as audio; anything
    * without the RIFF magic is raw 16-bit LE PCM (the engine's internal
    * format — back-compat).
    */
  def decodePcmAuto(bytes: Array[Byte]): Array[Short] = {
    if (!tag(bytes, 0, "RIFF")) return decodePcm16(bytes)
    if (bytes.length < 12 || !tag(bytes, 8, "WAVE")) return Array.empty
    var o = 12
    while (o + 8 <= bytes.length) {
      val size = rdLe32(bytes, o + 4)
      if (size < 0) return Array.empty
      if (tag(bytes, o, "data")) {
        val avail = math.min(size.toLong, (bytes.length - o - 8).toLong).toInt
        return decodePcm16(java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + avail))
      }
      o += 8 + size + (size & 1) // chunks pad to even length
    }
    Array.empty
  }

  /** Per-window absolute-amplitude energy: (clip_id, window_idx, n_samples,
    * abs_sum). The tail window (< `window` samples) is kept with its true
    * sample count.
    */
  def windowEnergy(spark: SparkSession, clips: DataFrame,
                   window: Int): DataFrame = {
    import spark.implicits._
    require(window >= 1, "window must be >= 1")
    clips.select("clip_id", "bytes").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val pcm = decodePcmAuto(bytes)
        pcm.grouped(window).zipWithIndex.map { case (w, idx) =>
          var s = 0L
          var i = 0
          while (i < w.length) { s += math.abs(w(i).toLong); i += 1 }
          (id, idx.toLong, w.length, s)
        }
      }
      .toDF("clip_id", "window_idx", "n_samples", "abs_sum")
  }

  /** Deterministic synthetic clips: `nSamples` seeded 16-bit samples per
    * clip, packed as REAL RIFF/WAVE files (`container = "wav"`, the gated
    * default — round-5 item #8) or raw LE PCM. Returns (clips,
    * windowTruth): the truth table carries every window's |sample| sum
    * computed from the SOURCE samples before containerization, so the
    * oracle never shares the engine's demux/decode path.
    */
  def synthClips(spark: SparkSession, n: Long, nSamples: Int,
                 window: Int, container: String = "wav"): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parts = math.max(1, math.min(64, n / 256 + 1)).toInt
    val rows = spark.range(0L, n, 1L, parts).as[Long].map { c =>
      val samples = Array.tabulate(nSamples) { i =>
        (graft.model.Synth.mix64(c * 7919L + i) & 0xFFFFL).toShort
      }
      val bytes =
        if (container == "wav") encodeWav(samples)
        else {
          val raw = new Array[Byte](nSamples * 2)
          var i = 0
          while (i < nSamples) {
            raw(2 * i) = (samples(i) & 0xFF).toByte
            raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
            i += 1
          }
          raw
        }
      val sums = samples.grouped(window).map(w =>
        w.map(x => math.abs(x.toLong)).sum).toSeq
      (f"clip$c%08d", bytes, nSamples, sums)
    }
    val clips = rows.map(r => (r._1, r._2, r._3))
      .toDF("clip_id", "bytes", "n_samples")
    val truth = rows.flatMap(r => r._4.zipWithIndex.map {
      case (s, i) => (r._1, i.toLong, s)
    }).toDF("clip_id", "window_idx", "abs_sum")
    (clips, truth)
  }

  /** SOURCE sample table for the resample/feature oracles: regenerates the
    * exact [[synthClips]] sample formula (shared constant 7919) as slim
    * (clip_id, samples) rows — the oracle reads these, never the engine's
    * demux/decode path (the video_frames discipline).
    */
  def synthSampleTable(spark: SparkSession, n: Long,
                       nSamples: Int): DataFrame = {
    import spark.implicits._
    val parts = math.max(1, math.min(64, n / 256 + 1)).toInt
    spark.range(0L, n, 1L, parts).as[Long].map { c =>
      (f"clip$c%08d", (0 until nSamples).map(i =>
        (graft.model.Synth.mix64(c * 7919L + i) & 0xFFFFL).toShort.toInt))
    }.toDF("clip_id", "samples")
  }

  /** Linear-interpolation PCM resampling (the sample-rate conversion step
    * of an audio-curation pipeline) with 8-bit fixed-point positions:
    * output k reads source position (k·stepQ)/256 and blends the two
    * neighbors. The blend biases samples to non-negative (+32768) before
    * the >> 8 so the shift IS floor division on both engines — exact
    * integer math end to end, SQL-replayable. Emits per-clip checksums
    * (signed value sum + position-weighted sum — pins every output
    * sample); resampled payloads stay where a sink would consume them.
    */
  def resamplePcm(spark: SparkSession, clips: DataFrame, outN: Int,
                  stepQ: Int): DataFrame = {
    import spark.implicits._
    clips.select("clip_id", "bytes").as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        val pcm = decodePcmAuto(bytes)
        var vSum = 0L
        var wSum = 0L
        var k = 0
        while (k < outN) {
          val xq = k * stepQ
          val x0 = math.min(xq >> 8, pcm.length - 2)
          val f = xq - (x0 << 8)
          val v = (((pcm(x0) + 32768L) * (256L - f)
            + (pcm(x0 + 1) + 32768L) * f + 128L) >> 8) - 32768L
          vSum += v
          wSum += v * (k + 1)
          k += 1
        }
        (id, outN.toLong, vSum, wSum)
      }
      .toDF("clip_id", "n_out", "v_sum", "vw_sum")
  }

  /** Per-clip audio features (the curation stats an audio pipeline filters
    * on): strict zero-crossing count (s·s′ < 0 — zeros never cross, so the
    * count is deterministic), peak |sample|, and the exact |sample| sum.
    * One decode pass, zero shuffle, slim stat rows.
    */
  def audioFeatures(spark: SparkSession, clips: DataFrame): DataFrame = {
    import spark.implicits._
    clips.select("clip_id", "bytes").as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        val pcm = decodePcmAuto(bytes)
        var zcr = 0L
        var peak = 0L
        var absSum = 0L
        var i = 0
        while (i < pcm.length) {
          val a = math.abs(pcm(i).toLong)
          if (a > peak) peak = a
          absSum += a
          if (i > 0 && pcm(i - 1).toLong * pcm(i) < 0) zcr += 1
          i += 1
        }
        (id, pcm.length.toLong, zcr, peak, absSum)
      }
      .toDF("clip_id", "n_samples", "zcr", "peak", "abs_sum")
  }
}
