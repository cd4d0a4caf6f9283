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
        val pcm = decodePcm16(bytes)
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
    * clip. Returns (clips, windowTruth): the truth table carries every
    * window's |sample| sum computed from the SOURCE samples before byte
    * packing, so the oracle never shares the engine's decode path.
    */
  def synthClips(spark: SparkSession, n: Long, nSamples: Int,
                 window: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parts = math.max(1, math.min(64, n / 256 + 1)).toInt
    val rows = spark.range(0L, n, 1L, parts).as[Long].map { c =>
      val samples = Array.tabulate(nSamples) { i =>
        (graft.model.Synth.mix64(c * 7919L + i) & 0xFFFFL).toShort
      }
      val bytes = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        bytes(2 * i) = (samples(i) & 0xFF).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
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
}
