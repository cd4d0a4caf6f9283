package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{ImageCodec, PngCodec}

/** Frame sampling over opaque video containers (the last multimodal op of
  * the training-pipeline list: decode / feature-extract / resize /
  * frame-sample).
  *
  * Round 5: the container is a REAL ISO-BMFF (MP4) file — ftyp/mdat/moov
  * with a full sample table, demuxed by a general box-walker
  * ([[graft.model.Mp4]]: co64, largesize, multi-run stsc, multi-trak) —
  * while the sample codec stays the from-scratch PNG (`png ` sample
  * entries; no H.264 decoder ships in this sandbox, documented). The
  * legacy engine-defined `GVID` framing (magic | nFrames | length-prefixed
  * frames, big-endian) still decodes via container sniffing. Spark-side
  * plumbing: the payload stays an opaque binary column with typed
  * metadata, sampling is a typed per-partition flatMap (one demux pass,
  * no payload shuffle — rows carry only the sampled frames onward), and
  * malformed containers route to zero rows instead of failing the job
  * (never-fail contract).
  */
object VideoOps {

  val Magic: Int = 0x47564944 // "GVID"

  /** Pack PNG frames into one container blob. */
  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      8 + frames.map(_.length + 4).sum)
    val d = new java.io.DataOutputStream(out)
    d.writeInt(Magic)
    d.writeInt(frames.length)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    out.toByteArray
  }

  /** Unpack a container into its frames; malformed input (bad magic,
    * truncated frame, implausible counts) yields the frames extracted
    * before the defect — never throws.
    */
  def unpack(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    try {
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (d.readInt() != Magic) return Nil
      val n = d.readInt()
      if (n < 0 || n > (1 << 24)) return Nil
      var i = 0
      var ok = true
      while (i < n && ok) {
        val len = d.readInt()
        if (len < 0 || len > bytes.length) ok = false
        else {
          val f = new Array[Byte](len)
          d.readFully(f)
          out += f
          i += 1
        }
      }
    } catch { case scala.util.control.NonFatal(_) => /* keep what we have */ }
    out.toSeq
  }

  /** Container-sniffing frame extraction: ISO-BMFF boxes → Mp4.demux,
    * GVID magic → unpack, anything else → no frames (never-fail).
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
    if (graft.model.Mp4.sniff(bytes)) graft.model.Mp4.demux(bytes)
    else unpack(bytes)

  /** Sample every `every`-th frame (0, every, 2·every, …) of each video:
    * (video_id, frame_idx, w, h, px_sum) — the decoded-pixel checksum
    * proves each sampled frame round-trips the real PNG decode, not just
    * the container split. One decode pass per video, executed where the
    * payload already lives; only the slim sampled rows continue.
    */
  def sampleFrames(spark: SparkSession, videos: DataFrame,
                   every: Int): DataFrame = {
    import spark.implicits._
    require(every >= 1, "every must be >= 1")
    videos.select("video_id", "bytes").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        frames(bytes).zipWithIndex.collect {
          case (png, idx) if idx % every == 0 =>
            try {
              val (px, w, h) = PngCodec.decode(png)
              var s = 0L
              var i = 0
              while (i < px.length) { s += px(i) & 0xFF; i += 1 }
              (id, idx.toLong, w, h, s)
            } catch {
              case scala.util.control.NonFatal(_) =>
                (id, idx.toLong, -1, -1, -1L) // defective frame, marked
            }
        }
      }
      .toDF("video_id", "frame_idx", "w", "h", "px_sum")
  }

  /** Shot-boundary detection (the video-curation op between demux and
    * frame sampling: split clips at content changes so sampling covers
    * every shot): a boundary is a frame whose pixel-sum differs from its
    * predecessor by more than `threshold`; `shot_id` is the running
    * boundary count. One demux+decode pass per clip where the payload
    * lives, sequential fold over its frames, zero shuffle — only slim
    * (id, idx, sum, boundary, shot) rows continue. A richer per-frame
    * distance (histogram intersection, edge change ratio) is a fold-local
    * function swap, not a plan change.
    */
  def shotBoundaries(spark: SparkSession, videos: DataFrame,
                     threshold: Long): DataFrame = {
    import spark.implicits._
    videos.select("video_id", "bytes").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        var prev = -1L
        var shot = 0L
        frames(bytes).zipWithIndex.map { case (png, idx) =>
          val s = try {
            val (px, _, _) = PngCodec.decode(png)
            var acc = 0L
            var i = 0
            while (i < px.length) { acc += px(i) & 0xFF; i += 1 }
            acc
          } catch { case scala.util.control.NonFatal(_) => -1L }
          val boundary = idx > 0 && math.abs(s - prev) > threshold
          if (boundary) shot += 1
          prev = s
          (id, idx.toLong, s, boundary, shot)
        }
      }
      .toDF("video_id", "frame_idx", "px_sum", "boundary", "shot_id")
  }

  /** Deterministic synthetic videos: `nFrames` seeded 8×8 PNG frames per
    * video, containered as real MP4 files (`container = "mp4"`, the gated
    * default) or the legacy GVID framing. Returns (videos, frameTruth):
    * the truth table carries every frame's pixel sum computed from the
    * SOURCE pixels BEFORE encoding, so the oracle never shares the
    * engine's demux/decode path.
    */
  def synthVideos(spark: SparkSession, n: Long, nFrames: Int,
                  container: String = "mp4"): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parts = math.max(1, math.min(64, n / 256 + 1)).toInt
    val rows = spark.range(0L, n, 1L, parts).as[Long].map { v =>
      val frames = (0 until nFrames).map { f =>
        ImageCodec.seededPixels(8, 8, graft.model.Synth.mix64(v * 1000003L + f))
      }
      val sums = frames.map(px => px.map(b => (b & 0xFF).toLong).sum)
      val pngs = frames.map(px => ImageCodec.encodePng(px, 8, 8))
      val blob = if (container == "mp4") graft.model.Mp4.mux(pngs, 8, 8)
                 else pack(pngs)
      (f"vid$v%08d", blob, nFrames, sums)
    }
    val videos = rows.map(r => (r._1, r._2, r._3))
      .toDF("video_id", "bytes", "n_frames")
    val truth = rows.flatMap(r => r._4.zipWithIndex.map {
      case (s, i) => (r._1, i.toLong, s)
    }).toDF("video_id", "frame_idx", "px_sum")
    (videos, truth)
  }
}
