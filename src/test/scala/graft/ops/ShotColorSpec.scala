package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** shotBoundaries (q89) + dominantColor (q90): truth-table / brute-force
  * equality on deterministic fixtures.
  */
class ShotColorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shot boundaries match a fold over the source-pixel truth table") {
    val (videos, truth) = VideoOps.synthVideos(spark, 6L, nFrames = 12)
    val out = VideoOps.shotBoundaries(spark, videos, threshold = 2000L)
      .orderBy("video_id", "frame_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    val expect = truth.orderBy("video_id", "frame_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (vid, fs) =>
        var prev = -1L; var shot = 0L
        fs.sortBy(_._2).map { case (_, idx, s) =>
          val b = idx > 0 && math.abs(s - prev) > 2000L
          if (b) shot += 1
          prev = s
          (vid, idx, s, b, shot)
        }
      }
    assert(out.toSeq === expect)
    assert(out.exists(_._4), "fixture should contain at least one boundary")
    assert(out.exists(r => r._2 > 0 && !r._4),
      "fixture should contain at least one non-boundary continuation")
  }

  test("dominant color matches brute force; ties go to the smallest code") {
    // hand-built tie: half pixels code A, half code B, A < B → A wins
    val w = 4; val h = 2
    val px = new Array[Byte](w * h * 3)
    for (j <- 0 until w * h) {
      val (r, g, b) = if (j % 2 == 0) (16, 32, 48) else (240, 224, 208)
      px(3 * j) = r.toByte; px(3 * j + 1) = g.toByte; px(3 * j + 2) = b.toByte
    }
    val imgs = (Seq(("tie", ImageCodec.encodeRaw(px), w, h, "raw")) ++
      graft.model.Synth.images(spark, 16L, 4L).collect()
        .map(r => (r.image_id, r.bytes, r.w, r.h, r.fmt)))
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val out = ImageOps.dominantColor(spark, imgs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("tie") === ((1 * 256 + 2 * 16 + 3).toLong, 4L, 2L))
    imgs.as[(String, Array[Byte], Int, Int, String)].collect().foreach {
      case (id, bytes, iw, ih, fmt) =>
        val p = ImageCodec.decode(bytes, fmt, iw, ih)
        val counts = scala.collection.mutable.Map.empty[Int, Int]
        for (j <- 0 until iw * ih) {
          val code = ((p(3 * j) & 0xFF) / 16) * 256 +
            ((p(3 * j + 1) & 0xFF) / 16) * 16 + (p(3 * j + 2) & 0xFF) / 16
          counts(code) = counts.getOrElse(code, 0) + 1
        }
        val (bc, bn) = counts.toSeq.sortBy { case (c, n) => (-n, c) }.head
        assert(out(id) === ((bc.toLong, bn.toLong, counts.size.toLong)), id)
    }
  }
}
