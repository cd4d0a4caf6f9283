package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, Synth}

/** Histogram equalization (q115): per-image CDF remap of integer BT.601
  * luma. Pins (a) brute-force equality on seeded images, (b) the
  * constant-image edge (n_px = cdf_min → eq = 0, no division), (c) the
  * full-range property (lowest occupied bin → 0, highest → 255 when the
  * image is not constant), (d) partition invariance.
  */
class HistEqualizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seeded(n: Int) = (0 until n).map { i =>
    val px = ImageCodec.seededPixels(16, 16, Synth.mix64(900L + i))
    (f"he$i%02d", ImageCodec.encodePng(px, 16, 16), 16, 16, "png")
  }

  private def brute(id: String, px: Array[Byte])
      : Seq[(String, Long, Long, Long, Long)] = {
    val lums = (0 until 256).map(j => (299 * (px(3 * j) & 0xFF) +
      587 * (px(3 * j + 1) & 0xFF) + 114 * (px(3 * j + 2) & 0xFF)) / 1000)
    val hist = lums.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cdfMin = hist(hist.keys.min)
    var cdf = 0L
    hist.keys.toSeq.sorted.map { l =>
      cdf += hist(l)
      val eq = if (256L > cdfMin) (cdf - cdfMin) * 255L / (256L - cdfMin)
               else 0L
      (id, l.toLong, hist(l), cdf, eq)
    }
  }

  test("matches brute force on seeded images") {
    val rows = seeded(6)
    val df = rows.toDF("image_id", "bytes", "w", "h", "fmt")
    val got = ImageOps.histogramEqualize(spark, df)
      .orderBy("image_id", "lum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val expect = rows.flatMap { case (id, bytes, _, _, _) =>
      brute(id, ImageCodec.decodePng(bytes)._1)
    }.sortBy(t => (t._1, t._2))
    assert(got === expect)
    // non-constant images span the full output range
    val byImg = got.groupBy(_._1)
    byImg.values.foreach { rs =>
      assert(rs.map(_._5).min === 0L)
      assert(rs.map(_._5).max === 255L)
    }
  }

  test("constant image maps to eq = 0 without dividing") {
    val px = Array.fill(16 * 16 * 3)(77.toByte)
    val df = Seq(("const", ImageCodec.encodeRaw(px), 16, 16, "raw"))
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val got = ImageOps.histogramEqualize(spark, df).collect()
    assert(got.length === 1)
    assert(got(0).getLong(2) === 256L) // one bin holds every pixel
    assert(got(0).getLong(4) === 0L)
  }

  test("partition invariance") {
    val df = seeded(6).toDF("image_id", "bytes", "w", "h", "fmt")
    val a = ImageOps.histogramEqualize(spark, df)
      .orderBy("image_id", "lum").collect().toSeq
    val b = ImageOps.histogramEqualize(spark, df.repartition(5))
      .orderBy("image_id", "lum").collect().toSeq
    assert(a === b)
  }
}
