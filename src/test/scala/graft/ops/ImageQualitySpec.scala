package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** qualityStats (q85): brute-force equality of the integer sums, the flat /
  * checkerboard extremes, and the sharp-gate threshold semantics.
  */
class ImageQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(id: String, px: Array[Byte], w: Int, h: Int) =
    (id, ImageCodec.encodeRaw(px), w, h, "raw")

  private def flat(w: Int, h: Int, v: Int): Array[Byte] =
    Array.fill(w * h * 3)(v.toByte)

  private def checker(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      out((y * w + x) * 3 + c) = if ((x + y) % 2 == 0) 0.toByte else 255.toByte
    out
  }

  private def brute(px: Array[Byte], w: Int, h: Int): (Long, Long, Long) = {
    val lum = Array.tabulate(w * h) { j =>
      (299 * (px(3 * j) & 0xFF) + 587 * (px(3 * j + 1) & 0xFF) +
        114 * (px(3 * j + 2) & 0xFF)) / 1000
    }
    var ls = 0L; var l2 = 0L; var lumaSum = 0L
    lum.foreach(lumaSum += _)
    for (y <- 1 until h - 1; x <- 1 until w - 1) {
      val c = y * w + x
      val l = 4 * lum(c) - lum(c - 1) - lum(c + 1) - lum(c - w) - lum(c + w)
      ls += l; l2 += l.toLong * l
    }
    (ls, l2, lumaSum)
  }

  test("flat image has zero blur variance and is not sharp") {
    val df = Seq(img("flat", flat(8, 8, 77), 8, 8))
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val r = ImageOps.qualityStats(spark, df, 10.0).collect().head
    assert(r.getAs[Long]("lap_sum") === 0L)
    assert(r.getAs[Long]("lap_sq_sum") === 0L)
    assert(r.getAs[Double]("blur_var_raw") === 0.0)
    assert(r.getAs[Double]("mean_luma_raw") === 77.0) // weights sum to 1000
    assert(!r.getAs[Boolean]("sharp"))
  }

  test("checkerboard maximizes the Laplacian; sums match brute force") {
    val px = checker(10, 6)
    val df = Seq(img("chk", px, 10, 6), img("fl", flat(10, 6, 200), 10, 6))
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val out = ImageOps.qualityStats(spark, df, 1000.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val (ls, l2, _) = brute(px, 10, 6)
    val chk = out("chk")
    assert(chk.getAs[Long]("n_int") === 32L)
    assert(chk.getAs[Long]("lap_sum") === ls)
    assert(chk.getAs[Long]("lap_sq_sum") === l2)
    assert(chk.getAs[Boolean]("sharp"))
    assert(!out("fl").getAs[Boolean]("sharp"))
    // checkerboard: every interior lap = ±8*255-ish, variance >> threshold
    assert(chk.getAs[Double]("blur_var_raw") > 100000.0)
  }

  test("seeded noise images match brute force decoded via either codec") {
    val imgs = graft.model.Synth.images(spark, 32L, 4L).toDF()
    val out = ImageOps.qualityStats(spark, imgs, 48500.0).collect()
      .map(r => r.getString(0) -> r).toMap
    val src = imgs.select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)].collect()
    src.foreach { case (id, bytes, w, h, fmt) =>
      val (ls, l2, lu) = brute(ImageCodec.decode(bytes, fmt, w, h), w, h)
      val r = out(id)
      assert(r.getAs[Long]("lap_sum") === ls, id)
      assert(r.getAs[Long]("lap_sq_sum") === l2, id)
      val nInt = ((w - 2) * (h - 2)).toLong
      val v = (l2.toDouble - ls.toDouble * ls.toDouble / nInt) / nInt
      assert(r.getAs[Double]("blur_var_raw") === v, id)
      assert(r.getAs[Double]("mean_luma_raw") === lu.toDouble / (w * h), id)
      assert(r.getAs[Boolean]("sharp") === (v >= 48500.0), id)
    }
  }
}
