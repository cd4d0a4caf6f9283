package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, Synth}

/** Bilinear resample (q121). Pins (a) interpolation exactness on a
  * constructed gradient (known closed form at fixed-point positions),
  * (b) identity sampling (stepQ = 256, offQ = 0 reproduces the source
  * grid exactly), (c) brute-force checksum equality on seeded tiles,
  * (d) partition invariance.
  */
class BilinearSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, Array[Byte])]) =
    rows.map { case (id, px) => (id, ImageCodec.encodeRaw(px), 16, 16, "raw") }
      .toDF("image_id", "bytes", "w", "h", "fmt")

  private def bruteSums(px: Array[Byte], outW: Int, outH: Int, stepQ: Int,
                        offQ: Int): (Long, Long) = {
    var vs = 0L; var ws = 0L
    for (j <- 0 until outH; i <- 0 until outW; c <- 0 until 3) {
      val yq = j * stepQ + offQ; val y0 = math.min(yq >> 8, 14)
      val fy = yq - (y0 << 8)
      val xq = i * stepQ + offQ; val x0 = math.min(xq >> 8, 14)
      val fx = xq - (x0 << 8)
      def at(x: Int, y: Int) = px((y * 16 + x) * 3 + c) & 0xFF
      val v = ((256L - fx) * (256L - fy) * at(x0, y0) +
        fx.toLong * (256L - fy) * at(x0 + 1, y0) +
        (256L - fx) * fy.toLong * at(x0, y0 + 1) +
        fx.toLong * fy.toLong * at(x0 + 1, y0 + 1) + 32768L) >> 16
      vs += v; ws += v * ((j * outW + i) * 3 + c + 1)
    }
    (vs, ws)
  }

  test("identity sampling reproduces the source grid") {
    val px = ImageCodec.seededPixels(16, 16, Synth.mix64(4100L))
    val got = ImageOps.bilinearResample(spark, df(Seq(("a", px))),
      outW = 16, outH = 16, stepQ = 256, offQ = 0).head()
    val expVs = px.map(b => (b & 0xFF).toLong).sum
    assert(got.getLong(3) === expVs)
  }

  test("linear gradient interpolates exactly") {
    // px value = 10 * x on every channel → sample at xq is
    // (10·x0·(256−fx) + 10·(x0+1)·fx + rounding) >> 8 = round(10·xq/256)
    val px = new Array[Byte](16 * 16 * 3)
    for (j <- 0 until 256; c <- 0 until 3) px(3 * j + c) = (10 * (j % 16)).toByte
    val got = ImageOps.bilinearResample(spark, df(Seq(("g", px))),
      outW = 12, outH = 12, stepQ = 341, offQ = 42).head()
    val exp = (for (i <- 0 until 12) yield {
      val xq = i * 341 + 42
      // exact expected value of the fixed-point blend on a linear ramp
      val x0 = math.min(xq >> 8, 14); val fx = xq - (x0 << 8)
      (((256L - fx) * 256L * 10 * x0 + fx.toLong * 256L * 10 * (x0 + 1)
        + 32768L) >> 16)
    }).sum * 12 * 3
    assert(got.getLong(3) === exp)
  }

  test("matches brute force on seeded tiles") {
    val rows = (0 until 5).map(i =>
      (f"b$i%02d", ImageCodec.seededPixels(16, 16, Synth.mix64(4200L + i))))
    val got = ImageOps.bilinearResample(spark, df(rows), 12, 12, 341, 42)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    val expect = rows.map { case (id, px) =>
      id -> bruteSums(px, 12, 12, 341, 42)
    }.toMap
    assert(got === expect)
  }

  test("partition invariance") {
    val rows = (0 until 5).map(i =>
      (f"c$i%02d", ImageCodec.seededPixels(16, 16, Synth.mix64(4300L + i))))
    val a = ImageOps.bilinearResample(spark, df(rows), 12, 12, 341, 42)
      .orderBy("image_id").collect().toSeq
    val b = ImageOps.bilinearResample(spark, df(rows).repartition(7),
      12, 12, 341, 42).orderBy("image_id").collect().toSeq
    assert(a === b)
  }
}
