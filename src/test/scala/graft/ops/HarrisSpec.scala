package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: Harris corners. Pins the detector's qualitative contract on
  * hand-built 16×16 fixtures — a corner junction fires, flat fields and
  * straight edges do not (edge responses are negative by construction of
  * R = 16·det − trace²), symmetric plateaus die to strict NMS — plus
  * partition invariance on a mixed batch.
  */
class HarrisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Build a 16×16 raw RGB image from a luma function (0..255). */
  private def img(id: String, f: (Int, Int) => Int)
      : (String, Array[Byte], Int, Int, String) = {
    val px = new Array[Byte](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      px((y * 16 + x) * 3 + c) = f(x, y).toByte
    (id, px, 16, 16, "raw")
  }

  private def run(imgs: Seq[(String, Array[Byte], Int, Int, String)],
                  thr: Long, parts: Int = 4): Map[String, (Long, Long)] = {
    import spark.implicits._
    val df = spark.createDataFrame(imgs)
      .toDF("image_id", "bytes", "w", "h", "fmt").repartition(parts)
    ImageOps.harrisCorners(spark, df, thr).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("corner fires; flat and straight edges do not") {
    val corner = img("corner", (x, y) => if (x >= 8 && y >= 8) 220 else 30)
    val flat = img("flat", (_, _) => 128)
    val edge = img("edge", (x, _) => if (x >= 8) 220 else 30)
    val got = run(Seq(corner, flat, edge), thr = 0L)
    assert(got.contains("corner"), "the L-junction must yield a corner")
    assert(!got.contains("flat"), "flat field has zero response")
    assert(!got.contains("edge"),
      "a straight edge has det ~ 0, so R < 0 everywhere")
  }

  test("strict NMS kills symmetric plateaus") {
    // a centered bright square: its four corners produce EQUAL responses
    // at symmetric positions — each is still a strict local max in its
    // own 3x3 window, so they all fire; a RIDGE of equal responses does
    // not. Build a 2px-wide bright band -> responses tie along the band.
    val band = img("band", (x, y) => if (y == 8 || y == 9) 220 else 30)
    val got = run(Seq(band), thr = 0L)
    assert(!got.contains("band"),
      "band responses tie along x, so strict NMS keeps none")
  }

  test("threshold suppresses weak responses") {
    val corner = img("c", (x, y) => if (x >= 8 && y >= 8) 220 else 30)
    assert(run(Seq(corner), thr = 0L).contains("c"))
    // a threshold past the max response kills everything
    assert(run(Seq(corner), thr = Long.MaxValue / 2).isEmpty)
  }

  test("partition invariance") {
    val imgs = (0 until 12).map { i =>
      img(s"i$i", (x, y) =>
        ((graft.model.Synth.mix64(i * 289L + y * 16 + x) & 0x7f) + 60).toInt)
    }
    assert(run(imgs, 1000000000000L, parts = 1) ===
      run(imgs, 1000000000000L, parts = 7))
  }
}
