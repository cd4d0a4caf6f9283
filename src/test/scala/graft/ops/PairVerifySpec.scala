package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** q113 exact pair verification: per-pair SAD/MAE over decoded pixels. */
class PairVerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SAD and milli-MAE match brute force, including a planted diff") {
    val base = ImageCodec.seededPixels(16, 16, 42L)
    val tweaked = base.clone()
    tweaked(0) = (tweaked(0) ^ 0x7).toByte   // |diff| = known at channel 0
    tweaked(100) = (tweaked(100) ^ 0x30).toByte
    val imgs = Seq(
      ("a", ImageCodec.encodePng(base, 16, 16), 16, 16, "png"),
      ("b", ImageCodec.encodePng(tweaked, 16, 16), 16, 16, "png"),
      ("c", ImageCodec.encodePng(base, 16, 16), 16, 16, "png"))
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("img_a", "img_b")
    val sadAB = (0 until 768).map(i =>
      math.abs((base(i) & 0xFF) - (tweaked(i) & 0xFF)).toLong).sum
    val byPair = ImageOps.pairPixelSad(spark, imgs, pairs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(byPair(("a", "b")) === ((sadAB, 768L, sadAB * 1000 / 768)))
    assert(byPair(("a", "c")) === ((0L, 768L, 0L)))
    assert(sadAB > 0L)
  }
}
