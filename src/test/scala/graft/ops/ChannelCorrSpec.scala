package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{PngCodec, Synth}

/** Channel correlation (q151). Pins (a) identical channels give exactly
  * 1e9 and the grayish flag, (b) anti-correlated channels give −1e9,
  * (c) a constant channel emits no row, (d) brute equality + partition
  * invariance on the synth corpus.
  */
class ChannelCorrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(id: String, rg: Seq[(Int, Int)]) = {
    val px = new Array[Byte](768)
    rg.zipWithIndex.foreach { case ((r, g), i) =>
      px(3 * i) = r.toByte; px(3 * i + 1) = g.toByte; px(3 * i + 2) = 0
    }
    (id, PngCodec.encode(px, 16, 16), 16, 16, "png")
  }

  private def run(imgs: Seq[(String, Array[Byte], Int, Int, String)],
                  parts: Int = 4): Map[String, (Long, Boolean)] =
    ImageOps.channelCorrelation(spark,
      imgs.toDF("image_id", "bytes", "w", "h", "fmt").repartition(parts))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap

  test("identical channels: exactly 1e9, grayish") {
    val vals = (0 until 256).map(i => (i % 200 + 10, i % 200 + 10))
    val got = run(Seq(img("a", vals)))
    assert(got("a") === ((1000000000L, true)))
  }

  test("anti-correlated channels: exactly -1e9") {
    val vals = (0 until 256).map(i => (i % 200, 199 - i % 200))
    val got = run(Seq(img("b", vals)))
    assert(got("b") === ((-1000000000L, false)))
  }

  test("constant channel emits no row") {
    val vals = (0 until 256).map(i => (100, i % 200))
    assert(run(Seq(img("c", vals))).isEmpty)
  }

  test("brute equality + partition invariance on the synth corpus") {
    val imgs = Synth.withAnchors(Synth.images(spark, 300L, 16L).toDF(), 16L)
    val a = ImageOps.channelCorrelation(spark, imgs)
      .orderBy("image_id").collect().toSeq
    val b = ImageOps.channelCorrelation(spark, imgs.repartition(11))
      .orderBy("image_id").collect().toSeq
    assert(a === b && a.nonEmpty)
    // independent replica on one collected image
    val one = imgs.limit(1).select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)].head()
    val px = graft.model.ImageCodec.decode(one._2, one._5, one._3, one._4)
    val n = 256L
    var sr = 0L; var sg = 0L; var srr = 0L; var sgg = 0L; var srg = 0L
    for (j <- 0 until 256) {
      val r = px(3 * j) & 0xFF; val g = px(3 * j + 1) & 0xFF
      sr += r; sg += g; srr += r.toLong * r; sgg += g.toLong * g
      srg += r.toLong * g
    }
    val expect = math.round((n * srg - sr * sg).toDouble /
      math.sqrt((n * srr - sr * sr).toDouble * (n * sgg - sg * sg))
      * 1e9)
    assert(a.find(_.getString(0) == one._1).get.getLong(1) === expect)
  }
}
