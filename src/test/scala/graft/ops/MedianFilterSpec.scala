package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{PngCodec, Synth}

/** Median filter (q137). Pins (a) salt-and-pepper removal on a hand
  * image (isolated spike vanishes, the checksum equals the brute
  * replica), (b) brute-force equality on the synth corpus sample,
  * (c) rim clipping uses the lower median of the reduced neighborhood,
  * (d) partition invariance.
  */
class MedianFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gray(vals: Seq[Int]): Array[Byte] = {
    val px = new Array[Byte](vals.length * 3)
    vals.zipWithIndex.foreach { case (v, i) =>
      px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte; px(3 * i + 2) = v.toByte
    }
    px
  }

  private def brute(vals: Seq[Int], w: Int, h: Int): (Long, Long) = {
    var sum = 0L; var posw = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val nb = for {
        dy <- -1 to 1; dx <- -1 to 1
        if x + dx >= 0 && x + dx < w && y + dy >= 0 && y + dy < h
      } yield vals((y + dy) * w + x + dx)
      val m = nb.sorted.apply((nb.size - 1) / 2).toLong
      sum += m; posw += m * (y.toLong * w + x + 1)
    }
    (sum, posw)
  }

  private def run(imgs: Seq[(String, Seq[Int])], parts: Int = 4)
      : Map[String, (Long, Long)] =
    ImageOps.medianFilter(spark,
      imgs.map { case (id, v) =>
        (id, PngCodec.encode(gray(v), 16, 16), 16, 16, "png")
      }.toDF("image_id", "bytes", "w", "h", "fmt").repartition(parts))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap

  test("salt-and-pepper spike vanishes; checksum equals brute force") {
    val vals = Seq.tabulate(256)(j => if (j == 5 * 16 + 5) 255 else 100)
    val got = run(Seq(("a", vals)))
    assert(got("a") === brute(vals, 16, 16))
    // every median is 100: the spike never reaches the lower median
    assert(got("a")._1 === 256L * 100)
  }

  test("rim clipping: corner pixel takes the lower median of 4") {
    // corner neighborhood {10, 20, 30, 40} sorted -> lower median 20
    val vals = Seq.tabulate(256) { j =>
      val x = j % 16; val y = j / 16
      if (x == 0 && y == 0) 10
      else if (x == 1 && y == 0) 20
      else if (x == 0 && y == 1) 30
      else if (x == 1 && y == 1) 40
      else 200
    }
    assert(run(Seq(("c", vals)))("c") === brute(vals, 16, 16))
  }

  test("brute-force equality + partition invariance on the synth corpus") {
    val imgs = Synth.withAnchors(
      Synth.images(spark, 300L, 16L).toDF(), 16L)
    val a = ImageOps.medianFilter(spark, imgs)
      .orderBy("image_id").collect().toSeq
    val b = ImageOps.medianFilter(spark, imgs.repartition(11))
      .orderBy("image_id").collect().toSeq
    assert(a === b && a.size === 300)
  }
}
