package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, PngCodec, Synth}

/** Otsu threshold (q131). Pins (a) a hand bimodal image — the threshold
  * falls between the modes with the exact class stats, (b) a brute-force
  * replica (all 255 thresholds, rational comparison) on seeded images,
  * (c) a constant image yields no row, (d) partition invariance.
  */
class OtsuSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gray(vals: Seq[Int]): Array[Byte] = {
    val px = new Array[Byte](vals.length * 3)
    vals.zipWithIndex.foreach { case (v, i) =>
      px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte; px(3 * i + 2) = v.toByte
    }
    px
  }

  private def df(imgs: Seq[(String, Seq[Int])]) =
    imgs.map { case (id, vals) =>
      (id, PngCodec.encode(gray(vals), 16, 16), 16, 16, "png")
    }.toDF("image_id", "bytes", "w", "h", "fmt")

  /** All 255 thresholds, exact rational argmax (cross-multiplied). */
  private def brute(vals: Seq[Int]): Option[(Long, Long, Long)] = {
    val lum = vals // gray: luma = (299v+587v+114v)/1000 = v
    val n = lum.size.toLong
    val sTot = lum.map(_.toLong).sum
    var best: Option[(Long, Long, Long, BigInt, BigInt)] = None
    for (t <- 1 to 255) {
      val c0 = lum.count(_ < t).toLong
      val s0 = lum.filter(_ < t).map(_.toLong).sum
      if (c0 > 0 && c0 < n) {
        val num = BigInt(s0 * (n - c0) - (sTot - s0) * c0)
        val sc = num * num
        val den = BigInt(c0 * (n - c0))
        val better = best match {
          case None => true
          case Some((_, _, _, bs, bd)) => sc * bd > bs * den
        }
        if (better) best = Some((t.toLong, n - c0, sTot - s0, sc, den))
      }
    }
    best.map { case (t, c1, s1, _, _) => (t, c1, s1) }
  }

  test("hand bimodal image splits between the modes") {
    val vals = Seq.fill(200)(40) ++ Seq.fill(56)(210)
    val got = ImageOps.otsuThreshold(spark, df(Seq(("a", vals)))).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(1) > 40 && r.getLong(1) <= 211)
    assert(r.getLong(2) === 56L && r.getLong(3) === 56L * 210)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === brute(vals).get)
  }

  test("matches the exact-rational brute force on seeded images") {
    val rnd = new scala.util.Random(5)
    val imgs = (0 until 40).map { i =>
      (f"img$i%03d", Seq.fill(256)(rnd.nextInt(256)))
    }
    val got = ImageOps.otsuThreshold(spark, df(imgs)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    imgs.foreach { case (id, vals) =>
      assert(got.get(id) === brute(vals), s"mismatch for $id")
    }
  }

  test("constant image yields no row") {
    assert(ImageOps.otsuThreshold(spark,
      df(Seq(("c", Seq.fill(256)(77))))).count() === 0L)
  }

  test("partition invariance on the synth corpus") {
    val imgs = Synth.withAnchors(
      Synth.images(spark, 400L, 16L).toDF(), 16L)
    val a = ImageOps.otsuThreshold(spark, imgs)
      .orderBy("image_id").collect().toSeq
    val b = ImageOps.otsuThreshold(spark, imgs.repartition(11))
      .orderBy("image_id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
