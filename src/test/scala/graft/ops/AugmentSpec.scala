package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.model.ImageCodec

/** ImageOps.augment (q81): brute-force crop/flip checksum equality,
  * flip sensitivity of the weighted sum, determinism, partition invariance.
  */
class AugmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4)
  private val w = 8; private val h = 6
  private val imgs: Seq[(String, Array[Byte], Int, Int, String)] =
    (0 until 12).map { i =>
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      (f"im$i%03d", ImageCodec.encodeRaw(px), w, h, "raw")
    }

  private def brute(id: String, px: Array[Byte], cw: Int, chh: Int,
                    ox: Int, oy: Int, flip: Boolean): (Long, Long) = {
    var s = 0L; var ws = 0L
    for (y <- 0 until chh; x <- 0 until cw; c <- 0 until 3) {
      val sx = ox + (if (flip) cw - 1 - x else x)
      val v = (px(((oy + y) * w + sx) * 3 + c) & 0xFF).toLong
      val k = (y * cw + x) * 3 + c
      s += v; ws += v * (k + 1)
    }
    (s, ws)
  }

  test("checksums match brute force at the reported offsets, any partitioning") {
    val raw = imgs.map { case (id, b, _, _, _) => id -> ImageCodec.decode(b, "raw", w, h) }.toMap
    for (parts <- Seq(1, 5)) {
      val df = imgs.toDF("image_id", "bytes", "w", "h", "fmt").repartition(parts)
      val got = ImageOps.augment(spark, df, cw = 4, ch = 3, seed = 9L).collect()
      assert(got.length === imgs.size)
      got.foreach { r =>
        val id = r.getAs[String]("image_id")
        val (ox, oy) = (r.getAs[Long]("ox").toInt, r.getAs[Long]("oy").toInt)
        val flip = r.getAs[Boolean]("flip")
        assert(ox >= 0 && ox <= w - 4 && oy >= 0 && oy <= h - 3, s"$id bounds")
        val (s, ws) = brute(id, raw(id), 4, 3, ox, oy, flip)
        assert((r.getAs[Long]("aug_sum"), r.getAs[Long]("aug_wsum")) === ((s, ws)), id)
      }
    }
  }

  test("weighted sum is flip-sensitive; plain sum is not") {
    // one asymmetric image: forced flip comparison via brute force
    val px = raw3x1Gradient()
    val (s0, ws0) = bruteOn(px, flip = false)
    val (s1, ws1) = bruteOn(px, flip = true)
    assert(s0 === s1)
    assert(ws0 !== ws1)
  }

  private def raw3x1Gradient(): Array[Byte] = {
    // 4x1 crop over a horizontal gradient — flipping reorders weights
    val p = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      p((y * w + x) * 3 + c) = (x * 30).toByte
    p
  }
  private def bruteOn(px: Array[Byte], flip: Boolean): (Long, Long) =
    brute("x", px, 4, 3, 0, 0, flip)

  test("same seed → identical output; different seed → different offsets somewhere") {
    val df = imgs.toDF("image_id", "bytes", "w", "h", "fmt")
    val a = ImageOps.augment(spark, df, 4, 3, seed = 9L)
      .orderBy("image_id").collect().map(_.toSeq)
    val b = ImageOps.augment(spark, df, 4, 3, seed = 9L)
      .orderBy("image_id").collect().map(_.toSeq)
    val c = ImageOps.augment(spark, df, 4, 3, seed = 10L)
      .orderBy("image_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
  }
}
