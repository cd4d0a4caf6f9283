package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, Synth}

/** Round-6: distributed integral image + O(1) box sums (q167). Pins
  * (a) exact agreement with direct pixel sums on random boxes spanning
  * tile boundaries, (b) degenerate boxes (single pixel, single row/col,
  * the whole mosaic), (c) boxes starting at the origin (the X<0 / Y<0
  * SAT≡0 corners), (d) partition invariance of the prefix carries.
  */
class IntegralImageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val side = 4
  private val W = side * 16
  private lazy val tiles = Synth.mosaicTiles(spark, side)

  /** World luma grid straight from the decoded tiles. */
  private lazy val lum: Array[Array[Long]] = {
    val g = Array.ofDim[Long](W, W)
    tiles.select("bytes", "w", "h", "fmt", "tile_x", "tile_y")
      .as[(Array[Byte], Int, Int, String, Int, Int)]
      .collect().foreach { case (bytes, w, h, fmt, tx, ty) =>
        val px = ImageCodec.decode(bytes, fmt, w, h)
        for (j <- 0 until w * h)
          g(ty * 16 + j / w)(tx * 16 + j % w) =
            (299 * (px(3 * j) & 0xFF) + 587 * (px(3 * j + 1) & 0xFF)
              + 114 * (px(3 * j + 2) & 0xFF)) / 1000
      }
    g
  }

  private def direct(b: (Long, Long, Long, Long, Long)): Long =
    (for (y <- b._3 to b._5; x <- b._2 to b._4)
      yield lum(y.toInt)(x.toInt)).sum

  private def run(boxes: Seq[(Long, Long, Long, Long, Long)],
                  parts: Int = 5): Map[Long, Long] =
    ImageOps.integralBoxSums(spark,
        tiles.repartition(parts),
        spark.createDataset(boxes).toDF("box_id", "x0", "y0", "x1", "y1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random boxes across tile boundaries match direct pixel sums") {
    val rnd = new scala.util.Random(3)
    val boxes = (0L until 30L).map { i =>
      val x0 = rnd.nextInt(W); val y0 = rnd.nextInt(W)
      val x1 = math.min(x0 + rnd.nextInt(40), W - 1)
      val y1 = math.min(y0 + rnd.nextInt(40), W - 1)
      (i, x0.toLong, y0.toLong, x1.toLong, y1.toLong)
    }
    val out = run(boxes)
    boxes.foreach(b => assert(out(b._1) === direct(b), s"box $b"))
  }

  test("degenerate and edge boxes: pixel, row, column, origin, full") {
    val boxes = Seq(
      (0L, 17L, 33L, 17L, 33L),          // single pixel mid-mosaic
      (1L, 0L, 0L, 0L, 0L),              // origin pixel (all corners clipped)
      (2L, 0L, 5L, W - 1L, 5L),          // full-width row
      (3L, 40L, 0L, 40L, W - 1L),        // full-height column
      (4L, 0L, 0L, W - 1L, W - 1L))      // the whole mosaic
    val out = run(boxes)
    boxes.foreach(b => assert(out(b._1) === direct(b), s"box $b"))
    assert(out(4L) === lum.map(_.sum).sum)
  }

  test("partition invariance") {
    val boxes = (0L until 10L).map(i =>
      (i, i * 3, i * 5 % W, math.min(i * 3 + 20, W - 1L),
        math.min(i * 5 % W + 11, W - 1L)))
    assert(run(boxes, parts = 1) === run(boxes, parts = 9))
  }
}
