package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, Synth}

/** Cross-tile 3×3 morphology (q127). Pins (a) whole-raster brute-force
  * equality on the seeded mosaic (clipped rim neighborhoods, cross-tile
  * windows), (b) a hand fixture — one dark pixel at a tile corner erodes
  * all four tiles that touch it, (c) partition invariance.
  */
class MorphologySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def resultMap(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), (Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  private def brute(tiles: Seq[(Int, Int, Array[Byte], Int, Int, String)])
      : Map[(Long, Long), (Long, Long, Long)] = {
    val lum = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    tiles.foreach { case (tx, ty, bytes, w, h, fmt) =>
      val px = ImageCodec.decode(bytes, fmt, w, h)
      for (j <- 0 until w * h)
        lum((tx.toLong * w + j % w, ty.toLong * h + j / w)) =
          (299 * (px(3 * j) & 0xFF) + 587 * (px(3 * j + 1) & 0xFF) +
            114 * (px(3 * j + 2) & 0xFF)) / 1000
    }
    val acc = scala.collection.mutable.HashMap
      .empty[(Long, Long), (Long, Long, Long)]
    lum.foreach { case ((wx, wy), _) =>
      val nb = for {
        dx <- -1 to 1; dy <- -1 to 1
        v <- lum.get((wx + dx, wy + dy))
      } yield v
      val t = (wx / 16, wy / 16)
      val edge =
        if (wx % 16 == 0 || wx % 16 == 15 || wy % 16 == 0 || wy % 16 == 15)
          1L else 0L
      val (e, dl, ne) = acc.getOrElse(t, (0L, 0L, 0L))
      acc(t) = (e + nb.min, dl + nb.max, ne + edge)
    }
    acc.toMap
  }

  test("matches whole-raster brute force on the seeded mosaic") {
    val tilesDf = Synth.mosaicTiles(spark, side = 4)
    val rows = tilesDf.select("tile_x", "tile_y", "bytes", "w", "h", "fmt")
      .as[(Int, Int, Array[Byte], Int, Int, String)].collect().toSeq
    assert(resultMap(ImageOps.morphology(spark, tilesDf)) === brute(rows))
  }

  test("dark pixel at a tile corner erodes all four touching tiles") {
    // 2×2 mosaic of uniform gray 16×16 tiles; one black pixel at the
    // world center (15,15) — the corner shared by all four tiles
    def tile(tx: Int, ty: Int): (Int, Int, Array[Byte], Int, Int, String) = {
      val px = Array.fill(16 * 16 * 3)(200.toByte)
      if (tx == 0 && ty == 0) {
        px(3 * (15 * 16 + 15)) = 0; px(3 * (15 * 16 + 15) + 1) = 0
        px(3 * (15 * 16 + 15) + 2) = 0
      }
      (tx, ty, graft.model.PngCodec.encode(px, 16, 16), 16, 16, "png")
    }
    val tiles = Seq(tile(0, 0), tile(1, 0), tile(0, 1), tile(1, 1))
    val df = tiles.toDF("tile_x", "tile_y", "bytes", "w", "h", "fmt")
    val got = resultMap(ImageOps.morphology(spark, df))
    assert(got === brute(tiles))
    // uniform luma 200; the black pixel pulls the 3×3 min to 0 for itself
    // and its neighbors — (0,0) loses 4 windows, the others 2/2/1
    val full = 256L * 200L
    assert(got((0L, 0L))._1 === full - 4 * 200L)
    assert(got((1L, 0L))._1 === full - 2 * 200L)
    assert(got((0L, 1L))._1 === full - 2 * 200L)
    assert(got((1L, 1L))._1 === full - 1 * 200L)
    // dilation is untouched: max stays 200 everywhere
    assert(got.values.forall(_._2 === full))
  }

  test("partition invariance") {
    val tilesDf = Synth.mosaicTiles(spark, side = 5)
    val a = resultMap(ImageOps.morphology(spark, tilesDf))
    val b = resultMap(ImageOps.morphology(spark, tilesDf.repartition(13)))
    assert(a === b && a.size === 25)
  }
}
