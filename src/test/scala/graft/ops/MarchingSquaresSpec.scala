package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, Synth}

/** Marching squares (q120). Pins (a) whole-raster brute-force equality on
  * the seeded mosaic incl. the straddle breakout, (b) a hand fixture — a
  * single bright pixel at a tile corner produces exactly the four corner
  * cases (1/2/4/8), all straddling, (c) the saddle fixture (case 5 → 2
  * segments), (d) partition invariance.
  */
class MarchingSquaresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def resultMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  private def brute(tiles: Seq[(Int, Int, Array[Byte], Int, Int, String)])
      : Map[Long, (Long, Long, Long)] = {
    val b = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    var maxX = 0L; var maxY = 0L
    tiles.foreach { case (tx, ty, bytes, w, h, fmt) =>
      val px = ImageCodec.decode(bytes, fmt, w, h)
      for (j <- 0 until w * h) {
        val lum = (299 * (px(3 * j) & 0xFF) + 587 * (px(3 * j + 1) & 0xFF) +
          114 * (px(3 * j + 2) & 0xFF)) / 1000
        val wx = tx.toLong * w + j % w; val wy = ty.toLong * h + j / w
        b((wx, wy)) = if (lum >= 128) 1 else 0
        maxX = math.max(maxX, wx); maxY = math.max(maxY, wy)
      }
    }
    val cc = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    for (cy <- 0L until maxY; cx <- 0L until maxX) {
      // only cells whose 4 corners all exist (sparse hand fixtures may
      // not tile a full rectangle)
      val corners = Seq((cx, cy), (cx + 1, cy), (cx + 1, cy + 1), (cx, cy + 1))
      if (corners.forall(b.contains)) {
        val c = (b((cx, cy)) + 2 * b((cx + 1, cy)) + 4 * b((cx + 1, cy + 1)) +
          8 * b((cx, cy + 1))).toLong
        val (nc, ns) = cc.getOrElse(c, (0L, 0L))
        val straddle = if (cx % 16 == 15 || cy % 16 == 15) 1L else 0L
        cc(c) = (nc + 1, ns + straddle)
      }
    }
    cc.map { case (c, (nc, ns)) =>
      val segs = if (c == 0 || c == 15) 0L else if (c == 5 || c == 10) 2L else 1L
      c -> ((nc, ns, nc * segs))
    }.toMap
  }

  test("matches whole-raster brute force on the seeded mosaic") {
    val tilesDf = Synth.mosaicTiles(spark, side = 4)
    val rows = tilesDf.select("tile_x", "tile_y", "bytes", "w", "h", "fmt")
      .as[(Int, Int, Array[Byte], Int, Int, String)].collect().toSeq
    val expect = brute(rows)
    val got = resultMap(ImageOps.marchingSquares(spark, tilesDf))
    assert(got === expect)
    assert(expect.exists(_._2._2 > 0), "no straddling cells — fixture weak")
  }

  private def flat(v: Int) = Array.fill(16 * 16 * 3)(v.toByte)

  private def paint(dark: Array[Byte], pts: Seq[(Int, Int)]): Array[Byte] = {
    val px = dark.clone()
    pts.foreach { case (x, y) =>
      val j = y * 16 + x
      px(3 * j) = 200.toByte; px(3 * j + 1) = 200.toByte
      px(3 * j + 2) = 200.toByte
    }
    px
  }

  test("bright pixel at a tile corner → four straddling corner cases") {
    // pixel (0,0) of tile (1,1) = world (16,16); its four covering cells
    // all straddle tile boundaries and read cases 4 (TL cell), 8, 2, 1
    val tiles = Seq(
      ("a", ImageCodec.encodeRaw(flat(30)), 16, 16, "raw", 0, 0),
      ("b", ImageCodec.encodeRaw(flat(30)), 16, 16, "raw", 1, 0),
      ("c", ImageCodec.encodeRaw(flat(30)), 16, 16, "raw", 0, 1),
      ("d", ImageCodec.encodeRaw(paint(flat(30), Seq((0, 0)))), 16, 16,
        "raw", 1, 1))
      .toDF("image_id", "bytes", "w", "h", "fmt", "tile_x", "tile_y")
    val got = resultMap(ImageOps.marchingSquares(spark, tiles))
    // cells (15,15)/(16,15)/(15,16) straddle tile edges; (16,16) — the
    // case-1 cell whose TL is the bright pixel — is interior to tile d
    assert(got(4L) === ((1L, 1L, 1L)), s"case 4: ${got.get(4L)}")
    assert(got(8L) === ((1L, 1L, 1L)), s"case 8: ${got.get(8L)}")
    assert(got(2L) === ((1L, 1L, 1L)), s"case 2: ${got.get(2L)}")
    assert(got(1L) === ((1L, 0L, 1L)), s"case 1: ${got.get(1L)}")
    assert(got(0L)._1 === 31L * 31 - 4)
  }

  test("saddle case 5 counts two segments") {
    // diagonal corners bright: (3,3) and (4,4) on one tile → the cell
    // (3,3) reads TL+BR = 1 + 4 = 5
    val tiles = Seq(("a", ImageCodec.encodeRaw(
      paint(flat(30), Seq((3, 3), (4, 4)))), 16, 16, "raw", 0, 0))
      .toDF("image_id", "bytes", "w", "h", "fmt", "tile_x", "tile_y")
    val got = resultMap(ImageOps.marchingSquares(spark, tiles))
    assert(got(5L) === ((1L, 0L, 2L)))
  }

  test("partition invariance") {
    val tilesDf = Synth.mosaicTiles(spark, side = 4)
    val a = resultMap(ImageOps.marchingSquares(spark, tilesDf))
    val b = resultMap(ImageOps.marchingSquares(spark, tilesDf.repartition(7)))
    assert(a === b)
  }
}
