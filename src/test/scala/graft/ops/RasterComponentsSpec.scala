package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{ImageCodec, Synth}

/** Distributed cross-tile raster connected-component labeling (q114).
  * Pins (a) equality with a whole-raster brute-force BFS on the seeded
  * mosaic (blobs that span tile boundaries included), (b) a hand fixture
  * where one stripe crosses two tiles (must merge, n_tiles = 2), (c)
  * 4-adjacency strictness — a diagonal-only touch across a tile corner
  * must NOT merge, (d) partition invariance.
  */
class RasterComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lum(px: Array[Byte], j: Int): Int =
    (299 * (px(3 * j) & 0xFF) + 587 * (px(3 * j + 1) & 0xFF) +
      114 * (px(3 * j + 2) & 0xFF)) / 1000

  /** Whole-raster brute force: stitch every tile into one world mask, BFS
    * 4-adjacent foreground, component id = min world ordinal (wy<<22|wx).
    */
  private def brute(tiles: Seq[(Int, Int, Array[Byte], Int, Int, String)],
                    threshold: Int)
      : Map[Long, (Long, Long, Long, Long, Long, Long, Long)] = {
    val lumAt = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    tiles.foreach { case (tx, ty, bytes, w, h, fmt) =>
      val px = ImageCodec.decode(bytes, fmt, w, h)
      for (j <- 0 until w * h) {
        val l = lum(px, j)
        if (l >= threshold)
          lumAt((tx.toLong * w + j % w, ty.toLong * h + j / w)) = l
      }
    }
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val out = scala.collection.mutable.HashMap
      .empty[Long, (Long, Long, Long, Long, Long, Long, Long)]
    lumAt.keys.toSeq.sorted.foreach { start =>
      if (!seen(start)) {
        val comp = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val q = scala.collection.mutable.Queue(start)
        seen += start
        while (q.nonEmpty) {
          val c @ (x, y) = q.dequeue()
          comp += c
          Seq((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)).foreach { nb =>
            if (lumAt.contains(nb) && !seen(nb)) { seen += nb; q += nb }
          }
        }
        val id = comp.map { case (x, y) => (y << 22) | x }.min
        val tilesOf = comp.map { case (x, y) => (x / 16, y / 16) }.distinct
        out(id) = (comp.size.toLong, tilesOf.size.toLong,
          comp.map(_._1).min, comp.map(_._2).min,
          comp.map(_._1).max, comp.map(_._2).max,
          comp.map { case (x, y) => lumAt((x, y)).toLong }.sum)
      }
    }
    out.toMap
  }

  private def resultMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Long, Long, Long, Long)] =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toMap

  test("matches whole-raster brute force on the seeded mosaic") {
    val tilesDf = Synth.mosaicTiles(spark, side = 4)
    val rows = tilesDf
      .select("tile_x", "tile_y", "bytes", "w", "h", "fmt")
      .as[(Int, Int, Array[Byte], Int, Int, String)].collect().toSeq
    val expect = brute(rows, 128)
    val got = resultMap(ImageOps.rasterComponents(spark, tilesDf)
      .select("component", "n_px", "n_tiles", "min_wx", "min_wy",
        "max_wx", "max_wy", "lum_sum"))
    assert(got === expect)
    // the fixture must actually exercise the cross-tile merge
    assert(expect.values.exists(_._2 > 1),
      "seeded mosaic has no blob spanning tiles — fixture too weak")
  }

  private def flat(v: Int) = Array.fill(16 * 16 * 3)(v.toByte)

  /** Paint world pixels bright on a dark tile. */
  private def paint(dark: Array[Byte], pts: Seq[(Int, Int)]): Array[Byte] = {
    val px = dark.clone()
    pts.foreach { case (x, y) =>
      val j = y * 16 + x
      px(3 * j) = 200.toByte; px(3 * j + 1) = 200.toByte
      px(3 * j + 2) = 200.toByte
    }
    px
  }

  test("a stripe crossing the tile boundary merges into ONE component") {
    // tiles (0,0) and (1,0): bright row y=5, x=14..15 on the left tile and
    // x=0..1 on the right — 4-adjacent across the boundary at wx=15|16
    val t0 = paint(flat(30), Seq((14, 5), (15, 5)))
    val t1 = paint(flat(30), Seq((0, 5), (1, 5)))
    val df = Seq(("a", ImageCodec.encodeRaw(t0), 16, 16, "raw", 0, 0),
      ("b", ImageCodec.encodeRaw(t1), 16, 16, "raw", 1, 0))
      .toDF("image_id", "bytes", "w", "h", "fmt", "tile_x", "tile_y")
    val got = resultMap(ImageOps.rasterComponents(spark, df))
    assert(got.size === 1)
    val (nPx, nTiles, minWx, minWy, maxWx, maxWy, _) =
      got((5L << 22) | 14L)
    assert((nPx, nTiles, minWx, minWy, maxWx, maxWy) ===
      ((4L, 2L, 14L, 5L, 17L, 5L)))
  }

  test("diagonal-only touch across the tile corner does NOT merge") {
    // (15,15) of tile (0,0) and (0,0) of tile (1,1): 8-adjacent, not
    // 4-adjacent — must stay two components
    val t0 = paint(flat(30), Seq((15, 15)))
    val t1 = paint(flat(30), Seq((0, 0)))
    val df = Seq(("a", ImageCodec.encodeRaw(t0), 16, 16, "raw", 0, 0),
      ("b", ImageCodec.encodeRaw(t1), 16, 16, "raw", 1, 1))
      .toDF("image_id", "bytes", "w", "h", "fmt", "tile_x", "tile_y")
    assert(ImageOps.rasterComponents(spark, df).count() === 2)
  }

  test("partition invariance") {
    val tilesDf = Synth.mosaicTiles(spark, side = 4)
    val a = resultMap(ImageOps.rasterComponents(spark, tilesDf))
    val b = resultMap(ImageOps.rasterComponents(spark, tilesDf.repartition(7)))
    assert(a === b)
  }
}
