package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** Zonal statistics (q106): per-zone pixel-center stats over
  * georeferenced tiles. Pins (a) brute-force equality over decoded
  * pixels on seeded tiles × hand-made zones, (b) the CENTER-inclusive
  * boundary semantics (a center exactly on the zone edge counts — the
  * BETWEEN is inclusive), (c) zones with rect overlap but NO center
  * inside produce no row, (d) partition invariance of the integer sums.
  */
class ZonalStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4 seeded 16×16 tiles at known anchors (one pair overlapping). */
  private def tiles() = {
    val rows = (0 until 4).map { i =>
      val px = ImageCodec.seededPixels(16, 16, graft.model.Synth.mix64(77L + i))
      ("t%02d".format(i), ImageCodec.encodePng(px, 16, 16), 16, 16, "png",
        i * 10.0, i * 4.0)
    }
    rows.toDF("image_id", "bytes", "w", "h", "fmt", "anchor_x", "anchor_y")
  }

  private def bruteZone(zid: Long, xmin: Double, xmax: Double, ymin: Double,
                        ymax: Double): Option[(Long, Long, Long, Long, Long)] = {
    var nImg = 0L; var nPx = 0L; var ls = 0L
    for (i <- 0 until 4) {
      val px = ImageCodec.seededPixels(16, 16, graft.model.Synth.mix64(77L + i))
      val ax = i * 10.0; val ay = i * 4.0
      var n = 0L; var s = 0L
      for (jy <- 0 until 16; ix <- 0 until 16) {
        val cx = ax + (ix + 0.5) * 1.0
        val cy = ay + (jy + 0.5) * 1.0
        if (cx >= xmin && cx <= xmax && cy >= ymin && cy <= ymax) {
          val o = (jy * 16 + ix) * 3
          n += 1
          s += 299L * (px(o) & 0xFF) + 587L * (px(o + 1) & 0xFF) +
            114L * (px(o + 2) & 0xFF)
        }
      }
      if (n > 0) { nImg += 1; nPx += n; ls += s }
    }
    if (nImg > 0) Some((zid, nImg, nPx, ls, ls / nPx)) else None
  }

  test("matches brute force over decoded pixels, including an " +
    "edge-inclusive center and a no-center overlap") {
    // zone 0 spans tiles 0+1; zone 1's xmax = 16.5 lands EXACTLY on tile
    // 0's ix=15 center (inclusive); zone 2 overlaps tile 3's rect by
    // 0.3 m but contains no pixel center → must vanish
    val zones = Seq(
      (0L, 2.0, 14.0, 1.0, 9.0),
      (1L, 15.5, 16.5, 0.0, 3.0),
      (2L, 45.7, 45.9, 12.0, 12.4)).toDF(
      "building_ord", "xmin", "xmax", "ymin", "ymax")
    val got = ImageOps.zonalStats(spark, tiles(), zones)
      .orderBy("building_ord").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val want = Seq((0L, 2.0, 14.0, 1.0, 9.0), (1L, 15.5, 16.5, 0.0, 3.0),
      (2L, 45.7, 45.9, 12.0, 12.4))
      .flatMap { case (z, a, b, c, d) => bruteZone(z, a, b, c, d) }
    assert(got.toSeq === want)
    assert(!got.exists(_._1 == 2L), "no-center zone must produce no row")
    // the edge-inclusive zone must actually have counted the boundary
    // column: tile 0's ix=15 centers sit at x=15.5 — exactly the zone's
    // xmin — for jy=0..2 (tile 1 reaches x=16.5 but fails the y range)
    assert(got.find(_._1 == 1L).get._3 === 3L)
  }

  test("lumaSamples: per-image raw luma numerator sums match brute force") {
    val got = ImageOps.lumaSamples(spark, tiles())
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (i <- 0 until 4) {
      val px = ImageCodec.seededPixels(16, 16, graft.model.Synth.mix64(77L + i))
      val want = (0 until 256).map { j =>
        299L * (px(3 * j) & 0xFF) + 587L * (px(3 * j + 1) & 0xFF) +
          114L * (px(3 * j + 2) & 0xFF)
      }.sum
      assert(got("t%02d".format(i)) === want)
    }
  }

  test("partition invariance") {
    val zones = Seq((0L, 2.0, 30.0, 1.0, 14.0)).toDF(
      "building_ord", "xmin", "xmax", "ymin", "ymax")
    val a = ImageOps.zonalStats(spark, tiles(), zones).collect().toSeq
    val b = ImageOps.zonalStats(spark, tiles().repartition(7),
      zones.repartition(3)).collect().toSeq
    assert(a === b)
  }
}
