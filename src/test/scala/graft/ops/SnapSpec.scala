package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Snap-to-segment join (q132). Pins (a) brute-force argmin equality on
  * seeded layers, (b) hand geometry covering all three distance arms
  * (projection interior, endpoint, degenerate zero-length segment) and
  * the radius cut, (c) the smallest-seg_id tie-break, (d) partition
  * invariance.
  */
class SnapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val R = 64L

  private def segDf(rows: Seq[(Long, Long, Long, Long, Long)]) =
    rows.toDF("seg_id", "x1", "y1", "x2", "y2")
  private def ptDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("point_id", "x", "y")

  private def d2(px: Long, py: Long, s: (Long, Long, Long, Long, Long)): Double = {
    val (_, x1, y1, x2, y2) = s
    val vx = px - x1; val vy = py - y1
    val wx = px - x2; val wy = py - y2
    val dx = x2 - x1; val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    val tnum = vx * dx + vy * dy
    if (len2 == 0 || tnum <= 0) (vx * vx + vy * vy).toDouble
    else if (tnum >= len2) (wx * wx + wy * wy).toDouble
    else { val c = vx * dy - vy * dx; (c * c).toDouble / len2 }
  }

  private def brute(pts: Seq[(Long, Long, Long)],
                    segs: Seq[(Long, Long, Long, Long, Long)])
      : Map[Long, (Long, Double)] =
    pts.flatMap { case (pid, px, py) =>
      val cands = segs.map(s => (s._1, d2(px, py, s)))
        .filter(_._2 <= (R * R).toDouble)
      if (cands.isEmpty) None
      else Some(pid -> cands.minBy(c => (c._2, c._1)))
    }.toMap

  private def run(pts: Seq[(Long, Long, Long)],
                  segs: Seq[(Long, Long, Long, Long, Long)],
                  parts: Int = 4): Map[Long, (Long, Double)] =
    SpatialOps.snapToSegments(ptDf(pts).repartition(parts), segDf(segs), R)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("matches the brute-force argmin on seeded layers") {
    val rnd = new scala.util.Random(13)
    val segs = (0 until 120).map { i =>
      val x1 = rnd.nextInt(4096).toLong; val y1 = rnd.nextInt(4096).toLong
      (i.toLong, x1, y1,
        math.max(0L, math.min(4095L, x1 + rnd.nextInt(385) - 192)),
        math.max(0L, math.min(4095L, y1 + rnd.nextInt(385) - 192)))
    }
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val got = run(pts, segs)
    assert(got === brute(pts, segs) && got.nonEmpty)
  }

  test("hand geometry: all three arms and the radius cut") {
    val segs = Seq(
      (1L, 100L, 100L, 200L, 100L), // horizontal
      (2L, 500L, 500L, 500L, 500L)) // degenerate point-segment
    val pts = Seq(
      (1L, 150L, 130L),  // interior projection: d2 = 900
      (2L, 230L, 140L),  // beyond endpoint b: d2 = 30^2+40^2 = 2500
      (3L, 520L, 521L),  // degenerate: d2 = 400+441 = 841
      (4L, 150L, 200L))  // d2 = 10000 > 4096 → dropped
    val got = run(pts, segs)
    assert(got === Map(1L -> ((1L, 900.0)), 2L -> ((1L, 2500.0)),
      3L -> ((2L, 841.0))))
  }

  test("equidistant tie breaks to the smallest seg_id") {
    val segs = Seq((7L, 0L, 0L, 100L, 0L), (3L, 0L, 20L, 100L, 20L))
    val got = run(Seq((1L, 50L, 10L)), segs)
    assert(got === Map(1L -> ((3L, 100.0))))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(31)
    val segs = (0 until 80).map { i =>
      val x1 = rnd.nextInt(2048).toLong; val y1 = rnd.nextInt(2048).toLong
      (i.toLong, x1, y1, x1 + rnd.nextInt(100), y1 + rnd.nextInt(100))
    }
    val pts = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(2048).toLong, rnd.nextInt(2048).toLong))
    assert(run(pts, segs, 3) === run(pts, segs, 17))
  }
}
