package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Segment-crossing overlay join (q129). Pins (a) brute-force equality on
  * seeded layers (blocking vs O(n·m) scan), (b) hand geometry — proper
  * crossing found; touching, collinear overlap, and disjoint excluded,
  * (c) cross-cell crossings survive blocking, (d) partition invariance.
  */
class SegmentCrossingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long, Long, Long)]) =
    rows.toDF("seg_id", "x1", "y1", "x2", "y2")

  private def orient(px: Long, py: Long, qx: Long, qy: Long,
                     rx: Long, ry: Long): Long =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  private def brute(as: Seq[(Long, Long, Long, Long, Long)],
                    bs: Seq[(Long, Long, Long, Long, Long)])
      : Set[(Long, Long)] =
    (for {
      a <- as; b <- bs
      if orient(a._2, a._3, a._4, a._5, b._2, b._3) *
        orient(a._2, a._3, a._4, a._5, b._4, b._5) < 0
      if orient(b._2, b._3, b._4, b._5, a._2, a._3) *
        orient(b._2, b._3, b._4, b._5, a._4, a._5) < 0
    } yield (a._1, b._1)).toSet

  private def run(as: Seq[(Long, Long, Long, Long, Long)],
                  bs: Seq[(Long, Long, Long, Long, Long)],
                  parts: Int = 4): Set[(Long, Long)] =
    SpatialOps.segmentCrossings(df(as).repartition(parts), df(bs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def seeded(n: Int, salt: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val rnd = new scala.util.Random(salt)
    (0 until n).map { i =>
      val x1 = rnd.nextInt(4096).toLong; val y1 = rnd.nextInt(4096).toLong
      (i.toLong, x1, y1,
        math.max(0L, math.min(4095L, x1 + rnd.nextInt(385) - 192)),
        math.max(0L, math.min(4095L, y1 + rnd.nextInt(385) - 192)))
    }
  }

  test("matches the brute-force scan on seeded layers") {
    val as = seeded(150, 3); val bs = seeded(200, 9)
    val got = run(as, bs)
    assert(got === brute(as, bs) && got.nonEmpty)
  }

  test("hand geometry: proper crossing in, touch/collinear/disjoint out") {
    val as = Seq((1L, 0L, 0L, 10L, 10L), // crosses b1
      (2L, 0L, 20L, 10L, 20L),           // touches b2's endpoint
      (3L, 0L, 30L, 10L, 30L),           // collinear overlap with b3
      (4L, 0L, 40L, 10L, 40L))           // disjoint from everything
    val bs = Seq((1L, 0L, 10L, 10L, 0L),
      (2L, 5L, 20L, 5L, 25L),
      (3L, 5L, 30L, 15L, 30L),
      (4L, 0L, 50L, 10L, 50L))
    assert(run(as, bs) === Set((1L, 1L)))
  }

  test("a crossing spanning a cell boundary survives blocking") {
    // level-13 cells are 128 wide; cross exactly at x = 128
    val as = Seq((1L, 100L, 50L, 160L, 50L))
    val bs = Seq((1L, 128L, 20L, 129L, 80L))
    assert(run(as, bs) === Set((1L, 1L)))
  }

  test("partition invariance") {
    val as = seeded(120, 21); val bs = seeded(160, 22)
    assert(run(as, bs, parts = 3) === run(as, bs, parts = 17))
  }
}
