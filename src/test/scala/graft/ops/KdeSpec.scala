package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Kernel-density splat (q136). Pins (a) a single point's full 5×5
  * footprint with the separable 4-2-1 weights, (b) additivity (two
  * points' surfaces sum), (c) the domain clamp at the origin corner,
  * (d) brute-force equality + partition invariance on a seeded cloud.
  */
class KdeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Level = 14 // 64 m cells
  private def k(d: Long): Long = if (d == 0) 4L else if (d.abs == 1) 2L else 1L

  private def brute(pts: Seq[(Double, Double)]): Map[(Long, Long), Long] = {
    val acc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    pts.foreach { case (x, y) =>
      val ix = math.floor(x / 64.0).toLong; val iy = math.floor(y / 64.0).toLong
      for (dx <- -2L to 2L; dy <- -2L to 2L) {
        val cx = ix + dx; val cy = iy + dy
        if (cx >= 0 && cy >= 0 && cx < 16384 && cy < 16384)
          acc((cx, cy)) = acc.getOrElse((cx, cy), 0L) + k(dx) * k(dy)
      }
    }
    acc.toMap
  }

  private def run(pts: Seq[(Double, Double)], parts: Int = 4)
      : Map[(Long, Long), Long] =
    SpatialOps.kernelDensity(pts.toDF("x", "y").repartition(parts),
      "x", "y", Level)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("single point: full separable 5x5 footprint") {
    val got = run(Seq((1000.0, 2000.0))) // cell (15, 31)
    assert(got.size === 25)
    assert(got((15L, 31L)) === 16L)
    assert(got((14L, 31L)) === 8L && got((15L, 30L)) === 8L)
    assert(got((13L, 29L)) === 1L)
    assert(got.values.sum === (1L + 2 + 4 + 2 + 1) * (1L + 2 + 4 + 2 + 1))
  }

  test("two points' surfaces add") {
    val a = run(Seq((1000.0, 2000.0)))
    val b = run(Seq((1032.0, 2000.0)))
    val both = run(Seq((1000.0, 2000.0), (1032.0, 2000.0)))
    val sum = (a.keySet ++ b.keySet).map(c =>
      c -> (a.getOrElse(c, 0L) + b.getOrElse(c, 0L))).toMap
    assert(both === sum)
  }

  test("domain clamp at the origin corner") {
    val got = run(Seq((10.0, 10.0))) // cell (0,0): negative targets drop
    assert(got === brute(Seq((10.0, 10.0))))
    assert(got.size === 9)
  }

  test("brute-force equality + partition invariance on a seeded cloud") {
    val rnd = new scala.util.Random(41)
    val pts = Seq.fill(500)((rnd.nextDouble() * 5000, rnd.nextDouble() * 5000))
    val got = run(pts)
    assert(got === brute(pts))
    assert(run(pts, parts = 17) === got)
  }
}
