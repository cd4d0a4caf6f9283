package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Haversine radius join (q119). Pins (a) brute-force equality on seeded
  * points (candidate completeness across grid-cell boundaries AND refine
  * math), (b) a hand pair straddling a cell boundary at just-under the
  * radius (must be found) and just-over (must not), (c) the gridDeg
  * guard, (d) partition invariance.
  */
class HaversineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hav(lonA: Double, latA: Double, lonB: Double,
                  latB: Double): Double = {
    def r(x: Double) = math.toRadians(x)
    val sLat = math.sin((r(latB) - r(latA)) / 2)
    val sLon = math.sin((r(lonB) - r(lonA)) / 2)
    2.0 * 6371000.0 * math.asin(math.sqrt(
      sLat * sLat + math.cos(r(latA)) * math.cos(r(latB)) * sLon * sLon))
  }

  private def brute(pts: Seq[(String, Double, Double)], radius: Double)
      : Map[String, (Long, Long, Long)] =
    pts.flatMap { case (ia, lonA, latA) =>
      val ds = pts.collect {
        case (ib, lonB, latB) if ib != ia &&
          math.round(hav(lonA, latA, lonB, latB)) <= radius =>
          math.round(hav(lonA, latA, lonB, latB))
      }
      if (ds.isEmpty) None
      else Some(ia -> ((ds.size.toLong, ds.sum, ds.min)))
    }.toMap

  private def run(pts: Seq[(String, Double, Double)], radius: Double,
                  grid: Double, parts: Int = 1) = {
    val df0 = pts.toDF("image_id", "lon", "lat")
    val df = if (parts > 1) df0.repartition(parts) else df0
    SpatialOps.haversineNeighbors(df, radius, grid).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("matches brute force on seeded clustered points") {
    val rnd = new scala.util.Random(19)
    // clusters ~300 m wide, so plenty of pairs inside 500 m
    val pts = (0 until 120).map { i =>
      val (cx, cy) = (0.1 + (i % 4) * 0.004, 0.1 + (i / 4 % 4) * 0.004)
      (f"p$i%03d", cx + rnd.nextDouble() * 0.003,
        cy + rnd.nextDouble() * 0.003)
    }
    val expect = brute(pts, 500.0)
    assert(expect.nonEmpty, "fixture produced no neighbor pairs")
    assert(run(pts, 500.0, 0.006) === expect)
  }

  test("cell-boundary pair inside/outside the radius") {
    // grid 0.006° — points on opposite sides of the lon boundary 0.012:
    // ~444 m apart (inside 500) and ~555 m apart (outside)
    val in = Seq(("a", 0.0119, 0.1), ("b", 0.0159, 0.1))
    val out = Seq(("c", 0.0119, 0.1), ("d", 0.0169, 0.1))
    assert(run(in, 500.0, 0.006).keySet === Set("a", "b"))
    assert(run(out, 500.0, 0.006).isEmpty)
  }

  test("high latitude: lon cells shrink as cos(lat), ring must widen") {
    // at lat 75° one lon degree ≈ 28.8 km, so a 0.006° cell is ~173 m of
    // longitude — a 500 m radius spans ~3 lon cells and the old fixed ±1
    // ring missed true pairs (r5 ADVICE). Brute-force equality pins the
    // widened ring's completeness.
    val rnd = new scala.util.Random(31)
    val pts = (0 until 100).map { i =>
      (f"h$i%03d", 10.0 + rnd.nextDouble() * 0.04,
        75.0 + rnd.nextDouble() * 0.008)
    }
    val expect = brute(pts, 500.0)
    assert(expect.nonEmpty, "fixture produced no neighbor pairs")
    assert(run(pts, 500.0, 0.006) === expect)
    assert(run(pts, 500.0, 0.006, parts = 5) === expect)
    // hand pair 2.5 lon cells apart but only ~432 m: must be found
    val far = Seq(("a", 10.0, 75.0), ("b", 10.015, 75.0))
    assert(run(far, 500.0, 0.006).keySet === Set("a", "b"))
  }

  test("gridDeg guard rejects a grid finer than the radius") {
    intercept[IllegalArgumentException] {
      SpatialOps.haversineNeighbors(
        Seq(("a", 0.0, 0.0)).toDF("image_id", "lon", "lat"),
        radiusM = 500.0, gridDeg = 0.004)
    }
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 80).map(i =>
      (f"q$i%03d", 0.1 + rnd.nextDouble() * 0.01, 0.1 + rnd.nextDouble() * 0.01))
    assert(run(pts, 500.0, 0.006) === run(pts, 500.0, 0.006, parts = 7))
  }
}
