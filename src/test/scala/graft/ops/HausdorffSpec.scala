package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: symmetric trajectory Hausdorff pairs. Pins (a) agreement with
  * a brute-force reference (candidate screen AND max-of-min distances) on
  * seeded walks, (b) blocking independence (cellSize variations change
  * nothing), (c) the exact AABB-gap candidate criterion at the boundary,
  * (d) hand-computed distances on a tiny fixture, (e) partition
  * invariance.
  */
class HausdorffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (walker, seq, x, y) rows
  private def brute(rows: Seq[(Long, Long, Long, Long)], sampleEvery: Long,
                    maxGap: Long, k: Int): Seq[(Long, Long, Long)] = {
    val pts = rows.filter(_._2 % sampleEvery == 0)
      .groupBy(_._1).view.mapValues(_.map(r => (r._3, r._4))).toMap
    val bb = pts.view.mapValues { ps =>
      (ps.map(_._1).min, ps.map(_._1).max, ps.map(_._2).min, ps.map(_._2).max)
    }.toMap
    val ids = pts.keys.toSeq.sorted
    def gap(a: Long, b: Long): Long = {
      val (amnx, amxx, amny, amxy) = bb(a); val (bmnx, bmxx, bmny, bmxy) = bb(b)
      val gx = math.max(0L, math.max(amnx - bmxx, bmnx - amxx))
      val gy = math.max(0L, math.max(amny - bmxy, bmny - amxy))
      gx * gx + gy * gy
    }
    def dh(a: Long, b: Long): Long = pts(a).map { p =>
      pts(b).map(q => (p._1 - q._1) * (p._1 - q._1) +
        (p._2 - q._2) * (p._2 - q._2)).min
    }.max
    (for {
      a <- ids; b <- ids if a < b && gap(a, b) <= maxGap * maxGap
    } yield (a, b, math.max(dh(a, b), dh(b, a))))
      .sortBy { case (a, b, h) => (h, a, b) }.take(k)
  }

  private def run(rows: Seq[(Long, Long, Long, Long)], sampleEvery: Long,
                  maxGap: Long, cellSize: Long, k: Int,
                  parts: Int = 4): Seq[(Long, Long, Long)] = {
    val df = spark.createDataFrame(rows).toDF("walker_id", "seq", "x", "y")
      .repartition(parts)
    TrajectoryOps.hausdorffPairs(df, sampleEvery, maxGap, cellSize, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def walks(trial: Int, nw: Int, steps: Int): Seq[(Long, Long, Long, Long)] =
    (0 until nw).flatMap { w =>
      val h0 = graft.model.Synth.mix64(trial * 5003L + w)
      var x = 2000L + java.lang.Long.remainderUnsigned(h0, 900L)
      var y = 2000L + java.lang.Long.remainderUnsigned(
        graft.model.Synth.mix64(h0 + 1), 900L)
      (0 until steps).map { t =>
        x += java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(h0 + 10L * t + 2), 15L) - 7L
        y += java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(h0 + 10L * t + 3), 15L) - 7L
        (w.toLong, t.toLong, x, y)
      }
    }

  test("seeded walks match the brute-force reference") {
    for (trial <- 0 until 4) {
      val rows = walks(trial, nw = 14, steps = 40)
      val want = brute(rows, sampleEvery = 2, maxGap = 200, k = 30)
      val got = run(rows, sampleEvery = 2, maxGap = 200, cellSize = 256, k = 30)
      assert(got === want, s"trial $trial")
    }
  }

  test("blocking independence: cell size never changes the result") {
    val rows = walks(7, nw = 10, steps = 30)
    val base = run(rows, 2, 200, cellSize = 256, k = 20)
    for (c <- Seq(64L, 300L, 5000L))
      assert(run(rows, 2, 200, cellSize = c, k = 20) === base, s"cell $c")
  }

  test("AABB gap boundary is inclusive") {
    // two single-point tracks exactly maxGap apart on one axis
    val rows = Seq((0L, 0L, 1000L, 1000L), (1L, 0L, 1100L, 1000L))
    assert(run(rows, 1, 100, 128, 5) === Seq((0L, 1L, 10000L)))
    assert(run(rows, 1, 99, 128, 5) === Seq.empty)
  }

  test("hand-computed Hausdorff on an asymmetric fixture") {
    // A = {(0? shifted) ...}: B covers A's span but adds a far excursion,
    // so h(B,A) > h(A,B) — the symmetric max must pick the excursion
    val rows = Seq(
      (0L, 0L, 1000L, 1000L), (0L, 1L, 1010L, 1000L),
      (1L, 0L, 1000L, 1002L), (1L, 1L, 1010L, 1002L), (1L, 2L, 1050L, 1030L))
    // h(A,B): each A point is 2 away (squared 4); h(B,A): excursion point
    // (1050,1030) -> nearest A (1010,1000): 40^2+30^2 = 2500
    assert(run(rows, 1, 300, 512, 5) === Seq((0L, 1L, 2500L)))
  }

  test("partition invariance") {
    val rows = walks(11, nw = 12, steps = 36)
    assert(run(rows, 2, 250, 256, 25, parts = 1) ===
      run(rows, 2, 250, 256, 25, parts = 9))
  }
}
