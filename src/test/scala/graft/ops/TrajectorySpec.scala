package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Trajectory stop detection (q133). Pins (a) a hand trajectory with a
  * planted stop, a moving leg, and a return stop (re-entering a cell
  * starts a NEW run), (b) a brute-force run-length replica on seeded
  * tracks, (c) the minPoints cut, (d) partition invariance.
  */
class TrajectorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long, Long, Long)]) =
    rows.toDF("walker_id", "seq", "ts_us", "x", "y")

  private def brute(rows: Seq[(Long, Long, Long, Long, Long)],
                    cell: Long, minPts: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (w, pts) =>
      val ord = pts.sortBy(_._2)
        .map(p => (p._3, p._4 / cell, p._5 / cell))
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]
      ord.foreach { p =>
        if (runs.nonEmpty && runs.last.last._2 == p._2 &&
          runs.last.last._3 == p._3) runs.last += p
        else runs += scala.collection.mutable.ArrayBuffer(p)
      }
      runs.filter(_.size >= minPts).map(r =>
        (w, r.head._2, r.head._3, r.map(_._1).min, r.map(_._1).max,
          r.size.toLong))
    }.toSet

  private def run(rows: Seq[(Long, Long, Long, Long, Long)],
                  parts: Int = 4)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    TrajectoryOps.stopDetection(df(rows).repartition(parts), 64L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("planted stop, moving leg, and re-entry as a separate run") {
    // walker 1: 12 points parked in cell (10,10), 15 points marching east
    // one cell per step, then 11 points parked back in (10,10)
    val park1 = (0 until 12).map(k =>
      (1L, k.toLong, k * 1000L, 640L + k % 3, 640L))
    val move = (0 until 15).map(k =>
      (1L, 12L + k, (12 + k) * 1000L, 704L + k * 64L, 640L))
    val park2 = (0 until 11).map(k =>
      (1L, 27L + k, (27 + k) * 1000L, 650L, 645L))
    val rows = park1 ++ move ++ park2
    val got = run(rows)
    assert(got === Set(
      (1L, 10L, 10L, 0L, 11000L, 12L),
      (1L, 10L, 10L, 27000L, 37000L, 11L)))
    assert(got === brute(rows, 64L, 10))
  }

  test("matches brute force on seeded tracks") {
    val rnd = new scala.util.Random(17)
    val rows = for (w <- 0L until 20L; k <- 0L until 150L) yield {
      val parked = (k / 15) % 2 == 0 && rnd.nextInt(10) > 0
      (w, k, k * 1000L,
        5000L + w * 10000L + (if (parked) 0L else k * 17 % 900),
        5000L + (if (parked) 0L else k * 13 % 900))
    }
    // note: the generator above is stateless per row, so "parked" rows all
    // share one exact position per walker — runs form wherever consecutive
    val got = run(rows)
    assert(got === brute(rows, 64L, 10) && got.nonEmpty)
  }

  test("runs below minPoints are dropped") {
    val rows = (0 until 9).map(k => (1L, k.toLong, k * 1000L, 100L, 100L))
    assert(run(rows) === Set.empty)
  }

  test("partition invariance on the synth tracks") {
    val t = graft.SparkEntry.synthTracks(spark, 30L, 120L)
    val a = TrajectoryOps.stopDetection(t, 64L, 10)
      .orderBy("walker_id", "enter_us").collect().toSeq
    val b = TrajectoryOps.stopDetection(t.repartition(7), 64L, 10)
      .orderBy("walker_id", "enter_us").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
