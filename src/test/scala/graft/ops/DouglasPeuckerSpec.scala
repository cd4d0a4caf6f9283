package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: depth-capped Douglas-Peucker. Pins (a) agreement with a
  * plain-Scala breadth-first replication (points, coords AND round tags),
  * (b) a hand-checked fixture (single far point kept, straight line
  * collapsed to endpoints), (c) the strict >tol boundary, (d) the
  * degenerate closed-loop chord (s==e coords), (e) partition invariance.
  */
class DouglasPeuckerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Breadth-first depth-capped DP with identical integer semantics. */
  private def brute(rows: Seq[(Long, Long, Long, Long)], tol: Long,
                    levels: Int): Set[(Long, Long, Long, Long, Int)] = {
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long, Int)]()
    rows.groupBy(_._1).foreach { case (w, prs) =>
      val ps = prs.sortBy(_._2).map(r => (r._2, r._3, r._4))
      out += ((w, ps.head._1, ps.head._2, ps.head._3, 0))
      if (ps.size > 1) out += ((w, ps.last._1, ps.last._2, ps.last._3, 0))
      var segs = List((0, ps.size - 1))
      for (round <- 1 to levels) {
        segs = segs.flatMap { case (si, ei) =>
          val interior = (si + 1) until ei
          if (interior.isEmpty) Nil
          else {
            val (sx, sy) = (ps(si)._2, ps(si)._3)
            val (ex, ey) = (ps(ei)._2, ps(ei)._3)
            val len2 = (ex - sx) * (ex - sx) + (ey - sy) * (ey - sy)
            def lhs(i: Int): Long = {
              val (px, py) = (ps(i)._2, ps(i)._3)
              if (len2 == 0) (px - sx) * (px - sx) + (py - sy) * (py - sy)
              else {
                val c = (ex - sx) * (py - sy) - (ey - sy) * (px - sx)
                c * c
              }
            }
            val rhs = if (len2 == 0) tol * tol else tol * tol * len2
            val best = interior.maxBy(i => (lhs(i), -ps(i)._1))
            if (lhs(best) > rhs) {
              out += ((w, ps(best)._1, ps(best)._2, ps(best)._3, round))
              List((si, best), (best, ei))
            } else Nil
          }
        }
      }
    }
    out.toSet
  }

  private def run(rows: Seq[(Long, Long, Long, Long)], tol: Long,
                  levels: Int, parts: Int = 4)
      : Set[(Long, Long, Long, Long, Int)] = {
    import spark.implicits._
    val df = rows.toDF("walker_id", "seq", "x", "y").repartition(parts)
    TrajectoryOps.douglasPeucker(df, tol, levels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
  }

  private def walks(trial: Int, nw: Int, steps: Int): Seq[(Long, Long, Long, Long)] =
    (0 until nw).flatMap { w =>
      var x = 5000L; var y = 5000L
      (0 until steps).map { t =>
        val h = graft.model.Synth.mix64(trial * 9001L + w * 131L + t)
        x += java.lang.Long.remainderUnsigned(h, 21L) - 10L
        y += java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(h), 21L) - 10L
        (w.toLong, t.toLong, x, y)
      }
    }

  test("seeded walks match the breadth-first replication") {
    for (trial <- 0 until 4) {
      val rows = walks(trial, nw = 6, steps = 60)
      assert(run(rows, tol = 12, levels = 6) ===
        brute(rows, tol = 12, levels = 6), s"trial $trial")
    }
  }

  test("hand fixture: far point kept, straight run collapsed") {
    val rows = Seq(
      (0L, 0L, 0L, 0L), (0L, 1L, 10L, 0L), (0L, 2L, 20L, 50L),
      (0L, 3L, 30L, 0L), (0L, 4L, 40L, 0L),
      (1L, 0L, 0L, 0L), (1L, 1L, 10L, 0L), (1L, 2L, 20L, 0L))
    val got = run(rows, tol = 5, levels = 4)
    assert(got.contains((0L, 2L, 20L, 50L, 1)), "the spike splits round 1")
    assert(!got.exists(r => r._1 == 1L && r._5 > 0),
      "collinear walker keeps only its endpoints")
    assert(got.count(_._1 == 1L) === 2)
  }

  test("boundary is strictly greater-than") {
    // deviation exactly tol: cross² == tol²·len² → no split
    // chord (0,0)->(10,0), point at (5, 4), tol 4: cross = 10*4 = 40,
    // cross² = 1600 == tol²·len² = 16*100
    val rows = Seq((0L, 0L, 0L, 0L), (0L, 1L, 5L, 4L), (0L, 2L, 10L, 0L))
    assert(run(rows, tol = 4, levels = 3).forall(_._5 == 0))
    assert(run(rows, tol = 3, levels = 3).exists(_._5 == 1))
  }

  test("degenerate closed loop uses point distance") {
    // s and e coords equal (closed loop): interior at distance 9 > tol 5
    val rows = Seq((0L, 0L, 100L, 100L), (0L, 1L, 109L, 100L),
      (0L, 2L, 100L, 100L))
    val got = run(rows, tol = 5, levels = 2)
    assert(got.contains((0L, 1L, 109L, 100L, 1)))
  }

  test("partition invariance") {
    val rows = walks(8, nw = 5, steps = 50)
    assert(run(rows, 12, 6, parts = 1) === run(rows, 12, 6, parts = 7))
  }
}
