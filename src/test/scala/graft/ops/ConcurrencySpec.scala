package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Peak session concurrency (q147). Pins (a) a hand interval layout with
  * a known peak and earliest peak instant (inclusive-end semantics: a
  * session ending at t still counts at t), (b) brute-force equality on a
  * seeded stream, (c) partition invariance of the two-pass running sum.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = LocalDateTime.of(2024, 5, 1, 0, 0, 0)
  private val Gap = 1800000000L // 30 min

  private def ev(rows: Seq[(Long, Long)]) = // (user, second)
    rows.zipWithIndex.map { case ((u, sec), i) =>
      (i.toLong, T0.plusSeconds(sec), u, "a", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def brute(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    val t0us = 1714521600000000L // 2024-05-01 UTC epoch micros
    val sessions = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ts = es.map(_._2 * 1000000L + t0us).sorted
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(ts.head))
      ts.tail.foreach { t =>
        if (t - runs.last.last > Gap) runs += scala.collection.mutable.ArrayBuffer(t)
        else runs.last += t
      }
      runs.map(r => (r.head, r.last))
    }
    val bounds = sessions.flatMap { case (s, e) =>
      Seq((s, 1L, 0L), ((e + 1), 0L, 1L)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (us, l) => (us, l.map(_._2).sum, l.map(_._3).sum) }
    var cum = 0L; var peak = 0L; var peakUs = 0L
    bounds.foreach { case (us, p, m) =>
      val cand = cum + p
      if (cand > peak) { peak = cand; peakUs = us }
      cum = cand - m
    }
    (peak, peakUs, sessions.size.toLong)
  }

  private def run(rows: Seq[(Long, Long)], parts: Int = 4)
      : (Long, Long, Long) = {
    val r = Sessionize.peakConcurrency(ev(rows).repartition(parts), Gap)
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("hand layout: overlap peak at the right instant, inclusive ends") {
    // u1: [0, 60], u2: [30, 90], u3: [60, 60] — at t=60 all three live
    val rows = Seq((1L, 0L), (1L, 60L), (2L, 30L), (2L, 90L), (3L, 60L))
    val got = run(rows)
    assert(got === brute(rows))
    assert(got._1 === 3L)
    assert(got._2 === 1714521600000000L + 60L * 1000000L)
  }

  test("matches brute force on a seeded stream") {
    val rnd = new scala.util.Random(79)
    val rows = (0 until 1200).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(200000).toLong))
    assert(run(rows) === brute(rows))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(83)
    val rows = (0 until 800).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(150000).toLong))
    assert(run(rows, 3) === run(rows, 17))
  }
}
