package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Retention cohorts + transition matrix (q143/q144). Pins (a) a hand
  * timeline with known cohort/offset cells, (b) pre-anchor activity is
  * excluded while week-0 activity counts, (c) transition bigrams with the
  * event_id tiebreak on equal timestamps, (d) partition invariance.
  */
class CohortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // epoch week boundary: 2024-01-04 00:00 UTC is week 2818 start
  private val T0 = LocalDateTime.of(2024, 1, 4, 0, 0, 0)

  private def ev(rows: Seq[(Long, String, Long)], ids: Boolean = false) =
    rows.zipWithIndex.map { case ((u, t, day), i) =>
      (i.toLong, T0.plusDays(day), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("hand cohorts: week-0 counts, pre-anchor weeks excluded") {
    val rows = Seq(
      // user 1 signs up week 0, active weeks 0,1,3
      (1L, "signup", 0L), (1L, "click", 8L), (1L, "view", 22L),
      // user 2 signs up week 1, active weeks 1,2 — plus PRE-anchor
      // activity in week 0 that must not produce a negative offset
      (2L, "view", 1L), (2L, "signup", 7L), (2L, "click", 14L),
      // user 3 never signs up: no cohort
      (3L, "view", 0L))
    val got = Sessionize.retentionCohorts(ev(rows), "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // independent replica: cohort = min signup week, activity = distinct
    // (user, week), offsets never negative
    val brute = {
      val epochDay0 = 19726L // 2024-01-04
      val evs = rows.map { case (u, t, d) => (u, t, (epochDay0 + d) / 7) }
      val cohorts = evs.filter(_._2 == "signup").groupBy(_._1)
        .map { case (u, l) => u -> l.map(_._3).min }
      evs.map(e => (e._1, e._3)).distinct
        .flatMap { case (u, w) => cohorts.get(u).filter(_ <= w)
          .map(cw => (cw, w - cw)) }
        .groupBy(identity).map { case (k, l) => k -> l.size.toLong }
    }
    assert(got === brute)
  }

  test("transition bigrams respect the event_id tiebreak") {
    // two events at the SAME timestamp: event_id order decides the path
    val df = Seq(
      (1L, T0, 1L, "view", 0.0, "{}"),
      (2L, T0, 1L, "click", 0.0, "{}"),
      (3L, T0.plusDays(1), 1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Sessionize.transitionMatrix(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("view", "click") -> 1L,
      ("click", "purchase") -> 1L))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(71)
    val types = Seq("view", "click", "signup", "purchase")
    val rows = (0 until 1500).map(_ =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(4)),
        rnd.nextInt(60).toLong))
    val df = ev(rows)
    def c(parts: Int) = Sessionize.retentionCohorts(df.repartition(parts),
      "signup").orderBy("cohort_week", "week_offset").collect().toSeq
    def t(parts: Int) = Sessionize.transitionMatrix(df.repartition(parts))
      .orderBy("from_type", "to_type").collect().toSeq
    assert(c(3) === c(17) && c(3).nonEmpty)
    assert(t(3) === t(17) && t(3).nonEmpty)
  }
}
