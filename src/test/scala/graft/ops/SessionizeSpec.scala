package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Sessionize (q88): gap splits, duplicate-timestamp tiebreak, rollups. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val GapUs = 60000000L // 1 minute

  private def ev(id: Long, user: Long, sec: Long, v: Double) =
    (id, java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC),
      user, "click", v, "{}")

  private def df(rows: Seq[(Long, java.time.LocalDateTime, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gaps over the threshold open new sessions; rollups are exact") {
    val events = df(Seq(
      ev(0L, 1L, 0L, 1.5), ev(1L, 1L, 30L, 2.5),   // session 0
      ev(2L, 1L, 120L, 4.0),                        // +90s → session 1
      ev(3L, 2L, 0L, 8.0)))                         // other user
    val out = Sessionize.sessions(events, GapUs)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1L, 0L, 2L, 1L, 30000000L, 4.0),
      (1L, 1L, 1L, 2L, 0L, 4.0),
      (2L, 0L, 1L, 3L, 0L, 8.0)))
  }

  test("exactly-at-gap stays in session; duplicate ts tiebreaks on event_id") {
    val events = df(Seq(
      ev(0L, 1L, 0L, 1.0), ev(1L, 1L, 60L, 1.0),   // gap == threshold: same
      ev(3L, 1L, 60L, 1.0),                         // dup ts, higher id
      ev(4L, 1L, 200L, 1.0)))                       // new session
    val a = Sessionize.assign(events, GapUs)
      .orderBy("ts_us", "event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_id")))
    assert(a.toSeq === Seq((0L, 0L), (1L, 0L), (3L, 0L), (4L, 1L)))
  }

  test("session_window gap is INCLUSIVE — agrees with the batch > boundary") {
    def sw(events: org.apache.spark.sql.DataFrame): Long = events
      .groupBy(org.apache.spark.sql.functions.session_window(
        org.apache.spark.sql.functions.col("ts").cast("timestamp"),
        "1 minute"), org.apache.spark.sql.functions.col("user_id"))
      .count().count()
    // exactly at the gap: BOTH keep one session
    val at = df(Seq(ev(0L, 1L, 0L, 1.0), ev(1L, 1L, 60L, 1.0)))
    assert(Sessionize.sessions(at, GapUs).count() === 1L)
    assert(sw(at) === 1L)
    // one past the gap: BOTH split
    val past = df(Seq(ev(0L, 1L, 0L, 1.0), ev(1L, 1L, 61L, 1.0)))
    assert(Sessionize.sessions(past, GapUs).count() === 2L)
    assert(sw(past) === 2L)
  }

  test("partition invariance") {
    val base = (0 until 200).map { i =>
      ev(i.toLong, (i % 7).toLong, (i * 37 % 500).toLong, 0.25 * i)
    }
    val a = Sessionize.sessions(df(base), GapUs)
    val b = Sessionize.sessions(df(base).repartition(13, col("event_id")), GapUs)
    assert(a.orderBy("user_id", "session_id").collect().toSeq ===
      b.orderBy("user_id", "session_id").collect().toSeq)
  }
}
