package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** First-touch funnel (q142). Pins (a) a hand timeline exercising the
  * strictly-after rule, the horizon cut, and out-of-order steps, (b)
  * first-touch semantics — a user whose EARLIEST anchor cannot convert
  * is not rescued by a later one, (c) exact lag sums, (d) partition
  * invariance on a seeded event stream.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.zipWithIndex.map { case ((u, t, sec), i) =>
      (i.toLong, T0.plusSeconds(sec), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def run(rows: Seq[(Long, String, Long)], horizonUs: Long,
                  parts: Int = 4): Map[Long, (Long, Long)] =
    Sessionize.funnel(ev(rows).repartition(parts),
      Seq("view", "click", "purchase"), horizonUs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("hand timeline: strictly-after, horizon, out-of-order") {
    val H = 100000000L // 100 s
    val rows = Seq(
      // user 1 converts fully: view@0, click@10, purchase@20
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // user 2: click BEFORE view never counts; no later click
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 30L),
      // user 3: purchase beyond the 100 s horizon
      (3L, "view", 0L), (3L, "click", 50L), (3L, "purchase", 200L),
      // user 4: view only
      (4L, "view", 7L))
    val got = run(rows, H)
    assert(got(1L) === (4L, 0L))                       // 4 viewers
    assert(got(2L) === (2L, (10L + 50L) * 1000000L))   // users 1 and 3
    assert(got(3L) === (1L, 20L * 1000000L))           // user 1 only
  }

  test("first-touch: a dead earliest anchor is not rescued") {
    val H = 50000000L // 50 s
    // earliest view@0 has no click within 50 s; the view@100+click@110
    // pair would convert, but first-touch anchors at view@0
    val rows = Seq((1L, "view", 0L), (1L, "view", 100L),
      (1L, "click", 110L), (1L, "purchase", 120L))
    val got = run(rows, H)
    assert(got(1L)._1 === 1L && got(2L)._1 === 0L && got(3L)._1 === 0L)
  }

  test("partition invariance on a seeded stream") {
    val rnd = new scala.util.Random(67)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(4)),
        rnd.nextInt(100000).toLong))
    assert(run(rows, 3600000000L, 3) === run(rows, 3600000000L, 17))
  }
}
