package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of join (AsOfJoin.asOf): correctness against a brute-force
  * per-left-row scan, inclusive at-or-before tie semantics, largest-
  * tiebreak-wins within (key, ts), null when nothing precedes, and
  * partition invariance (the window carry must not depend on input
  * partitioning).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (id, key, ts_sec, value)
  private val leftRows = Seq(
    (100L, 1L, 50L, 0.0), (101L, 1L, 10L, 0.0), (102L, 1L, 30L, 0.0),
    (103L, 2L, 5L, 0.0), (104L, 2L, 40L, 0.0), (105L, 3L, 25L, 0.0))
  private val rightRows = Seq(
    (1L, 1L, 10L, 1.5),  // exactly at left 101's ts — inclusive
    (2L, 1L, 20L, 2.5),
    (3L, 1L, 20L, 3.5),  // same (key, ts) as id 2 — larger id wins
    (4L, 2L, 39L, 4.5),
    (5L, 2L, 41L, 5.5))  // after left 104 — must not match
    // key 3 has no right rows at all

  private def frames(parts: Int) = {
    val l = leftRows.toDF("event_id", "user_id", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
      .select("event_id", "user_id", "ts").repartition(parts)
    val r = rightRows.toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", col("sec").cast("timestamp"))
      .select("user_id", "ts", "event_id", "value").repartition(parts)
    (l, r)
  }

  private def bruteForce(): Map[Long, Option[(Long, Double)]] =
    leftRows.map { case (lid, k, lts, _) =>
      val cands = rightRows.filter { case (_, rk, rts, _) => rk == k && rts <= lts }
      // latest ts; among equal ts the largest tiebreak (id) wins
      lid -> cands.sortBy(c => (c._3, c._1)).lastOption.map(c => (c._1, c._4))
    }.toMap

  private def run(parts: Int): Map[Long, Option[(Long, Double)]] = {
    val (l, r) = frames(parts)
    AsOfJoin.asOf(l, r, key = "user_id", ts = "ts",
      payload = Seq("event_id", "value"), tiebreak = "event_id")
      .collect()
      .map { row =>
        val lid = row.getAs[Long]("event_id")
        val m =
          if (row.isNullAt(row.fieldIndex("asof_event_id"))) None
          else Some((row.getAs[Long]("asof_event_id"), row.getAs[Double]("asof_value")))
        lid -> m
      }.toMap
  }

  test("matches brute force, inclusive ties, largest tiebreak wins") {
    val expect = bruteForce()
    assert(run(3) === expect)
    // sanity on the fixture itself: exercise every branch
    assert(expect(101L) === Some((1L, 1.5)), "at-or-before is inclusive")
    assert(expect(102L) === Some((3L, 3.5)), "same (key,ts): larger tiebreak")
    assert(expect(103L) === None, "nothing precedes")
    assert(expect(105L) === None, "key with no right rows")
    assert(expect(104L) === Some((4L, 4.5)), "later right row excluded")
  }

  test("partition invariance") {
    assert(run(1) === run(7))
  }

  test("left columns survive; payload is prefixed") {
    val (l, r) = frames(2)
    val out = AsOfJoin.asOf(l, r, "user_id", "ts", Seq("value"), "event_id")
    assert(out.columns.toSet === Set("event_id", "user_id", "ts", "asof_value"))
  }
}
