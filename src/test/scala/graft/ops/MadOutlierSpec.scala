package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MAD outlier screen (q140). Pins (a) a hand distribution where the
  * classic mean±kσ screen would differ (one extreme value must not drag
  * the robust threshold), (b) brute-force equality (nearest-rank medians)
  * on seeded data, (c) a constant source yields MAD 0 and flags every
  * deviant, (d) partition invariance.
  */
class MadOutlierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nearestRankMedian(vs: Seq[Long]): Long = {
    val sorted = vs.sorted
    sorted((math.ceil(0.5 * vs.size) - 1).toInt)
  }

  private def brute(rows: Seq[(Long, String, Long)], k: Long)
      : Map[Long, (Long, Long)] =
    rows.groupBy(_._2).flatMap { case (_, docs) =>
      val med = nearestRankMedian(docs.map(_._3))
      val mad = nearestRankMedian(docs.map(d => math.abs(d._3 - med)))
      docs.filter(d => math.abs(d._3 - med) > k * mad)
        .map(d => d._1 -> ((med, mad)))
    }

  private def run(rows: Seq[(Long, String, Long)], k: Long,
                  parts: Int = 4): Map[Long, (Long, Long)] =
    TextOps.madOutliers(
      rows.toDF("doc_id", "source", "n_chars").repartition(parts),
      "n_chars", k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap

  test("one extreme value does not drag the robust threshold") {
    // values cluster at 100±5 with one 10000: classic 3-sigma would let
    // moderate deviants through; MAD flags the extreme alone
    val rows = (0L until 20L).map(i => (i, "s", 95L + (i % 11))) :+
      ((20L, "s", 10000L))
    val got = run(rows, 3L)
    assert(got.keySet === Set(20L))
    assert(got === brute(rows, 3L))
  }

  test("matches brute force on seeded multi-source data") {
    val rnd = new scala.util.Random(53)
    val rows = (0L until 300L).map(i =>
      (i, s"src${i % 4}", (200 + rnd.nextInt(100) +
        (if (rnd.nextInt(20) == 0) 5000 else 0)).toLong))
    assert(run(rows, 2L) === brute(rows, 2L))
  }

  test("constant source: MAD 0 flags every deviant") {
    val rows = (0L until 10L).map(i => (i, "s", 50L)) :+ ((10L, "s", 51L))
    val got = run(rows, 3L)
    assert(got === Map(10L -> ((50L, 0L))))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(59)
    val rows = (0L until 200L).map(i =>
      (i, s"src${i % 3}", rnd.nextInt(1000).toLong))
    assert(run(rows, 2L, 3) === run(rows, 2L, 17))
  }
}
