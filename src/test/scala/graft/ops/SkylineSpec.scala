package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Distributed skyline (q110). Pins brute-force NOT-EXISTS dominance
  * equality on seeded point sets with duplicates and equal-x ties, and
  * partition invariance of the two-phase plan.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.toSet

  test("matches brute-force dominance on seeded sets with dups and ties") {
    for (trial <- 0 until 8) {
      val n = 40 + trial * 17
      val pts = (0 until n).map { i =>
        // small value domain → plenty of duplicates and equal-x groups
        val x = math.floorMod(graft.model.Synth.mix64(trial * 1000L + i), 12L)
        val y = math.floorMod(graft.model.Synth.mix64(trial * 2000L + i), 12L)
        (i.toLong, x, y)
      }
      val got = Skyline.skyline2(spark,
        pts.toDF("doc_id", "x", "y").repartition(5), "doc_id", "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(pts), s"trial $trial")
    }
  }

  test("duplicate frontier points all survive") {
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 5L, 5L))
    val got = Skyline.skyline2(spark, pts.toDF("doc_id", "x", "y"),
      "doc_id", "x", "y").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("partition invariance") {
    val pts = (0 until 300).map(i => (i.toLong,
      math.floorMod(graft.model.Synth.mix64(i.toLong), 100L),
      math.floorMod(graft.model.Synth.mix64(9999L + i), 100L)))
    val a = Skyline.skyline2(spark, pts.toDF("doc_id", "x", "y"),
      "doc_id", "x", "y").collect().map(_.getLong(0)).toSet
    val b = Skyline.skyline2(spark,
      pts.toDF("doc_id", "x", "y").repartition(11), "doc_id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
  }
}
