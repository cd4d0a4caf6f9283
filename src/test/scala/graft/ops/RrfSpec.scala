package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: reciprocal-rank fusion (q171). Pins (a) hand-computed
  * integer contributions (10⁹ div (k0+rank)) and their sums, (b) docs
  * missing from one ranker get only the other's contribution, (c) the
  * (rrf_u DESC, doc_id) tiebreak, (d) top-k cut, (e) partition
  * invariance.
  */
class RrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rk(rows: Seq[(Long, Int)], parts: Int = 3) =
    spark.createDataset(rows).repartition(parts).toDF("doc_id", "rank")

  private def c(rank: Long, k0: Long = 60L): Long = 1000000000L / (k0 + rank)

  test("hand-computed fusion: sums, missing ranks, tiebreak") {
    val a = rk(Seq((10L, 1), (11L, 2), (12L, 3)))
    val b = rk(Seq((11L, 1), (13L, 2)))
    val out = TextOps.rrfFuse(Seq(a, b), k0 = 60L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = Seq(
      (11L, c(2) + c(1), 2L), // both rankers
      (10L, c(1), 1L),
      (13L, c(2), 1L),
      (12L, c(3), 1L))
      .sortBy(t => (-t._2, t._1))
    assert(out.toSeq === expect)
  }

  test("equal fused scores break ties on doc_id; top-k cuts after sort") {
    val a = rk(Seq((5L, 1), (4L, 2)))
    val b = rk(Seq((4L, 1), (5L, 2)))
    val out = TextOps.rrfFuse(Seq(a, b), k0 = 60L, k = 1)
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(4L)) // both fuse to c(1)+c(2); 4 < 5
  }

  test("partition invariance") {
    val rows = (0L until 40L).map(i => (i, (i % 17 + 1).toInt))
    val one = TextOps.rrfFuse(Seq(rk(rows, 1), rk(rows.reverse, 1)), k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val many = TextOps.rrfFuse(Seq(rk(rows, 9), rk(rows.reverse, 5)), k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one === many)
  }
}
