package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-source budget cut (q138). Pins (a) equality with the naive
  * single-window replica (the distributed two-pass prefix sum must be
  * mathematically identical), (b) the crossing doc is kept and the next
  * one drops, (c) per-source independence, (d) partition invariance.
  */
class BudgetCutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def naive(rows: Seq[(Long, String, Long)],
                    budget: Long): Map[Long, Long] =
    rows.groupBy(_._2).flatMap { case (_, docs) =>
      val ordered = docs.sortBy(d => (md5hex("bc" + d._1), d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).drop(1)
      ordered.zip(cums).filter { case (d, c) => c - d._3 < budget }
        .map { case (d, c) => d._1 -> c }
    }

  private def run(rows: Seq[(Long, String, Long)], budget: Long,
                  parts: Int = 4): Map[Long, Long] =
    TextOps.budgetCut(
      rows.toDF("doc_id", "source", "n_chars").repartition(parts),
      "n_chars", budget)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("equals the naive per-source window on a seeded corpus") {
    val rnd = new scala.util.Random(19)
    val rows = (0L until 400L).map(i =>
      (i, s"src${i % 5}", (20 + rnd.nextInt(200)).toLong))
    val got = run(rows, 3000L)
    assert(got === naive(rows, 3000L) && got.nonEmpty)
    assert(got.size < rows.size, "the budget must actually cut")
  }

  test("the crossing doc is kept; the next one drops") {
    // one source, equal weights 100, budget 250: exclusive prefixes are
    // 0/100/200/300... -> exactly 3 docs kept regardless of order
    val rows = (0L until 10L).map(i => (i, "s", 100L))
    val got = run(rows, 250L)
    assert(got.size === 3)
    assert(got.values.toSeq.sorted === Seq(100L, 200L, 300L))
  }

  test("sources are independent") {
    val rows = (0L until 40L).map(i => (i, s"src${i % 2}", 50L))
    val got = run(rows, 300L)
    assert(got.size === 12) // 6 docs x 2 sources
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(29)
    val rows = (0L until 300L).map(i =>
      (i, s"src${i % 3}", (10 + rnd.nextInt(90)).toLong))
    assert(run(rows, 2000L, 3) === run(rows, 2000L, 17))
  }
}
