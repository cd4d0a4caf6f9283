package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** exactQuantiles (q75): nearest-rank definition against a brute-force
  * sorted pick on seeded data with heavy duplicates, edge quantiles, and
  * partition invariance.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val data = (0 until 2000).map { i =>
    (s"s${i % 3}", rnd.nextInt(40).toLong)  // heavy ties
  }

  private def brute(q: Double): Map[String, Long] =
    data.groupBy(_._1).map { case (s, rows) =>
      val sorted = rows.map(_._2).sorted
      val rank = math.ceil(q * sorted.size).toInt // nearest-rank, 1-based
      s -> sorted(math.max(rank, 1) - 1)
    }

  test("matches brute-force nearest-rank with duplicates") {
    for (parts <- Seq(1, 8)) {
      val got = Quantiles.exactQuantiles(
        data.toDF("source", "v").repartition(parts), "source", "v",
        Seq(0.5, 0.95, 1.0))
        .collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("p50"), r.getAs[Long]("p95"), r.getAs[Long]("p100"))))
        .toMap
      val expect = (brute(0.5), brute(0.95), brute(1.0))
      got.foreach { case (s, (p50, p95, p100)) =>
        assert((p50, p95, p100) === ((expect._1(s), expect._2(s), expect._3(s))),
          s"stratum $s parts=$parts")
      }
    }
  }

  test("n column counts rows per stratum") {
    val n = Quantiles.exactQuantiles(data.toDF("source", "v"), "source", "v",
      Seq(0.5)).collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(n === data.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
  }
}
