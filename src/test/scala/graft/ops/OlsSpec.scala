package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: exact per-group OLS trend (q172). Pins (a) bit-identical
  * agreement with a plain-Scala BigInt replication on seeded data,
  * (b) an exact known slope on a perfect line, (c) null for a
  * constant-x group, (d) partition invariance (exact integer sums are
  * order-independent).
  */
class OlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], parts: Int = 4) =
    MlOps.groupedOls(
        spark.createDataset(rows).repartition(parts).toDF("k", "x", "y"),
        "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  private def brute(rows: Seq[(String, Long, Long)]) =
    rows.groupBy(_._1).map { case (k, g) =>
      val x0 = g.map(_._2).min
      val xp = g.map(r => BigInt(r._2 - x0)); val yp = g.map(r => BigInt(r._3))
      val n = BigInt(g.size)
      val num = n * xp.zip(yp).map(t => t._1 * t._2).sum - xp.sum * yp.sum
      val den = n * xp.map(v => v * v).sum - xp.sum * xp.sum
      val slope = if (den == 0) None
        else Some(BigDecimal(num.toDouble / den.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
      k -> ((g.size.toLong, (yp.sum / n).toLong, slope))
    }

  test("perfect line recovers its exact slope") {
    val rows = (0L until 50L).map(x => ("a", 1000L + x * 7, 3 * (x * 7) + 11))
    val out = run(rows)
    assert(out("a")._3 === Some(3.0))
    assert(out("a")._1 === 50L)
  }

  test("constant x yields a null slope, not a crash") {
    val out = run(Seq(("c", 5L, 1L), ("c", 5L, 9L), ("c", 5L, 4L)))
    assert(out("c")._3 === None)
  }

  test("BigInt replication agreement on seeded noisy groups") {
    val rnd = new scala.util.Random(31)
    val rows = for {
      k <- Seq("g1", "g2", "g3"); i <- 0 until 120
    } yield (k, 1700000000000000L + i * 86400L + rnd.nextInt(1000),
      (i * (k.hashCode % 7 + 2)).toLong * 1000 + rnd.nextInt(500000))
    assert(run(rows) === brute(rows))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 200).map(i =>
      (s"s${i % 4}", i.toLong * 31 + rnd.nextInt(5), rnd.nextInt(100000).toLong))
    assert(run(rows, parts = 1) === run(rows, parts = 13))
  }
}
