package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model-based quality filtering (q104): hard-sigmoid logistic regression
  * trained by full-batch GD in integer micro-unit math. Pins (a) the
  * distributed trainer against a pure-Scala brute force over the collected
  * rows (every weight, every iteration — bit equality), (b) partition
  * invariance (integer gradient sums are order-independent), (c) the
  * clamp bounds of the scorer, (d) that on a linearly-separable fixture
  * the distilled model actually classifies (accuracy, not just math).
  */
class MlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = MlOps.Scale

  private def brute(rows: Array[(Long, Long, Long)], iters: Int,
                    lr: Long): (Long, Long, Long) = {
    val n = rows.length.toLong
    var b = 0L; var w1 = 0L; var w2 = 0L
    for (_ <- 1 to iters) {
      var gb = 0L; var g1 = 0L; var g2 = 0L
      rows.foreach { case (y, x1, x2) =>
        val z = (w1 * x1 + w2 * x2) / S + b
        val p = math.min(math.max(z / 4 + S / 2, 0L), S)
        val e = p - y * S
        gb += e; g1 += e * x1 / S; g2 += e * x2 / S
      }
      b -= lr * gb / n; w1 -= lr * g1 / n; w2 -= lr * g2 / n
    }
    (b, w1, w2)
  }

  private def mkRows(n: Int): Array[(Long, Long, Long)] =
    (0 until n).toArray.map { i =>
      val x1 = graft.model.Synth.mix64(1000L + i) % (S / 2)
      val x2 = graft.model.Synth.mix64(2000L + i) % (S / 2)
      // separable with slack + a band of label noise near the margin
      val y = if (x1 + x2 / 2 > 0L) 1L else 0L
      (y, x1, x2)
    }

  test("distributed trainer equals pure-Scala brute force bit for bit") {
    val rows = mkRows(257)
    val df = rows.toSeq.toDF("y", "x1", "x2")
    for (iters <- Seq(0, 1, 3, 8)) {
      val m = MlOps.trainHardSigmoidLr(df, "y", Seq("x1", "x2"),
        iters = iters, lr = 2L)
      val (b, w1, w2) = brute(rows, iters, 2L)
      assert((m.bias, m.weights(0), m.weights(1)) === ((b, w1, w2)),
        s"iters=$iters")
    }
  }

  test("partition invariance: identical model at 1, 3 and 7 partitions") {
    val rows = mkRows(100)
    val base = rows.toSeq.toDF("y", "x1", "x2")
    val models = Seq(1, 3, 7).map { np =>
      val m = MlOps.trainHardSigmoidLr(base.repartition(np), "y",
        Seq("x1", "x2"), iters = 5, lr = 2L)
      (m.bias, m.weights)
    }
    assert(models.distinct.size === 1, models.toString)
  }

  test("scorer clamps to [0, Scale] and separates the fixture") {
    val rows = mkRows(400)
    val df = rows.toSeq.toDF("y", "x1", "x2")
    val m = MlOps.trainHardSigmoidLr(df, "y", Seq("x1", "x2"),
      iters = 8, lr = 2L)
    val scored = df.select(col("y"),
      MlOps.scoreU(m, Seq("x1", "x2")).as("s")).collect()
    assert(scored.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= S))
    val acc = scored.count { r =>
      (r.getLong(1) >= S / 2) == (r.getLong(0) == 1L)
    }.toDouble / scored.length
    assert(acc >= 0.9, s"separable fixture must classify, got $acc")
  }

  test("integerMeans matches driver-side sum div n") {
    val rows = mkRows(123)
    val df = rows.toSeq.toDF("y", "x1", "x2")
    val mu = MlOps.integerMeans(df, Seq("x1", "x2"))
    val n = rows.length.toLong
    assert(mu(0) === rows.map(_._2).sum / n)
    assert(mu(1) === rows.map(_._3).sum / n)
  }
}
