package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MlOps

/** q153 linear probes: (a) the grouped trainer is bit-identical to
  * training each class alone (same rows, same integer math), (b) the
  * probes classify the striped fixture, (c) the per-class score vector —
  * the learned 3-dim embedding — carries more neighborhood semantics than
  * an equal-dimension UNLEARNED projection of the same features (1-NN
  * label agreement, leave-one-out).
  */
class LinearProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grouped trainer equals per-class solo training, bit for bit") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val label = i % 3
      (i.toLong, label.toLong,
        (0 until 4).map(j => rnd.nextInt(2000001) - 1000000L +
          (if (j == label) 300000L else 0L)))
    }
    val feat = rows.map { case (id, l, x) => (id, l, x(0), x(1), x(2), x(3)) }
      .toDF("id", "label", "x1", "x2", "x3", "x4")
    val xs = (1 to 4).map(i => s"x$i")
    val crossed = feat
      .withColumn("cls", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("y", when(col("label") === col("cls"), 1L).otherwise(0L))
    val grouped = MlOps.trainLinearProbes(crossed, "cls", "y", xs,
      iters = 5, lr = 2L)
    for (c <- 0L to 2L) {
      val solo = MlOps.trainHardSigmoidLr(
        crossed.where(col("cls") === c), "y", xs, iters = 5, lr = 2L)
      assert(grouped(c) === solo, s"class $c diverged from solo training")
    }
  }

  test("probes classify the striped fixture; learned 3-dim embedding " +
    "preserves the 8-dim 1-NN label structure") {
    val out = SparkEntry.queries("q153_linear_probe")(spark, "unused")
      .collect()
    assert(out.length === 600)
    val acc = out.map(_.getAs[Long]("correct")).sum.toDouble / out.length
    info(f"probe classification accuracy: $acc%.3f")
    assert(acc >= 0.9, f"probe accuracy $acc%.3f below 0.9")

    // learned embedding = (s0, s1, s2); unlearned baseline = a fixed
    // 8→3 projection of the SAME centered features
    val feats = SparkEntry.probeFeats(spark).localCheckpoint()
    val rs = (1 to 8).map(b => s"r$b")
    val mu = MlOps.integerMeans(feats, rs)
    val X = feats.select(col("img_no") +: col("label") +:
        rs.zipWithIndex.map { case (r, i) => (col(r) - lit(mu(i))).as(s"x${i + 1}") }: _*)
      .collect()
      .map(r => (r.getAs[Long]("img_no"), r.getAs[Long]("label"),
        (1 to 8).map(i => r.getAs[Long](s"x$i").toDouble).toArray))
      .sortBy(_._1)
    val labels = X.map(_._2.toInt)
    def oneNnAcc(emb: Array[Array[Double]]): Double = {
      var hit = 0
      for (i <- emb.indices) {
        var best = -1; var bestD = Double.MaxValue
        for (j <- emb.indices if j != i) {
          var d = 0.0
          var k = 0
          while (k < emb(i).length) {
            val t = emb(i)(k) - emb(j)(k); d += t * t; k += 1
          }
          if (d < bestD) { bestD = d; best = j }
        }
        if (labels(best) == labels(i)) hit += 1
      }
      hit.toDouble / emb.length
    }
    val learned = out.sortBy(_.getAs[Long]("img_no")).map(r =>
      Array(r.getAs[Long]("s0").toDouble, r.getAs[Long]("s1").toDouble,
        r.getAs[Long]("s2").toDouble))
    // fixed deterministic 8->3 projection (no training signal)
    val P = Array.tabulate(3, 8)((c, j) =>
      (((c * 8 + j + 1) * 2654435761L) % 1999L - 999L).toDouble)
    val unlearned = X.map { case (_, _, x) =>
      Array.tabulate(3)(c => (0 until 8).map(j => P(c)(j) * x(j)).sum)
    }
    val aL = oneNnAcc(learned)
    val aU = oneNnAcc(unlearned)
    val a8 = oneNnAcc(X.map(_._3))
    info(f"1-NN label agreement: learned3=$aL%.3f unlearned3=$aU%.3f raw8=$a8%.3f")
    assert(aL >= 0.9, f"learned embedding 1-NN $aL%.3f below 0.9")
    assert(aL >= a8 - 0.03,
      f"learned 3-dim $aL%.3f lost more than 0.03 vs raw 8-dim $a8%.3f")
  }
}
