package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: Misra-Gries exact heavy hitters. Pins (a) output == the exact
  * GROUP BY/HAVING answer on seeded skewed corpora at several
  * partitionings (the superset guarantee in action), (b) the MG survivor
  * bound itself (every token with count > n/(k+1) is in the final counter
  * set), (c) the guarantee precondition rejecting an impossible maxK.
  */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish token stream: token t with weight ~ 1/(t+1). */
  private def corpus(trial: Int, n: Int): Seq[String] =
    (0 until n).map { i =>
      val h = java.lang.Long.remainderUnsigned(
        graft.model.Synth.mix64(trial * 48611L + i), 1000L)
      // ~n/4 'tok0', ~n/8 'tok1', ... tail uniform over 200 rare tokens
      val t =
        if (h < 250) 0
        else if (h < 375) 1
        else if (h < 440) 2
        else if (h < 475) 3
        else 4 + (java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(h * 31L + i), 200L)).toInt
      s"tok$t"
    }

  test("matches the exact GROUP BY answer across partitionings") {
    for (trial <- 0 until 3; parts <- Seq(1, 7)) {
      val toks = corpus(trial, 4000)
      val thr = 200L
      val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).toMap
      val df = toks.toDF("token").repartition(parts)
      val got = SketchOps.heavyHitters(df, "token", thr)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial parts $parts")
    }
  }

  test("MG survivor bound: every > n/(k+1) token is in the counter set") {
    val toks = corpus(9, 3000)
    val k = 10
    val df = toks.toDF("token").repartition(5)
    val cand = df.as[String]
      .select(udaf(new SketchOps.MgAgg(k), org.apache.spark.sql.Encoders.STRING)
        .apply(col("token"))).head().getSeq[String](0).toSet
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
    val bound = toks.size.toLong / (k + 1)
    counts.filter(_._2 > bound).keys.foreach(t =>
      assert(cand.contains(t), s"$t (count ${counts(t)}) must survive"))
  }

  test("impossible guarantee is rejected") {
    val df = (0 until 1000).map(i => s"t$i").toDF("token")
    intercept[IllegalArgumentException] {
      SketchOps.heavyHitters(df, "token", threshold = 2L, maxK = 10)
    }
  }
}
