package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSIR importance resampling (q116). Pins (a) a brute-force replica of
  * the whole chain (bigram buckets, add-one smoothing, nano-nat rounding,
  * per-doc sums) on a hand corpus, (b) the selection property — documents
  * written in the reference style score positive, off-style documents
  * negative, (c) single-token docs get (0, 0, false), (d) partition
  * invariance.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 64

  // corpus large enough that bigram counts dominate the add-one smoothing
  // over B buckets (tiny corpora drown the signal in the smoothing term —
  // WAI for DSIR, but then no doc scores positive and the selection
  // property can't be asserted)
  private val rows: Seq[(Long, Boolean, String)] =
    (0 until 8).flatMap { r =>
      Seq((r * 10L, true, "the cat sat on the mat"),
        (r * 10L + 1, true, "the cat ate the fish"),
        (r * 10L + 3, false, "stock prices fell sharply today"),
        (r * 10L + 4, false, "quantum flux capacitor hums loudly"))
    } ++ Seq(
      (2L, false, "the cat sat on the mat"), // ref-style text, raw source
      (5L, false, "solo"),
      (6L, false, "stock prices fell sharply again"))

  private def corpus() = rows
    .map { case (id, ref, t) => (id, if (ref) "ref" else "web", t) }
    .toDF("doc_id", "source", "text")

  private def b60(g: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % B
  }

  private def brute(): Map[Long, (Long, Long, Boolean)] = {
    val grams = rows.map { case (id, ref, t) =>
      val tk = t.split(" ")
      (id, ref, tk.indices.dropRight(1).map(i => b60(tk(i) + " " + tk(i + 1))))
    }
    val refC = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val rawC = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    grams.foreach { case (_, ref, gs) =>
      gs.foreach { b => rawC(b) += 1; if (ref) refC(b) += 1 }
    }
    val rt = refC.values.sum; val qt = rawC.values.sum
    def wNano(b: Long): Long =
      math.round((math.log((refC(b) + 1.0) / (rt + B)) -
        math.log((rawC(b) + 1.0) / (qt + B))) * 1e9)
    grams.map { case (id, _, gs) =>
      val sc = gs.map(wNano).sum
      id -> ((gs.size.toLong, sc, sc > 0))
    }.toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    TextOps.dsirScores(df, col("source") === "ref", buckets = B)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("matches the brute-force replica and selects reference-style docs") {
    val got = run(corpus())
    assert(got === brute())
    assert(got(2L)._3, "ref-style raw doc must score positive")
    assert(!got(3L)._3 && !got(6L)._3, "off-style docs must score negative")
    assert(got(5L) === ((0L, 0L, false)), "single-token doc: no grams")
  }

  test("partition invariance") {
    assert(run(corpus().repartition(5)) === run(corpus()))
  }
}
