package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-5 q102 operator: deterministic weighted sampling without
  * replacement (Efraimidis-Spirtes A-ES over a seeded md5 uniform). Pins
  * (a) agreement with a driver-side replay of the same hash→uniform→score
  * chain, (b) without-replacement + per-stratum-k contracts, (c) the
  * statistical point of the op — heavier rows are selected more often
  * across seeds, (d) partitioning invariance (no RNG state anywhere).
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map { i =>
    (f"doc$i%04d", if (i % 10 == 0) "web" else "book", 50 + i * 7 % 400)
  }.toDF("doc_id", "source", "n_chars")

  /** Driver-side replay: same md5 prefix → 60-bit uniform → ln(u)/w. */
  private def brute(rows: Seq[(String, String, Int)], k: Int, seed: Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: String): Double = {
      val hex = md.digest(s"$id@ws$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) + 1L).toDouble / 1152921504606846976.0
    }
    rows.map { case (id, src, w) =>
      val s = BigDecimal(math.log(u(id)) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, id, s)
    }.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy { case (_, id, s) => (-s, id) }.take(k)
    }.map { case (src, id, s) => (src, id, s) }.toSet
  }

  test("matches the driver-side A-ES replay for several seeds") {
    val d = docs(120)
    val rows = d.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    for (seed <- Seq(0L, 7L, 123456789L)) {
      val got = TextOps.weightedSample(d, k = 8, seed = seed)
        .select("source", "doc_id", "score")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === brute(rows, 8, seed), s"seed $seed")
    }
  }

  test("per-stratum k cap and no replacement") {
    // docs(100): 10 'web' docs, 90 'book' docs; k=15 → web yields all 10
    val got = TextOps.weightedSample(docs(100), k = 15, seed = 3).collect()
    val bySrc = got.groupBy(_.getString(0))
    assert(bySrc("web").length === 10)
    assert(bySrc("book").length === 15)
    assert(got.map(_.getString(1)).distinct.length === got.length)
  }

  test("heavier weights win more often across seeds") {
    // two strata-free docsets: one heavy doc (w=5000) among light (w=50)
    val d = (0 until 50).map(i =>
      (f"d$i%02d", "s", if (i == 17) 5000 else 50)).toDF("doc_id", "source", "n_chars")
    val wins = (0 until 20).count { seed =>
      TextOps.weightedSample(d, k = 5, seed = seed.toLong)
        .collect().exists(_.getString(1) == "d17")
    }
    // P(selected) ≈ 1 - (1-p)^5 with p ≈ 5000/7450 → heavy doc nearly always in
    assert(wins >= 16, s"heavy doc sampled only $wins/20 times")
  }

  test("partitioning invariance") {
    val d = docs(200)
    val a = TextOps.weightedSample(d.repartition(1), k = 6, seed = 9)
      .collect().map(_.toString).sorted.toSeq
    val b = TextOps.weightedSample(d.repartition(13), k = 6, seed = 9)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
